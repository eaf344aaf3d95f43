"""S2Polyline::NearlyCovers — reference golden cases
(s2polyline_test.cc:680-765) plus structural properties and the Spark
operator round-trip."""

import numpy as np
import pytest

from s2geometry_spark.kernels.nearcover import is_edge_b_near_edge_a, nearly_covers
from s2geometry_spark.kernels.textformat import make_points


def _ch2(tol_deg: float) -> float:
    t = np.radians(tol_deg)
    s = 2.0 * np.sin(t / 2.0)
    return float(s * s)


def _pts(text: str) -> np.ndarray:
    return make_points(text) if text else np.zeros((0, 3))


# (a, b, tol_deg, b_covers_a, a_covers_b) — s2polyline_test.cc golden set
GOLDEN = [
    ("1:1, 2:2, -1:10", "1:1, 2:2, -1:10", 1e-10, True, True),
    ("1:1, 2:2, -1:10", "-1:10, 2:2, 1:1", 1e-10, False, False),
    ("1:1, 2:1", "1:1, 1.5:1, 2:1", 1e-10, True, True),
    ("-5:1, 10:1, 10:5, 5:10", "9:1, 9.9995:1, 10.0005:5", 1e-3, False, True),
    ("-5:1, 10:1", "0:1, 20:1", 1.0, False, False),
    ("0:0, 0:2, 0:1, 0:4, 0:5", "0:0, 0:2, 0:4, 0:3, 0:5", 1.5, True, True),
    ("0:0, 0:2, 0:1, 0:4, 0:5", "0:0, 0:2, 0:4, 0:3, 0:5", 0.5, False, False),
    ("5:1, -5:1", "1:1, 3:1", 1.0, False, False),
    ("5:1, -5:1", "1:1, 3:1", 2.5, False, True),
    ("0:1, 0:2, 0:2, 0:3", "0:1, 0:1, 0:1, 0:3", 1e-10, True, True),
    ("0:11, 0:0, 0:9, 0:20", "0:10, 0:15", 1.5, False, True),
    (
        "40:1, 20:1",
        "39.9:0.9, 40:1.1, 30:1.15, 29:0.95, 28:1.1, 27:1.15, "
        "26:1.05, 25:0.85, 24:1.1, 23:0.9, 20:0.99",
        0.2,
        True,
        True,
    ),
    ("0:0, 0:2", "0:2, 0:3", 1.5, False, True),
    ("0:0, 0:2, 0:2, 0:2", "0:2, 0:3", 1.5, False, True),
    ("0:1, 0:2", "", 0.0, False, True),
    ("", "", 0.0, True, True),
]


@pytest.mark.parametrize("a,b,tol,b_covers_a,a_covers_b", GOLDEN)
def test_golden(a, b, tol, b_covers_a, a_covers_b):
    A, B = _pts(a), _pts(b)
    ct = _ch2(tol)
    assert nearly_covers(B, A, ct) == b_covers_a
    assert nearly_covers(A, B, ct) == a_covers_b


def _random_chain(rng, n):
    base = rng.normal(size=3)
    base /= np.linalg.norm(base)
    steps = rng.normal(scale=0.02, size=(n, 3))
    V = base + np.cumsum(steps, axis=0)
    return V / np.linalg.norm(V, axis=1, keepdims=True)


def test_contiguous_subchain_always_covered():
    rng = np.random.default_rng(7)
    tiny = _ch2(1e-9)
    for _ in range(20):
        A = _random_chain(rng, 30)
        i = rng.integers(0, 10)
        j = rng.integers(i + 2, 30)
        assert nearly_covers(A, A[i:j], tiny)


def test_self_covered_and_reverse_not():
    rng = np.random.default_rng(8)
    tiny = _ch2(1e-9)
    for _ in range(20):
        A = _random_chain(rng, 25)
        assert nearly_covers(A, A, tiny)
        assert not nearly_covers(A, A[::-1].copy(), tiny)


def test_disjoint_not_covered():
    A = _pts("10:10, 11:11, 12:10")
    B = _pts("-40:80, -41:81")
    assert not nearly_covers(A, B, _ch2(2.0))


def test_degenerate_gate_edges():
    """A zero-length edge is near iff its opposite edge's endpoints are
    within tol (point-distance limit; module docstring)."""
    p = _pts("10:10")[0]
    near = _pts("10:10.5, 10:11")
    far = _pts("30:30, 31:31")
    P = np.stack([p, p])
    assert is_edge_b_near_edge_a(P[:1], P[1:], near[:1], near[1:], _ch2(2.0))[0]
    assert not is_edge_b_near_edge_a(P[:1], P[1:], far[:1], far[1:], _ch2(2.0))[0]
    # and symmetrically for a degenerate B edge
    A = _pts("10:9, 10:12")
    assert is_edge_b_near_edge_a(A[:1], A[1:], P[:1], P[1:], _ch2(1.0))[0]


def test_operator_matches_kernel(spark):
    """nearly_covers_pairs == the kernel applied per pair."""
    import pandas as pd
    from pyspark.sql import functions as F

    from s2geometry_spark.operators.nearcover import nearly_covers_pairs

    rng = np.random.default_rng(11)
    rows = []
    chains = {}
    for cid in range(6):
        V = _random_chain(rng, 12 + cid)
        chains[cid] = V
        for s, (x, y, z) in enumerate(V):
            rows.append((cid, s, x, y, z))
    cdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["chain_id", "seq", "x", "y", "z"])
    )
    pairs = spark.createDataFrame(
        pd.DataFrame(
            [(a, b, "t") for a in range(6) for b in range(6)],
            columns=["chain_a", "chain_b", "kind"],
        )
    )
    ct = _ch2(1.0)
    got = {
        (r.chain_a, r.chain_b): (r.n_a, r.n_b, r.covers)
        for r in nearly_covers_pairs(spark, cdf, pairs, ct).collect()
    }
    assert len(got) == 36
    for a in range(6):
        for b in range(6):
            exp = int(nearly_covers(chains[a], chains[b], ct))
            assert got[a, b] == (len(chains[a]), len(chains[b]), exp)


# ---------- S2Loop::BoundaryNear golden cases (s2loop_test.cc) ----------


def _near(a_str: str, b_str: str, tol_deg_or_ch2: float, expected: bool, ch2=None):
    from s2geometry_spark.kernels.nearcover import loop_boundary_near
    from s2geometry_spark.kernels.textformat import make_points

    A = make_points(a_str)
    B = make_points(b_str)
    tol = ch2 if ch2 is not None else _ch2(tol_deg_or_ch2)
    assert loop_boundary_near(A, B, tol) == expected
    assert loop_boundary_near(B, A, tol) == expected  # symmetric, like TestNear


def test_boundary_near_golden():
    """The four TEST(S2Loop, BoundaryNear) cases, both directions each."""
    _near("0:0, 0:10, 5:5", "0:0.1, -0.1:9.9, 5:5.2", 0.5, True)
    _near(
        "0:0, 0:3, 0:7, 0:10, 3:7, 5:5",
        "0:0, 0:10, 2:8, 5:5, 4:4, 3:3, 1:1",
        0.0, True, ch2=_ch2(np.degrees(1e-3)),
    )
    # all vertices close to some edge, but not equivalent
    _near("0:0, 0:2, 2:2, 2:0", "0:0, 1.9999:1, 0:2, 2:2, 2:0", 0.5, False)
    # backtracking triangles that defeat greedy matching
    t1 = ("0.1:0, 0.1:1, 0.1:2, 0.1:3, 0.1:4, 1:4, 2:4, 3:4, "
          "2:4.1, 1:4.1, 2:4.2, 3:4.2, 4:4.2, 5:4.2")
    t2 = ("0:0, 0:1, 0:2, 0:3, 0.1:2, 0.1:1, 0.2:2, 0.2:3, "
          "0.2:4, 1:4.1, 2:4, 3:4, 4:4, 5:4")
    _near(t1, t2, 1.5, True)
    _near(t1, t2, 0.5, False)


def test_boundary_approx_equals_and_polygon_near():
    from s2geometry_spark.kernels.nearcover import (
        loop_boundary_approx_equals,
        polygon_boundary_near,
    )
    from s2geometry_spark.kernels.regions import Loop
    from s2geometry_spark.kernels.textformat import make_points

    A = make_points("0:0, 0:10, 10:10, 10:0")
    # rotated copy matches under some offset; perturbed beyond tol fails
    B = np.roll(A.copy(), -2, axis=0)
    assert loop_boundary_approx_equals(A, B, _ch2(1e-9))
    assert not loop_boundary_approx_equals(A, make_points("0:0, 0:10, 10:10"), _ch2(1.0))
    assert not loop_boundary_approx_equals(
        A, make_points("0:0, 0:10, 10:10, 11.5:0"), _ch2(1.0)
    )
    # polygon: shell+hole vs the same with loops listed in the other order
    shell = Loop.make_regular(10.0, 20.0, 0.4, 16).vertices
    hole = Loop.make_regular(10.0, 20.0, 0.15, 12).vertices
    assert polygon_boundary_near([shell, hole], [hole, shell], _ch2(0.01))
    other = Loop.make_regular(10.0, 24.0, 0.4, 16).vertices
    assert not polygon_boundary_near([shell, hole], [other, hole], _ch2(0.01))


def test_oracle_collapses_adjacent_duplicates(spark):
    """ADVICE r3: the kernel collapses adjacent duplicate vertices
    (simplify_chain) before the search; the oracle must do the same or a
    repeated vertex creates degenerate edges only on the oracle side and
    can flip the covers verdict.  Chains here include exact adjacent
    duplicates; n_a/n_b must still report RAW vertex counts."""
    import duckdb
    import pandas as pd

    from s2geometry_spark.operators.nearcover import (
        nearly_covers_oracle_sql,
        nearly_covers_pairs,
    )

    rng = np.random.default_rng(23)
    rows = []
    raw_len = {}
    for cid in range(4):
        V = _random_chain(rng, 8)
        # inject an adjacent duplicate mid-chain (and a doubled head on
        # odd chains) — exactly the degenerate-edge shape snapping makes
        V = np.insert(V, 3, V[3], axis=0)
        if cid % 2:
            V = np.insert(V, 0, V[0], axis=0)
        raw_len[cid] = len(V)
        for s, (x, y, z) in enumerate(V):
            rows.append((cid, s, float(x), float(y), float(z)))
    pairs = [(a, b, "t") for a in range(4) for b in range(4)]
    ct = _ch2(1.0)

    cdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["chain_id", "seq", "x", "y", "z"])
    )
    pdf = spark.createDataFrame(
        pd.DataFrame(pairs, columns=["chain_a", "chain_b", "kind"])
    )
    got = {
        (r.chain_a, r.chain_b): (r.n_a, r.n_b, r.covers)
        for r in nearly_covers_pairs(spark, cdf, pdf, ct).collect()
    }

    verts_sql = "SELECT * FROM (VALUES " + ",".join(
        f"({cid}, {s}, CAST({x!r} AS DOUBLE), CAST({y!r} AS DOUBLE), CAST({z!r} AS DOUBLE))"
        for cid, s, x, y, z in rows
    ) + ") AS t(chain_id, seq, x, y, z)"
    pairs_sql = "SELECT * FROM (VALUES " + ",".join(
        f"({i}, {a}, {b}, 't')" for i, (a, b, _) in enumerate(pairs)
    ) + ") AS t(pair_id, chain_a, chain_b, kind)"
    con = duckdb.connect()
    want = {
        (a, b): (na, nb, cov)
        for a, b, _, na, nb, cov in con.sql(
            nearly_covers_oracle_sql(verts_sql, pairs_sql, ct)
        ).fetchall()
    }
    assert got == want
    for (a, b), (na, nb, _) in got.items():
        assert (na, nb) == (raw_len[a], raw_len[b])
