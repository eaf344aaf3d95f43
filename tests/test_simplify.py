"""SubsampleVertices: golden cases ported from s2polyline_test.cc
(SubsampleVerticesTrivialInputs / SimpleExample / Guarantees), the
tolerance guarantee as a property, and kernel <-> DuckDB-oracle decision
parity on the jittered chain fixtures."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from s2geometry_spark.kernels import textformat
from s2geometry_spark.kernels.simplify import _rem2pi, subsample_vertices
from s2geometry_spark.operators.simplify import subsample_oracle_sql

GOLDEN = [
    # (polyline, tolerance_degrees, expected kept indices) — verbatim
    # from s2polyline_test.cc CheckSubsample calls
    ("", 1.0, ""),
    ("0:1", 1.0, "0"),
    ("10:10, 11:11", 5.0, "0,1"),
    ("-1:0, 0:0, 1:0", 1e-15, "0,2"),
    ("-1:0, 0:0, 1:1", 0.0, "0,1,2"),
    ("-1:0, 0:0, 1:1", -1.0, "0,1,2"),
    ("0:1, 0:2, 0:3, 0:4, 0:5", 1.0, "0,4"),
    ("0:1, 0:1, 0:1, 0:2", 0.0, "0,3"),
    ("0:0, 0:1, -1:2, 0:3, 0:4, 1:4, 2:4.5, 3:4, 3.5:4, 4:4", 3.0, "0,9"),
    ("0:0, 0:1, -1:2, 0:3, 0:4, 1:4, 2:4.5, 3:4, 3.5:4, 4:4", 2.0, "0,6,9"),
    ("0:0, 0:1, -1:2, 0:3, 0:4, 1:4, 2:4.5, 3:4, 3.5:4, 4:4", 0.9, "0,2,6,9"),
    ("0:0, 0:1, -1:2, 0:3, 0:4, 1:4, 2:4.5, 3:4, 3.5:4, 4:4", 0.4,
     "0,1,2,3,4,6,9"),
    ("0:0, 0:1, -1:2, 0:3, 0:4, 1:4, 2:4.5, 3:4, 3.5:4, 4:4", 0,
     "0,1,2,3,4,5,6,7,8,9"),
    ("10:10, 12:12, 10:10", 5.0, "0"),
    ("0:0, 1:1, 0:0, 0:120, 0:130", 5.0, "0,3,4"),
    ("90:0, 50:180, 20:180, -20:180, -50:180, -90:0, 30:0, 90:0", 5.0,
     "0,2,4,5,6,7"),
    ("10:10, 10:20, 10:30, 10:15, 10:40", 5.0, "0,2,3,4"),
    ("10:10, 10:20, 10:30, 10:10, 10:30, 10:40", 5.0, "0,2,3,5"),
    ("10:10, 12:12, 9:9, 10:20, 10:30", 5.0, "0,4"),
]


def _xyz_lists(s):
    if not s:
        return [], [], []
    P = textformat.make_points(s)
    return [list(P[:, i]) for i in range(3)]


@pytest.mark.parametrize("poly,tol_deg,expected", GOLDEN)
def test_subsample_goldens(poly, tol_deg, expected):
    xs, ys, zs = _xyz_lists(poly)
    got = subsample_vertices(xs, ys, zs, math.radians(tol_deg))
    want = [int(t) for t in expected.split(",")] if expected else []
    assert got == want


def test_rem2pi_matches_ieee_remainder():
    rng = np.random.default_rng(11)
    for x in rng.uniform(-30, 30, 50_000):
        assert _rem2pi(float(x)) == math.remainder(float(x), 2 * math.pi)


def _point_to_arc_dist(p, a, b):
    """Distance from p to the minor arc a->b (for the guarantee check
    only — plain NumPy, no parity constraints)."""
    n = np.cross(a, b)
    nn = np.linalg.norm(n)
    if nn == 0:
        return math.acos(max(-1.0, min(1.0, float(np.dot(p, a)))))
    n = n / nn
    # projection onto the great circle
    q = p - float(np.dot(p, n)) * n
    qn = np.linalg.norm(q)
    if qn > 0:
        q = q / qn
        # inside the lune of the arc?
        if float(np.dot(np.cross(a, q), n)) >= 0 and float(
            np.dot(np.cross(q, b), n)
        ) >= 0:
            return math.acos(max(-1.0, min(1.0, float(np.dot(p, q)))))
    da = math.acos(max(-1.0, min(1.0, float(np.dot(p, a)))))
    db = math.acos(max(-1.0, min(1.0, float(np.dot(p, b)))))
    return min(da, db)


def test_subsample_tolerance_guarantee():
    """Every dropped vertex stays within tolerance of the kept
    polyline (the algorithm's contract, s2polyline.h:254-264)."""
    rng = np.random.default_rng(5)
    for trial in range(20):
        n = int(rng.integers(5, 40))
        lat = np.cumsum(rng.uniform(-2, 2, n)) + 20
        lng = np.cumsum(rng.uniform(-2, 2, n)) - 30
        la, lo = np.radians(lat), np.radians(lng)
        P = np.stack(
            [np.cos(la) * np.cos(lo), np.cos(la) * np.sin(lo), np.sin(la)], 1
        )
        tol = math.radians(float(rng.uniform(0.5, 4.0)))
        xs, ys, zs = [list(P[:, i]) for i in range(3)]
        kept = subsample_vertices(xs, ys, zs, tol)
        K = P[kept]
        for i in range(n):
            if i in kept:
                continue
            d = min(
                _point_to_arc_dist(P[i], K[j], K[j + 1])
                for j in range(len(K) - 1)
            )
            assert d <= tol * (1 + 1e-9), (trial, i, d, tol)


def _fixture_chains(n_keys=3000, div=60):
    from s2geometry_spark.kernels.geotag import (
        int_triplet_from_key,
        xyz_from_triplet,
    )

    k = np.arange(1, n_keys + 1, dtype=np.int64)
    chain = (k - (k % div)) // div
    bk = chain * 7907 + 11
    px, py, pz = xyz_from_triplet(*int_triplet_from_key(bk))
    gx, gy, gz = xyz_from_triplet(*int_triplet_from_key(k - (k % 16)))
    qx, qy, qz = xyz_from_triplet(*int_triplet_from_key(k))
    ex = px + 0.25 * gx + 0.05 * qx
    ey = py + 0.25 * gy + 0.05 * qy
    ez = pz + 0.25 * gz + 0.05 * qz
    en = np.sqrt((ex * ex + ey * ey) + ez * ez)
    return pd.DataFrame(
        {"chain_id": chain, "seq": k, "x": ex / en, "y": ey / en, "z": ez / en}
    )


def test_oracle_parity_on_fixture_chains():
    """The DuckDB oracle replays the kernel decision-for-decision on
    jittered fixture chains (several tolerances; twice each to catch the
    nondeterministic lambda-in-recursion failure mode the oracle was
    restructured around)."""
    df = _fixture_chains()
    want = {}
    for tol_deg in (0.5, 2.0):
        tol = math.radians(tol_deg)
        for cid, g in df.groupby("chain_id"):
            g = g.sort_values("seq")
            kept = subsample_vertices(
                [float(v) for v in g.x],
                [float(v) for v in g.y],
                [float(v) for v in g.z],
                tol,
            )
            seqs = g.seq.to_list()
            want[(tol_deg, int(cid))] = sorted(seqs[i] for i in kept)
    con = duckdb.connect()
    con.register("t", df)
    for tol_deg in (0.5, 2.0):
        sql = subsample_oracle_sql(
            "SELECT chain_id, seq, x, y, z FROM t", math.radians(tol_deg)
        )
        for _trial in range(2):
            got = {}
            for cid, seq, n_in, n_kept in con.sql(sql).fetchall():
                got.setdefault(int(cid), []).append(seq)
            for cid in {c for (t, c) in want if t == tol_deg}:
                assert sorted(got.get(cid, [])) == want[(tol_deg, cid)], (
                    tol_deg,
                    cid,
                )


def test_simplify_chains_operator(spark):
    """Spark operator == kernel on the same chains, and n_in/n_kept
    bookkeeping is consistent."""
    from s2geometry_spark.operators.simplify import simplify_chains

    df = _fixture_chains(n_keys=600)
    tol = math.radians(2.0)
    sdf = spark.createDataFrame(df)
    out = simplify_chains(sdf, tol).toPandas()
    for cid, g in df.groupby("chain_id"):
        g = g.sort_values("seq")
        kept = subsample_vertices(
            [float(v) for v in g.x],
            [float(v) for v in g.y],
            [float(v) for v in g.z],
            tol,
        )
        seqs = g.seq.to_list()
        sub = out[out.chain_id == cid]
        assert sorted(sub.seq) == sorted(seqs[i] for i in kept)
        assert (sub.n_in == len(g)).all()
        assert (sub.n_kept == len(kept)).all()
