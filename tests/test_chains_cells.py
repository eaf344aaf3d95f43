"""Chain interpolation + closest-cell query operators."""

import math

import numpy as np
import pytest

from s2geometry_spark.kernels import cellid, measures
from s2geometry_spark.operators.chains import _interp_chain, chain_interpolate
from s2geometry_spark.operators.closest_cell import (
    _cell_distances,
    cell_corner_table,
    closest_cells_join,
)


def _pt(lat, lng):
    la, ln = math.radians(lat), math.radians(lng)
    return np.array(
        [math.cos(la) * math.cos(ln), math.cos(la) * math.sin(ln), math.sin(la)]
    )


def test_interp_chain_matches_polyline_kernel():
    V = np.stack([_pt(0, 0), _pt(0, 10), _pt(10, 10), _pt(10, 30)])
    for f in (0.1, 0.25, 0.5, 0.9):
        got = _interp_chain(V, f)
        want = measures.polyline_interpolate(V, f)
        assert np.allclose(got, want, atol=1e-12)
    assert np.allclose(_interp_chain(V, 0.0), V[0])
    assert np.allclose(_interp_chain(V, 1.0), V[-1])


def test_chain_interpolate_distributed(spark):
    rng = np.random.RandomState(5)
    rows = []
    for cid in range(4):
        base = rng.randn(3)
        base /= np.linalg.norm(base)
        for s in range(8):
            p = base + 0.02 * rng.randn(3)
            p /= np.linalg.norm(p)
            rows.append((cid, s, float(p[0]), float(p[1]), float(p[2])))
    pts = spark.createDataFrame(
        rows, "chain_id long, seq long, x double, y double, z double"
    )
    out = chain_interpolate(pts, (0.3, 0.7)).collect()
    assert len(out) == 8
    by_chain = {}
    for cid, s, x, y, z in rows:
        by_chain.setdefault(cid, []).append((s, x, y, z))
    for r in out:
        V = np.array(
            [[x, y, z] for s, x, y, z in sorted(by_chain[r.chain_id])]
        )
        want = _interp_chain(V, r.fraction)
        assert np.allclose([r.x, r.y, r.z], want, atol=0)


def test_cell_distance_zero_inside_positive_outside():
    cid = cellid.parent(
        cellid.from_latlng_degrees(np.array([10.0]), np.array([20.0])), 8
    )[0]
    labels, biased, corners = cell_corner_table([("a", int(cid))])
    inside = _pt(10.0, 20.0)[None, :]
    far = _pt(-40.0, 150.0)[None, :]
    assert _cell_distances(inside, corners)[0, 0] == 0.0
    d = _cell_distances(far, corners)[0, 0]
    assert d > 1.0


def test_closest_cells_join_vs_bruteforce(spark):
    rng = np.random.RandomState(11)
    lats = rng.uniform(-60, 60, 40)
    lngs = rng.uniform(-170, 170, 40)
    cells = [
        (
            f"r{i % 3}",
            int(
                cellid.parent(
                    cellid.from_latlng_degrees(
                        np.array([lats[i]]), np.array([lngs[i]])
                    ),
                    6,
                )[0]
            ),
        )
        for i in range(12)
    ]
    cells = list({c: None for c in cells})  # dedupe
    Q = rng.randn(50, 3)
    Q /= np.linalg.norm(Q, axis=1)[:, None]
    pts = spark.createDataFrame(
        [(i, float(q[0]), float(q[1]), float(q[2])) for i, q in enumerate(Q)],
        "qid long, qx double, qy double, qz double",
    )
    out = {(r.qid, r.rank): (r.label, r.cell, r.dist_chord2)
           for r in closest_cells_join(pts, cells, k=2).collect()}
    labels, biased, corners = cell_corner_table(cells)
    D = _cell_distances(Q, corners)
    for qi in range(50):
        order = np.argsort(D[qi], kind="stable")[:2]
        for rk, ci in enumerate(order, 1):
            assert out[(qi, rk)] == (labels[ci], biased[ci], D[qi, ci])

def test_chain_interpolate_boundary_fractions_oracle_parity(spark):
    """r3 ADVICE: engine and oracle must agree BIT-EXACTLY at f=0 and
    f=1 (raw endpoint vertices, no slerp renorm), and on single-vertex
    and fully-degenerate (zero-length) chains."""
    import duckdb

    from s2geometry_spark.operators.chains import chain_interpolate_oracle_sql

    rng = np.random.RandomState(11)
    rows = []
    for cid in range(3):
        lat, lng = rng.uniform(-50, 50), rng.uniform(-150, 150)
        for s in range(6):
            # degree-scale steps: sub-milliradian segments hit the known
            # last-ulp acos/sin libm divergence vs DuckDB (BENCH.md
            # transcendental-portability note); fixtures use coarse steps
            lat += rng.uniform(2.0, 8.0)
            lng += rng.uniform(2.0, 8.0)
            p = _pt(lat, lng)
            rows.append((cid, s, float(p[0]), float(p[1]), float(p[2])))
    # single-vertex chain
    p = rng.randn(3); p /= np.linalg.norm(p)
    rows.append((90, 0, float(p[0]), float(p[1]), float(p[2])))
    # zero-length chain (all vertices identical -> total == 0)
    q = rng.randn(3); q /= np.linalg.norm(q)
    for s in range(3):
        rows.append((91, s, float(q[0]), float(q[1]), float(q[2])))

    fracs = (0.0, 0.25, 1.0)
    pts = spark.createDataFrame(
        rows, "chain_id long, seq long, x double, y double, z double"
    )
    got = {
        (r.chain_id, r.fraction): (r.x, r.y, r.z)
        for r in chain_interpolate(pts, fracs).collect()
    }

    # %.17e: bare decimal literals parse as DECIMAL in DuckDB (lossy
    # before the CAST); E-notation parses as DOUBLE
    verts_sql = "SELECT * FROM (VALUES " + ",".join(
        "(%d, %d, CAST(%.17e AS DOUBLE), CAST(%.17e AS DOUBLE), CAST(%.17e AS DOUBLE))"
        % (cid, s, x, y, z)
        for cid, s, x, y, z in rows
    ) + ") AS t(chain_id, seq, x, y, z)"
    con = duckdb.connect()
    want = {
        (cid, f): (x, y, z)
        for cid, f, x, y, z in con.sql(
            chain_interpolate_oracle_sql(verts_sql, fracs)
        ).fetchall()
    }
    assert set(got) == set(want)
    for k in got:
        assert got[k] == want[k], (k, got[k], want[k])
