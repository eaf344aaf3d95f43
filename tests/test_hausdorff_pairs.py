"""Per-pair discrete Hausdorff query (s2hausdorff_distance_query.h)."""

import math

import duckdb
import numpy as np

from s2geometry_spark.kernels.measures import point_edge_chord2
from s2geometry_spark.operators.hausdorff import (
    _directed_hausdorff,
    hausdorff_pairs,
    hausdorff_pairs_oracle_sql,
)


def _pt(lat, lng):
    la, ln = math.radians(lat), math.radians(lng)
    return np.array(
        [math.cos(la) * math.cos(ln), math.cos(la) * math.sin(ln), math.sin(la)]
    )


def _brute_directed(A, B):
    best_d, best_k = -1.0, -1
    for k, p in enumerate(A):
        dmin = min(
            float(point_edge_chord2(p[None], B[j][None], B[j + 1][None])[0])
            for j in range(len(B) - 1)
        )
        if dmin > best_d:
            best_d, best_k = dmin, k
    return best_d, best_k


def test_directed_kernel_matches_bruteforce():
    rng = np.random.RandomState(7)
    for _ in range(10):
        la, lb = rng.randint(2, 9), rng.randint(2, 9)
        lat, lng = rng.uniform(-60, 60), rng.uniform(-170, 170)
        A = np.stack([_pt(lat + 3 * i, lng + 2 * i) for i in range(la)])
        B = np.stack([_pt(lat + 1 + 2 * i, lng - 1 + 3 * i) for i in range(lb)])
        assert _directed_hausdorff(A, B) == _brute_directed(A, B)


def test_directed_asymmetry_catalina_shape():
    """The header's Catalina example: a short chain near a long chain has
    a small directed distance to it, while the long chain's far end makes
    the reverse direction (and the undirected max) much larger."""
    island = np.stack([_pt(33.3, -118.4), _pt(33.4, -118.5)])
    mainland = np.stack(
        [_pt(33.7, -118.2), _pt(36.0, -112.0), _pt(41.0, -95.0), _pt(44.0, -70.0)]
    )
    d_ab, _ = _directed_hausdorff(island, mainland)
    d_ba, _ = _directed_hausdorff(mainland, island)
    assert d_ab < 0.01 < d_ba
    assert max(d_ab, d_ba) == d_ba


def test_hausdorff_pairs_spark_oracle_parity(spark):
    rng = np.random.RandomState(13)
    rows = []
    for cid in range(8):
        lat, lng = rng.uniform(-50, 50), rng.uniform(-150, 150)
        for s in range(rng.randint(3, 8)):
            lat += rng.uniform(1.0, 5.0)
            lng += rng.uniform(1.0, 5.0)
            p = _pt(lat, lng)
            rows.append((cid, s, float(p[0]), float(p[1]), float(p[2])))
    pair_list = [(a, b) for a in range(8) for b in range(8) if a != b][:20]

    cdf = spark.createDataFrame(
        rows, "chain_id long, seq long, x double, y double, z double"
    )
    pdf = spark.createDataFrame(pair_list, "chain_a long, chain_b long")
    got = {
        (r.chain_a, r.chain_b): (
            r.n_a, r.n_b, r.directed_ab, r.a_vertex,
            r.directed_ba, r.b_vertex, r.undirected,
        )
        for r in hausdorff_pairs(spark, cdf, pdf).collect()
    }

    verts_sql = "SELECT * FROM (VALUES " + ",".join(
        "(%d, %d, CAST(%.17e AS DOUBLE), CAST(%.17e AS DOUBLE), CAST(%.17e AS DOUBLE))"
        % r for r in rows
    ) + ") AS t(chain_id, seq, x, y, z)"
    pairs_sql = "SELECT * FROM (VALUES " + ",".join(
        f"({a}, {b})" for a, b in pair_list
    ) + ") AS t(chain_a, chain_b)"
    con = duckdb.connect()
    want = {
        (a, b): rest
        for a, b, *rest in con.sql(
            hausdorff_pairs_oracle_sql(verts_sql, pairs_sql)
        ).fetchall()
    }
    assert set(got) == set(want)
    for k in got:
        assert got[k] == tuple(want[k]), (k, got[k], want[k])
    # undirected is symmetric: swap (a, b) in the pair list and directed
    # distances swap while undirected is unchanged
    swapped = {
        (r.chain_a, r.chain_b): (r.directed_ab, r.directed_ba, r.undirected)
        for r in hausdorff_pairs(
            spark, cdf, spark.createDataFrame(
                [(b, a) for a, b in pair_list], "chain_a long, chain_b long"
            )
        ).collect()
    }
    for (a, b), (_, _, dab, _, dba, _, und) in got.items():
        assert swapped[(b, a)] == (dba, dab, und)
