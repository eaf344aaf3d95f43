"""Polyline alignment (s2polyline_alignment.cc): kernel vs brute force,
windowed/approx consistency, medoid + consensus, and the Spark operator
vs the kernel on a synthetic chain table."""

import numpy as np
import pytest

from s2geometry_spark.kernels.alignment import (
    Window,
    approx_alignment,
    consensus_polyline,
    cost_matrix,
    dtw_cost,
    dtw_exact,
    dtw_windowed,
    medoid_index,
)


def _rand_chain(rng, n):
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _brute_best(c):
    """Minimum-cost monotone path through cost matrix c by enumeration."""
    n, m = c.shape
    best = [np.inf]

    def rec(i, j, acc):
        acc = acc + c[i, j]
        if i == n - 1 and j == m - 1:
            best[0] = min(best[0], acc)
            return
        if i + 1 < n:
            rec(i + 1, j, acc)
        if j + 1 < m:
            rec(i, j + 1, acc)
        if i + 1 < n and j + 1 < m:
            rec(i + 1, j + 1, acc)

    rec(0, 0, 0.0)
    return best[0]


def test_exact_matches_bruteforce():
    rng = np.random.default_rng(7)
    for _ in range(25):
        A = _rand_chain(rng, int(rng.integers(1, 6)))
        B = _rand_chain(rng, int(rng.integers(1, 6)))
        cost, path = dtw_exact(A, B)
        assert cost == pytest.approx(_brute_best(cost_matrix(A, B)), abs=1e-12)
        assert dtw_cost(A, B) == cost  # bitwise: same pinned recurrence


def test_path_is_valid_warp():
    rng = np.random.default_rng(11)
    for _ in range(20):
        n, m = int(rng.integers(1, 12)), int(rng.integers(1, 12))
        A, B = _rand_chain(rng, n), _rand_chain(rng, m)
        cost, path = dtw_exact(A, B)
        assert path[0] == (0, 0) and path[-1] == (n - 1, m - 1)
        c = cost_matrix(A, B)
        assert cost == pytest.approx(sum(c[i, j] for i, j in path), rel=1e-12)
        for (i0, j0), (i1, j1) in zip(path, path[1:]):
            assert (i1 - i0, j1 - j0) in {(0, 1), (1, 0), (1, 1)}


def test_identical_chains_align_on_diagonal():
    rng = np.random.default_rng(3)
    A = _rand_chain(rng, 9)
    cost, path = dtw_exact(A, A)
    assert cost == 0.0
    assert path == [(i, i) for i in range(9)]


def test_windowed_full_window_equals_exact():
    rng = np.random.default_rng(5)
    A, B = _rand_chain(rng, 10), _rand_chain(rng, 14)
    w = Window([(0, 14)] * 10, 14)
    assert w.is_valid()
    cost, path = dtw_windowed(A, B, w)
    ecost, epath = dtw_exact(A, B)
    assert cost == ecost and path == epath


def test_window_from_path_upsample_dilate_valid():
    rng = np.random.default_rng(13)
    A, B = _rand_chain(rng, 8), _rand_chain(rng, 12)
    _, path = dtw_exact(A, B)
    w = Window.from_warp_path(path)
    assert w.is_valid()
    up = w.upsample(16, 24)
    assert up.is_valid()
    assert up.dilate(2).is_valid()


def test_approx_upper_bounds_exact_and_converges():
    rng = np.random.default_rng(17)
    A, B = _rand_chain(rng, 80), _rand_chain(rng, 90)
    ecost, _ = dtw_exact(A, B)
    acost, apath = approx_alignment(A, B)
    assert acost >= ecost - 1e-12
    assert apath[0] == (0, 0) and apath[-1] == (79, 89)
    # huge radius -> density switchover -> falls back to exact
    fcost, fpath = approx_alignment(A, B, radius=100)
    assert (fcost, fpath) == dtw_exact(A, B)


def test_medoid_matches_bruteforce():
    rng = np.random.default_rng(19)
    chains = [_rand_chain(rng, int(rng.integers(3, 8))) for _ in range(5)]
    totals = np.zeros(5)
    for i in range(5):
        for j in range(5):
            if i != j:
                totals[i] += dtw_exact(chains[i], chains[j])[0]
    assert medoid_index(chains, approx=False) == int(np.argmin(totals))


def test_consensus_fixed_point_on_identical_inputs():
    rng = np.random.default_rng(23)
    A = _rand_chain(rng, 7)
    out = consensus_polyline([A.copy(), A.copy(), A.copy()], approx=False)
    # DBA over identical inputs renormalizes the input to itself
    assert np.allclose(out, A, atol=1e-12)
    assert np.allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-12)


def test_operator_matches_kernel(spark):
    """align_chain_pairs / medoid_chains reproduce the kernel per pair."""
    from pyspark.sql import functions as F

    from s2geometry_spark.operators.alignment import align_chain_pairs, medoid_chains

    rng = np.random.default_rng(29)
    chains = {cid: _rand_chain(rng, int(rng.integers(2, 9))) for cid in range(8)}
    rows = [
        (cid, seq, float(x), float(y), float(z))
        for cid, V in chains.items()
        for seq, (x, y, z) in enumerate(V)
    ]
    cdf = spark.createDataFrame(rows, "chain_id long, seq int, x double, y double, z double")
    pairs = spark.createDataFrame(
        [(a, a + 1) for a in range(0, 8, 2)], "chain_a long, chain_b long"
    )
    got = {
        (r["chain_a"], r["chain_b"]): (r["alignment_cost"], r["path_len"])
        for r in align_chain_pairs(spark, cdf, pairs).collect()
    }
    for a in range(0, 8, 2):
        cost, path = dtw_exact(chains[a], chains[a + 1])
        assert got[(a, a + 1)] == (cost, len(path))

    med = medoid_chains(
        spark, cdf.withColumn("group_id", (F.col("chain_id") / 4).cast("long"))
    ).collect()
    by_group = {r["group_id"]: r["medoid_chain"] for r in med}
    for g, members in [(0, range(0, 4)), (1, range(4, 8))]:
        totals = {
            i: sum(dtw_exact(chains[i], chains[j])[0] for j in members if j != i)
            for i in members
        }
        assert by_group[g] == min(sorted(members), key=lambda i: (totals[i], i))


def test_consensus_operator_matches_kernel(spark):
    from s2geometry_spark.operators.alignment import consensus_chains

    rng = np.random.default_rng(31)
    chains = {cid: _rand_chain(rng, int(rng.integers(3, 8))) for cid in range(6)}
    rows = [
        (cid // 3, cid, seq, float(x), float(y), float(z))
        for cid, V in chains.items()
        for seq, (x, y, z) in enumerate(V)
    ]
    cdf = spark.createDataFrame(
        rows, "group_id long, chain_id long, seq int, x double, y double, z double"
    )
    got = consensus_chains(spark, cdf).toPandas()
    for gid, members in [(0, [0, 1, 2]), (1, [3, 4, 5])]:
        exp = consensus_polyline(
            [chains[c] for c in members], approx=False, iteration_cap=1
        )
        g = got[got["group_id"] == gid].sort_values("seq")
        assert (g[["x", "y", "z"]].to_numpy() == exp).all()
