"""S2Builder ChooseInitialSites (identity snap) — the invariants the
reference guarantees (s2builder.cc:727-789) plus the operator
round-trip."""

import numpy as np
import pandas as pd

from s2geometry_spark.kernels.builder import choose_sites


def _cloud(rng, n):
    V = rng.normal(size=(n, 3))
    base = rng.normal(size=3)
    V = base + 0.1 * V
    return V / np.linalg.norm(V, axis=1, keepdims=True)


SEP = 0.03 ** 2  # squared chord


def test_every_vertex_covered_and_sites_separated():
    rng = np.random.default_rng(3)
    for _ in range(10):
        V = _cloud(rng, 400)
        sites, sid = choose_sites(V, SEP)
        assert 0 < len(sites) < len(V)
        # identity snap: sites are input vertices, bit-for-bit
        vset = {v.tobytes() for v in V}
        assert all(s.tobytes() in vset for s in sites)
        # every vertex within snap radius of its assigned site
        d = ((V - sites[sid]) ** 2).sum(axis=1)
        assert (d <= SEP).all()
        # chosen sites pairwise separated by MORE than the separation
        diff = sites[:, None, :] - sites[None, :, :]
        c2 = (diff ** 2).sum(axis=2)
        iu = np.triu_indices(len(sites), 1)
        assert (c2[iu] > SEP).all()
        # assignment is the argmin with lowest-id tie-break
        dall = ((V[:, None, :] - sites[None, :, :]) ** 2).sum(axis=2)
        assert (sid == np.argmin(dall, axis=1)).all()


def test_order_independence_for_distinct_points():
    """SortInputVertices makes the chosen set a function of the point
    SET (distinct points), not the input row order."""
    rng = np.random.default_rng(4)
    V = _cloud(rng, 300)
    s1, _ = choose_sites(V, SEP)
    perm = rng.permutation(len(V))
    s2, _ = choose_sites(V[perm], SEP)
    assert np.array_equal(s1, s2)


def test_duplicate_points_merge_to_one_site():
    rng = np.random.default_rng(5)
    V = _cloud(rng, 50)
    W = np.concatenate([V, V, V[:10]])
    s1, sid = choose_sites(W, SEP)
    s0, _ = choose_sites(V, SEP)
    assert np.array_equal(s0, s1)
    # duplicates snap to the same site
    assert (sid[:50] == sid[50:100]).all()


def test_zero_separation_keeps_all_distinct():
    rng = np.random.default_rng(6)
    V = _cloud(rng, 80)
    sites, _ = choose_sites(V, 0.0)
    assert len(sites) == len(V)


def test_operator_matches_kernel(spark):
    from s2geometry_spark.operators.builder_ops import identity_snap_chains

    rng = np.random.default_rng(9)
    rows = []
    for gid in range(3):
        for cid in range(2):
            V = _cloud(rng, 40)
            for s, (x, y, z) in enumerate(V):
                rows.append((gid, gid * 2 + cid, s, x, y, z))
    pdf = pd.DataFrame(rows, columns=["group_id", "chain_id", "seq", "x", "y", "z"])
    cdf = spark.createDataFrame(pdf)
    got = (
        identity_snap_chains(cdf, SEP)
        .toPandas()
        .sort_values(["group_id", "chain_id", "pos"])
        .reset_index(drop=True)
    )
    for gid, grp in pdf.groupby("group_id"):
        grp = grp.sort_values(["chain_id", "seq"]).reset_index(drop=True)
        V = grp[["x", "y", "z"]].to_numpy()
        sites, sid = choose_sites(V, SEP)
        for cid, sub in grp.groupby("chain_id"):
            s = sid[sub.index.to_numpy()]
            keep = np.ones(len(s), bool)
            keep[1:] = s[1:] != s[:-1]
            exp = s[keep]
            g = got[(got.group_id == gid) & (got.chain_id == cid)]
            assert np.array_equal(g["site_id"].to_numpy(), exp)
            assert np.array_equal(
                g[["sx", "sy", "sz"]].to_numpy(), sites[exp]
            )
