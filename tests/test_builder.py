"""S2Builder snap subset: snapping semantics, degeneracy cleanup, and
the distributed snapping operators."""

import numpy as np
import pytest

from s2geometry_spark.kernels import builder, cellid
from s2geometry_spark.kernels.regions import Loop


def _rand_points(n, seed=0):
    rng = np.random.RandomState(seed)
    P = rng.randn(n, 3)
    return P / np.linalg.norm(P, axis=1)[:, None]


def test_snap_is_idempotent():
    P = _rand_points(500)
    S1 = builder.snap_to_cell_centers(P, 10)
    S2 = builder.snap_to_cell_centers(S1, 10)
    assert np.array_equal(S1, S2)


def test_snap_cells_are_level_ancestors():
    P = _rand_points(200)
    cells = builder.snap_cells(P, 8)
    leafs = cellid.from_xyz(P[:, 0], P[:, 1], P[:, 2])
    assert np.array_equal(cells, cellid.parent(leafs, 8))
    assert (cellid.level(cells) == 8).all()


def test_snap_error_within_half_diagonal():
    from s2geometry_spark.kernels import metrics

    P = _rand_points(1000, seed=3)
    S = builder.snap_to_cell_centers(P, 10)
    chord = np.linalg.norm(P - S, axis=1)
    ang = 2.0 * np.arcsin(np.minimum(1.0, 0.5 * chord))
    # S2CellIdSnapFunction::snap_radius: <= half the max cell diagonal
    assert ang.max() <= 0.5 * metrics.MAX_DIAG.get_value(10) + 1e-15


def test_simplify_and_degenerate_loop_drop():
    # three nearby points collapse to one cell center at a coarse level
    lo = Loop.make_regular(10, 20, 1e-6, 8).vertices  # tiny ring
    assert builder.build_loops([lo], 5) == []
    big = Loop.make_regular(10, 20, 0.3, 12).vertices
    out = builder.build_loops([big], 10)
    assert len(out) == 1
    v = out[0]
    assert np.unique(v, axis=0).shape[0] == v.shape[0] >= 3
    # polyline: duplicate-collapse
    chain = np.repeat(big[:4], 3, axis=0)
    pl = builder.build_polyline(chain, 10)
    assert pl.shape[0] >= 2
    assert (np.any(pl[1:] != pl[:-1], axis=1)).all()


def test_snap_dedup_operator(spark):
    from s2geometry_spark.operators.builder_ops import snap_dedup

    P = _rand_points(300, seed=7)
    df = spark.createDataFrame(
        [(i, float(p[0]), float(p[1]), float(p[2])) for i, p in enumerate(P)],
        "pid long, x double, y double, z double",
    )
    out = {r.snap_cell: (r.keeper_id, r.n_merged) for r in snap_dedup(df, 3).collect()}
    cells = cellid.to_biased(builder.snap_cells(P, 3))
    want = {}
    for i, c in enumerate(cells.tolist()):
        k, n = want.get(c, (i, 0))
        want[c] = (min(k, i), n + 1)
    assert out == want
    assert sum(n for _, n in out.values()) == 300


def test_snap_chains_operator(spark):
    from s2geometry_spark.operators.builder_ops import snap_chains

    big = Loop.make_regular(10, 20, 0.3, 24).vertices
    rows = [(0, s, *map(float, big[s])) for s in range(24)]
    df = spark.createDataFrame(
        rows, "chain_id long, seq long, x double, y double, z double"
    )
    out = sorted(snap_chains(df, 6).collect(), key=lambda r: r.seq)
    want = builder.build_polyline(big, 6)
    got = np.array([[r.sx, r.sy, r.sz] for r in out])
    assert np.array_equal(got, want)


# ---------------------------------------------------------------------------
# IntLatLngSnapFunction (s2builderutil_snap_functions.cc:327-414)
# ---------------------------------------------------------------------------


def test_int_latlng_snap_idempotent():
    """Snapping a snapped point returns the same grid coordinates
    (SnapPoint is a projection, s2builder_test.cc snap idempotence)."""
    P = _rand_points(2000, seed=3)
    for e in (0, 2, 5, 7):
        ilat, ilng = builder.int_latlng_snap(P, e)
        S = builder.int_latlng_snap_point(ilat, ilng, e)
        ilat2, ilng2 = builder.int_latlng_snap(S, e)
        assert (ilat2 == ilat).all()
        # lng of a snapped pole degenerates; compare only off-pole rows
        off_pole = np.abs(ilat) < 90 * 10**e
        assert (ilng2[off_pole] == ilng[off_pole]).all()


def test_int_latlng_snap_within_snap_radius():
    """SnapPoint moves each vertex by at most MinSnapRadiusForExponent
    (the defining guarantee, s2builderutil_snap_functions.cc:248-277)."""
    P = _rand_points(2000, seed=4)
    for e in (1, 3, 5):
        r = builder.min_snap_radius_for_exponent(e)
        ilat, ilng = builder.int_latlng_snap(P, e)
        S = builder.int_latlng_snap_point(ilat, ilng, e)
        d = np.arccos(np.clip((P * S).sum(axis=1), -1.0, 1.0))
        assert (d <= r).all(), (e, float(d.max()), r)


def test_exponent_for_max_snap_radius_inverse():
    """ExponentForMaxSnapRadius is the inverse of MinSnapRadiusForExponent
    (s2builderutil_snap_functions_test.cc ExponentForMaxSnapRadius)."""
    for e in range(0, 11):
        r = builder.min_snap_radius_for_exponent(e)
        assert builder.exponent_for_max_snap_radius(r) == e
        # a slightly smaller movement budget needs a finer grid (e+1)
        assert builder.exponent_for_max_snap_radius(0.9 * r) == min(e + 1, 10)
        # a larger budget still admits the same grid
        assert builder.exponent_for_max_snap_radius(2.0 * r) <= e


def test_int_latlng_min_vertex_separation_bounds():
    """min_vertex_separation stays within (0, snap_radius] and equals the
    max of the proportional and asymptotic bounds."""
    for e in (0, 4, 8):
        r = builder.min_snap_radius_for_exponent(e)
        sep = builder.int_latlng_min_vertex_separation(e, r)
        assert 0.0 < sep <= r
        assert sep >= 0.471 * r - 1e-18


def test_snap_latlng_dedup_operator(spark):
    """Distributed IntLatLng snap-dedup: every input point appears in
    exactly one grid bucket, keeper is the min id, and the kernel's
    integers match a local recomputation."""
    from s2geometry_spark.operators.builder_ops import snap_latlng_dedup

    P = _rand_points(500, seed=5)
    pdf_rows = [
        (int(i), float(P[i, 0]), float(P[i, 1]), float(P[i, 2]))
        for i in range(len(P))
    ]
    df = spark.createDataFrame(pdf_rows, "pid long, x double, y double, z double")
    out = snap_latlng_dedup(df, 5).toPandas()
    assert int(out.n_merged.sum()) == len(P)
    ilat, ilng = builder.int_latlng_snap(P, 5)
    import pandas as pd

    local = (
        pd.DataFrame({"ilat": ilat, "ilng": ilng, "pid": np.arange(len(P))})
        .groupby(["ilat", "ilng"])
        .agg(keeper_id=("pid", "min"), n_merged=("pid", "size"))
        .reset_index()
    )
    merged = out.sort_values(["ilat", "ilng"]).reset_index(drop=True)
    local = local.sort_values(["ilat", "ilng"]).reset_index(drop=True)
    assert (merged.ilat.to_numpy() == local.ilat.to_numpy()).all()
    assert (merged.ilng.to_numpy() == local.ilng.to_numpy()).all()
    assert (merged.keeper_id.to_numpy() == local.keeper_id.to_numpy()).all()
    assert (merged.n_merged.to_numpy() == local.n_merged.to_numpy()).all()


def test_cellid_snap_level_roundtrip():
    """S2CellIdSnapFunction LevelToFromSnapRadius
    (s2builderutil_snap_functions_test.cc): the level<->radius pair
    round-trips, a slightly smaller radius forces the next finer level,
    and huge/tiny radii clamp to 0 / max level."""
    from s2geometry_spark.kernels.builder import (
        level_for_max_snap_radius,
        min_snap_radius_for_level,
    )

    MAX_LEVEL = 30
    for level in range(0, MAX_LEVEL + 1):
        radius = min_snap_radius_for_level(level)
        assert level_for_max_snap_radius(radius) == level, level
        assert level_for_max_snap_radius(0.999 * radius) == min(
            level + 1, MAX_LEVEL
        ), level
    # a radius larger than level 0's minimum clamps to level 0; a tiny
    # one clamps to the max level
    assert level_for_max_snap_radius(2.0) == 0
    assert level_for_max_snap_radius(1e-30) == MAX_LEVEL


def test_int_latlng_snap_fixed_points():
    """IntLatLngSnapFunction SnapPoint fixed points
    (s2builderutil_snap_functions_test.cc SnapPoint): points generated
    from integer E5/E6/E7 coordinates snap to themselves at the matching
    exponent, and an E7 point with a trailing 1 digit is NOT a fixed
    point at E6."""
    rng = np.random.default_rng(21)
    for _ in range(200):
        p = rng.normal(size=3)
        p /= np.linalg.norm(p)
        ilat, ilng = builder.int_latlng_snap(p[None, :], 7)
        for e in (5, 6, 7):
            il, ig = builder.int_latlng_snap(p[None, :], e)
            pe = builder.int_latlng_snap_point(il, ig, e)
            il2, ig2 = builder.int_latlng_snap(pe, e)
            assert il2[0] == il[0] and ig2[0] == ig[0], e
        # E7 coordinates ending in ...1 are not on the E6 grid
        il6, ig6 = builder.int_latlng_snap(p[None, :], 6)
        p7n6 = builder.int_latlng_snap_point(
            il6 * 10 + 1, ig6 * 10 + 1, 7
        )
        jl, jg = builder.int_latlng_snap(p7n6, 6)
        q = builder.int_latlng_snap_point(jl, jg, 6)
        assert not np.array_equal(q, p7n6)
