"""Measures + edge-distance kernel tests, replaying the reference's
property-test style: closed-form truths for caps/hemispheres, metamorphic
checks, and brute-force cross-validation."""

import math

import numpy as np
import pytest

from s2geometry_spark.kernels import cellid, cellunion, measures
from s2geometry_spark.kernels.regions import Loop


def regular(lat, lng, r, n):
    return Loop.make_regular(lat, lng, r, n).vertices


def test_loop_area_matches_cap_area():
    # interior area of a radius-r cap is 2*pi*(1 - cos r); a regular
    # n-gon inscribed in the cap converges to it from below
    for r in (0.1, 0.5, 1.2):
        cap_area = 2 * math.pi * (1 - math.cos(r))
        a256 = measures.loop_area(regular(37.7, -122.4, r, 256))
        assert a256 == pytest.approx(cap_area, rel=2e-3)
        a32 = measures.loop_area(regular(37.7, -122.4, r, 32))
        assert a32 < a256 < cap_area  # monotone convergence from below


def test_loop_area_hemisphere_and_orientation():
    # great-circle "cap" of radius pi/2 = hemisphere = 2*pi
    a = measures.loop_area(regular(0.0, 0.0, math.pi / 2, 512))
    assert a == pytest.approx(2 * math.pi, rel=1e-3)
    # reversing orientation gives the complementary area
    v = regular(10.0, 20.0, 0.4, 64)
    a_fwd = measures.loop_area(v)
    a_rev = measures.loop_area(v[::-1])
    assert a_fwd + a_rev == pytest.approx(4 * math.pi, rel=1e-12)


def test_loop_perimeter():
    # n-gon perimeter -> circumference of the small circle 2*pi*sin(r)
    r = 0.3
    p = measures.loop_perimeter(regular(45.0, 7.0, r, 512))
    assert p == pytest.approx(2 * math.pi * math.sin(r), rel=1e-3)


def test_loop_centroid_direction_and_magnitude():
    # centroid integral over a polar cap of radius r = z_hat * pi*sin^2(r)
    r = 0.8
    c = measures.loop_centroid(regular(90.0, 0.0, r, 512))
    assert np.linalg.norm(c[:2]) < 1e-3
    assert c[2] == pytest.approx(math.pi * math.sin(r) ** 2, rel=5e-3)


def test_cell_average_area_sums():
    # level-k average area * 6*4^k == sphere area
    for lvl in (0, 5, 12, 30):
        assert measures.cell_average_area(lvl) * 6 * 4**lvl == pytest.approx(
            4 * math.pi
        )
    # union average-based area of one face cell = 1/6 sphere
    face = cellid.from_face(np.array([2]))
    assert measures.cell_union_average_area(face) == pytest.approx(4 * math.pi / 6)


# ---------- edge distances ----------


def _pt(lat, lng):
    la, ln = math.radians(lat), math.radians(lng)
    return np.array([math.cos(la) * math.cos(ln), math.cos(la) * math.sin(ln), math.sin(la)])


def test_distance_to_edge_brute_force():
    rng = np.random.default_rng(7)
    a, b = _pt(10, 20), _pt(15, 60)
    # dense sampling along the edge is the brute-force oracle
    ts = np.linspace(0, 1, 20001)
    samples = measures.interpolate(a, b, ts)
    for _ in range(50):
        v = rng.normal(size=3)
        x = v / np.linalg.norm(v)
        d = float(measures.distance_to_edge(x[None, :], a, b)[0])
        brute = float(np.arccos(np.clip(samples @ x, -1, 1)).min())
        assert d == pytest.approx(brute, abs=1e-4)


def test_project_endpoint_cases():
    a, b = _pt(0, 0), _pt(0, 10)
    # point "behind" a projects to a; beyond b projects to b
    behind = _pt(0, -20)
    beyond = _pt(0, 30)
    assert np.allclose(measures.project_to_edge(behind[None], a, b)[0], a)
    assert np.allclose(measures.project_to_edge(beyond[None], a, b)[0], b)
    mid = _pt(5, 5)
    p = measures.project_to_edge(mid[None], a, b)[0]
    assert abs(p[2]) < 1e-9  # on the equator arc


def test_interpolate_endpoints_and_midpoint():
    a, b = _pt(0, 0), _pt(0, 90)
    assert np.allclose(measures.interpolate(a, b, 0.0)[0], a)
    assert np.allclose(measures.interpolate(a, b, 1.0)[0], b)
    assert np.allclose(measures.interpolate(a, b, 0.5)[0], _pt(0, 45), atol=1e-12)


def test_interpolate_antipodal_no_nan():
    """Near-antipodal endpoints: sin(ab) underflows; the result must stay a
    finite unit vector with correct endpoint behaviour (any great circle
    through `a` is acceptable, per the reference's robust ortho)."""
    a = _pt(0, 0)
    b = -a  # exactly antipodal
    for t in (0.0, 0.25, 0.5, 1.0):
        p = measures.interpolate(a, b, t)[0]
        assert np.all(np.isfinite(p))
        assert np.linalg.norm(p) == pytest.approx(1.0, abs=1e-12)
    assert np.allclose(measures.interpolate(a, b, 0.0)[0], a)
    assert np.allclose(measures.interpolate(a, b, 1.0)[0], b, atol=1e-12)
    # midpoint is 90 degrees from both endpoints
    mid = measures.interpolate(a, b, 0.5)[0]
    assert abs(np.dot(mid, a)) < 1e-12


def test_polyline_ops():
    v = np.stack([_pt(0, 0), _pt(0, 10), _pt(10, 10)])
    L = measures.polyline_length(v)
    assert L == pytest.approx(math.radians(10) * 2, rel=1e-6)
    assert np.allclose(measures.polyline_interpolate(v, 0.5), _pt(0, 10))
    p, i = measures.polyline_project(_pt(-3, 5), v)
    assert i == 0 and abs(p[2]) < 1e-9


# ---------- new cellid ops ----------


def test_advance_matches_next_prev():
    ids = cellid.parent(
        cellid.from_latlng_degrees(np.array([1.0, 45.0]), np.array([2.0, -120.0])), 10
    )
    np.testing.assert_array_equal(cellid.advance(ids, 1), cellid.next_cell(ids))
    np.testing.assert_array_equal(cellid.advance(ids, -1), cellid.prev_cell(ids))
    np.testing.assert_array_equal(
        cellid.advance(cellid.advance(ids, 7), -7), ids
    )


def test_common_ancestor_level():
    leaf = cellid.from_latlng_degrees(np.array([47.36]), np.array([8.55]))
    p5 = cellid.parent(leaf, 5)
    p12 = cellid.parent(leaf, 12)
    assert cellid.common_ancestor_level(leaf, p12)[0] == 12
    assert cellid.common_ancestor_level(p12, p5)[0] == 5
    assert cellid.common_ancestor_level(leaf, leaf)[0] == 30
    # different faces -> -1
    f0 = cellid.from_face(np.array([0]))
    f3 = cellid.from_face(np.array([3]))
    assert cellid.common_ancestor_level(f0, f3)[0] == -1


def test_maximum_tile_tiles_a_range():
    """Greedy maximum_tile must tile [range_min(A), range_max(B)] exactly
    with valid, non-overlapping, in-range cells (the reference's use)."""
    a = cellid.parent(cellid.from_latlng_degrees(np.array([10.0]), np.array([20.0])), 8)
    start = int(cellid.range_min(a)[0])  # leaf id (odd), reference-style
    limit_cell = cellid.next_cell(cellid.next_cell(a))
    limit = int(cellid.range_min(limit_cell)[0])
    tiles = []
    pos = start
    while pos < limit:
        t = int(
            cellid.maximum_tile(
                np.array([pos], np.uint64), np.array([limit], np.uint64)
            )[0]
        )
        tiles.append(t)
        ta = np.array([t], np.uint64)
        assert cellid.is_valid(ta)[0]
        assert int(cellid.range_min(ta)[0]) == pos  # tile starts exactly here
        assert int(cellid.range_max(ta)[0]) < limit  # never overflows
        pos = int(cellid.range_max(ta)[0]) + 2  # next leaf position
    assert pos == limit  # leaf coverage is exact and contiguous
    assert 1 <= len(tiles) <= 8