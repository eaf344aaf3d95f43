"""S2WindingOperation::Build — region assembly from arbitrary
(self-intersecting / duplicated / touching) loop multisets.

Ground truth for every case: the pointwise pinned winding kernel on the
RAW loops; the built polygon's odd-even membership must agree at every
sampled point (sampling avoids a small band around the arrangement
edges, matching the generic-position contract)."""

import numpy as np
import pytest

from s2geometry_spark.kernels import booleanop
from s2geometry_spark.kernels.regions import Loop, Polygon
from s2geometry_spark.kernels.winding import (
    WINDING_RULES,
    build_winding_polygon,
    winding_numbers,
)

RNG = np.random.default_rng(20260817)
REF = np.array([0.0, 0.0, -1.0])  # south pole, well away from fixtures


def ll(lat, lng):
    la, lo = np.radians(lat), np.radians(lng)
    return np.array(
        [np.cos(la) * np.cos(lo), np.cos(la) * np.sin(lo), np.sin(la)]
    )


def cap_samples(center_lat, center_lng, spread_deg, n):
    lat = RNG.uniform(center_lat - spread_deg, center_lat + spread_deg, n)
    lng = RNG.uniform(center_lng - spread_deg, center_lng + spread_deg, n)
    return np.stack(
        [
            np.cos(np.radians(lat)) * np.cos(np.radians(lng)),
            np.cos(np.radians(lat)) * np.sin(np.radians(lng)),
            np.sin(np.radians(lat)),
        ],
        axis=1,
    )


def check_region(loops, rule, P, min_margin=1e-7):
    """Built polygon membership == rule(raw winding) at each sample far
    enough from every raw edge plane (boundary-band exclusion)."""
    out = build_winding_polygon(loops, REF, 0, rule)
    w = winding_numbers(loops, REF, 0, P)
    want = WINDING_RULES[rule](w)
    # exclude samples within the band of ANY raw or result edge plane
    keep = np.ones(len(P), dtype=bool)
    for vset in list(loops) + out:
        m = vset.shape[0]
        for i in range(m):
            c, d = vset[i], vset[(i + 1) % m]
            n = np.cross(c, d)
            nn = np.linalg.norm(n)
            if nn == 0:
                continue
            keep &= np.abs(P @ (n / nn)) > min_margin
    got = (
        Polygon([Loop(v) for v in out]).contains_points(P)
        if out
        else np.zeros(len(P), dtype=bool)
    )
    assert np.array_equal(got[keep], want[keep]), (
        rule,
        int(keep.sum()),
        int((got[keep] != want[keep]).sum()),
    )
    return out


def assert_simple(out):
    """Result loops are pairwise non-crossing and self-simple: the
    overlay splitter finds no transversal crossings among them."""
    edges = booleanop._loops_edges(out, 0)
    assert booleanop._split_points(edges, edges) == {}


class TestBuildWindingPolygon:
    def test_bowtie_odd(self):
        bow = np.stack([ll(0, 0), ll(10, 10), ll(0, 10), ll(10, 0)])
        P = cap_samples(5, 5, 8, 4000)
        out = check_region([bow], "odd", P)
        assert len(out) == 2
        assert_simple(out)

    def test_pentagram_rules(self):
        # 5-point star traversed point-to-point: center winding 2,
        # points winding 1 (CCW)
        k = np.arange(5)
        star = np.stack([ll(10 + 8 * np.cos(a), 8 * np.sin(a))
                         for a in 2 * np.pi * (2 * k) / 5])
        P = cap_samples(10, 0, 10, 6000)
        out_odd = check_region([star], "odd", P)
        out_nz = check_region([star], "nonzero", P)
        assert_simple(out_odd)
        assert_simple(out_nz)
        # odd excludes the doubly-wound core: strictly smaller area
        a_odd = booleanop.polygon_area(out_odd)
        a_nz = booleanop.polygon_area(out_nz)
        assert 0 < a_odd < a_nz
        # odd keeps only the five singly-wound tips; nonzero is the
        # whole star outline
        assert len(out_odd) == 5 and len(out_nz) == 1
        assert out_nz[0].shape[0] == 10

    def test_duplicate_loop_cancels_under_odd(self):
        tri = np.stack([ll(0, 0), ll(0, 12), ll(12, 6)])
        assert build_winding_polygon([tri, tri.copy()], REF, 0, "odd") == []
        out = build_winding_polygon([tri, tri.copy()], REF, 0, "nonzero")
        P = cap_samples(4, 6, 10, 3000)
        w = winding_numbers([tri, tri], REF, 0, P)
        got = Polygon([Loop(v) for v in out]).contains_points(P)
        keep = np.ones(len(P), bool)
        for i in range(3):
            n = np.cross(tri[i], tri[(i + 1) % 3])
            keep &= np.abs(P @ (n / np.linalg.norm(n))) > 1e-7
        assert np.array_equal(got[keep], (w != 0)[keep])

    def test_sibling_edge_merge(self):
        # two CCW triangles sharing the edge (0,0)-(10,0): the shared
        # edge is traversed in both directions and must vanish; odd and
        # nonzero both give the single quad
        t1 = np.stack([ll(0, 0), ll(10, 0), ll(10, -8)])
        t2 = np.stack([ll(0, 0), ll(5, 8), ll(10, 0)])
        P = cap_samples(6, 0, 10, 4000)
        for rule in ("odd", "nonzero"):
            out = check_region([t1, t2], rule, P)
            assert len(out) == 1 and out[0].shape[0] == 4
            assert_simple(out)

    def test_t_junction_vertex_on_edge(self):
        # a loop whose third vertex lies exactly on another loop's edge
        # midpoint chord — exercises _add_vertex_splits in self mode
        a0, a1 = ll(0, -10), ll(0, 10)
        mid = a0 + a1
        mid /= np.linalg.norm(mid)
        big = np.stack([a0, a1, ll(15, 0)])
        small = np.stack([mid, ll(-8, 4), ll(-8, -4)])
        P = cap_samples(2, 0, 14, 4000)
        out = check_region([big, small], "odd", P)
        assert_simple(out)

    def test_positive_rule_orientation_sensitivity(self):
        tri = np.stack([ll(0, 0), ll(0, 12), ll(12, 6)])  # CCW: w=+1
        out_pos = build_winding_polygon([tri], REF, 0, "positive")
        assert len(out_pos) == 1
        # CW traversal has w=-1 inside: positive region is empty,
        # negative region is the triangle
        assert build_winding_polygon([tri[::-1].copy()], REF, 0, "positive") == []
        assert len(build_winding_polygon([tri[::-1].copy()], REF, 0, "negative")) == 1

    def test_whole_sphere_raises(self):
        tri = np.stack([ll(0, 0), ll(0, 12), ll(12, 6)])
        with pytest.raises(ValueError, match="whole sphere"):
            build_winding_polygon([tri], REF, 1, "nonzero")

    def test_normalized_feeds_overlay(self):
        # normalize a bowtie, then intersect with a plain triangle via
        # the standard overlay — the downstream op accepts the output
        bow = np.stack([ll(0, 0), ll(10, 10), ll(0, 10), ll(10, 0)])
        norm = build_winding_polygon([bow], REF, 0, "odd")
        tri = np.stack([ll(-2, -2), ll(-2, 12), ll(12, 5)])
        inter = booleanop.polygon_intersection(norm, [tri])
        P = cap_samples(5, 5, 9, 3000)
        w = winding_numbers([bow], REF, 0, P)
        in_bow = (w % 2) != 0
        in_tri = Polygon([Loop(tri)]).contains_points(P)
        got = (
            Polygon([Loop(v) for v in inter]).contains_points(P)
            if inter
            else np.zeros(len(P), bool)
        )
        keep = np.ones(len(P), bool)
        for vset in [bow, tri] + inter:
            m = vset.shape[0]
            for i in range(m):
                n = np.cross(vset[i], vset[(i + 1) % m])
                nn = np.linalg.norm(n)
                if nn:
                    keep &= np.abs(P @ (n / nn)) > 1e-7
        assert np.array_equal(got[keep], (in_bow & in_tri)[keep])

    def test_random_self_crossing_sweep(self):
        # seeded sweep: random 6-vertex closed paths in a cap (usually
        # self-crossing); every build must agree with raw parity
        for seed in range(8):
            rng = np.random.default_rng(100 + seed)
            lat = rng.uniform(-6, 16, 6)
            lng = rng.uniform(-6, 16, 6)
            poly = np.stack([ll(a, b) for a, b in zip(lat, lng)])
            P = cap_samples(5, 5, 14, 2500)
            out = check_region([poly], "odd", P)
            assert_simple(out)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
