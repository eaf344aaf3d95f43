"""Wedge relations vs the reference's own cases
(s2wedge_relations_test.cc TestWedge table) plus consistency properties
against loop-side membership sampling."""

import math

import numpy as np
import pytest

from s2geometry_spark.kernels import wedges
from s2geometry_spark.kernels.predicates import sign


def _n(p):
    v = np.asarray(p, np.float64)
    return v / math.sqrt(float(v @ v))


CASES = [
    # a0, ab1, a2, b0, b2, contains, intersects, relation
    # intersection in one wedge
    ((-1, 0, 10), (0, 0, 1), (1, 2, 10), (0, 1, 10), (1, -2, 10),
     False, True, wedges.WEDGE_PROPERLY_OVERLAPS),
    # intersection in two wedges
    ((-1, -1, 10), (0, 0, 1), (1, -1, 10), (1, 0, 10), (-1, 1, 10),
     False, True, wedges.WEDGE_PROPERLY_OVERLAPS),
    # normal containment
    ((-1, -1, 10), (0, 0, 1), (1, -1, 10), (-1, 0, 10), (1, 0, 10),
     True, True, wedges.WEDGE_PROPERLY_CONTAINS),
    # containment with equality on one side
    ((2, 1, 10), (0, 0, 1), (-1, -1, 10), (2, 1, 10), (1, -5, 10),
     True, True, wedges.WEDGE_PROPERLY_CONTAINS),
    # containment with equality on the other side
    ((2, 1, 10), (0, 0, 1), (-1, -1, 10), (1, -2, 10), (-1, -1, 10),
     True, True, wedges.WEDGE_PROPERLY_CONTAINS),
    # equality on both sides
    ((-2, 3, 10), (0, 0, 1), (4, -5, 10), (-2, 3, 10), (4, -5, 10),
     True, True, wedges.WEDGE_EQUALS),
    # disjoint with equality on one side
    ((-2, 3, 10), (0, 0, 1), (4, -5, 10), (4, -5, 10), (-2, -3, 10),
     False, False, wedges.WEDGE_IS_DISJOINT),
    # disjoint with equality on the other side
    ((-2, 3, 10), (0, 0, 1), (0, 5, 10), (4, -5, 10), (-2, 3, 10),
     False, False, wedges.WEDGE_IS_DISJOINT),
    # disjoint with equality on both sides
    ((-2, 3, 10), (0, 0, 1), (4, -5, 10), (4, -5, 10), (-2, 3, 10),
     False, False, wedges.WEDGE_IS_DISJOINT),
    # B contains A with equality on one side
    ((2, 1, 10), (0, 0, 1), (1, -5, 10), (2, 1, 10), (-1, -1, 10),
     False, True, wedges.WEDGE_IS_PROPERLY_CONTAINED),
    # B contains A with equality on the other side
    ((2, 1, 10), (0, 0, 1), (1, -5, 10), (-2, 1, 10), (1, -5, 10),
     False, True, wedges.WEDGE_IS_PROPERLY_CONTAINED),
]


@pytest.mark.parametrize("a0,ab1,a2,b0,b2,contains,intersects,rel", CASES)
def test_reference_cases(a0, ab1, a2, b0, b2, contains, intersects, rel):
    a0, ab1, a2, b0, b2 = map(_n, (a0, ab1, a2, b0, b2))
    assert wedges.wedge_contains(a0, ab1, a2, b0, b2) == contains
    assert wedges.wedge_intersects(a0, ab1, a2, b0, b2) == intersects
    assert wedges.get_wedge_relation(a0, ab1, a2, b0, b2) == rel


def test_relation_consistency_random():
    """contains/intersects fast paths agree with the detailed relation,
    and the relation matches brute-force ray-membership sampling, on
    seeded random non-degenerate wedges around the north pole."""
    rng = np.random.default_rng(7)
    o = np.array([0.0, 0.0, 1.0])

    def ray(theta):
        # a point slightly off the pole in direction theta
        return _n((0.05 * math.cos(theta), 0.05 * math.sin(theta), 1.0))

    def in_wedge(theta, t0, t2):
        # wedge at x1 = rays from x1->x0 (inclusive) to x1->x2 (exclusive)
        # going CLOCKWISE (s2wedge_relations.h:29-31), i.e. decreasing theta
        span = (t0 - t2) % (2 * math.pi)
        off = (t0 - theta) % (2 * math.pi)
        return off < span if span > 0 else False

    for _ in range(300):
        t = rng.uniform(0, 2 * math.pi, 4)
        a0t, a2t, b0t, b2t = t
        if min(abs((a0t - a2t) % (2 * math.pi)),
               abs((b0t - b2t) % (2 * math.pi))) < 1e-3:
            continue
        a0, a2, b0, b2 = ray(a0t), ray(a2t), ray(b0t), ray(b2t)
        rel = wedges.get_wedge_relation(a0, o, a2, b0, b2)
        c = wedges.wedge_contains(a0, o, a2, b0, b2)
        i = wedges.wedge_intersects(a0, o, a2, b0, b2)
        assert c == (rel in (wedges.WEDGE_EQUALS, wedges.WEDGE_PROPERLY_CONTAINS))
        assert i == (rel != wedges.WEDGE_IS_DISJOINT)
        # brute force: sample rays; wedge at x1 spans CCW from the
        # incoming-edge direction (towards x0) to the outgoing (towards x2)
        thetas = rng.uniform(0, 2 * math.pi, 64)
        in_a = np.array([in_wedge(x, a0t, a2t) for x in thetas])
        in_b = np.array([in_wedge(x, b0t, b2t) for x in thetas])
        if rel == wedges.WEDGE_IS_DISJOINT:
            assert not (in_a & in_b).any()
        elif rel == wedges.WEDGE_PROPERLY_CONTAINS:
            assert not (in_b & ~in_a).any()
        elif rel == wedges.WEDGE_IS_PROPERLY_CONTAINED:
            assert not (in_a & ~in_b).any()


def test_wedge_clockwise_convention():
    """The wedge spans CLOCKWISE from the x0 direction to the x2
    direction: for A = (-135deg, pole, -45deg) — the 270deg wedge missing
    only the bottom notch — a thin wedge at the top is contained and a
    thin wedge inside the notch is disjoint."""
    o = np.array([0.0, 0.0, 1.0])

    def ray(deg):
        t = math.radians(deg)
        return _n((0.05 * math.cos(t), 0.05 * math.sin(t), 1.0))

    a0, a2 = ray(-135), ray(-45)
    assert wedges.wedge_contains(a0, o, a2, ray(100), ray(80))
    rel = wedges.get_wedge_relation(a0, o, a2, ray(-85), ray(-95))
    assert rel == wedges.WEDGE_IS_DISJOINT
    # interior ray of a CCW turn lies on the Sign-positive side of the
    # incoming edge and the Sign-negative side of the outgoing edge
    top = ray(90)
    assert sign(o, a0, top) != sign(o, a2, top)
