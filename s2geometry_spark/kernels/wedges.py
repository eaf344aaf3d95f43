"""Wedge relations: the relationship between two angular wedges that
share a middle vertex (s2wedge_relations.h:27-63, s2wedge_relations.cc).

Given an edge chain (x0, x1, x2), the wedge at x1 is the set of rays
from x1->x0 (inclusive) to x1->x2 (exclusive) going clockwise — i.e.
the region to the LEFT of the chain.  Wedge relations are the primitive
the reference uses to compare loop boundaries at shared vertices
(S2Loop::CompareBoundary, boolean-op degeneracy handling), which is why
they live next to the robust predicates they are built on.

All functions require non-empty wedges (x0 != x1 != x2) and accept any
3-sequence of floats (tuple / list / ndarray row).
"""

from __future__ import annotations

from .predicates import ordered_ccw

# WedgeRelation enum values (s2wedge_relations.h:38-44); ints so they can
# ride in Spark columns without a UDT.
WEDGE_EQUALS = 0
WEDGE_PROPERLY_CONTAINS = 1
WEDGE_IS_PROPERLY_CONTAINED = 2
WEDGE_PROPERLY_OVERLAPS = 3
WEDGE_IS_DISJOINT = 4


def wedge_contains(a0, ab1, a2, b0, b2) -> bool:
    """True iff wedge A contains wedge B (s2wedge_relations.cc:26-34):
    the CCW edge order around ab1 must be a2 b2 b0 a0, tested as two
    three-vertex OrderedCCW checks."""
    return ordered_ccw(a2, b2, b0, ab1) and ordered_ccw(b0, a0, a2, ab1)


def wedge_intersects(a0, ab1, a2, b0, b2) -> bool:
    """True iff wedge A intersects wedge B (s2wedge_relations.cc:36-47):
    disjoint iff the CCW order is a0 b2 b0 a2; written as the negation of
    two OrderedCCW tests so duplicate vertices resolve the same way the
    reference resolves them."""
    return not (ordered_ccw(a0, b2, b0, ab1) and ordered_ccw(b0, a2, a0, ab1))


def get_wedge_relation(a0, ab1, a2, b0, b2) -> int:
    """Detailed relation from wedge A to wedge B
    (s2wedge_relations.cc:49-81).  Overlapping-edge cases pick the most
    specific of the satisfiable circular orderings, exactly as the
    reference's branch order does."""
    ta0, ta2, tb0, tb2 = tuple(a0), tuple(a2), tuple(b0), tuple(b2)
    if ta0 == tb0 and ta2 == tb2:
        return WEDGE_EQUALS
    if ordered_ccw(a0, a2, b2, ab1):
        # cases 1, 5, 6 — or 2 when a2 == b2
        if ordered_ccw(b2, b0, a0, ab1):
            return WEDGE_PROPERLY_CONTAINS
        return WEDGE_IS_PROPERLY_CONTAINED if ta2 == tb2 else WEDGE_PROPERLY_OVERLAPS
    # cases 2, 3, 4
    if ordered_ccw(a0, b0, b2, ab1):
        return WEDGE_IS_PROPERLY_CONTAINED
    return WEDGE_IS_DISJOINT if ordered_ccw(a0, b0, a2, ab1) else WEDGE_PROPERLY_OVERLAPS
