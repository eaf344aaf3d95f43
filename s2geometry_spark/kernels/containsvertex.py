"""S2ContainsVertexQuery (s2contains_vertex_query.h/.cc): does a polygon
contain one of its own vertices?  Used when loops share vertices (the
shared-vertex cases of boolean operations and polygon validation), where
plain point-in-polygon parity is ill-defined.

The polygon's edges incident on the target vertex are summed by
direction per far endpoint (+1 outgoing, -1 incoming — matched sibling
pairs cancel), and the vertex is contained iff the first unmatched edge
clockwise from the fixed reference direction RefDir(target) == Ortho
(target) is OUTGOING.  This convention matches S2::VertexCrossing, which
is what makes it composable with the crossing machinery here
(kernels/predicates.vertex_crossing).
"""

from __future__ import annotations

from .predicates import _ortho, ordered_ccw

__all__ = ["ContainsVertexQuery"]


class ContainsVertexQuery:
    """Mirror of S2ContainsVertexQuery; points are 3-tuples/arrays."""

    def __init__(self, target):
        self.target = tuple(float(c) for c in target)
        self._edges: dict[tuple, int] = {}

    def add_edge(self, v, direction: int) -> None:
        """Edge between target and ``v``: +1 outgoing, -1 incoming,
        0 degenerate (s2contains_vertex_query.h:55)."""
        key = tuple(float(c) for c in v)
        self._edges[key] = self._edges.get(key, 0) + direction

    def duplicate_edges(self) -> bool:
        """True if the same directed edge was added twice
        (s2contains_vertex_query.h:62-70)."""
        return any(abs(s) >= 2 for s in self._edges.values())

    def contains_sign(self) -> int:
        """+1 contained, -1 not contained, 0 if all incident edges were
        matched sibling pairs (s2contains_vertex_query.cc:29-48): find
        the unmatched edge immediately clockwise from RefDir(target);
        contained iff it is outgoing.  Iteration is in sorted-point
        order, matching the reference's btree_map."""
        ref = _ortho(self.target)
        best_point, best_sign = ref, 0
        for v, s in sorted(self._edges.items()):
            if s == 0:
                continue  # matched sibling pair
            if ordered_ccw(ref, best_point, v, self.target):
                best_point, best_sign = v, s
        return best_sign
