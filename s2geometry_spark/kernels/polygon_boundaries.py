"""BuildPolygonBoundaries (s2shapeutil_build_polygon_boundaries.cc):
group connected components of non-crossing loops into polygons whose
interiors do not intersect — the loop-assembly step between raw loop
soup and multi-loop polygons.

Each component must subdivide the sphere (every point covered exactly
once by the component's loops), except that a single-loop component must
be degenerate.  A fixed "point at infinity" (S2::Origin, the reference's
point near the north pole) induces the nesting hierarchy: loop A
contains component B iff A contains B's representative vertex and A does
not contain the origin.

Loops are (n,3) vertex arrays; faces are returned as lists of
(component_index, loop_index) pairs — children first, then the indexed
loop itself, with the final face holding the depth-0 outer loops, the
same output order the reference produces.
"""

from __future__ import annotations

import numpy as np

from .regions import Loop

__all__ = ["build_polygon_boundaries", "ORIGIN"]

# S2::Origin (s2pointutil.h:110-116): ~66 km from the north pole.
ORIGIN = np.array(
    [-0.0099994664350250197, 0.0025924542609324121, 0.99994664350250195]
)


def _loop_contains(V: np.ndarray, p: np.ndarray) -> bool:
    """ContainsBruteForce semantics; loops with < 3 distinct vertices are
    degenerate (empty interior) and contain nothing."""
    V = np.asarray(V, np.float64)
    if V.shape[0] < 3 or np.unique(V, axis=0).shape[0] < 3:
        return False
    return bool(Loop(V).contains_point(np.asarray(p, np.float64)))


def build_polygon_boundaries(
    components: list[list[np.ndarray]],
) -> list[list[tuple[int, int]]]:
    """Returns one face per indexed (origin-free, multi-loop-component)
    loop — its child outer loops first, itself last — plus a final face
    of all depth-0 outer loops.  Raises if a component has more or fewer
    than one outer loop (not a subdivision)."""
    if not components:
        return []
    indexed: list[tuple[int, int]] = []
    outer: list[tuple[int, int]] = []
    for i, comp in enumerate(components):
        n_outer = 0
        for j, V in enumerate(comp):
            if len(comp) > 1 and not _loop_contains(V, ORIGIN):
                indexed.append((i, j))
            else:
                outer.append((i, j))
                n_outer += 1
        if n_outer != 1:
            raise ValueError(f"component {i} is not a subdivision")
    comp_of_indexed = [ci for ci, _ in indexed]
    # ancestors[i] = indexed loop ids containing component i's outer
    # loop's first vertex; len == the component's nesting depth
    ancestors: list[list[int]] = []
    for ci, cj in outer:
        rep = components[ci][cj][0]
        ancestors.append(
            [
                k
                for k, (ai, aj) in enumerate(indexed)
                if _loop_contains(components[ai][aj], rep)
            ]
        )
    children: dict[int, list[tuple[int, int]]] = {k: [] for k in range(len(indexed))}
    depth0: list[tuple[int, int]] = []
    for idx, ref in enumerate(outer):
        anc = ancestors[idx]
        if not anc:
            depth0.append(ref)
            continue
        parent = -1
        for cand in anc:
            if len(ancestors[comp_of_indexed[cand]]) == len(anc) - 1:
                assert parent == -1, "ambiguous parent: invalid input"
                parent = cand
        assert parent >= 0, "no parent at depth-1: invalid input"
        children[parent].append(ref)
    faces = [children[k] + [indexed[k]] for k in range(len(indexed))]
    faces.append(depth0)
    return faces
