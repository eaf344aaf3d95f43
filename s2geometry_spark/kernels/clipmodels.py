"""Boundary-model-aware polyline x polygon clipping
(S2BooleanOperation PolygonModel / PolylineModel,
s2boolean_operation.h:160-230): the INTERSECTION of a polyline with a
convex polygon under the three polygon boundary models

* ``open``      — the polygon does not contain its boundary: sub-arcs
                  riding along a boundary edge are dropped.
* ``semi_open`` — a boundary edge is contained iff the polygon interior
                  is immediately to its LEFT in the direction of
                  traversal (the loop is CCW / interior-on-left, so a
                  ride in loop order is kept, a reverse ride dropped).
* ``closed``    — the polygon contains its whole boundary: all boundary
                  rides kept, and a polyline vertex touching the
                  boundary at a loop vertex with no adjacent kept
                  sub-arc survives as a DEGENERATE point, gated by the
                  PolylineModel (``open``: interior vertices only,
                  ``semi_open``: all but the last, ``closed``: all —
                  s2boolean_operation.h:196-217).

Degeneracy detection is STRUCTURAL, mirroring what the reference gets
from S2Builder snapping (s2builder.cc): a chain edge lies on the
boundary iff its endpoints are bitwise-equal to adjacent loop vertices
(shared geometry has identical coordinates after snapping).  Everything
else splits at transversal crossings and classifies sub-arc midpoints
— the same recipe as operators/polylines.clip_to_polygon.

The DuckDB oracle (operators/polylines.clip_models_oracle_sql) never
computes an intersection coordinate: because the loop is geodesically
CONVEX and every chain edge subtends < pi, the in/out flags of the
sub-arcs of one edge ALTERNATE, anchored at whichever endpoint is off
the boundary — so per-edge kept counts and run boundaries follow from
(endpoint-in flag, crossing count) alone.  The kernel therefore pins
its crossing test to the oracle's pure-double form (robust=False: the
1e-15 band sign chain), keeping the counts bit-comparable.
"""

from __future__ import annotations

import numpy as np

from . import predicates
from .booleanop import edge_intersection

__all__ = ["POLYGON_MODELS", "POLYLINE_MODELS", "clip_chain_models"]

POLYGON_MODELS = ("open", "semi_open", "closed")
POLYLINE_MODELS = ("open", "semi_open", "closed")


def _vkey(p) -> tuple:
    return (float(p[0]), float(p[1]), float(p[2]))


def _pl_contains_vertex(model: str, k: int, n: int) -> bool:
    """PolylineModel vertex containment (s2boolean_operation.h:196-217):
    open -> neither endpoint, semi_open -> all but the last, closed ->
    every vertex."""
    if model == "open":
        return 0 < k < n - 1
    if model == "semi_open":
        return k < n - 1
    return True


def _edge_flags(
    a0: np.ndarray,
    a1: np.ndarray,
    i0: int | None,
    i1: int | None,
    L: np.ndarray,
    origin_inside: bool,
) -> dict[str, list[int]]:
    """Per-polygon-model kept flags for the sub-arcs of one chain edge.

    i0/i1: loop-vertex index of the endpoint when it coincides bitwise
    with a loop vertex, else None.  L: (n,3) CCW convex loop.
    """
    n = L.shape[0]
    if i0 is not None and i1 is not None:
        if i1 == (i0 + 1) % n:  # boundary ride, loop order (interior left)
            return {"open": [0], "semi_open": [1], "closed": [1]}
        if i0 == (i1 + 1) % n:  # reverse ride (interior right)
            return {"open": [0], "semi_open": [0], "closed": [1]}
        # interior chord of a convex loop: strictly inside except endpoints
        return {"open": [1], "semi_open": [1], "closed": [1]}
    # generic edge: split at transversal crossings with loop edges that
    # do NOT share an exact vertex with this edge (shared-vertex pairs
    # are degenerate for the sign chain; the adjacent edges of a
    # coincident endpoint cannot cross transversally anyway)
    excl: set[int] = set()
    for idx in (i0, i1):
        if idx is not None:
            excl.add(idx)  # loop edge starting at the shared vertex
            excl.add((idx - 1) % n)  # loop edge ending at it
    keep = np.array([e for e in range(n) if e not in excl], dtype=np.int64)
    B0 = L[keep]
    B1 = L[(keep + 1) % n]
    m = B0.shape[0]
    hit = predicates.edges_cross_batch(
        np.broadcast_to(a0, (m, 3)),
        np.broadcast_to(a1, (m, 3)),
        B0,
        B1,
        robust=False,
    )
    xs = [edge_intersection(a0, a1, B0[j], B1[j]) for j in np.flatnonzero(hit)]
    xs.sort(key=lambda p: -float(np.dot(p, a0)))
    chain = [a0] + xs + [a1]
    flags = []
    for s in range(len(chain) - 1):
        mid = chain[s] + chain[s + 1]
        mid = mid / np.linalg.norm(mid)
        inside = bool(
            predicates.loop_contains_points(L, origin_inside, mid[None, :])[0]
        )
        flags.append(1 if inside else 0)
    return {"open": flags, "semi_open": list(flags), "closed": list(flags)}


def clip_chain_models(
    V: np.ndarray, L: np.ndarray, origin_inside: bool
) -> dict[str, dict[str, tuple[int, int, int]]]:
    """Clip chain V against the convex CCW loop L under every
    (PolygonModel, PolylineModel) combination.

    Returns {pg_model: {pl_model: (n_pieces, n_vertices, n_points)}}:
    piece/vertex counts of the clipped sub-polylines (pl-independent)
    plus the count of surviving degenerate points (closed polygon model
    only, gated per polyline model).
    """
    nv = V.shape[0]
    vidx = {_vkey(L[i]): i for i in range(L.shape[0])}
    li = [vidx.get(_vkey(V[k])) for k in range(nv)]
    per_edge: list[dict[str, list[int]]] = [
        _edge_flags(V[k], V[k + 1], li[k], li[k + 1], L, origin_inside)
        for k in range(nv - 1)
    ]
    out: dict[str, dict[str, tuple[int, int, int]]] = {}
    for pg in POLYGON_MODELS:
        seq = [f for e in per_edge for f in e[pg]]
        kept = sum(seq)
        pieces = sum(
            1 for s in range(len(seq)) if seq[s] == 1 and (s == 0 or seq[s - 1] == 0)
        )
        n_vertices = kept + pieces
        out[pg] = {}
        for pl in POLYLINE_MODELS:
            points = 0
            if pg == "closed":
                for k in range(nv):
                    if li[k] is None or not _pl_contains_vertex(pl, k, nv):
                        continue
                    prev_kept = k > 0 and per_edge[k - 1][pg][-1] == 1
                    next_kept = k < nv - 1 and per_edge[k][pg][0] == 1
                    if not prev_kept and not next_kept:
                        points += 1
            out[pg][pl] = (pieces, n_vertices, points)
    return out
