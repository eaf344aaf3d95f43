"""Polygon boolean operations: an S2BooleanOperation subset
(s2boolean_operation.h:16-75, s2polygon.cc InitToIntersection/Union/
Difference) for NON-DEGENERATE polygon pairs.

Algorithm: the classic overlay walk, spherical edition —

1. find every transversal crossing between an A edge and a B edge
   (predicates.edges_cross_batch) and its intersection point
   (S2::GetIntersection simple path: the cross product of the two edge
   normals, sign-picked into both arcs);
2. split each edge at its crossings (ordered along the arc);
3. classify every sub-edge by its midpoint's containment in the OTHER
   polygon (odd-even semantics, matching the Polygon class);
4. select sub-edges per operation:
     intersection : A-edges inside B        + B-edges inside A
     union        : A-edges outside B       + B-edges outside A
     difference   : A-edges outside B       + B-edges inside A, REVERSED
5. chain selected directed sub-edges into closed loops (at a transversal
   crossing exactly one selected edge leaves each selected arrival, so
   the walk is deterministic); loops that never cross chain back into
   themselves, which also handles the disjoint / fully-nested cases.

Result loops are normalized to their "small" orientation (area <= 2pi)
so the Polygon class's XOR containment gives standard odd-even parity,
and loop nesting depth (S2ShapeNestingQuery, s2shape_nesting_query.h)
signs the area sum.

Out of scope (documented, reference needs S2Builder for these): shared
vertices/edges between A and B, self-intersecting inputs, snapping of
near-degenerate crossings.
"""

from __future__ import annotations

import numpy as np

from . import measures, predicates
from .regions import Loop, Polygon


def edge_intersection(a0, a1, b0, b1) -> np.ndarray:
    """Intersection point of two crossing geodesic segments
    (S2::GetIntersection's stable path, s2edge_crossings.cc:520+)."""
    na = np.cross(a0 - a1, a0 + a1)  # robust cross product main path
    nb = np.cross(b0 - b1, b0 + b1)
    x = np.cross(na, nb)
    n = np.linalg.norm(x)
    if n == 0.0:
        raise ValueError("edges are on the same great circle (degenerate)")
    x = x / n
    # sign-pick into both arcs: x must lie on the hemisphere of both
    # arc midpoints
    if np.dot(x, (a0 + a1) + (b0 + b1)) < 0:
        x = -x
    return x


def _loops_edges(loops: list[np.ndarray], tag: int):
    """Flat directed edge list [(tag, loop_i, edge_i, v0, v1)]."""
    out = []
    for li, v in enumerate(loops):
        n = v.shape[0]
        for ei in range(n):
            out.append((tag, li, ei, v[ei], v[(ei + 1) % n]))
    return out


def _split_points(edges_a, edges_b):
    """crossings[(side, loop, edge)] -> list of intersection points."""
    if not edges_a or not edges_b:
        return {}
    A0 = np.stack([e[3] for e in edges_a])
    A1 = np.stack([e[4] for e in edges_a])
    B0 = np.stack([e[3] for e in edges_b])
    B1 = np.stack([e[4] for e in edges_b])
    na, nb = len(edges_a), len(edges_b)
    ii, jj = np.meshgrid(np.arange(na), np.arange(nb), indexing="ij")
    ii, jj = ii.ravel(), jj.ravel()
    hit = predicates.edges_cross_batch(A0[ii], A1[ii], B0[jj], B1[jj], robust=True)
    splits: dict[tuple, list[np.ndarray]] = {}
    for i, j in zip(ii[hit], jj[hit]):
        ea, eb = edges_a[i], edges_b[j]
        x = edge_intersection(ea[3], ea[4], eb[3], eb[4])
        splits.setdefault(ea[:3], []).append(x)
        splits.setdefault(eb[:3], []).append(x)
    return splits


def _sub_edges(edges, splits):
    """Split each directed edge at its crossing points, ordered along the
    arc (by angle from the start vertex — monotone for arcs < pi)."""
    out = []
    for e in edges:
        key = e[:3]
        v0, v1 = e[3], e[4]
        pts = splits.get(key)
        if not pts:
            out.append((key, v0, v1))
            continue
        pts = sorted(pts, key=lambda p: -float(np.dot(p, v0)))
        chain = [v0] + pts + [v1]
        for s in range(len(chain) - 1):
            out.append((key, chain[s], chain[s + 1]))
    return out


def _select(sub, other: Polygon, keep_inside: bool, reverse: bool):
    """Filter sub-edges by midpoint containment; optionally reverse."""
    if not sub:
        return []
    mids = np.stack([s[1] + s[2] for s in sub])
    mids = mids / np.linalg.norm(mids, axis=1)[:, None]
    inside = other.contains_points(mids)
    kept = []
    for s, ins in zip(sub, inside):
        if bool(ins) == keep_inside:
            kept.append((s[2], s[1]) if reverse else (s[1], s[2]))
    return kept


def _chain(edges) -> list[np.ndarray]:
    """Assemble directed edges into closed loops (exact float-key match:
    every shared endpoint is the same computed double triple)."""
    start: dict[bytes, list] = {}
    for v0, v1 in edges:
        start.setdefault(v0.tobytes(), []).append((v0, v1))
    loops = []
    used = set()
    for v0, v1 in edges:
        k = (v0.tobytes(), v1.tobytes())
        if k in used:
            continue
        verts = [v0]
        cur = (v0, v1)
        while True:
            used.add((cur[0].tobytes(), cur[1].tobytes()))
            nxt_key = cur[1].tobytes()
            if nxt_key == verts[0].tobytes():
                break
            verts.append(cur[1])
            cands = [
                e
                for e in start.get(nxt_key, [])
                if (e[0].tobytes(), e[1].tobytes()) not in used
            ]
            if not cands:
                raise ValueError(
                    "open chain: degenerate input (shared vertex/edge?)"
                )
            cur = cands[0]
        if len(verts) >= 3:
            loops.append(np.stack(verts))
    return loops


def _normalize_small(loops: list[np.ndarray]) -> list[np.ndarray]:
    """Orient every loop to enclose the SMALL side (area <= 2pi) so XOR
    parity over the loop set is standard odd-even."""
    out = []
    for v in loops:
        if measures.loop_area(v) > 2.0 * np.pi:
            v = v[::-1].copy()
        out.append(v)
    return out


def _orient_interior_left(loops: list[np.ndarray]) -> list[np.ndarray]:
    """Orient each loop so the POLYGON interior is on its left (shells
    CCW, odd-depth holes CW) — the invariant the chain walk requires.
    Input loops may arrive in any orientation (odd-even containment does
    not care); normalize to small first, then reverse odd depths."""
    small = _normalize_small(loops)
    depths = nesting_depths(small)
    return [v[::-1].copy() if d % 2 == 1 else v for v, d in zip(small, depths)]


def overlay(
    a_loops: list[np.ndarray], b_loops: list[np.ndarray], op: str
) -> list[np.ndarray]:
    """Boolean overlay of two odd-even polygons; returns result loops
    (small-oriented).  op in {'intersection', 'union', 'difference'}."""
    # two views of each input: SMALL-oriented loops for odd-even
    # containment (the Polygon class's convention), interior-on-LEFT
    # loops (holes reversed) for the directed edge walk
    a_small = _normalize_small(a_loops)
    b_small = _normalize_small(b_loops)
    pa = Polygon([Loop(v) for v in a_small])
    pb = Polygon([Loop(v) for v in b_small])
    ea = _loops_edges(_orient_interior_left(a_loops), 0)
    eb = _loops_edges(_orient_interior_left(b_loops), 1)
    splits = _split_points(ea, eb)
    sub_a = _sub_edges(ea, splits)
    sub_b = _sub_edges(eb, splits)
    if op == "intersection":
        kept = _select(sub_a, pb, True, False) + _select(sub_b, pa, True, False)
    elif op == "union":
        kept = _select(sub_a, pb, False, False) + _select(sub_b, pa, False, False)
    elif op == "difference":
        kept = _select(sub_a, pb, False, False) + _select(sub_b, pa, True, True)
    else:
        raise ValueError(f"unknown op {op!r}")
    return _normalize_small(_chain(kept))


def nesting_depths(loops: list[np.ndarray]) -> list[int]:
    """S2ShapeNestingQuery: depth of each loop = number of OTHER loops
    containing it (loops must be non-crossing; containment is tested at
    a representative vertex).  Even depth = shell, odd = hole."""
    lps = [Loop(v) for v in loops]
    depths = []
    for i, v in enumerate(loops):
        d = 0
        for j, lp in enumerate(lps):
            if j != i and bool(lp.contains_point(v[0])):
                d += 1
        depths.append(d)
    return depths


def polygon_area(loops: list[np.ndarray]) -> float:
    """Area of an odd-even polygon: alternating sum by nesting depth."""
    if not loops:
        return 0.0
    depths = nesting_depths(loops)
    area = 0.0
    for v, d in zip(loops, depths):
        area += measures.loop_area(v) * (1.0 if d % 2 == 0 else -1.0)
    return area


def polygon_intersection(a, b):
    return overlay(a, b, "intersection")


def polygon_union(a, b):
    return overlay(a, b, "union")


def polygon_difference(a, b):
    return overlay(a, b, "difference")
