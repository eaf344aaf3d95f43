"""FindPolygonDegeneracies (s2builderutil_find_polygon_degeneracies.cc).

A polygon degeneracy is a degenerate edge (vertex to itself) or a
sibling edge pair; each is classified as a SHELL (outside the polygon's
non-degenerate boundary) or a HOLE (inside).  This is the faithful
single-graph algorithm (reference .cc:85-366):

1. mark degenerate edges / sibling pairs; mark vertices incident to an
   unbalanced (sibling-less) edge (.cc:185-214);
2. build connected components from each unvisited degeneracy root,
   propagating inside/outside parity across edges via CrossingParity —
   the OrderedCCW fan count around the shared vertex (.cc:221-284);
3. a component containing an unbalanced vertex resolves its root sign
   with S2ContainsVertexQuery (.cc:296-306); otherwise root signs come
   from a known vertex by counting EdgeOrVertexCrossings of the geodesic
   (known -> root) against all non-degenerate edges (.cc:308-325);
4. merge: absolute is_hole = relative is_hole XOR (root_sign < 0)
   (.cc:352-366).

The distributed form groups one graph per polygon id and runs this
kernel per group (operators/degeneracies.py) — graphs are small, the
polygon count carries the parallelism.
"""

from __future__ import annotations

import numpy as np

from s2geometry_spark.kernels.containsvertex import ContainsVertexQuery
from s2geometry_spark.kernels.predicates import (
    _ortho,
    edge_or_vertex_crossing,
    ordered_ccw,
)

__all__ = ["find_polygon_degeneracies"]


def find_polygon_degeneracies(
    verts: np.ndarray,
    edges: list[tuple[int, int]],
    is_full: bool | None = None,
) -> list[tuple[int, bool]]:
    """``verts``: (n, 3) unit points; ``edges``: directed (v0, v1)
    vertex-id pairs (no duplicate directed edges).  Returns
    [(edge_index, is_hole)] sorted by edge index — one entry per
    degenerate edge and per sibling-pair member, exactly the reference's
    output contract.  ``is_full`` plays the IsFullPolygon predicate role
    for fully degenerate graphs (.cc:121-132: every degeneracy is then
    a hole iff the polygon is full); None keeps the strict fixture
    contract and raises on that case."""
    n_e = len(edges)
    edge_set = set(edges)
    out_edges: dict[int, list[int]] = {}
    in_edges: dict[int, list[int]] = {}
    for e, (a, b) in enumerate(edges):
        out_edges.setdefault(a, []).append(e)
        in_edges.setdefault(b, []).append(e)

    # -- step 1: degeneracies + unbalanced vertices (.cc:185-214)
    is_deg = [False] * n_e
    unbalanced: set[int] = set()
    n_deg = 0
    for e, (a, b) in enumerate(edges):
        if a == b or (b, a) in edge_set:
            is_deg[e] = True
            n_deg += 1
        else:
            unbalanced.add(a)
    if n_deg == 0:
        return []
    if n_deg == n_e:
        if is_full is None:
            raise ValueError(
                "fully degenerate graph: classification needs IsFullPolygon "
                "metadata (reference .cc:124-132); pass is_full or keep a "
                "non-degenerate boundary in the fixture"
            )
        return [(e, bool(is_full)) for e in range(n_e)]

    def pt(v: int) -> tuple:
        return tuple(verts[v])

    def crossing_parity(v0: int, v1: int, include_same: bool) -> bool:
        """.cc:263-284 — crossings of (v0, v1) with edges incident to
        v0, mod 2."""
        crossings = 0
        p0, p1 = pt(v0), pt(v1)
        p0_ref = _ortho(p0)
        for e in out_edges.get(v0, ()):
            w = edges[e][1]
            if w == v1:
                if include_same:
                    crossings += 1
            elif ordered_ccw(p0_ref, pt(w), p1, p0):
                crossings += 1
        for e in in_edges.get(v0, ()):
            w = edges[e][0]
            if w == v1:
                if include_same:
                    crossings += 1
            elif ordered_ccw(p0_ref, pt(w), p1, p0):
                crossings += 1
        return bool(crossings & 1)

    def contains_vertex_sign(v0: int) -> int:
        """.cc:296-306 — semi-open containment of vertex v0."""
        q = ContainsVertexQuery(pt(v0))
        for e in out_edges.get(v0, ()):
            q.add_edge(pt(edges[e][1]), 1)
        for e in in_edges.get(v0, ()):
            q.add_edge(pt(edges[e][0]), -1)
        return q.contains_sign()

    # -- step 2: components (.cc:221-251)
    used: set[int] = set()
    components: list[dict] = []
    known_vertex = -1
    known_sign = 0
    for e in range(n_e):
        if not is_deg[e]:
            continue
        root = edges[e][0]
        if root in used:
            continue
        comp = {"root": root, "sign": 0, "degs": []}
        frontier = [(root, True)]
        used.add(root)
        while frontier:
            v0, v0_same = frontier.pop()
            if comp["sign"] == 0 and v0 in unbalanced:
                s = contains_vertex_sign(v0)
                comp["sign"] = s if v0_same else -s
            for oe in out_edges.get(v0, ()):
                v1 = edges[oe][1]
                same = v0_same ^ crossing_parity(v0, v1, False)
                if is_deg[oe]:
                    comp["degs"].append((oe, same))
                if v1 in used:
                    continue
                same ^= crossing_parity(v1, v0, True)
                frontier.append((v1, same))
                used.add(v1)
        if comp["sign"] == 0:
            pass
        else:
            known_vertex = root
            known_sign = comp["sign"]
        components.append(comp)

    # -- step 3: resolve unknown root signs (.cc:286-325)
    if any(c["sign"] == 0 for c in components):
        if known_sign == 0:
            known_vertex = min(unbalanced)
            known_sign = contains_vertex_sign(known_vertex)
        kp = pt(known_vertex)
        for comp in components:
            if comp["sign"] != 0:
                continue
            inside = known_sign > 0
            rp = pt(comp["root"])
            for e, (a, b) in enumerate(edges):
                if is_deg[e]:
                    continue
                inside ^= edge_or_vertex_crossing(kp, rp, pt(a), pt(b))
            comp["sign"] = 1 if inside else -1

    # -- step 4: merge (.cc:352-366)
    result = []
    for comp in components:
        invert = comp["sign"] < 0
        for e, rel in comp["degs"]:
            result.append((e, bool(rel ^ invert)))
    result.sort()
    return result
