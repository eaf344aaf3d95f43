"""GetSnappedWindingDelta — the change in winding number of a reference
vertex caused by S2Builder snapping.

Parity target: s2builderutil_get_snapped_winding_delta.cc:216-405 (the
chain assembly, closed-loop and open-chain cases, connector vertices,
Za/Zb construction) plus the crossing primitives it relies on:
SignedVertexCrossing (s2edge_crossings.cc:393-411) and
S2EdgeCrosser::SignedEdgeOrVertexCrossing (s2edge_crosser.h:401-408,
interior crossing sign == Sign(ABC)).

Contract (mirrors the reference's requirements): the filtered input
edges incident to the reference site form closed loops; the snapped
graph keeps all edges (DegenerateEdges::KEEP, SiblingPairs KEEP/
REQUIRE/CREATE, no simplify_edge_chains).  Input per reference site:
one EdgeSnap per input edge — the input edge endpoints plus the
snapped neighbor vertices (v_in: the predecessor of the site on the
snapped chain of that edge, if the edge ENTERS the site's Voronoi
region; v_out: the successor, if it LEAVES).

This is a per-site bounded kernel: a distributed plan groups candidate
edges by snap site (one hash shuffle) and runs this chain assembly per
group — the same granularity as the reference, which computes it per
layer vertex.
"""

from __future__ import annotations

import numpy as np

from . import predicates
from .measures import interpolate


def signed_vertex_crossing(a, b, c, d) -> int:
    """S2::SignedVertexCrossing (s2edge_crossings.cc:393-411): +1 if
    both edges outgoing / both incoming at the shared vertex, else -1;
    0 when there is no vertex crossing."""
    ta, tb, tc, td = tuple(a), tuple(b), tuple(c), tuple(d)
    if ta == tb or tc == td:
        return 0
    if ta == tc:
        return (
            1
            if (tb == td or predicates.ordered_ccw(predicates._ortho(a), d, b, a))
            else 0
        )
    if tb == td:
        return 1 if predicates.ordered_ccw(predicates._ortho(b), c, a, b) else 0
    if ta == td:
        return (
            -1
            if (tb == tc or predicates.ordered_ccw(predicates._ortho(a), c, b, a))
            else 0
        )
    if tb == tc:
        return -1 if predicates.ordered_ccw(predicates._ortho(b), d, a, b) else 0
    return 0


def signed_edge_or_vertex_crossing(a, b, c, d) -> int:
    """S2EdgeCrosser::SignedEdgeOrVertexCrossing: interior crossing
    contributes Sign(A,B,C); shared-vertex crossings the signed vertex
    convention; else 0."""
    crossing = predicates.crossing_sign(a, b, c, d)
    if crossing < 0:
        return 0
    if crossing > 0:
        return predicates.sign(tuple(a), tuple(b), tuple(c))
    return signed_vertex_crossing(a, b, c, d)


def get_edge_winding_delta(a, b, chain) -> int:
    """Sum of signed crossings of edge AB with the polyline ``chain``
    (.cc:161-172)."""
    delta = 0
    for i in range(len(chain) - 1):
        delta += signed_edge_or_vertex_crossing(a, b, chain[i], chain[i + 1])
    return delta


def _get_connector(b0, b1, b1_snapped):
    """GetConnector (.cc:180-190): substitute vertex for the elided
    middle of a snapped edge chain."""
    b0 = np.asarray(b0, float)
    b1 = np.asarray(b1, float)
    bs = np.asarray(b1_snapped, float)
    if float(bs @ b1) >= 0:
        return b1
    x = np.cross(predicates._robust_cross_prod(b0, b1), bs)
    x = x / np.linalg.norm(x)
    mid = interpolate(b0, b1, 0.5)[0]
    return x if float(x @ mid) >= 0 else -x


class EdgeSnap:
    """One input edge incident to the reference site (.cc:90-100):
    endpoints (v0, v1) as unit vectors; v_in = the snapped predecessor
    vertex if the edge's snapped chain ENTERS the site (else None);
    v_out = the snapped successor if it LEAVES (else None)."""

    __slots__ = ("v0", "v1", "v_in", "v_out")

    def __init__(self, v0, v1, v_in=None, v_out=None):
        self.v0 = np.asarray(v0, float)
        self.v1 = np.asarray(v1, float)
        self.v_in = None if v_in is None else np.asarray(v_in, float)
        self.v_out = None if v_out is None else np.asarray(v_out, float)


def _build_chain(ref_out, vertex_map):
    """BuildChain (.cc:106-158): pop one maximal chain from the
    v0-keyed multimap.  Returns (chain_in, chain_out) as point lists;
    raises ValueError when the filtered edges do not form loops."""
    chain_in: list = []
    chain_out: list = []
    # prefer a chain that starts by ENTERING the Voronoi region
    start_key = None
    for key, snaps in vertex_map.items():
        if any(s.v_in is not None for s in snaps):
            start_key = key
            snap = next(s for s in snaps if s.v_in is not None)
            chain_out.append(snap.v_in)
            break
    if start_key is None:
        start_key = next(iter(vertex_map))
        snap = vertex_map[start_key][0]
    vertex_map[start_key].remove(snap)
    if not vertex_map[start_key]:
        del vertex_map[start_key]

    chain_in.append(snap.v0)
    chain_in.append(snap.v1)
    chain_out.append(ref_out)
    if snap.v_out is not None:
        chain_out.append(snap.v_out)
        return chain_in, chain_out

    while tuple(chain_in[-1]) != tuple(chain_in[0]):
        key = tuple(chain_in[-1])
        snaps = vertex_map.get(key)
        if not snaps:
            raise ValueError(
                "input edges (after filtering) do not form loops"
            )
        snap = snaps.pop(0)
        if not snaps:
            del vertex_map[key]
        chain_in.append(snap.v1)
        if snap.v_out is not None:
            chain_out.append(snap.v_out)
            break
    return chain_in, chain_out


def get_snapped_winding_delta(ref_in, ref_out, snaps) -> int:
    """The winding-number change of the reference vertex due to
    snapping (.cc:216-405).  ``ref_in``: the vertex before snapping;
    ``ref_out``: its snap site; ``snaps``: EdgeSnap per incident input
    edge.  Add the result to the pre-snap winding number to obtain the
    winding number of ``ref_out`` in the snapped graph."""
    ref_in = np.asarray(ref_in, float)
    ref_out = np.asarray(ref_out, float)
    vertex_map: dict = {}
    for s in snaps:
        vertex_map.setdefault(tuple(s.v0), []).append(s)

    winding_delta = 0
    while vertex_map:
        chain_in, chain_out = _build_chain(ref_out, vertex_map)
        if len(chain_out) == 1:
            # closed loop entirely inside the Voronoi region of ref_out:
            # its snapped image is a point, so only the input loop's
            # crossings of Z->R matter (Z = Ortho(R'), 90 deg away)
            assert tuple(chain_in[0]) == tuple(chain_in[-1])
            z = np.asarray(predicates._ortho(ref_out), float)
            winding_delta += 0 - get_edge_winding_delta(z, ref_in, chain_in)
        else:
            # open chain C = (A0, A1, ..., B0, B1) snapping to
            # C' = (A0', R', B1')
            assert len(chain_out) == 3
            za = predicates._robust_cross_prod(chain_in[0], chain_in[1])
            za = za / np.linalg.norm(za)
            zb = predicates._robust_cross_prod(chain_in[-2], chain_in[-1])
            zb = zb / np.linalg.norm(zb)
            if float(za @ ref_out) > 0:
                za = -za
            if float(zb @ ref_out) > 0:
                zb = -zb
            a0_connector = _get_connector(
                chain_in[1], chain_in[0], chain_out[0]
            )
            b1_connector = _get_connector(
                chain_in[-2], chain_in[-1], chain_out[2]
            )
            chain_z = [
                chain_out[0],
                chain_out[1],
                chain_in[1],
                chain_in[0],
                a0_connector,
                chain_out[0],
            ]
            winding_delta += get_edge_winding_delta(za, zb, chain_z)
            chain_diff = list(chain_out)
            chain_diff.append(b1_connector)
            chain_diff.extend(reversed(chain_in))
            chain_diff.append(a0_connector)
            chain_diff.append(chain_out[0])
            winding_delta += get_edge_winding_delta(zb, ref_in, chain_diff)
            winding_delta += get_edge_winding_delta(
                ref_in, ref_out, chain_out
            )
    return winding_delta
