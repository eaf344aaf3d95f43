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


# ---------- vectorized batch form ----------
#
# The class above is per-shape Python (fine for kernels called on a few
# hundred shapes); reference_points runs it on EVERY shape of the
# corpus, so the fold is also provided in batch form: one (rows)
# vectorized pass per fold round, with the same triage -> exact-scalar
# escalation the other vectorized predicates use.  Bit-identical to the
# scalar class by construction: same sorted iteration order, the same
# _ortho reference direction, and the identical sign chain (triage
# determinant first, expensive_sign for in-band rows).

import numpy as np

from .predicates import MAX_DET_ERROR, expensive_sign


def _sign_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    det = np.einsum("ij,ij->i", np.cross(a, b), c)
    out = np.where(det > MAX_DET_ERROR, 1, np.where(det < -MAX_DET_ERROR, -1, 0))
    for i in np.nonzero(out == 0)[0]:
        out[i] = expensive_sign(tuple(a[i]), tuple(b[i]), tuple(c[i]))
    return out


def _ordered_ccw_vec(
    a: np.ndarray, b: np.ndarray, c: np.ndarray, o: np.ndarray
) -> np.ndarray:
    total = (_sign_vec(b, o, a) >= 0).astype(np.int64)
    total += _sign_vec(c, o, b) >= 0
    total += _sign_vec(a, o, c) > 0
    return total >= 2


def _ortho_vec(t: np.ndarray) -> np.ndarray:
    ax = np.abs(t)
    k0 = np.where(
        ax[:, 0] > ax[:, 1],
        np.where(ax[:, 0] > ax[:, 2], 0, 2),
        np.where(ax[:, 1] > ax[:, 2], 1, 2),
    )
    k = (k0 - 1) % 3
    temp = np.tile(np.array([0.012, 0.0053, 0.00457]), (len(t), 1))
    temp[np.arange(len(t)), k] = 1.0
    v = np.cross(t, temp)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def contains_signs_batch(
    gid: np.ndarray,
    target: np.ndarray,
    far: np.ndarray,
    sgn: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Batch ContainsVertexQuery: one row per (shape, incident edge).

    ``gid`` (n,) int64 shape ids; ``target`` (n, 3) the queried vertex
    (constant within a gid); ``far`` (n, 3) the edge's other endpoint;
    ``sgn`` (n,) +1 outgoing / -1 incoming / 0 degenerate.  Returns
    (unique_gids, contains_sign) in first-occurrence-sorted gid order.
    """
    order = np.lexsort((far[:, 2], far[:, 1], far[:, 0], gid))
    gid, target, far, sgn = gid[order], target[order], far[order], sgn[order]
    # collapse duplicate far endpoints (matched sibling pairs cancel)
    change = np.empty(len(gid), bool)
    change[0] = True
    change[1:] = (gid[1:] != gid[:-1]) | np.any(far[1:] != far[:-1], axis=1)
    starts = np.nonzero(change)[0]
    s = np.add.reduceat(sgn, starts)
    g, t, w = gid[starts], target[starts], far[starts]

    ug, ustart = np.unique(g, return_index=True)
    n = len(ug)
    tgt = t[ustart]
    ref = _ortho_vec(tgt)
    best = ref.copy()
    bsign = np.zeros(n, np.int64)

    keep = s != 0
    g_k, w_k, s_k = g[keep], w[keep], s[keep]
    shape_ix = np.searchsorted(ug, g_k)
    # rank of each kept edge within its shape (rows are sorted by gid
    # then far endpoint, matching the scalar sorted-dict iteration)
    first_of = np.empty(len(g_k), np.int64)
    if len(g_k):
        newg = np.empty(len(g_k), bool)
        newg[0] = True
        newg[1:] = g_k[1:] != g_k[:-1]
        first_ix = np.nonzero(newg)[0]
        first_of = first_ix[np.cumsum(newg) - 1]
    rank = np.arange(len(g_k)) - first_of
    for k in range(int(rank.max()) + 1 if len(rank) else 0):
        m = rank == k
        si = shape_ix[m]
        upd = _ordered_ccw_vec(ref[si], best[si], w_k[m], tgt[si])
        tgt_rows = si[upd]
        best[tgt_rows] = w_k[m][upd]
        bsign[tgt_rows] = s_k[m][upd]
    return ug, bsign
