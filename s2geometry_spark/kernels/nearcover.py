"""S2Polyline::NearlyCovers — "can a car drive along B while staying
within max_error of a car driving monotonically along A?"

Reference: s2polyline.cc:696-820 (SearchState stack walk over
(i, j, i_in_progress) states), s2edge_distances.cc:421-505
(IsEdgeBNearEdgeA), tests s2polyline_test.cc:667-765.

The state space is the same as the reference's: a start state (i, 0,
true) for every edge i of A whose closest point to B[0] is within
max_error (excluding duplicate end-vertex starts), transitions
(i,j,p) -> (i+1,j,false) / (i,j+1,true) gated by IsEdgeBNearEdgeA, and
acceptance when any reachable state has j == m-1.  Instead of the
reference's explicit stack + visited set we compute ALL transition
gates vectorized up front (2*(n-1)*(m-1) IsEdgeBNearEdgeA rows in one
NumPy pass) and run a boolean reachability fixpoint — same reachable
set, no per-state Python.

Angle comparisons are rewritten squared-chord-monotone (the
reference's own S1ChordAngle idiom) so no transcendental ever runs on
either engine, and tiny tolerances stay representable (cos(1e-10 deg)
rounds to exactly 1.0 in doubles; (2*sin(tol/2))^2 does not):

    dist(x, y) <= tol      <=>  chord2(x, y) <= (2*sin(tol/2))^2
    angle(n1, n2) <= tol   <=>  chord2(n1, n2) <= same threshold
    angle >= pi/2          <=>  dot <= 0
    S1Angle(a,b) < S1Angle(a,c)  <=>  chord2(a,b) < chord2(a,c)

chord2_tol = (2*sin(tol/2))^2 is computed ONCE on the driver and
shipped as the same literal to both the kernel and the DuckDB oracle,
so the engine and the oracle compare bit-identical doubles (the
reference's atan2-based S1Angle would diverge across libms — memory:
atan2 never vetted).
Sign predicates use the triage determinant only (fixtures are in
generic position; the reference's exact/symbolic fallback fires only
within ~1e-14 of degeneracy, documented out of contract here).

One degeneracy IS handled explicitly, because the search itself
manufactures it on every input: a transition gate's edge collapses to
a point whenever a projection lands exactly on an edge endpoint
(jb == b1, ib == a1 — routine for clamped projections, and guaranteed
when chains share vertices).  The reference survives via
RobustCrossProd(a, a) -> Ortho(a) (s2edge_crossings.cc:147-166); we
instead use the exact point-distance limit: distance along a geodesic
to a fixed point is quasi-convex, so a degenerate edge is near iff
both opposite-edge endpoints are within tol — which is precisely the
existing `far` check (projection onto a degenerate edge returns its
point).  Implemented as an explicit short-circuit in BOTH engines, so
no NaN/NULL ever reaches a verdict.
"""

from __future__ import annotations

import numpy as np

from .builder import simplify_chain
from .measures import project_to_edge_pinned

__all__ = ["is_edge_b_near_edge_a", "nearly_covers"]


def _unit_cross(P0: np.ndarray, P1: np.ndarray):
    """Pinned RobustCrossProd(P0, P1).Normalize() main path:
    normalize((P0 - P1) x (P0 + P1)) — same direction as P0 x P1
    (s2edge_crossings.cc RobustCrossProd; exact fallback not needed in
    generic position).  Component arithmetic is written out so the SQL
    twin replays the identical add/mul order."""
    ux, uy, uz = P0[:, 0] - P1[:, 0], P0[:, 1] - P1[:, 1], P0[:, 2] - P1[:, 2]
    vx, vy, vz = P0[:, 0] + P1[:, 0], P0[:, 1] + P1[:, 1], P0[:, 2] + P1[:, 2]
    rx = uy * vz - uz * vy
    ry = uz * vx - ux * vz
    rz = ux * vy - uy * vx
    rn = np.sqrt((rx * rx + ry * ry) + rz * rz)
    return rx / rn, ry / rn, rz / rn


def _chord2(P, Q):
    """Pinned squared chord length ||P - Q||^2, rows."""
    dx, dy, dz = P[:, 0] - Q[:, 0], P[:, 1] - Q[:, 1], P[:, 2] - Q[:, 2]
    return (dx * dx + dy * dy) + dz * dz


def is_edge_b_near_edge_a(
    A0: np.ndarray, A1: np.ndarray, B0: np.ndarray, B1: np.ndarray,
    ch2_tol: float,
) -> np.ndarray:
    """Row-wise S2::IsEdgeBNearEdgeA(a0, a1, b0, b1, tol): is every
    point of edge B within tol of edge A?  All inputs (k, 3) unit;
    ch2_tol = (2*sin(tol/2))^2, 0 < tol < pi/2.  Returns (k,) bool."""
    A0 = np.atleast_2d(np.asarray(A0, np.float64))
    A1 = np.atleast_2d(np.asarray(A1, np.float64))
    B0 = np.atleast_2d(np.asarray(B0, np.float64))
    B1 = np.atleast_2d(np.asarray(B1, np.float64))
    # exactly-parallel great circles make the furthest-point cross
    # product 0/0 = NaN; that branch is unreachable then (near_plane or
    # the hemisphere test already decided), so just silence it
    with np.errstate(divide="ignore", invalid="ignore"):
        return _is_near_impl(A0, A1, B0, B1, ch2_tol)


def _is_near_impl(A0, A1, B0, B1, ch2_tol: float) -> np.ndarray:
    aox, aoy, aoz = _unit_cross(A0, A1)
    P0 = project_to_edge_pinned(B0, A0, A1)
    P1 = project_to_edge_pinned(B1, A0, A1)
    # orient a_ortho with (a_nearest_b0 x a_nearest_b1)
    cx = P0[:, 1] * P1[:, 2] - P0[:, 2] * P1[:, 1]
    cy = P0[:, 2] * P1[:, 0] - P0[:, 0] * P1[:, 2]
    cz = P0[:, 0] * P1[:, 1] - P0[:, 1] * P1[:, 0]
    det = (aox * cx + aoy * cy) + aoz * cz
    s = np.where(det < 0, -1.0, 1.0)
    fox, foy, foz = s * aox, s * aoy, s * aoz
    # endpoint distances: dist(b, proj) > tol  <=>  chord2 > ch2_tol
    far = (_chord2(B0, P0) > ch2_tol) | (_chord2(B1, P1) > ch2_tol)
    # degenerate (zero-length) edge on either side: the point-distance
    # limit — near iff NOT far (see module docstring)
    deg = (
        (A0[:, 0] == A1[:, 0]) & (A0[:, 1] == A1[:, 1]) & (A0[:, 2] == A1[:, 2])
    ) | (
        (B0[:, 0] == B1[:, 0]) & (B0[:, 1] == B1[:, 1]) & (B0[:, 2] == B1[:, 2])
    )
    box, boy, boz = _unit_cross(B0, B1)
    BO = np.stack([box, boy, boz], axis=1)
    FO = np.stack([fox, foy, foz], axis=1)
    cosp = (fox * box + foy * boy) + foz * boz
    near_plane = _chord2(FO, BO) <= ch2_tol
    # planar_angle >= pi/2: B is near A iff b0 and b1 are closest to
    # the same endpoint of A (chord2 comparisons, S1Angle-monotone)
    ca0 = _chord2(B0, A0)
    ca1 = _chord2(B0, A1)
    cb0 = _chord2(B1, A0)
    cb1 = _chord2(B1, A1)
    hemi = (ca0 < ca1) == (cb0 < cb1)
    # furthest point of circ(B) from circ(A): normalize(b_ortho x
    # RobustCrossProd(a_ortho, b_ortho)); B is NOT near A if it (or its
    # antipode) lies on the arc B, tested with triage Sign.
    gx, gy, gz = _unit_cross(FO, BO)
    wx = boy * gz - boz * gy
    wy = boz * gx - box * gz
    wz = box * gy - boy * gx
    wn = np.sqrt((wx * wx + wy * wy) + wz * wz)
    fx, fy, fz = wx / wn, wy / wn, wz / wn
    dA = (
        box * (B0[:, 1] * fz - B0[:, 2] * fy)
        + boy * (B0[:, 2] * fx - B0[:, 0] * fz)
    ) + boz * (B0[:, 0] * fy - B0[:, 1] * fx)
    dB = (
        fx * (B1[:, 1] * boz - B1[:, 2] * boy)
        + fy * (B1[:, 2] * box - B1[:, 0] * boz)
    ) + fz * (B1[:, 0] * boy - B1[:, 1] * box)
    # det(b_ortho,b0,-f) = -dA and det(-f,b1,b_ortho) = -dB, so the
    # "furthest_inv on B" branch is (dA < 0) & (dB < 0)
    on_b = ((dA > 0) & (dB > 0)) | ((dA < 0) & (dB < 0))
    return np.where(
        deg,
        ~far,
        np.where(
            far, False, np.where(near_plane, True, np.where(cosp <= 0, hemi, ~on_b))
        ),
    )


def nearly_covers(A: np.ndarray, B: np.ndarray, ch2_tol: float) -> bool:
    """True iff polyline A nearly covers polyline B within
    tol = 2*asin(sqrt(ch2_tol)/2).  Adjacent duplicate vertices are
    collapsed first (equivalent to the reference's NextDistinctVertex
    walk)."""
    A = simplify_chain(np.asarray(A, np.float64))
    B = simplify_chain(np.asarray(B, np.float64))
    n, m = A.shape[0], B.shape[0]
    if m == 0:
        return True
    if n < 2:
        return False
    # start states: edge i of A whose closest point to B[0] is within
    # tol; skip starts that project exactly onto the edge's END vertex
    # unless it is the last edge (dedup rule, s2polyline.cc:771-778)
    b0 = np.broadcast_to(B[0], (n - 1, 3))
    P = project_to_edge_pinned(b0, A[:-1], A[1:])
    at_end = np.all(P == A[1:], axis=1)
    is_last = np.arange(n - 1) == n - 2
    starts = (is_last | ~at_end) & (_chord2(b0, P) <= ch2_tol)
    if not starts.any():
        return False
    if m == 1:
        return True
    # transition gates for every (p, i, j), i < n-1, j < m-1
    ii, jj = np.meshgrid(np.arange(n - 1), np.arange(m - 1), indexing="ij")
    ii, jj = ii.ravel(), jj.ravel()
    a0, a1 = A[ii], A[ii + 1]
    bj, bj1 = B[jj], B[jj + 1]
    # p = true: the covered-car sits at vertex B[j]; project it onto A's
    # edge.  p = false: the this-car sits at vertex A[i]; project onto B's
    # edge.  (s2polyline.cc:799-808)
    ib_t = project_to_edge_pinned(bj, a0, a1)
    jb_f = project_to_edge_pinned(a0, bj, bj1)
    go = {}
    for p, ib, jb in ((True, ib_t, bj), (False, a0, jb_f)):
        go[p, "i"] = is_edge_b_near_edge_a(jb, bj1, ib, a1, ch2_tol).reshape(
            n - 1, m - 1
        )
        go[p, "j"] = is_edge_b_near_edge_a(ib, a1, jb, bj1, ch2_tol).reshape(
            n - 1, m - 1
        )
    # boolean reachability fixpoint (each transition strictly increases
    # i + j, so n + m rounds suffice)
    R = np.zeros((2, n, m), bool)  # [p] with p index 1 == i_in_progress
    R[1, : n - 1, 0] |= starts
    for _ in range(n + m):
        act0 = R[0, : n - 1, : m - 1]
        act1 = R[1, : n - 1, : m - 1]
        new_i = (act0 & go[False, "i"]) | (act1 & go[True, "i"])
        new_j = (act0 & go[False, "j"]) | (act1 & go[True, "j"])
        before0 = R[0, 1:, : m - 1].copy()
        before1 = R[1, : n - 1, 1:].copy()
        R[0, 1:, : m - 1] |= new_i
        R[1, : n - 1, 1:] |= new_j
        if np.array_equal(before0, R[0, 1:, : m - 1]) and np.array_equal(
            before1, R[1, : n - 1, 1:]
        ):
            break
    return bool(R[:, :, m - 1].any())


# ---------- S2Loop::BoundaryNear / BoundaryApproxEquals ----------


def _vertex_edge_gates(A: np.ndarray, B: np.ndarray, ch2_tol: float) -> np.ndarray:
    """D[v, e] = (distance from vertex A[v] to CLOSED edge e of loop B)
    <= tol, for every vertex x edge pair (chord^2 against the pinned
    point-edge kernel; monotone-equivalent to the reference's
    S2::GetDistance <= max_error)."""
    from .measures import point_edge_chord2

    na, nb = len(A), len(B)
    vv, ee = np.meshgrid(np.arange(na), np.arange(nb), indexing="ij")
    vv, ee = vv.ravel(), ee.ravel()
    d = point_edge_chord2(A[vv], B[ee], B[(ee + 1) % nb])
    return (d <= ch2_tol).reshape(na, nb)


def _match_boundaries(
    ga: np.ndarray, gb: np.ndarray, na: int, nb: int, offset: int
) -> bool:
    """MatchBoundaries (s2loop.cc): reachability of state (na, nb) from
    (0, 0), where i increments iff a(i+1+offset) is near b-edge j and j
    increments iff b(j+1) is near a-edge (i+offset).  The reference
    explores with an explicit stack + done-set; transitions only ever
    increment i or j, so a forward row sweep with a run-fill along j is
    the same reachability, vectorized."""
    idx = np.arange(nb + 1)
    reach = np.zeros(nb + 1, bool)
    reach[0] = True
    for i in range(na + 1):
        if i > 0:
            # from_above[j]: R[i-1, j] & gate_i[i-1, j]
            gate_i = ga[(i + offset) % na, idx % nb]
            reach = prev & gate_i
        # within-row fill: R[i, j] |= R[i, j-1] & gate_j[i, j-1]
        gate_j = gb[(idx[:-1] + 1) % nb, (i + offset) % na]
        seg = np.concatenate(([0], np.cumsum(~gate_j)))
        last_seed = np.maximum.accumulate(np.where(reach, idx, -1))
        seg_at_seed = np.where(last_seed >= 0, seg[np.maximum(last_seed, 0)], -1)
        reach = (last_seed >= 0) & (seg_at_seed == seg)
        prev = reach
    return bool(reach[nb])


def loop_boundary_near(A: np.ndarray, B: np.ndarray, ch2_tol: float) -> bool:
    """S2Loop::BoundaryNear (s2loop.cc BoundaryNear + MatchBoundaries,
    golden cases s2loop_test.cc TEST(S2Loop, BoundaryNear)): the loop
    boundaries stay within tol of each other under some rotation offset,
    allowing local backtracking that defeats greedy matching."""
    A = np.asarray(A, np.float64)
    B = np.asarray(B, np.float64)
    na, nb = len(A), len(B)
    if na == 0 or nb == 0:
        return na == nb
    ga = _vertex_edge_gates(A, B, ch2_tol)  # a-vertex near b-edge
    gb = _vertex_edge_gates(B, A, ch2_tol)  # b-vertex near a-edge
    return any(_match_boundaries(ga, gb, na, nb, off) for off in range(na))


def loop_boundary_approx_equals(
    A: np.ndarray, B: np.ndarray, ch2_tol: float
) -> bool:
    """S2Loop::BoundaryApproxEquals: same vertex count and some rotation
    offset matching every vertex pairwise within tol."""
    A = np.asarray(A, np.float64)
    B = np.asarray(B, np.float64)
    na = len(A)
    if na != len(B):
        return False
    if na == 0:
        return True
    for off in range(na):
        if (_chord2(np.roll(A, -off, axis=0), B) <= ch2_tol).all():
            return True
    return False


def polygon_boundary_near(
    a_loops: list, b_loops: list, ch2_tol: float
) -> bool:
    """S2Polygon::BoundaryNear (s2polygon.cc:1463-1482): same loop count,
    and every A loop has a same-depth B loop with BoundaryNear."""
    from .booleanop import nesting_depths

    if len(a_loops) != len(b_loops):
        return False
    da = nesting_depths(a_loops)
    db = nesting_depths(b_loops)
    for la, depth_a in zip(a_loops, da):
        if not any(
            depth_b == depth_a and loop_boundary_near(lb, la, ch2_tol)
            for lb, depth_b in zip(b_loops, db)
        ):
            return False
    return True
