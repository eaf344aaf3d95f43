"""Robust spherical predicates: orientation sign, edge crossings, and the
vectorized point-in-loop crossing-parity kernel.

Faithful re-implementation of the published three-tier scheme
(s2predicates.cc:44-296, s2edge_crosser.{h,cc}, s2edge_crossings.cc):

  triage (double, error bound)  ->  stable (permuted difference form)
  ->  exact (arbitrary precision: Python Fraction)  ->  symbolic perturbation

The hot path is fully vectorized NumPy over (points x edges); only pairs
whose triage sign falls inside the uncertainty band drop to the scalar
exact path (rare for generic data, by design).
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

DBL_EPSILON = float(np.finfo(np.float64).eps)  # 2.220446049250313e-16
MAX_DET_ERROR = 3.6548 * DBL_EPSILON  # TriageSign bound (s2predicates.h:393)
DET_ERROR_MULTIPLIER = 3.2321 * DBL_EPSILON  # StableSign (s2predicates.cc:82)
MIN_NO_UNDERFLOW = DET_ERROR_MULTIPLIER * np.sqrt(np.finfo(np.float64).tiny)
TANGENT_ERROR = (1.5 + 1 / np.sqrt(3)) * DBL_EPSILON  # s2edge_crosser.cc:100

# S2::Origin (s2pointutil.h:98-117): fixed reference point ~66km from the
# north pole; the seed of every crossing-parity containment test.
ORIGIN = np.array(
    [-0.0099994664350250197, 0.0025924542609324121, 0.99994664350250195]
)


# ---------- scalar robust sign (exact fallbacks) ----------


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _stable_sign(a, b, c) -> int:
    """StableSign (s2predicates.cc:64-103)."""
    ab = (b[0] - a[0], b[1] - a[1], b[2] - a[2])
    bc = (c[0] - b[0], c[1] - b[1], c[2] - b[2])
    ca = (a[0] - c[0], a[1] - c[1], a[2] - c[2])
    ab2 = _dot(ab, ab)
    bc2 = _dot(bc, bc)
    ca2 = _dot(ca, ca)
    if ab2 >= bc2 and ab2 >= ca2:
        det = -_dot(_cross(ca, bc), c)
        max_error = DET_ERROR_MULTIPLIER * np.sqrt(ca2 * bc2)
    elif bc2 >= ca2:
        det = -_dot(_cross(ab, ca), a)
        max_error = DET_ERROR_MULTIPLIER * np.sqrt(ab2 * ca2)
    else:
        det = -_dot(_cross(bc, ab), b)
        max_error = DET_ERROR_MULTIPLIER * np.sqrt(bc2 * ab2)
    if max_error < MIN_NO_UNDERFLOW:
        return 0
    return 0 if abs(det) <= max_error else (1 if det > 0 else -1)


def _symbolically_perturbed_sign(a, b, c, b_cross_c) -> int:
    """SymbolicallyPerturbedSign (s2predicates.cc:131-218); args are exact
    Fractions with a < b < c lexicographically."""

    def sgn(x):
        return (x > 0) - (x < 0)

    for v in (b_cross_c[2], b_cross_c[1], b_cross_c[0]):
        s = sgn(v)
        if s:
            return s
    s = sgn(c[0] * a[1] - c[1] * a[0])  # db[2]
    if s:
        return s
    s = sgn(c[0])  # db[2]*da[1]
    if s:
        return s
    s = -sgn(c[1])  # db[2]*da[0]
    if s:
        return s
    s = sgn(c[2] * a[0] - c[0] * a[2])  # db[1]
    if s:
        return s
    s = sgn(c[2])  # db[1]*da[0]
    if s:
        return s
    s = sgn(a[0] * b[1] - a[1] * b[0])  # dc[2]
    if s:
        return s
    s = -sgn(b[0])  # dc[2]*da[1]
    if s:
        return s
    s = sgn(b[1])  # dc[2]*da[0]
    if s:
        return s
    s = sgn(a[0])  # dc[2]*db[1]
    if s:
        return s
    return 1  # dc[2]*db[1]*da[0]


def _exact_sign(a, b, c, perturb: bool = True) -> int:
    """ExactSign (s2predicates.cc:226-262) via Fraction arithmetic."""
    pts = [tuple(a), tuple(b), tuple(c)]
    perm_sign = 1
    if pts[0] > pts[1]:
        pts[0], pts[1] = pts[1], pts[0]
        perm_sign = -perm_sign
    if pts[1] > pts[2]:
        pts[1], pts[2] = pts[2], pts[1]
        perm_sign = -perm_sign
    if pts[0] > pts[1]:
        pts[0], pts[1] = pts[1], pts[0]
        perm_sign = -perm_sign
    xa = tuple(Fraction(v) for v in pts[0])
    xb = tuple(Fraction(v) for v in pts[1])
    xc = tuple(Fraction(v) for v in pts[2])
    bxc = _cross(xb, xc)
    det = _dot(xa, bxc)
    det_sign = (det > 0) - (det < 0)
    if det_sign == 0 and perturb:
        det_sign = _symbolically_perturbed_sign(xa, xb, xc, bxc)
    return perm_sign * det_sign


def expensive_sign(a, b, c, perturb: bool = True) -> int:
    """ExpensiveSign (s2predicates.cc:275-296)."""
    if tuple(a) == tuple(b) or tuple(b) == tuple(c) or tuple(c) == tuple(a):
        return 0
    s = _stable_sign(a, b, c)
    if s != 0:
        return s
    return _exact_sign(a, b, c, perturb)


def sign(a, b, c) -> int:
    """s2pred::Sign — never returns 0 for distinct points."""
    det = _dot(_cross(a, b), c)
    if det > MAX_DET_ERROR:
        return 1
    if det < -MAX_DET_ERROR:
        return -1
    return expensive_sign(a, b, c)


def triage_sign(a, b, c, a_cross_b) -> int:
    det = _dot(a_cross_b, c)
    if det > MAX_DET_ERROR:
        return 1
    if det < -MAX_DET_ERROR:
        return -1
    return 0


# ---------- scalar crossing machinery ----------


def _largest_abs_component(a) -> int:
    """vector.h:508-513 tie-break semantics (strictly-greater chains)."""
    ax, ay, az = abs(a[0]), abs(a[1]), abs(a[2])
    if ax > ay:
        return 0 if ax > az else 2
    return 1 if ay > az else 2


def _ortho(a) -> tuple:
    """S2::Ortho (s2pointutil.cc): unit vector orthogonal to a, avoiding
    zero coordinates."""
    k = _largest_abs_component(a) - 1
    if k < 0:
        k = 2
    temp = [0.012, 0.0053, 0.00457]
    temp[k] = 1.0
    v = np.cross(np.asarray(a, float), temp)
    return tuple(v / np.linalg.norm(v))


def ordered_ccw(a, b, c, o) -> bool:
    """s2pred::OrderedCCW (s2predicates.cc:298-311)."""
    total = 0
    if sign(b, o, a) >= 0:
        total += 1
    if sign(c, o, b) >= 0:
        total += 1
    if sign(a, o, c) > 0:
        total += 1
    return total >= 2


def vertex_crossing(a, b, c, d) -> bool:
    """S2::VertexCrossing (s2edge_crossings.cc:371-390)."""
    ta, tb, tc, td = tuple(a), tuple(b), tuple(c), tuple(d)
    if ta == tb or tc == td:
        return False
    if ta == tc:
        return tb == td or ordered_ccw(_ortho(a), d, b, a)
    if tb == td:
        return ordered_ccw(_ortho(b), c, a, b)
    if ta == td:
        return tb == tc or ordered_ccw(_ortho(a), c, b, a)
    if tb == tc:
        return ordered_ccw(_ortho(b), d, a, b)
    return False


def _robust_cross_prod(a, b):
    """RobustCrossProd main path: (a-b)x(a+b) (s2edge_crossings.cc:98-137);
    exact fallback for the (vanishingly rare) degenerate case."""
    a = np.asarray(a, float)
    b = np.asarray(b, float)
    r = np.cross(a - b, a + b)
    n2 = float(r @ r)
    if n2 > 0:
        return r
    # exact fallback via Fractions, then symbolic if still zero
    fa = tuple(Fraction(v) for v in a)
    fb = tuple(Fraction(v) for v in b)
    rx = _cross(fa, fb)
    if any(v != 0 for v in rx):
        return np.array([float(v) for v in rx])
    return np.asarray(_ortho(a))


def crossing_sign(a, b, c, d) -> int:
    """S2::CrossingSign (s2edge_crosser CrossingSign/Internal2 logic):
    +1 interior crossing / 0 vertex-shared / -1 no crossing."""
    a = tuple(a)
    b = tuple(b)
    c = tuple(c)
    d = tuple(d)
    a_cross_b = _cross(a, b)
    acb = -triage_sign(a, b, c, a_cross_b)
    bda = triage_sign(a, b, d, a_cross_b)
    if acb == -bda and bda != 0:
        return -1
    # slow path (CrossingSignInternal2, s2edge_crosser.cc:41-105)
    norm = _robust_cross_prod(a, b)
    a_tangent = np.cross(np.asarray(a), norm)
    b_tangent = np.cross(norm, np.asarray(b))
    if (
        _dot(c, a_tangent) > TANGENT_ERROR and _dot(d, a_tangent) > TANGENT_ERROR
    ) or (_dot(c, b_tangent) > TANGENT_ERROR and _dot(d, b_tangent) > TANGENT_ERROR):
        return -1
    if a == c or a == d or b == c or b == d:
        return 0
    if a == b or c == d:
        return -1
    if acb == 0:
        acb = -expensive_sign(a, b, c)
    if bda == 0:
        bda = expensive_sign(a, b, d)
    if bda != acb:
        return -1
    c_cross_d = _cross(c, d)
    cbd = -_sign_with_cross(c, d, b, c_cross_d)
    if cbd != acb:
        return -1
    dac = _sign_with_cross(c, d, a, c_cross_d)
    return 1 if dac == acb else -1


def _sign_with_cross(a, b, c, a_cross_b) -> int:
    s = triage_sign(a, b, c, a_cross_b)
    if s != 0:
        return s
    return expensive_sign(a, b, c)


def edge_or_vertex_crossing(a, b, c, d) -> bool:
    """S2::EdgeOrVertexCrossing (s2edge_crossings.cc:414-420)."""
    crossing = crossing_sign(a, b, c, d)
    if crossing < 0:
        return False
    if crossing > 0:
        return True
    return vertex_crossing(a, b, c, d)


# ---------- vectorized point-in-loop kernel ----------


def loop_contains_points(
    vertices: np.ndarray, origin_inside: bool, points: np.ndarray
) -> np.ndarray:
    """Crossing parity of edge (Origin -> p) vs every loop edge, vectorized.

    Re-expression of S2Loop::BruteForceContains (s2loop.cc:605-617): instead
    of a stateful S2EdgeCrosser per point, all (point x edge) triage signs
    are computed as one NumPy broadcast; only uncertainty-band pairs fall
    back to the scalar robust path.

    vertices: (m,3) loop vertices (closed implicitly); points: (n,3).
    Returns bool (n,).
    """
    v = np.asarray(vertices, np.float64)
    p = np.asarray(points, np.float64)
    n = p.shape[0]
    m = v.shape[0]
    if n == 0:
        return np.zeros(0, dtype=bool)

    o = ORIGIN
    # a = origin, b = p_k: a_cross_b per point (n,3)
    axb = np.cross(np.broadcast_to(o, p.shape), p)
    # det((OxP), v_i) for all points x vertices: (n, m)
    dets = axb @ v.T
    signs = np.where(dets > MAX_DET_ERROR, 1, np.where(dets < -MAX_DET_ERROR, -1, 0))

    # edge i is (v_i, v_{i+1 mod m}); ACB = -sign(a,b,c_i), BDA = sign(a,b,d_i)
    s_c = signs
    s_d = np.roll(signs, -1, axis=1)
    fast_no = (s_c == s_d) & (s_d != 0)  # same side, no crossing
    definite = (s_c == -s_d) & (s_c != 0)  # opposite sides: run cbd/dac tests
    uncertain = ~fast_no & ~definite  # triage band: scalar robust path

    crossings = np.zeros((n, m), dtype=bool)
    if definite.any():
        # cbd = -Sign(c,d,b), dac = Sign(c,d,a) with shared cxd (per edge)
        d_v = np.roll(v, -1, axis=0)
        cxd = np.cross(v, d_v)  # (m,3)
        cbd_det = -(p @ cxd.T)  # (n,m)
        dac_det = cxd @ o  # (m,)
        cbd_s = np.where(
            cbd_det > MAX_DET_ERROR, 1, np.where(cbd_det < -MAX_DET_ERROR, -1, 0)
        )
        dac_s = np.where(
            dac_det > MAX_DET_ERROR, 1, np.where(dac_det < -MAX_DET_ERROR, -1, 0)
        )[None, :]
        acb = s_d  # == -s_c for definite pairs
        det_cross = definite & (cbd_s == acb) & (dac_s == acb)
        det_nocross = definite & (
            ((cbd_s != acb) & (cbd_s != 0)) | ((dac_s != acb) & (dac_s != 0))
        )
        crossings |= det_cross
        # definite pairs whose cbd/dac triage was uncertain -> scalar path
        uncertain |= definite & ~det_cross & ~det_nocross

    pi, ei = np.nonzero(uncertain)
    for k in range(pi.size):
        ip = int(pi[k])
        ie = int(ei[k])
        c = v[ie]
        d = v[(ie + 1) % m]
        if edge_or_vertex_crossing(o, p[ip], c, d):
            crossings[ip, ie] = True

    inside = np.full(n, bool(origin_inside))
    inside ^= (crossings.sum(axis=1) & 1).astype(bool)
    return inside


def _pinned_cross(ax, ay, az, bx, by, bz):
    """Component-wise cross product with pinned operation order (matches
    the SQL oracle's expression tree exactly)."""
    return (
        ay * bz - az * by,
        az * bx - ax * bz,
        ax * by - ay * bx,
    )


def _pinned_dot(ax, ay, az, bx, by, bz):
    return (ax * bx + ay * by) + az * bz


def edges_cross_batch(
    A0: np.ndarray, A1: np.ndarray, B0: np.ndarray, B1: np.ndarray,
    robust: bool = True,
) -> np.ndarray:
    """Interior-crossing test for n edge PAIRS (vectorized CrossingSign>0).

    A0,A1,B0,B1: (n,3) endpoint arrays, one candidate pair per row.
    robust=True sends triage-uncertain rows through the exact scalar path
    (the engine default); robust=False uses pure double triage signs with
    the pinned operation order — bit-reproducible in any IEEE SQL engine,
    for oracle-matched queries (generic data never enters the band).
    """
    ax, ay, az = A0[:, 0], A0[:, 1], A0[:, 2]
    bx, by, bz = A1[:, 0], A1[:, 1], A1[:, 2]
    nx, ny, nz = _pinned_cross(ax, ay, az, bx, by, bz)  # a0 x a1

    def tri(px, py, pz, qx, qy, qz, rx, ry, rz):
        cxx, cyy, czz = _pinned_cross(px, py, pz, qx, qy, qz)
        return _pinned_dot(cxx, cyy, czz, rx, ry, rz)

    d_b0 = _pinned_dot(nx, ny, nz, B0[:, 0], B0[:, 1], B0[:, 2])  # sign(a0,a1,b0)
    d_b1 = _pinned_dot(nx, ny, nz, B1[:, 0], B1[:, 1], B1[:, 2])  # sign(a0,a1,b1)
    mx, my, mz = _pinned_cross(
        B0[:, 0], B0[:, 1], B0[:, 2], B1[:, 0], B1[:, 1], B1[:, 2]
    )  # b0 x b1
    d_a0 = _pinned_dot(mx, my, mz, ax, ay, az)  # sign(b0,b1,a0)
    d_a1 = _pinned_dot(mx, my, mz, bx, by, bz)  # sign(b0,b1,a1)

    if not robust:
        # pure-double semantics: strict sign alternation on both edges PLUS
        # the orientation chain link sign(d_b1) == sign(d_a0) — without it
        # two arcs straddling each other's great circles at ANTIPODAL
        # intersection points false-positive (the reference's cbd/dac
        # checks, s2edge_crosser.cc).  Signs use a FIXED tolerance band
        # (|det| <= 1e-15 -> 0): shared-vertex pairs produce exact-zero
        # determinants plus rounding noise whose ulp-level value is not
        # portable across engines; the band makes the decision
        # deterministic everywhere (near-degenerate pairs -> no crossing).
        def sgn(d):
            return np.where(np.abs(d) <= 1e-15, 0, np.sign(d))

        return (
            (sgn(d_b0) * sgn(d_b1) < 0)
            & (sgn(d_a0) * sgn(d_a1) < 0)
            & (sgn(d_b1) == sgn(d_a0))
        )

    s_b0 = np.where(d_b0 > MAX_DET_ERROR, 1, np.where(d_b0 < -MAX_DET_ERROR, -1, 0))
    s_b1 = np.where(d_b1 > MAX_DET_ERROR, 1, np.where(d_b1 < -MAX_DET_ERROR, -1, 0))
    s_a0 = np.where(d_a0 > MAX_DET_ERROR, 1, np.where(d_a0 < -MAX_DET_ERROR, -1, 0))
    s_a1 = np.where(d_a1 > MAX_DET_ERROR, 1, np.where(d_a1 < -MAX_DET_ERROR, -1, 0))
    certain = (s_b0 != 0) & (s_b1 != 0) & (s_a0 != 0) & (s_a1 != 0)
    out = certain & (s_b0 * s_b1 < 0) & (s_a0 * s_a1 < 0) & (s_b1 == s_a0)
    for i in np.flatnonzero(~certain):
        out[i] = crossing_sign(A0[i], A1[i], B0[i], B1[i]) > 0
    return out


def compute_origin_inside(vertices: np.ndarray) -> bool:
    """S2Loop::InitOriginAndBound essence (s2loop.cc:275-301): decide whether
    S2::Origin() is inside the loop.

    Uses the reference's construction: v1_inside = OrderedCCW(Ortho(v1),
    v0, v2, v1), then XOR with the parity of crossings along the path from
    v1's neighborhood to Origin.  We compute it directly: take the parity of
    crossings of edge (v1_slightly_inside -> Origin); equivalently start
    with contains(v1_interior_side) and cross to Origin.
    """
    v = np.asarray(vertices, np.float64)
    m = v.shape[0]
    if m < 3:
        return False
    v1_inside = ordered_ccw(_ortho(v[1]), v[0], v[2], v[1])
    # contains_origin = v1_inside XOR crossings(v1 -> origin)
    crossings = 0
    a, b = v[1], ORIGIN
    for i in range(m):
        c = v[i]
        d = v[(i + 1) % m]
        if edge_or_vertex_crossing(a, b, c, d):
            crossings ^= 1
    return bool(v1_inside ^ crossings)


def polygon_contains_points(
    loops: list[np.ndarray], origin_inside_flags: list[bool], points: np.ndarray
) -> np.ndarray:
    """S2Polygon::Contains = XOR over loops (s2polygon.cc:704-729)."""
    points = np.asarray(points, np.float64)
    inside = np.zeros(points.shape[0], dtype=bool)
    for v, oi in zip(loops, origin_inside_flags):
        inside ^= loop_contains_points(v, oi, points)
    return inside
