"""Edge -> cube-face clipping: the GetFaceSegments face walk.

Vectorized NumPy re-implementation of the published algorithm in
s2edge_clipping.cc:33-258 (IntersectsFace, IntersectsOppositeEdges,
GetExitAxis, GetExitPoint, MoveOriginToValidFace, GetNextFace,
GetFaceSegments): given a directed geodesic edge AB, produce the chain
of (face, (u,v) segment) pieces that exactly covers the edge across
the 6 cube faces.  This is the primitive every shape-index build uses
to assign edges to cells; here it powers a distributed
edge-to-face-segment query.

Every operation is plain IEEE double +,-,*,/ plus exact comparisons
(the reference's SumEquals trick at s2edge_clipping.cc:64-98 is pure
FP compares), so the DuckDB oracle replaying the same unrolled walk is
bit-identical.  The only sqrt lives in MoveOriginToValidFace's
tangent test (s2edge_clipping.cc:161), also correctly rounded.

The line AB is defined by its RobustCrossProd normal; we pin the main
path (a-b)x(a+b) (s2edge_crossings.cc:147-176 GetStableCrossProd) and
the fixture filters out the near-degenerate pairs that would need the
extended-precision fallback (norm^2 > NORM2_MIN, replayed identically
in the oracle SQL so both engines drop the same rows).
"""

from __future__ import annotations

import numpy as np

from .coords import (
    FACE_UVW_FACES,
    face_uv_to_xyz,
    get_face,
    valid_face_xyz_to_uv,
    xyz_to_face_uv,
)

# s2edge_clipping.h:99-101
K_FACE_CLIP_ERROR_RADIANS = 3 * np.finfo(np.float64).eps
K_FACE_CLIP_ERROR_UV_COORD = 9 * (2.0 ** -0.5) * np.finfo(np.float64).eps
# kEdgeClipErrorUVCoord (s2edge_clipping.h:152) and the shape-index cell
# padding derived from it (mutable_s2shape_index.cc:183).
K_EDGE_CLIP_ERROR_UV_COORD = 2.25 * np.finfo(np.float64).eps
K_CELL_PADDING = 2 * (K_FACE_CLIP_ERROR_UV_COORD + K_EDGE_CLIP_ERROR_UV_COORD)

# fixture contract: RobustCrossProd main-path only (see module docstring)
NORM2_MIN = 1e-14

# a directed arc < pi crosses at most 5 faces; unroll bound shared with
# the SQL oracle (engine asserts it loudly rather than truncating)
MAX_SEGMENTS = 6


def face_xyz_to_uvw(face, x, y, z):
    """FaceXYZtoUVW (s2coords.cc:27-40): signed permutation per face."""
    face = np.asarray(face, np.int64)
    us = np.stack([y, -x, -x, -z, -z, y])
    vs = np.stack([z, z, -y, -y, x, x])
    ws = np.stack([x, y, z, -x, -y, -z])
    take = np.arange(face.size)
    shape = face.shape
    f = face.ravel()
    return (
        us.reshape(6, -1)[f, take].reshape(shape),
        vs.reshape(6, -1)[f, take].reshape(shape),
        ws.reshape(6, -1)[f, take].reshape(shape),
    )


def robust_cross_prod(ax, ay, az, bx, by, bz):
    """RobustCrossProd main path (a-b)x(a+b), pinned component order
    (s2edge_crossings.cc GetStableCrossProd)."""
    dx, dy, dz = ax - bx, ay - by, az - bz
    sx, sy, sz = ax + bx, ay + by, az + bz
    return dy * sz - dz * sy, dz * sx - dx * sz, dx * sy - dy * sx


def intersects_face(nx, ny, nz):
    """IntersectsFace (s2edge_clipping.cc:71-82): exact |Nu|+|Nv| >= |Nw|."""
    u, v, w = np.abs(nx), np.abs(ny), np.abs(nz)
    return (v >= w - u) & (u >= w - v)


def intersects_opposite_edges(nx, ny, nz):
    """IntersectsOppositeEdges (s2edge_clipping.cc:88-99): exact
    ||Nu|-|Nv|| >= |Nw|."""
    u, v, w = np.abs(nx), np.abs(ny), np.abs(nz)
    d = np.abs(u - v)
    return np.where(d != w, d >= w, np.where(u >= v, u - w >= v, v - w >= u))


def get_exit_axis(nx, ny, nz):
    """GetExitAxis (s2edge_clipping.cc:106-122): 0 = exits a u=+-1 edge,
    1 = exits a v=+-1 edge."""
    opp = intersects_opposite_edges(nx, ny, nz)
    axis_opp = np.where(np.abs(nx) >= np.abs(ny), 1, 0)
    # reference uses signbit() here; `< 0` differs only at +-0, which the
    # reference itself DCHECKs away (s2edge_clipping.cc:118) and the
    # fixture's generic-position contract excludes — and DuckDB's
    # signbit(-0.0) is broken, so both engines pin `< 0`.
    parity = (nx < 0) ^ (ny < 0) ^ (nz < 0)
    axis_adj = np.where(~parity, 1, 0)
    return np.where(opp, axis_opp, axis_adj).astype(np.int64)


def get_exit_point(nx, ny, nz, axis):
    """GetExitPoint (s2edge_clipping.cc:127-135)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        u0 = np.where(ny > 0, 1.0, -1.0)
        v0 = (-u0 * nx - nz) / ny
        v1 = np.where(nx < 0, 1.0, -1.0)
        u1 = (-v1 * ny - nz) / nx
    eu = np.where(axis == 0, u0, u1)
    ev = np.where(axis == 0, v0, v1)
    return eu, ev


def _dot3(px, py, pz, qx, qy, qz):
    return (px * qx + py * qy) + pz * qz


def move_origin_to_valid_face(face, ax, ay, az, nx, ny, nz, au, av):
    """MoveOriginToValidFace (s2edge_clipping.cc:147-178), vectorized.

    (nx,ny,nz) is the line normal oriented AWAY from this endpoint's
    travel direction convention: callers pass ab for the origin A and
    -ab for the destination B, exactly as GetFaceSegments does."""
    face = np.asarray(face, np.int64).copy()
    au = np.asarray(au, np.float64).copy()
    av = np.asarray(av, np.float64).copy()
    fast = np.maximum(np.abs(au), np.abs(av)) <= 1 - K_FACE_CLIP_ERROR_UV_COORD
    slow = ~fast
    if slow.any():
        fs, axs, ays, azs = face[slow], ax[slow], ay[slow], az[slow]
        nxs, nys, nzs = nx[slow], ny[slow], nz[slow]
        nu, nv, nw = face_xyz_to_uvw(fs, nxs, nys, nzs)
        itf = intersects_face(nu, nv, nw)
        exit_axis = get_exit_axis(nu, nv, nw)
        eu, ev = get_exit_point(nu, nv, nw, exit_axis)
        ex, ey, ez = face_uv_to_xyz(fs, eu, ev)
        nrm = np.sqrt((nxs * nxs + nys * nys) + nzs * nzs)
        ux, uy, uz = nxs / nrm, nys / nrm, nzs / nrm
        # a_tangent = ab.Normalize().CrossProd(a), pinned order
        tx = uy * azs - uz * ays
        ty = uz * axs - ux * azs
        tz = ux * ays - uy * axs
        ok = itf & (
            _dot3(ex - axs, ey - ays, ez - azs, tx, ty, tz)
            >= -K_FACE_CLIP_ERROR_RADIANS
        )
        repro = ~ok
        if repro.any():
            aus, avs = au[slow], av[slow]
            axis_r = np.where(np.abs(aus) >= np.abs(avs), 0, 1)
            positive = np.where(axis_r == 0, aus > 0, avs > 0).astype(np.int64)
            f2 = FACE_UVW_FACES[fs, axis_r, positive]
            u2, v2 = valid_face_xyz_to_uv(f2, axs, ays, azs)
            u2 = np.maximum(-1.0, np.minimum(1.0, u2))
            v2 = np.maximum(-1.0, np.minimum(1.0, v2))
            fs = np.where(repro, f2, fs)
            new_au, new_av = au[slow], av[slow]
            new_au = np.where(repro, u2, new_au)
            new_av = np.where(repro, v2, new_av)
            face[slow] = fs
            au[slow] = new_au
            av[slow] = new_av
    return face, au, av


def _sum_equals(u, v, w):
    """SumEquals (s2edge_clipping.cc:65-67): u + v == w exactly."""
    return (u + v == w) & (u == w - v) & (v == w - u)


def get_next_face(face, eu, ev, axis, nu, nv, nw, target_face):
    """GetNextFace (s2edge_clipping.cc:185-204)."""
    other_val = np.where(axis == 0, ev, eu)
    axis_val = np.where(axis == 0, eu, ev)
    adj_other = FACE_UVW_FACES[face, 1 - axis, (other_val > 0).astype(np.int64)]
    corner = (
        (np.abs(other_val) == 1.0)
        & (adj_other == target_face)
        & _sum_equals(eu * nu, ev * nv, -nw)
    )
    adj_axis = FACE_UVW_FACES[face, axis, (axis_val > 0).astype(np.int64)]
    return np.where(corner, target_face, adj_axis)


def _clip_destination(
    au, av, aw, bu, bv, bw, snu, snv, snw, a_tan, b_tan, scale_uv
):
    """ClipDestination (s2edge_clipping.cc:271-321), vectorized: clip
    endpoint B=(bu,bv,bw) of segment AB on the face implied by the UVW
    frame.  Returns (score, u, v)."""
    k_max_safe = 1 - K_FACE_CLIP_ERROR_UV_COORD
    with np.errstate(divide="ignore", invalid="ignore"):
        pu = bu / bw
        pv = bv / bw
    proj_ok = (bw > 0) & (np.maximum(np.abs(pu), np.abs(pv)) <= k_max_safe)
    axis = get_exit_axis(snu, snv, snw)
    eu, ev = get_exit_point(snu, snv, snw, axis)
    xu = scale_uv * eu
    xv = scale_uv * ev
    # p = (xu, xv, 1); tangent dot products with pinned order
    atx, aty, atz = a_tan
    btx, bty, btz = b_tan
    wrong_a = _dot3(xu - au, xv - av, 1.0 - aw, atx, aty, atz) < 0
    wrong_b = _dot3(xu - bu, xv - bv, 1.0 - bw, btx, bty, btz) < 0
    score = np.where(wrong_a, 2, np.where(wrong_b, 1, 0)).astype(np.int64)
    fallback = (score > 0) & (bw > 0)
    score = np.where((score > 0) & (bw <= 0), 3, score)
    u = np.where(proj_ok, pu, np.where(fallback, pu, xu))
    v = np.where(proj_ok, pv, np.where(fallback, pv, xv))
    score = np.where(proj_ok, 0, score)
    return score, u, v


def clip_to_padded_face(face, ax, ay, az, bx, by, bz, padding):
    """ClipToPaddedFace (s2edge_clipping.cc:323-362), vectorized over
    (edge, face) rows.  Returns (hit, au, av, bu, bv)."""
    face = np.asarray(face, np.int64)
    fa = get_face(ax, ay, az)
    fb = get_face(bx, by, bz)
    fast = (fa == face) & (fb == face)
    nx, ny, nz = robust_cross_prod(ax, ay, az, bx, by, bz)
    nu, nv, nw = face_xyz_to_uvw(face, nx, ny, nz)
    au3, av3, aw3 = face_xyz_to_uvw(face, ax, ay, az)
    bu3, bv3, bw3 = face_xyz_to_uvw(face, bx, by, bz)
    scale_uv = 1 + padding
    snu, snv, snw = scale_uv * nu, scale_uv * nv, nw
    itf = intersects_face(snu, snv, snw)
    nrm = np.sqrt((nu * nu + nv * nv) + nw * nw)
    with np.errstate(divide="ignore", invalid="ignore"):
        hu, hv, hw = nu / nrm, nv / nrm, nw / nrm
        # a_tangent = n_hat x a ; b_tangent = b x n_hat (pinned order)
        a_tan = (hv * aw3 - hw * av3, hw * au3 - hu * aw3, hu * av3 - hv * au3)
        b_tan = (bv3 * hw - bw3 * hv, bw3 * hu - bu3 * hw, bu3 * hv - bv3 * hu)
        a_score, cau, cav = _clip_destination(
            bu3, bv3, bw3, au3, av3, aw3, -snu, -snv, -snw, b_tan, a_tan, scale_uv
        )
        b_score, cbu, cbv = _clip_destination(
            au3, av3, aw3, bu3, bv3, bw3, snu, snv, snw, a_tan, b_tan, scale_uv
        )
        pau, pav = au3 / aw3, av3 / aw3
        pbu, pbv = bu3 / bw3, bv3 / bw3
    hit = fast | (itf & (a_score + b_score < 3))
    out_au = np.where(fast, pau, cau)
    out_av = np.where(fast, pav, cav)
    out_bu = np.where(fast, pbu, cbu)
    out_bv = np.where(fast, pbv, cbv)
    return hit, out_au, out_av, out_bu, out_bv


def intersects_rect(au, av, bu, bv, ulo, uhi, vlo, vhi):
    """IntersectsRect (s2edge_clipping.cc:364-380): does the 2D segment
    (a,b) intersect the closed rect [ulo,uhi]x[vlo,vhi]?  Exact-FP
    replay: bound check, then the two extreme rect vertices against the
    edge normal (b-a).Ortho() = (-(dy), dx)."""
    blo_u = np.minimum(au, bu)
    bhi_u = np.maximum(au, bu)
    blo_v = np.minimum(av, bv)
    bhi_v = np.maximum(av, bv)
    bound = (bhi_u >= ulo) & (blo_u <= uhi) & (bhi_v >= vlo) & (blo_v <= vhi)
    n0 = -(bv - av)
    n1 = bu - au
    iu = n0 >= 0
    jv = n1 >= 0
    vx = np.where(iu, uhi, ulo)
    vy = np.where(jv, vhi, vlo)
    wx = np.where(iu, ulo, uhi)
    wy = np.where(jv, vlo, vhi)
    mx = n0 * (vx - au) + n1 * (vy - av)
    mn = n0 * (wx - au) + n1 * (wy - av)
    return bound & (mx >= 0) & (mn <= 0)


def _uv_to_st(u):
    """Quadratic UVtoST (monotone; coords.uv_to_st), for bbox bounds."""
    with np.errstate(invalid="ignore"):
        hi = 0.5 * np.sqrt(1 + 3 * u)
        lo = 1 - 0.5 * np.sqrt(1 - 3 * u)
    return np.where(u >= 0, hi, lo)


def _st_to_uv(s):
    third = 1.0 / 3.0
    hi = third * (4 * s * s - 1)
    lo = third * (1 - (4 * (1 - s)) * (1 - s))
    return np.where(s >= 0.5, hi, lo)


def _st_to_ij(s):
    scaled = 1073741824.0 * s
    ij = np.minimum(np.floor(scaled), 1073741823.0).astype(np.int64)
    return np.where(s > 0, ij, 0)


def clip_edge(au, av, bu, bv, ulo, uhi, vlo, vhi):
    """ClipEdge (s2edge_clipping.cc:382-450): clip the 2D segment (a,b)
    to the closed rect, via the reference's axis-interval bound
    update (ClipEdgeBound/ClipBoundAxis/UpdateEndpoint with the
    InterpolateDouble lerp).  Returns (ok, cau, cav, cbu, cbv);
    clipped coordinates are valid only where ok."""

    def interp(x, a0, b0, a1, b1):
        # InterpolateDouble (s2edge_crossings.h): a1 + (b1-a1) * ((x-a0)/(b0-a0))
        with np.errstate(divide="ignore", invalid="ignore"):
            return a1 + (b1 - a1) * ((x - a0) / (b0 - a0))

    # bound = FromPointPair
    lo0 = np.minimum(au, bu).copy()
    hi0 = np.maximum(au, bu).copy()
    lo1 = np.minimum(av, bv).copy()
    hi1 = np.maximum(av, bv).copy()
    diag = (au > bu) != (av > bv)  # 1 if AB has negative slope
    ok = np.ones(np.shape(au), dtype=bool)

    def clip_axis(a0, b0, lo_0, hi_0, a1, b1, lo_1, hi_1, d, clo, chi):
        okk = np.ones(np.shape(a0), dtype=bool)
        # lo side
        m = lo_0 < clo
        okk &= ~(m & (hi_0 < clo))
        lo_0 = np.where(m, clo, lo_0)
        val = interp(clo, a0, b0, a1, b1)
        # UpdateEndpoint(bound1, diag, value)
        end0 = m & ~d  # end == 0: cap lo
        end1 = m & d
        okk &= ~(end0 & (hi_1 < val))
        lo_1 = np.where(end0 & (lo_1 < val) & okk, val, lo_1)
        okk &= ~(end1 & (lo_1 > val))
        hi_1 = np.where(end1 & (hi_1 > val) & okk, val, hi_1)
        # hi side
        m2 = hi_0 > chi
        okk &= ~(m2 & (lo_0 > chi))
        hi_0 = np.where(m2 & okk, chi, hi_0)
        val2 = interp(chi, a0, b0, a1, b1)
        e0 = m2 & d  # 1-diag == 0
        e1 = m2 & ~d
        okk &= ~(e0 & (hi_1 < val2))
        lo_1 = np.where(e0 & (lo_1 < val2) & okk, val2, lo_1)
        okk &= ~(e1 & (lo_1 > val2))
        hi_1 = np.where(e1 & (hi_1 > val2) & okk, val2, hi_1)
        return okk, lo_0, hi_0, lo_1, hi_1

    ok1, lo0, hi0, lo1, hi1 = clip_axis(au, bu, lo0, hi0, av, bv, lo1, hi1, diag, ulo, uhi)
    ok2, lo1, hi1, lo0, hi0 = clip_axis(av, bv, lo1, hi1, au, bu, lo0, hi0, diag, vlo, vhi)
    ok = ok1 & ok2
    # extract endpoints from the clipped bound (ClipEdge tail)
    ai = au > bu
    aj = av > bv
    cau = np.where(ai, hi0, lo0)
    cav = np.where(aj, hi1, lo1)
    cbu = np.where(ai, lo0, hi0)
    cbv = np.where(aj, lo1, hi1)
    return ok, cau, cav, cbu, cbv


def edge_level_cells(ax, ay, az, bx, by, bz, level):
    """Edge -> level-``level`` cell grid assignment: for every edge, the
    (face, ci, cj) grid cells of that level whose UV rect the edge's
    clipped face segment intersects (IntersectsRect refinement over the
    segment's bbox candidates) — the flat-grid form of the shape-index
    cell assignment.  Returns (edge_idx, face, ci, cj)."""
    idx, seg, face, au, av, bu, bv = get_face_segments(ax, ay, az, bx, by, bz)
    shift = 30 - level
    ulo = np.minimum(au, bu)
    uhi = np.maximum(au, bu)
    vlo = np.minimum(av, bv)
    vhi = np.maximum(av, bv)
    i0 = _st_to_ij(_uv_to_st(ulo)) >> shift
    i1 = _st_to_ij(_uv_to_st(uhi)) >> shift
    j0 = _st_to_ij(_uv_to_st(vlo)) >> shift
    j1 = _st_to_ij(_uv_to_st(vhi)) >> shift
    ni = i1 - i0 + 1
    nj = j1 - j0 + 1
    counts = ni * nj
    row = np.repeat(np.arange(seg.size), counts)
    offs = np.arange(counts.sum()) - np.repeat(np.cumsum(counts) - counts, counts)
    ci = i0[row] + offs // nj[row]
    cj = j0[row] + offs % nj[row]
    inv = 1.0 / 1073741824.0
    cu_lo = _st_to_uv(inv * (ci << shift).astype(np.float64))
    cu_hi = _st_to_uv(inv * ((ci + 1) << shift).astype(np.float64))
    cv_lo = _st_to_uv(inv * (cj << shift).astype(np.float64))
    cv_hi = _st_to_uv(inv * ((cj + 1) << shift).astype(np.float64))
    hit = intersects_rect(
        au[row], av[row], bu[row], bv[row], cu_lo, cu_hi, cv_lo, cv_hi
    )
    return idx[row][hit], face[row][hit], ci[hit], cj[hit]


def edge_level_cell_clips(ax, ay, az, bx, by, bz, level):
    """Edge -> level-``level`` cell assignment WITH the edge clipped to
    each cell's UV rect (ClipEdge, s2edge_clipping.cc:382-450) — the
    per-cell clipped-edge form a distributed shape-index build stores so
    downstream interior/crossing tests never re-derive the face segment.
    Returns (edge_idx, face, ci, cj, cau, cav, cbu, cbv)."""
    idx, seg, face, au, av, bu, bv = get_face_segments(ax, ay, az, bx, by, bz)
    shift = 30 - level
    ulo = np.minimum(au, bu)
    uhi = np.maximum(au, bu)
    vlo = np.minimum(av, bv)
    vhi = np.maximum(av, bv)
    i0 = _st_to_ij(_uv_to_st(ulo)) >> shift
    i1 = _st_to_ij(_uv_to_st(uhi)) >> shift
    j0 = _st_to_ij(_uv_to_st(vlo)) >> shift
    j1 = _st_to_ij(_uv_to_st(vhi)) >> shift
    ni = i1 - i0 + 1
    nj = j1 - j0 + 1
    counts = ni * nj
    row = np.repeat(np.arange(seg.size), counts)
    offs = np.arange(counts.sum()) - np.repeat(np.cumsum(counts) - counts, counts)
    ci = i0[row] + offs // nj[row]
    cj = j0[row] + offs % nj[row]
    inv = 1.0 / 1073741824.0
    cu_lo = _st_to_uv(inv * (ci << shift).astype(np.float64))
    cu_hi = _st_to_uv(inv * ((ci + 1) << shift).astype(np.float64))
    cv_lo = _st_to_uv(inv * (cj << shift).astype(np.float64))
    cv_hi = _st_to_uv(inv * ((cj + 1) << shift).astype(np.float64))
    ok, cau, cav, cbu, cbv = clip_edge(
        au[row], av[row], bu[row], bv[row], cu_lo, cu_hi, cv_lo, cv_hi
    )
    # ClipEdge succeeds exactly where IntersectsRect holds (the reference
    # documents them as the same predicate; asserted over 50k random
    # cases in tests/test_faceclip.py) — filter on ok directly.
    return (
        idx[row][ok], face[row][ok], ci[ok], cj[ok],
        cau[ok], cav[ok], cbu[ok], cbv[ok],
    )


def get_face_segments(ax, ay, az, bx, by, bz):
    """GetFaceSegments (s2edge_clipping.cc:206-258), vectorized over a
    batch of edges.  Returns (edge_idx, seg, face, a_u, a_v, b_u, b_v)
    flat arrays; seg is 0-based along each edge's walk order."""
    ax, ay, az = (np.asarray(c, np.float64) for c in (ax, ay, az))
    bx, by, bz = (np.asarray(c, np.float64) for c in (bx, by, bz))
    n = ax.size
    a_face, a_u, a_v = xyz_to_face_uv(ax, ay, az)
    b_face, b_u, b_v = xyz_to_face_uv(bx, by, bz)

    out_idx: list[np.ndarray] = []
    out_seg: list[np.ndarray] = []
    out_face: list[np.ndarray] = []
    out_au: list[np.ndarray] = []
    out_av: list[np.ndarray] = []
    out_bu: list[np.ndarray] = []
    out_bv: list[np.ndarray] = []

    same = a_face == b_face
    if same.any():
        idx = np.nonzero(same)[0]
        out_idx.append(idx)
        out_seg.append(np.zeros(idx.size, np.int64))
        out_face.append(a_face[same])
        out_au.append(a_u[same])
        out_av.append(a_v[same])
        out_bu.append(b_u[same])
        out_bv.append(b_v[same])

    multi = np.nonzero(~same)[0]
    if multi.size:
        axm, aym, azm = ax[multi], ay[multi], az[multi]
        bxm, bym, bzm = bx[multi], by[multi], bz[multi]
        nx, ny, nz = robust_cross_prod(axm, aym, azm, bxm, bym, bzm)
        norm2 = _dot3(nx, ny, nz, nx, ny, nz)
        if not (norm2 > NORM2_MIN).all():
            raise ValueError(
                "face_segments: edge pair below the RobustCrossProd "
                "main-path contract (norm^2 <= NORM2_MIN); filter the "
                "fixture with the same norm2 predicate as the oracle"
            )
        fa, ua, va = move_origin_to_valid_face(
            a_face[multi], axm, aym, azm, nx, ny, nz, a_u[multi], a_v[multi]
        )
        fb, ub, vb = move_origin_to_valid_face(
            b_face[multi], bxm, bym, bzm, -nx, -ny, -nz, b_u[multi], b_v[multi]
        )
        cur_face, cur_u, cur_v = fa, ua, va
        seg_no = np.zeros(multi.size, np.int64)
        for _round in range(MAX_SEGMENTS):
            act = cur_face != fb
            if not act.any():
                break
            f_act = cur_face[act]
            nu, nv, nw = face_xyz_to_uvw(f_act, nx[act], ny[act], nz[act])
            axis = get_exit_axis(nu, nv, nw)
            eu, ev = get_exit_point(nu, nv, nw, axis)
            out_idx.append(multi[act])
            out_seg.append(seg_no[act])
            out_face.append(f_act)
            out_au.append(cur_u[act])
            out_av.append(cur_v[act])
            out_bu.append(eu)
            out_bv.append(ev)
            ex, ey, ez = face_uv_to_xyz(f_act, eu, ev)
            nf = get_next_face(f_act, eu, ev, axis, nu, nv, nw, fb[act])
            nu2, nv2, _ = face_xyz_to_uvw(nf, ex, ey, ez)
            cur_face[act] = nf
            cur_u[act] = nu2
            cur_v[act] = nv2
            seg_no[act] += 1
        if (cur_face != fb).any():
            raise AssertionError(
                "face_segments walk exceeded MAX_SEGMENTS rounds"
            )
        out_idx.append(multi)
        out_seg.append(seg_no)
        out_face.append(fb)
        out_au.append(cur_u)
        out_av.append(cur_v)
        out_bu.append(ub)
        out_bv.append(vb)

    if not out_idx:
        z = np.zeros(0, np.int64)
        zf = np.zeros(0, np.float64)
        return z, z, z, zf, zf, zf, zf
    idx = np.concatenate(out_idx)
    return (
        idx,
        np.concatenate(out_seg),
        np.concatenate(out_face).astype(np.int64),
        np.concatenate(out_au),
        np.concatenate(out_av),
        np.concatenate(out_bu),
        np.concatenate(out_bv),
    )
