"""Spherical measures + edge-distance kernels (vectorized NumPy).

Re-implements (from the published formulas, not the reference source):
  * loop measures — GetArea / GetSignedArea / GetPerimeter / GetCentroid
    (s2loop_measures.h:44-114, s2measures.cc): signed area via the
    spherical-excess sum of triangle areas from an anchor vertex, each by
    Girard/L'Huilier; centroid via the triangle-centroid sum.
  * cell areas — AverageArea (4pi/6/4^level, s2cell.cc:120-158) and the
    per-cell approximation.
  * edge distances — S2::GetDistance / Project / Interpolate
    (s2edge_distances.h:50-145): point-to-geodesic-segment distance with
    the interior-projection test, closest-point projection, and slerp
    interpolation — all over (n,3) arrays.
"""

from __future__ import annotations

import numpy as np

FOUR_PI = 4.0 * np.pi


# ---------- triangle / loop measures ----------


def _triangle_area(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Signed spherical triangle area via the Girard-stable atan2 form
    (Eriksson): tan(E/2) = a.(bxc) / (1 + a.b + b.c + c.a).  Vectorized
    over leading dimensions; sign = orientation of (a,b,c)."""
    triple = np.einsum("...i,...i->...", a, np.cross(b, c))
    denom = (
        1.0
        + np.einsum("...i,...i->...", a, b)
        + np.einsum("...i,...i->...", b, c)
        + np.einsum("...i,...i->...", c, a)
    )
    return 2.0 * np.arctan2(triple, denom)


def loop_signed_area(vertices: np.ndarray) -> float:
    """GetSignedArea: CCW loops (interior on the left) get positive area,
    in (-2pi, 2pi) ... (4pi-area for inverted loops is applied by
    loop_area)."""
    v = np.asarray(vertices, np.float64)
    m = v.shape[0]
    if m < 3:
        return 0.0
    a = v[0]
    b = v[1:-1]
    c = v[2:]
    return float(np.sum(_triangle_area(np.broadcast_to(a, b.shape), b, c)))


def loop_area(vertices: np.ndarray, origin_inside: bool | None = None) -> float:
    """GetArea: area of the loop INTERIOR in [0, 4pi].

    The fan sum gives the signed area of the region left of the boundary;
    a negative sum means the "interior" (as oriented) is the complement.
    """
    s = loop_signed_area(vertices)
    return s if s >= 0 else FOUR_PI + s


def loop_perimeter(vertices: np.ndarray) -> float:
    v = np.asarray(vertices, np.float64)
    nxt = np.roll(v, -1, axis=0)
    dots = np.clip(np.einsum("ij,ij->i", v, nxt), -1.0, 1.0)
    return float(np.arccos(dots).sum())


def loop_centroid(vertices: np.ndarray) -> np.ndarray:
    """GetCentroid (times interior area) — the true (non-normalized)
    integral of position over the interior, as the sum of triangle
    centroids: for spherical triangle (a,b,c) the centroid integral is
    0.5 * sum over edges of (theta_e / sin theta_e) * (u x n_e)... we use
    the standard cross-product form from s2centroids.cc:TrueCentroid."""
    v = np.asarray(vertices, np.float64)
    m = v.shape[0]
    out = np.zeros(3)
    for k in range(1, m - 1):
        out += _true_centroid_triangle(v[0], v[k], v[k + 1])
    return out


def _true_centroid_triangle(a, b, c) -> np.ndarray:
    """S2::TrueCentroid(a,b,c): integral of unit position over the
    triangle (vector norm < triangle area)."""
    angle_a = _triangle_solid_angle_edge(b, c)
    angle_b = _triangle_solid_angle_edge(c, a)
    angle_c = _triangle_solid_angle_edge(a, b)
    return 0.5 * (angle_a + angle_b + angle_c)


def _triangle_solid_angle_edge(p, q) -> np.ndarray:
    """Per-edge term: (theta / sin theta) * 0.5 * (p x q) with the
    theta->0 limit handled."""
    x = np.cross(p, q)
    sin_t = np.linalg.norm(x)
    cos_t = float(np.dot(p, q))
    theta = np.arctan2(sin_t, cos_t)
    if sin_t < 1e-15:
        return x  # theta/sin(theta) -> 1
    return x * (theta / sin_t)


# ---------- cell areas ----------


def cell_average_area(level) -> np.ndarray:
    """S2Cell::AverageArea(level) = 4pi / (6 * 4^level)."""
    lvl = np.asarray(level, np.int64)
    return FOUR_PI / (6.0 * np.power(4.0, lvl.astype(np.float64)))


def cell_union_average_area(ids: np.ndarray) -> float:
    """S2CellUnion::AverageBasedArea = AverageArea(leaf) * LeafCellsCovered."""
    from . import cellunion

    leaf_area = FOUR_PI / (6.0 * 4.0**30)
    return float(leaf_area * cellunion.leaf_cells_covered(np.asarray(ids, np.uint64)))


# ---------- edge distances (point to geodesic segment) ----------


def _robust_cross(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.cross(a - b, a + b)  # RobustCrossProd main path


def project_to_edge(
    x: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """S2::Project(x, a, b): closest point on segment AB to each x.

    x: (n,3); a,b: (3,) one edge (broadcast edge).  Returns (n,3) unit.
    """
    x = np.atleast_2d(np.asarray(x, np.float64))
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    n = _robust_cross(a, b)
    n = n / np.linalg.norm(n)
    # projection of x onto the great circle of AB
    p = x - np.outer(x @ n, n)
    pn = np.linalg.norm(p, axis=1)
    ok = pn > 0
    p[ok] = p[ok] / pn[ok][:, None]
    # interior test: closest-great-circle point is interior to the arc iff
    # it is on the AB side of both perpendicular planes at A and B
    na = np.cross(n, a)
    nb = np.cross(b, n)
    interior = (p @ na > 0) & (p @ nb > 0) & ok
    # endpoints fallback: nearer of a, b by chord
    da = ((x - a) ** 2).sum(axis=1)
    db = ((x - b) ** 2).sum(axis=1)
    endpoint = np.where(da[:, None] <= db[:, None], a, b)
    return np.where(interior[:, None], p, endpoint)


def distance_to_edge(
    x: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """S2::GetDistance(x, a, b) as an angle (radians), vectorized over x."""
    x = np.atleast_2d(np.asarray(x, np.float64))
    closest = project_to_edge(x, a, b)
    dots = np.clip(np.einsum("ij,ij->i", x, closest), -1.0, 1.0)
    return np.arccos(dots)


def point_edge_chord2(
    X: np.ndarray, A: np.ndarray, B: np.ndarray
) -> np.ndarray:
    """Squared chord distance from point X[i] to geodesic segment A[i]B[i],
    row-wise, with PINNED operation order so a DuckDB oracle evaluating
    `point_edge_chord2_sql` reproduces every double bit-for-bit.

    Semantics are S2::UpdateMinDistance (s2edge_distances.cc): if the
    great-circle projection of x falls in the arc interior, the distance
    is to the circle (sin = |x.n| / |n|, n = a x b unnormalized); else to
    the nearer endpoint.  Valid for arcs < pi (the operator's contract);
    a degenerate edge (n ~ 0) falls through to the endpoint branch
    because the strict interior tests fail.
    """
    X = np.asarray(X, np.float64)
    A = np.asarray(A, np.float64)
    B = np.asarray(B, np.float64)
    ax, ay, az = A[:, 0], A[:, 1], A[:, 2]
    bx, by, bz = B[:, 0], B[:, 1], B[:, 2]
    xx, xy, xz = X[:, 0], X[:, 1], X[:, 2]
    # n = a x b (component order pinned)
    nx = ay * bz - az * by
    ny = az * bx - ax * bz
    nz = ax * by - ay * bx
    # na = n x a, nb = b x n
    nax = ny * az - nz * ay
    nay = nz * ax - nx * az
    naz = nx * ay - ny * ax
    nbx = by * nz - bz * ny
    nby = bz * nx - bx * nz
    nbz = bx * ny - by * nx
    d_na = (xx * nax + xy * nay) + xz * naz
    d_nb = (xx * nbx + xy * nby) + xz * nbz
    interior = (d_na > 0) & (d_nb > 0)
    xn = (xx * nx + xy * ny) + xz * nz
    nn = (nx * nx + ny * ny) + nz * nz
    with np.errstate(divide="ignore", invalid="ignore"):
        s2 = (xn * xn) / nn
        chord2_int = 2.0 - 2.0 * np.sqrt(np.maximum(0.0, 1.0 - s2))
    da = ((xx - ax) * (xx - ax) + (xy - ay) * (xy - ay)) + (xz - az) * (xz - az)
    db = ((xx - bx) * (xx - bx) + (xy - by) * (xy - by)) + (xz - bz) * (xz - bz)
    chord2_end = np.minimum(da, db)
    return np.where(interior, chord2_int, chord2_end)


def point_edge_max_chord2(
    X: np.ndarray, A: np.ndarray, B: np.ndarray
) -> np.ndarray:
    """Squared chord of the MAX distance from X[i] to segment A[i]B[i] —
    the reference's identity (s2edge_distances.cc UpdateMaxDistance):
    max d(x, e) = pi - min d(-x, e), i.e. chord2_max = 4 - chord2_min(-x).
    """
    return 4.0 - point_edge_chord2(-np.asarray(X, np.float64), A, B)


def point_edge_chord2_sql(x: str, a: str, b: str) -> str:
    """DuckDB expression mirroring point_edge_chord2 exactly; `x`, `a`,
    `b` are column-name PREFIXES, each expanded to <p>x, <p>y, <p>z."""
    ax, ay, az = f"{a}x", f"{a}y", f"{a}z"
    bx, by, bz = f"{b}x", f"{b}y", f"{b}z"
    xx, xy, xz = f"{x}x", f"{x}y", f"{x}z"
    nx = f"({ay}*{bz} - {az}*{by})"
    ny = f"({az}*{bx} - {ax}*{bz})"
    nz = f"({ax}*{by} - {ay}*{bx})"
    nax = f"({ny}*{az} - {nz}*{ay})"
    nay = f"({nz}*{ax} - {nx}*{az})"
    naz = f"({nx}*{ay} - {ny}*{ax})"
    nbx = f"({by}*{nz} - {bz}*{ny})"
    nby = f"({bz}*{nx} - {bx}*{nz})"
    nbz = f"({bx}*{ny} - {by}*{nx})"
    d_na = f"(({xx}*{nax} + {xy}*{nay}) + {xz}*{naz})"
    d_nb = f"(({xx}*{nbx} + {xy}*{nby}) + {xz}*{nbz})"
    xn = f"(({xx}*{nx} + {xy}*{ny}) + {xz}*{nz})"
    nn = f"(({nx}*{nx} + {ny}*{ny}) + {nz}*{nz})"
    s2 = f"(({xn}*{xn}) / {nn})"
    chord2_int = f"(2.0 - 2.0 * sqrt(greatest(0.0, 1.0 - {s2})))"
    da = (
        f"((({xx}-{ax})*({xx}-{ax}) + ({xy}-{ay})*({xy}-{ay}))"
        f" + ({xz}-{az})*({xz}-{az}))"
    )
    db = (
        f"((({xx}-{bx})*({xx}-{bx}) + ({xy}-{by})*({xy}-{by}))"
        f" + ({xz}-{bz})*({xz}-{bz}))"
    )
    return (
        f"(CASE WHEN {d_na} > 0 AND {d_nb} > 0 THEN {chord2_int}"
        f" ELSE least({da}, {db}) END)"
    )


def interpolate(a: np.ndarray, b: np.ndarray, t) -> np.ndarray:
    """S2::Interpolate(a, b, t): slerp along the geodesic, t in [0,1]
    (extrapolates outside).  t may be scalar or (n,)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    t = np.atleast_1d(np.asarray(t, np.float64))
    cos_ab = float(np.clip(np.dot(a, b), -1.0, 1.0))
    ab = np.arccos(cos_ab)
    if ab < 1e-15:
        return np.broadcast_to(a, (t.size, 3)).copy()
    sin_ab = np.sin(ab)
    if sin_ab < 1e-15:
        # near-antipodal endpoints: the geodesic is ill-defined (any great
        # circle through a works); pick the one through a deterministic
        # orthogonal direction, mirroring the reference's robust-ortho
        # behaviour (s2edge_distances.cc Interpolate -> S2::Ortho).
        ref = np.zeros(3)
        ref[int(np.argmin(np.abs(a)))] = 1.0
        m = np.cross(a, ref)
        m /= np.linalg.norm(m)
        ang = t * ab
        out = np.cos(ang)[:, None] * a + np.sin(ang)[:, None] * m
        return out / np.linalg.norm(out, axis=1)[:, None]
    wa = np.sin((1.0 - t) * ab) / sin_ab
    wb = np.sin(t * ab) / sin_ab
    out = wa[:, None] * a + wb[:, None] * b
    return out / np.linalg.norm(out, axis=1)[:, None]


def polyline_length(vertices: np.ndarray) -> float:
    """S2Polyline::GetLength: sum of edge angles (open chain)."""
    v = np.asarray(vertices, np.float64)
    if v.shape[0] < 2:
        return 0.0
    dots = np.clip(np.einsum("ij,ij->i", v[:-1], v[1:]), -1.0, 1.0)
    return float(np.arccos(dots).sum())


def polyline_interpolate(vertices: np.ndarray, fraction: float) -> np.ndarray:
    """S2Polyline::Interpolate: the point at `fraction` of total length."""
    v = np.asarray(vertices, np.float64)
    total = polyline_length(v)
    if total == 0.0 or fraction <= 0.0:
        return v[0]
    if fraction >= 1.0:
        return v[-1]
    target = fraction * total
    acc = 0.0
    for i in range(v.shape[0] - 1):
        seg = float(np.arccos(np.clip(np.dot(v[i], v[i + 1]), -1, 1)))
        if acc + seg >= target and seg > 0:
            return interpolate(v[i], v[i + 1], (target - acc) / seg)[0]
        acc += seg
    return v[-1]


def polyline_project(x: np.ndarray, vertices: np.ndarray) -> tuple[np.ndarray, int]:
    """S2Polyline::Project: closest point on the chain + edge index."""
    v = np.asarray(vertices, np.float64)
    best_d = np.inf
    best_p = v[0]
    best_i = 0
    x2 = np.atleast_2d(np.asarray(x, np.float64))
    for i in range(v.shape[0] - 1):
        d = float(distance_to_edge(x2, v[i], v[i + 1])[0])
        if d < best_d:
            best_d = d
            best_p = project_to_edge(x2, v[i], v[i + 1])[0]
            best_i = i
    return best_p, best_i


def project_to_edge_pinned(
    X: np.ndarray, A: np.ndarray, B: np.ndarray
) -> np.ndarray:
    """S2::Project(x, a, b) (s2edge_distances.cc) row-wise with PINNED
    operation order, the projection twin of point_edge_chord2: if the
    great-circle projection of x falls in the arc interior, return it
    normalized; else return the chord-nearer endpoint.  The interior
    test reuses the chord2 kernel's exact d_na/d_nb expressions, so the
    branch taken here always matches the branch that produced the
    reported distance.  `project_to_edge_sql_ctes` replays every double
    bit-for-bit in DuckDB.
    """
    X = np.asarray(X, np.float64)
    A = np.asarray(A, np.float64)
    B = np.asarray(B, np.float64)
    ax, ay, az = A[:, 0], A[:, 1], A[:, 2]
    bx, by, bz = B[:, 0], B[:, 1], B[:, 2]
    xx, xy, xz = X[:, 0], X[:, 1], X[:, 2]
    nx = ay * bz - az * by
    ny = az * bx - ax * bz
    nz = ax * by - ay * bx
    nax = ny * az - nz * ay
    nay = nz * ax - nx * az
    naz = nx * ay - ny * ax
    nbx = by * nz - bz * ny
    nby = bz * nx - bx * nz
    nbz = bx * ny - by * nx
    d_na = (xx * nax + xy * nay) + xz * naz
    d_nb = (xx * nbx + xy * nby) + xz * nbz
    interior = (d_na > 0) & (d_nb > 0)
    xn = (xx * nx + xy * ny) + xz * nz
    nn = (nx * nx + ny * ny) + nz * nz
    with np.errstate(divide="ignore", invalid="ignore"):
        kk = xn / nn
        p0x = xx - kk * nx
        p0y = xy - kk * ny
        p0z = xz - kk * nz
        pn = np.sqrt((p0x * p0x + p0y * p0y) + p0z * p0z)
        ipx = p0x / pn
        ipy = p0y / pn
        ipz = p0z / pn
    da = ((xx - ax) * (xx - ax) + (xy - ay) * (xy - ay)) + (xz - az) * (xz - az)
    db = ((xx - bx) * (xx - bx) + (xy - by) * (xy - by)) + (xz - bz) * (xz - bz)
    near_a = da <= db
    px = np.where(interior, ipx, np.where(near_a, ax, bx))
    py = np.where(interior, ipy, np.where(near_a, ay, by))
    pz = np.where(interior, ipz, np.where(near_a, az, bz))
    return np.stack([px, py, pz], axis=1)


def project_to_edge_sql_ctes(
    src: str, keep: str = "qid, eid, dist_chord2, qx, qy, qz"
) -> str:
    """DuckDB CTE chain replaying project_to_edge_pinned over a source
    relation `src` with columns (qx..qz unit query point, e0x..e1z unit
    edge endpoints, plus any pass-through id columns).  ``keep`` lists
    every column to carry through — it MUST include qx, qy, qz (the
    kernel reads them and downstream CASEs may too).  Intermediates are
    pinned in MATERIALIZED CTEs (a single giant inlined expression can
    perturb the last ulp of multiply-add chains).  Final CTE `prj_out`
    yields (``keep``, px, py, pz)."""
    return f"""prj_n AS MATERIALIZED (
  SELECT {keep},
         e0x, e0y, e0z, e1x, e1y, e1z,
         (e0y*e1z - e0z*e1y) AS nx,
         (e0z*e1x - e0x*e1z) AS ny,
         (e0x*e1y - e0y*e1x) AS nz
  FROM {src}
),
prj_d AS MATERIALIZED (
  SELECT *,
         ((qx*(ny*e0z - nz*e0y) + qy*(nz*e0x - nx*e0z)) + qz*(nx*e0y - ny*e0x))
           AS d_na,
         ((qx*(e1y*nz - e1z*ny) + qy*(e1z*nx - e1x*nz)) + qz*(e1x*ny - e1y*nx))
           AS d_nb,
         ((qx*nx + qy*ny) + qz*nz) AS xn,
         ((nx*nx + ny*ny) + nz*nz) AS nn
  FROM prj_n
),
prj_p0 AS MATERIALIZED (
  SELECT *,
         (qx - (xn / nn) * nx) AS p0x,
         (qy - (xn / nn) * ny) AS p0y,
         (qz - (xn / nn) * nz) AS p0z
  FROM prj_d
),
prj_pn AS MATERIALIZED (
  SELECT *, sqrt((p0x*p0x + p0y*p0y) + p0z*p0z) AS pn,
         (((qx-e0x)*(qx-e0x) + (qy-e0y)*(qy-e0y)) + (qz-e0z)*(qz-e0z)) AS da,
         (((qx-e1x)*(qx-e1x) + (qy-e1y)*(qy-e1y)) + (qz-e1z)*(qz-e1z)) AS db
  FROM prj_p0
),
prj_out AS MATERIALIZED (
  SELECT {keep},
    CASE WHEN d_na > 0 AND d_nb > 0 THEN p0x / pn
         WHEN da <= db THEN e0x ELSE e1x END AS px,
    CASE WHEN d_na > 0 AND d_nb > 0 THEN p0y / pn
         WHEN da <= db THEN e0y ELSE e1y END AS py,
    CASE WHEN d_na > 0 AND d_nb > 0 THEN p0z / pn
         WHEN da <= db THEN e0z ELSE e1z END AS pz
  FROM prj_pn
)"""
