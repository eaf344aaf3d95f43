"""Pure-SQL S2 cell-id encoder for DuckDB — an independent correctness
oracle for the engine's NumPy encode path.

Generates a SQL query that derives a sphere point from an integer key
(see kernels.geotag.int_triplet_from_key — exact integer arithmetic), then
performs the full XYZ -> face/(u,v) -> (s,t) -> (i,j) -> Hilbert-position
encode entirely in SQL.  Every floating-point step (divide, sqrt, multiply)
is an IEEE correctly-rounded operation written in the same order as the
NumPy kernels, so the resulting biased int64 cell ids match bit-for-bit.

The 8 Hilbert lookup rounds use the 1024-entry table from
kernels.hilbert.LOOKUP_POS embedded as a SQL list literal.
"""

from __future__ import annotations

from .kernels.geotag import sql_xyz_exprs
from .kernels.hilbert import LOOKUP_POS

MAX_LEVEL = 30
_BIAS = 1 << 63
_HALF_BIAS = 1 << 62


def _lookup_list_sql() -> str:
    return "[" + ",".join(str(int(v)) for v in LOOKUP_POS.tolist()) + "]"


def xyz_sql_cte(table: str, key_expr: str, keep_cols: str = "", prefix: str = "") -> str:
    """WITH-clause body ending in CTE ``{prefix}xyz`` holding unit-vector
    columns x,y,z derived from the integer key (bit-identical to
    kernels.geotag.xyz_from_triplet)."""
    xyz = sql_xyz_exprs(key_expr)
    keep = (keep_cols + ", ") if keep_cols else ""
    p = prefix
    return f"""
{p}pts AS (
  SELECT {keep}{xyz["x0"]} AS x0, {xyz["y0"]} AS y0, {xyz["z0"]} AS z0
  FROM {table}
),
{p}xyz0 AS (
  SELECT *, sqrt(CAST(x0*x0 + y0*y0 + z0*z0 AS DOUBLE)) AS nrm FROM {p}pts
),
{p}xyz AS (
  SELECT *, CAST(x0 AS DOUBLE)/nrm AS x, CAST(y0 AS DOUBLE)/nrm AS y,
         CAST(z0 AS DOUBLE)/nrm AS z
  FROM {p}xyz0
)"""


def leaf_from_xyz_cte(src: str = "xyz") -> str:
    """WITH-clause body ending in CTE ``leaf`` (biased int64 ``cell_leaf``
    plus ``src``'s columns), encoding UNIT-VECTOR columns x, y, z of
    ``src`` — the f0..leaf tail of ``leaf_cell_sql_cte`` for callers
    whose points don't come from an integer key (e.g. chain fixtures)."""
    rounds = []
    prev = "f_ij"
    for k in range(7, -1, -1):
        sh = 1 << (4 * k)
        carry = "(face % 2)" if k == 7 else f"(b{k + 1} % 4)"
        rounds.append(
            f"r{k} AS (SELECT *, CAST(lk_t[((i // {sh}) % 16) * 64 + ((j // {sh}) % 16) * 4 "
            f"+ {carry} + 1] AS BIGINT) AS b{k} FROM {prev})"
        )
        prev = f"r{k}"
    pos_terms = " + ".join(f"(b{k} // 4) * {1 << (8 * k)}" for k in range(7, -1, -1))
    return f"""
f0 AS (
  SELECT *, CASE WHEN abs(x) > abs(y)
                 THEN (CASE WHEN abs(x) > abs(z) THEN 0 ELSE 2 END)
                 ELSE (CASE WHEN abs(y) > abs(z) THEN 1 ELSE 2 END) END AS fax
  FROM {src}
),
fuv AS (
  SELECT *, CASE WHEN (CASE fax WHEN 0 THEN x WHEN 1 THEN y ELSE z END) < 0
                 THEN fax + 3 ELSE fax END AS face
  FROM f0
),
uv AS (
  SELECT *,
    CASE face WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z
              WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END AS u,
    CASE face WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z
              WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END AS v
  FROM fuv
),
st AS (
  SELECT *,
    CASE WHEN u >= 0 THEN 0.5 * sqrt(1 + 3*u) ELSE 1 - 0.5 * sqrt(1 - 3*u) END AS s,
    CASE WHEN v >= 0 THEN 0.5 * sqrt(1 + 3*v) ELSE 1 - 0.5 * sqrt(1 - 3*v) END AS t
  FROM uv
),
f_ij AS (
  SELECT *,
    CASE WHEN s > 0 THEN CAST(floor(least(1073741824e0 * s, 1073741823e0)) AS BIGINT) ELSE 0 END AS i,
    CASE WHEN t > 0 THEN CAST(floor(least(1073741824e0 * t, 1073741823e0)) AS BIGINT) ELSE 0 END AS j,
    {_lookup_list_sql()} AS lk_t
  FROM st
),
{",".join(rounds)},
leaf AS MATERIALIZED (
  -- MATERIALIZED stops DuckDB pushing outer predicates through the
  -- Hilbert-round chain (substituting cell_leaf below r0 expands the
  -- expression tree exponentially: each b_k is referenced twice)
  SELECT * EXCLUDE (lk_t),
         2*(face * {1 << 60} + {pos_terms} - {_HALF_BIAS}) + 1 AS cell_leaf
  FROM r0
)"""


def leaf_from_face_ij_cte(src: str) -> str:
    """WITH-clause body ending in CTE ``leaf`` (biased int64
    ``cell_leaf`` plus ``src``'s columns), encoding INTEGER columns
    face, i, j of ``src`` — FromFaceIJ (s2cell_id.cc:267-307) alone,
    for callers whose (face, i, j) do not come from a point decode
    (e.g. ShrinkToFit's clamped ij minima)."""
    rounds = []
    prev = "f_ij"
    for k in range(7, -1, -1):
        sh = 1 << (4 * k)
        carry = "(face % 2)" if k == 7 else f"(b{k + 1} % 4)"
        rounds.append(
            f"r{k} AS (SELECT *, CAST(lk_t[((i // {sh}) % 16) * 64 + ((j // {sh}) % 16) * 4 "
            f"+ {carry} + 1] AS BIGINT) AS b{k} FROM {prev})"
        )
        prev = f"r{k}"
    pos_terms = " + ".join(f"(b{k} // 4) * {1 << (8 * k)}" for k in range(7, -1, -1))
    return f"""
f_ij AS (SELECT *, {_lookup_list_sql()} AS lk_t FROM {src}),
{",".join(rounds)},
leaf AS MATERIALIZED (
  SELECT * EXCLUDE (lk_t),
         2*(face * {1 << 60} + {pos_terms} - {_HALF_BIAS}) + 1 AS cell_leaf
  FROM r0
)"""


def leaf_cell_sql_cte(table: str, key_expr: str, keep_cols: str = "") -> str:
    """Return a WITH-clause body ending in CTE ``leaf`` with column
    ``cell_leaf`` (biased int64 leaf cell id) alongside ``keep_cols``.

    Compose as: ``f"WITH {leaf_cell_sql_cte(...)} SELECT ... FROM leaf"``.
    """
    return xyz_sql_cte(table, key_expr, keep_cols) + ",\n" + leaf_from_xyz_cte("xyz")


def convex_loop_predicate_sql(vertices) -> str:
    """Containment predicate for a CCW *convex* spherical loop: the point is
    inside iff it is strictly left of every edge's great circle.  Edge
    normals are precomputed doubles; independent of (and therefore a strong
    cross-check for) the engine's crossing-parity kernel."""
    import numpy as np

    v = np.asarray(vertices, float)
    m = v.shape[0]
    terms = []
    for i in range(m):
        c = np.cross(v[i], v[(i + 1) % m])
        terms.append(f"({float(c[0])!r}*x + {float(c[1])!r}*y + {float(c[2])!r}*z > 0)")
    return "(" + " AND ".join(terms) + ")"


def cap_predicate_sql(center, radius_chord2: float) -> str:
    """chord^2 cap containment — same pinned association order as
    functions.chord2_expr, so bit-identical to the engine path."""
    cx, cy, cz = (float(c) for c in center)
    return (
        f"(((x - {cx!r})*(x - {cx!r}) + (y - {cy!r})*(y - {cy!r}))"
        f" + (z - {cz!r})*(z - {cz!r}) <= {float(radius_chord2)!r})"
    )


def rect_predicate_sql(rect) -> str:
    """S2LatLngRect containment over unit (x, y, z) WITHOUT atan2 (libm
    atan2 is not vetted bit-portable across engines): latitude via the
    monotone z = sin(lat) bounds, longitude via the two meridian
    half-plane signs — valid for longitude spans <= pi (and trivially for
    full longitude).  Constants are computed once driver-side so engine
    and oracle compare against the identical doubles."""
    import math

    parts = [f"z >= {math.sin(rect.lat.lo)!r}", f"z <= {math.sin(rect.lat.hi)!r}"]
    if not rect.lng.is_full():
        if rect.lng.get_length() > math.pi:
            raise ValueError("rect_predicate_sql: lng span > pi unsupported")
        lo, hi = rect.lng.lo, rect.lng.hi
        parts.append(f"(y * {math.cos(lo)!r} - x * {math.sin(lo)!r}) >= 0.0")
        parts.append(f"(x * {math.sin(hi)!r} - y * {math.cos(hi)!r}) >= 0.0")
    return "(" + " AND ".join(parts) + ")"


def token_sql_expr(cell_expr: str) -> str:
    """ToToken (s2cell_id.cc:217-254) of a biased int64 cell id in DuckDB
    SQL: unbias to uint64 via HUGEINT, 16-digit lower hex, strip trailing
    zeros (ids are never 0, so the token is never empty)."""
    un = f"CAST(CAST({cell_expr} AS HUGEINT) + {_BIAS} AS UBIGINT)"
    return f"rtrim(lpad(lower(hex({un})), 16, '0'), '0')"


def parent_sql_expr(cell_expr: str, level: int) -> str:
    """parent(level) of a biased leaf id — integer SQL, mirrors
    functions.parent_expr."""
    lsb = 1 << (2 * (MAX_LEVEL - level))
    m = 2 * lsb
    # non-negative mod of the (possibly negative) biased id
    return f"({cell_expr}) - ((({cell_expr}) % {m}) + {m}) % {m} + {lsb}"


def _lookup_ij_list_sql() -> str:
    from .kernels.hilbert import LOOKUP_IJ

    return "[" + ",".join(str(int(v)) for v in LOOKUP_IJ.tolist()) + "]"


def cell_center_xyz_cte(
    src: str, cell_col: str, level: int, out_name: str = "ctr", prefix: str = "d_"
) -> str:
    """CTE chain DECODING a biased cell-id column (constant ``level`` <
    30) to its center unit vector — the inverse of ``leaf_cell_sql_cte``,
    mirroring cellid.to_point bit-for-bit (inverse Hilbert via the
    LOOKUP_IJ table, GetCenterSiTi's delta, quadratic STtoUV,
    FaceUVtoXYZ, normalize; every float op in the NumPy kernels' order).

    Appends columns ``cx, cy, cz`` to ``src``'s columns in the CTE named
    ``out_name``.  Every round is MATERIALIZED: each lookup value v_k is
    referenced three times downstream (i-nibble, j-nibble, carry), so
    inlining would expand the expression tree 3^8-fold.
    """
    if level >= MAX_LEVEL:
        raise ValueError("decode CTE supports non-leaf levels only")
    p = prefix
    ij_t = _lookup_ij_list_sql()
    parts = [
        f"{p}h0 AS MATERIALIZED (\n"
        f"  SELECT *, CAST({cell_col} AS HUGEINT) + {_BIAS} AS craw FROM {src}\n"
        f"),",
        f"{p}r8 AS MATERIALIZED (\n"
        f"  SELECT *, CAST(craw // {1 << 61} AS BIGINT) AS dface FROM {p}h0\n"
        f"),",
    ]
    prev = f"{p}r8"
    for k in range(7, -1, -1):
        nbits = (MAX_LEVEL - 7 * 4) if k == 7 else 4
        mask = 1 << (2 * nbits)
        shift = 1 << (k * 8 + 1)
        carry = "(dface % 2)" if k == 7 else f"(v{k + 1} % 4)"
        parts.append(
            f"{p}r{k} AS MATERIALIZED (\n"
            f"  SELECT *, CAST({ij_t}[{carry} + CAST((craw // {shift}) % {mask} AS BIGINT) * 4 + 1] AS BIGINT) AS v{k}\n"
            f"  FROM {prev}\n"
            f"),"
        )
        prev = f"{p}r{k}"
    i_sum = " + ".join(f"(v{k} // 64) * {1 << (4 * k)}" for k in range(7, -1, -1))
    j_sum = " + ".join(f"((v{k} // 4) % 16) * {1 << (4 * k)}" for k in range(7, -1, -1))
    inv_max_si_ti = repr(1.0 / 2147483648.0)
    third = repr(1.0 / 3.0)
    parts.append(
        f"{p}ij AS MATERIALIZED (\n"
        f"  SELECT *, {i_sum} AS di, {j_sum} AS dj FROM {prev}\n"
        f"),",
    )
    parts.append(
        f"{p}dl AS MATERIALIZED (\n"
        f"  SELECT *, CASE WHEN (di % 2) != CAST((craw // 4) % 2 AS BIGINT)\n"
        f"                 THEN 2 ELSE 0 END AS ddelta\n"
        f"  FROM {p}ij\n"
        f"),",
    )
    parts.append(
        f"{p}st AS MATERIALIZED (\n"
        f"  SELECT *, {inv_max_si_ti} * CAST(2*di + ddelta AS DOUBLE) AS ds,\n"
        f"            {inv_max_si_ti} * CAST(2*dj + ddelta AS DOUBLE) AS dt\n"
        f"  FROM {p}dl\n"
        f"),",
    )
    parts.append(
        f"{p}uv AS MATERIALIZED (\n"
        f"  SELECT *,\n"
        f"    CASE WHEN ds >= 0.5 THEN {third} * (4*ds*ds - 1)\n"
        f"         ELSE {third} * (1 - (4*(1-ds))*(1-ds)) END AS du,\n"
        f"    CASE WHEN dt >= 0.5 THEN {third} * (4*dt*dt - 1)\n"
        f"         ELSE {third} * (1 - (4*(1-dt))*(1-dt)) END AS dv\n"
        f"  FROM {p}st\n"
        f"),",
    )
    parts.append(
        f"{p}x0 AS MATERIALIZED (\n"
        f"  SELECT *,\n"
        f"    CASE dface WHEN 0 THEN 1.0 WHEN 1 THEN -du WHEN 2 THEN -du\n"
        f"               WHEN 3 THEN -1.0 WHEN 4 THEN dv ELSE dv END AS rx,\n"
        f"    CASE dface WHEN 0 THEN du WHEN 1 THEN 1.0 WHEN 2 THEN -dv\n"
        f"               WHEN 3 THEN -dv WHEN 4 THEN -1.0 ELSE du END AS ry,\n"
        f"    CASE dface WHEN 0 THEN dv WHEN 1 THEN dv WHEN 2 THEN 1.0\n"
        f"               WHEN 3 THEN -du WHEN 4 THEN -du ELSE -1.0 END AS rz\n"
        f"  FROM {p}uv\n"
        f"),",
    )
    parts.append(
        f"{out_name} AS MATERIALIZED (\n"
        f"  SELECT * EXCLUDE (craw, dface, {', '.join(f'v{k}' for k in range(8))},\n"
        f"                    di, dj, ddelta, ds, dt, du, dv, rx, ry, rz),\n"
        f"         rx / sqrt(((rx*rx) + (ry*ry)) + (rz*rz)) AS cx,\n"
        f"         ry / sqrt(((rx*rx) + (ry*ry)) + (rz*rz)) AS cy,\n"
        f"         rz / sqrt(((rx*rx) + (ry*ry)) + (rz*rz)) AS cz\n"
        f"  FROM {p}x0\n"
        f")",
    )
    return "\n".join(parts)
