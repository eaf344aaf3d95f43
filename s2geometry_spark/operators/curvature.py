"""Geodesic loop curvature — S2::GetCurvature (SURVEY.md §2.7).

Parity target: s2loop_measures.cc:206-244 ``GetCurvature`` — the sum of
turn angles at each vertex (2*pi minus the enclosed area by Gauss-
Bonnet), accumulated with the Kahan compensated summation the reference
uses, over the rotation/reversal-invariant traversal chosen by
``GetCanonicalLoopOrder`` (s2loop_measures.cc:290-330: start at the
lexicographically smallest vertex, walk in the direction of the smaller
vertex sequence).  ``TurnAngle`` is s2measures.cc: angle between the
edge normals ``a x b`` and ``b x c`` signed by ``s2pred::Sign(a, b, c)``.

Bit-exactness contract:

* Every product/sum is evaluated in the SAME order in the Python kernel
  and the DuckDB oracle (the oracle's CTE columns mirror the kernel's
  locals one for one).
* atan2 is the ONE transcendental: the kernel calls SCALAR
  ``math.atan2`` (glibc), which is bit-identical to DuckDB's ``atan2``
  on this host, where NumPy's vectorized arctan2 drifts a last ulp on
  ~2% of inputs (BENCH.md; at production scale the vectorized path is
  the right trade and the result is within GetCurvatureMaxError).
* ``Sign`` uses the triage determinant ``(a x b) . c`` only
  (s2predicates.cc TriageSign); the fixtures are generic-position so
  the exact/symbolic fallbacks of kernels/predicates.py are never
  needed — the kernel asserts no adjacent duplicate vertices, so
  ``PruneDegeneracies`` (s2loop_measures.cc:155) is the identity.

Scale: canonical order + per-vertex turn angles are window/join
expressible (exactly how the oracle computes them); the ordered Kahan
fold is the only sequential step and runs per loop — loops are
bounded-size rows, so the applyInPandas kernel parallelizes across
loops with no shuffle beyond the one groupBy.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_DBL_EPS = 2.220446049250313e-16
_KMAX = 2.0 * math.pi - 4.0 * _DBL_EPS  # kMaxCurvature, s2loop_measures.cc:241
_ERR_PER_VERTEX = 11.25 * _DBL_EPS  # GetCurvatureMaxError, cc:246-266

_SCHEMA = (
    "chain_id long, n_verts long, min_pos long, dir long, "
    "curvature double, max_error double"
)


def _turn_angle(a, b, c) -> float:
    """S2::TurnAngle(a, b, c) (s2measures.cc): the crossing-free path —
    plain cross products (RobustCrossProd's fast case) + triage Sign."""
    ux = a[1] * b[2] - a[2] * b[1]
    uy = a[2] * b[0] - a[0] * b[2]
    uz = a[0] * b[1] - a[1] * b[0]
    vx = b[1] * c[2] - b[2] * c[1]
    vy = b[2] * c[0] - b[0] * c[2]
    vz = b[0] * c[1] - b[1] * c[0]
    wx = uy * vz - uz * vy
    wy = uz * vx - ux * vz
    wz = ux * vy - uy * vx
    angle = math.atan2(
        math.sqrt((wx * wx + wy * wy) + wz * wz), (ux * vx + uy * vy) + uz * vz
    )
    det = (ux * c[0] + uy * c[1]) + uz * c[2]  # TriageSign(a, b, c)
    return angle if det > 0 else -angle


def _curvature_one(V: np.ndarray) -> tuple[int, int, float]:
    """-> (min_pos, dir, curvature) for one loop (rows = seq order)."""
    n = len(V)
    rows = [tuple(r) for r in V]
    for i in range(n):
        if rows[i] == rows[(i + 1) % n]:
            raise ValueError(
                "adjacent duplicate vertex: PruneDegeneracies "
                "(s2loop_measures.cc:155) is assumed identity here"
            )
    i0 = min(range(n), key=lambda i: rows[i])
    d = 1 if rows[(i0 + 1) % n] < rows[(i0 - 1) % n] else -1
    i = i0
    s = _turn_angle(rows[(i + n - d) % n], rows[i], rows[(i + d) % n])
    comp = 0.0
    m = n
    while m > 1:
        m -= 1
        i += d
        ang = _turn_angle(rows[(i - d) % n], rows[i % n], rows[(i + d) % n])
        old = s
        ang = ang + comp
        s = s + ang
        comp = (old - s) + ang
    s = s + comp
    curv = max(-_KMAX, min(_KMAX, d * s))
    return i0, d, curv


def loop_curvature(chains: DataFrame, chain_col: str = "chain_id") -> DataFrame:
    """(chain_id, seq, x, y, z) closed loops -> per-loop curvature row."""

    def per_loop(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq")
        V = pdf[["x", "y", "z"]].to_numpy()
        i0, d, curv = _curvature_one(V)
        n = len(V)
        return pd.DataFrame(
            [
                {
                    "chain_id": int(pdf[chain_col].iloc[0]),
                    "n_verts": n,
                    "min_pos": i0,
                    "dir": d,
                    "curvature": curv,
                    "max_error": _ERR_PER_VERTEX * n,
                }
            ]
        )

    return chains.groupBy(chain_col).applyInPandas(per_loop, _SCHEMA)


def _lit(v: float) -> str:
    return "%.17e" % v


def curvature_oracle_sql(verts_sql: str) -> str:
    """DuckDB replay: canonical order via windows/joins, turn angles as
    CTE columns mirroring the kernel's locals, Kahan fold as a recursive
    CTE carrying (s, comp) with the kernel's exact operation order."""
    return f"""
WITH RECURSIVE vsrc AS MATERIALIZED ({verts_sql}),
v AS MATERIALIZED (
  SELECT chain_id,
         row_number() OVER (PARTITION BY chain_id ORDER BY seq) - 1 AS i,
         x, y, z
  FROM vsrc),
nn AS MATERIALIZED (SELECT chain_id, COUNT(*) AS n FROM v GROUP BY chain_id),
mn AS (
  SELECT chain_id, i AS i0 FROM (
    SELECT chain_id, i,
           row_number() OVER (PARTITION BY chain_id ORDER BY x, y, z, i) AS rn
    FROM v) WHERE rn = 1),
dirs AS MATERIALIZED (
  SELECT m.chain_id, m.i0,
         CASE WHEN (f.x, f.y, f.z) < (b.x, b.y, b.z) THEN 1 ELSE -1 END AS dir
  FROM mn m
  JOIN nn c ON c.chain_id = m.chain_id
  JOIN v f ON f.chain_id = m.chain_id AND f.i = (m.i0 + 1) % c.n
  JOIN v b ON b.chain_id = m.chain_id AND b.i = (m.i0 - 1 + c.n) % c.n),
canon AS MATERIALIZED (
  SELECT v.chain_id,
         CASE WHEN d.dir = 1 THEN (v.i - d.i0 + c.n) % c.n
              ELSE (d.i0 - v.i + c.n) % c.n END AS j,
         v.x, v.y, v.z
  FROM v JOIN dirs d ON d.chain_id = v.chain_id
  JOIN nn c ON c.chain_id = v.chain_id),
trip AS (
  SELECT b.chain_id, b.j,
         a.x AS a0, a.y AS a1, a.z AS a2,
         b.x AS b0, b.y AS b1, b.z AS b2,
         q.x AS c0, q.y AS c1, q.z AS c2
  FROM canon b
  JOIN nn c ON c.chain_id = b.chain_id
  JOIN canon a ON a.chain_id = b.chain_id AND a.j = (b.j - 1 + c.n) % c.n
  JOIN canon q ON q.chain_id = b.chain_id AND q.j = (b.j + 1) % c.n),
uv AS (
  SELECT chain_id, j, c0, c1, c2,
         a1*b2 - a2*b1 AS ux, a2*b0 - a0*b2 AS uy, a0*b1 - a1*b0 AS uz,
         b1*c2 - b2*c1 AS vx, b2*c0 - b0*c2 AS vy, b0*c1 - b1*c0 AS vz
  FROM trip),
w AS (
  SELECT chain_id, j, ux, uy, uz, vx, vy, vz, c0, c1, c2,
         uy*vz - uz*vy AS wx, uz*vx - ux*vz AS wy, ux*vy - uy*vx AS wz
  FROM uv),
turns AS MATERIALIZED (
  SELECT chain_id, j,
         CASE WHEN (ux*c0 + uy*c1) + uz*c2 > 0e0
              THEN atan2(sqrt((wx*wx + wy*wy) + wz*wz), (ux*vx + uy*vy) + uz*vz)
              ELSE -atan2(sqrt((wx*wx + wy*wy) + wz*wz), (ux*vx + uy*vy) + uz*vz)
         END AS ang
  FROM w),
fold AS (
  SELECT chain_id, 0 AS j, ang AS s, 0e0 AS comp FROM turns WHERE j = 0
  UNION ALL
  SELECT f.chain_id, f.j + 1,
         f.s + (t.ang + f.comp),
         (f.s - (f.s + (t.ang + f.comp))) + (t.ang + f.comp)
  FROM fold f JOIN turns t ON t.chain_id = f.chain_id AND t.j = f.j + 1)
SELECT f.chain_id,
       CAST(c.n AS BIGINT) AS n_verts,
       CAST(d.i0 AS BIGINT) AS min_pos,
       CAST(d.dir AS BIGINT) AS dir,
       GREATEST(-{_lit(_KMAX)},
                LEAST({_lit(_KMAX)}, CAST(d.dir AS DOUBLE) * (f.s + f.comp)))
         AS curvature,
       {_lit(_ERR_PER_VERTEX)} * c.n AS max_error
FROM fold f
JOIN nn c ON c.chain_id = f.chain_id AND f.j = c.n - 1
JOIN dirs d ON d.chain_id = f.chain_id
"""
