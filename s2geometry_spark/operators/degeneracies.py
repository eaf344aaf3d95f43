"""Distributed FindPolygonDegeneracies
(s2builderutil_find_polygon_degeneracies.h:44-79).

One polygon graph per family: the star-ordered boundary loop plus
planted degeneracies (degenerate edges at isolated vertices, sibling
pairs as isolated 2-vertex segments).  The per-family kernel is the
faithful reference algorithm (kernels/degeneracies.py: component BFS,
CrossingParity, S2ContainsVertexQuery, EdgeOrVertexCrossing sign
propagation — all robust predicates); families are independent and
small, so one ``applyInPandas`` group per polygon carries the
parallelism at scale, exactly like operators/nesting.py.

The oracle is deliberately an INDEPENDENT decision procedure rather
than a replay: for degeneracies isolated from the non-degenerate
boundary (the fixture contract — the reference REQUIRES degeneracies
not to coincide with the boundary, .h:37-43), is_hole is equivalent to
point-in-polygon containment of the degeneracy's representative vertex.
The oracle computes that containment as banded crossing parity along
the geodesic from the family's antipodal center -c (a point GUARANTEED
outside the star loop, making the parity absolute rather than
south-pole-relative) — so a bug in either the reference algorithm port
or the parity chain shows up as a mismatch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["polygon_degeneracies", "polygon_degeneracies_oracle_sql"]


def polygon_degeneracies(rows: DataFrame) -> DataFrame:
    """Input rows: (family_id, role, deg_id, slot, seq, x, y, z) where
    role 0 = boundary vertex (ordered by seq), role 1 = planted
    degeneracy vertex (deg_id >= 0; slot 0, plus slot 1 for a sibling
    pair).  Output: (family_id, deg_id, n_deg_edges, is_hole)."""
    from s2geometry_spark.kernels.degeneracies import find_polygon_degeneracies

    def one_family(pdf: pd.DataFrame) -> pd.DataFrame:
        fam = int(pdf["family_id"].iloc[0])
        b = pdf[pdf["role"] == 0].sort_values("seq")
        V = [b[["x", "y", "z"]].to_numpy(np.float64)]
        n = len(b)
        edges: list[tuple[int, int]] = [(i, (i + 1) % n) for i in range(n)]
        edge_to_deg: dict[int, int] = {}
        nxt = n
        p = pdf[pdf["role"] == 1].sort_values(["deg_id", "slot"])
        for deg_id, grp in p.groupby("deg_id", sort=True):
            pts = grp[["x", "y", "z"]].to_numpy(np.float64)
            V.append(pts)
            if len(pts) == 1:
                edge_to_deg[len(edges)] = int(deg_id)
                edges.append((nxt, nxt))
                nxt += 1
            else:
                edge_to_deg[len(edges)] = int(deg_id)
                edges.append((nxt, nxt + 1))
                edge_to_deg[len(edges)] = int(deg_id)
                edges.append((nxt + 1, nxt))
                nxt += 2
        verts = np.concatenate(V, axis=0)
        found = find_polygon_degeneracies(verts, edges)
        agg: dict[int, list[bool]] = {}
        for e, is_hole in found:
            if e not in edge_to_deg:
                raise AssertionError(
                    f"boundary edge {e} classified degenerate: fixture "
                    "contract violated (degeneracy coincides with boundary)"
                )
            agg.setdefault(edge_to_deg[e], []).append(is_hole)
        rows_out = []
        for deg_id, flags in sorted(agg.items()):
            if len(set(flags)) != 1:
                raise AssertionError(
                    f"inconsistent is_hole within degeneracy {deg_id}"
                )
            rows_out.append((fam, deg_id, len(flags), flags[0]))
        return pd.DataFrame(
            rows_out, columns=["family_id", "deg_id", "n_deg_edges", "is_hole"]
        )

    return rows.groupBy("family_id").applyInPandas(
        one_family,
        "family_id long, deg_id long, n_deg_edges long, is_hole boolean",
    )


def polygon_degeneracies_oracle_sql(
    boundary_sql: str, planted_sql: str
) -> str:
    """DuckDB oracle over a boundary source (family_id, seq, x, y, z)
    and a planted source (family_id, deg_id, slot, x, y, z): is_hole =
    banded crossing parity of the geodesic (-center -> slot-0 vertex)
    against the family's boundary edges; n_deg_edges = slots (1 for a
    degenerate edge, 2 for a sibling pair)."""
    from s2geometry_spark.operators.polygon_distance import _cross_pred_sql

    return f"""
WITH dsrc AS MATERIALIZED ({boundary_sql}),
dverts AS MATERIALIZED (
  SELECT family_id,
         row_number() OVER (PARTITION BY family_id ORDER BY seq) - 1 AS vi,
         x, y, z
  FROM dsrc
),
dcnt AS MATERIALIZED (
  SELECT family_id, count(*) AS n FROM dverts GROUP BY family_id
),
dedges AS MATERIALIZED (
  SELECT v0.family_id,
         v0.x AS p0x, v0.y AS p0y, v0.z AS p0z,
         v1.x AS p1x, v1.y AS p1y, v1.z AS p1z
  FROM dverts v0
  JOIN dcnt c ON c.family_id = v0.family_id
  JOIN dverts v1 ON v1.family_id = v0.family_id
              AND v1.vi = (v0.vi + 1) % c.n
),
dbox AS MATERIALIZED (
  SELECT family_id,
         (min(x) + max(x)) * 0.5 AS m0,
         (min(y) + max(y)) * 0.5 AS m1,
         (min(z) + max(z)) * 0.5 AS m2
  FROM dsrc GROUP BY family_id
),
dc AS MATERIALIZED (
  SELECT family_id,
         m0 / sqrt((m0*m0 + m1*m1) + m2*m2) AS c0,
         m1 / sqrt((m0*m0 + m1*m1) + m2*m2) AS c1,
         m2 / sqrt((m0*m0 + m1*m1) + m2*m2) AS c2
  FROM dbox
),
-- reference point: NEAR the antipode -c (guaranteed outside the star
-- loop) but nudged off the center axis by a fixed tangent offset --
-- planted points are collinear with (c, vertex) rays by construction,
-- so a probe from exactly -c would pass through a loop VERTEX (a
-- degenerate crossing the banded sign chain cannot count).
dtan AS MATERIALIZED (
  SELECT family_id, c0, c1, c2,
         (c1 * 1e0 - c2 * CAST(53e-4 AS DOUBLE)) AS t0,
         (c2 * CAST(12e-3 AS DOUBLE) - c0 * 1e0) AS t1,
         (c0 * CAST(53e-4 AS DOUBLE) - c1 * CAST(12e-3 AS DOUBLE)) AS t2
  FROM dc
),
dw AS MATERIALIZED (
  SELECT family_id,
         (-c0 + CAST(371e-4 AS DOUBLE) * (t0 / sqrt((t0*t0 + t1*t1) + t2*t2))) AS w0,
         (-c1 + CAST(371e-4 AS DOUBLE) * (t1 / sqrt((t0*t0 + t1*t1) + t2*t2))) AS w1,
         (-c2 + CAST(371e-4 AS DOUBLE) * (t2 / sqrt((t0*t0 + t1*t1) + t2*t2))) AS w2
  FROM dtan
),
dref AS MATERIALIZED (
  SELECT family_id,
         w0 / sqrt((w0*w0 + w1*w1) + w2*w2) AS rx,
         w1 / sqrt((w0*w0 + w1*w1) + w2*w2) AS ry,
         w2 / sqrt((w0*w0 + w1*w1) + w2*w2) AS rz
  FROM dw
),
dplant AS MATERIALIZED ({planted_sql}),
dreps AS MATERIALIZED (
  SELECT p.family_id, p.deg_id, p.x AS px, p.y AS py, p.z AS pz,
         s.n_slots
  FROM dplant p
  JOIN (SELECT family_id, deg_id, count(*) AS n_slots
        FROM dplant GROUP BY family_id, deg_id) s
    ON s.family_id = p.family_id AND s.deg_id = p.deg_id
  WHERE p.slot = 0
),
dpar AS MATERIALIZED (
  SELECT family_id, deg_id, n_slots,
         sum(CASE WHEN {_cross_pred_sql()} THEN 1 ELSE 0 END) % 2 AS inside
  FROM (
    SELECT r.family_id, r.deg_id, r.n_slots,
           f.rx AS a0x, f.ry AS a0y, f.rz AS a0z,
           r.px AS a1x, r.py AS a1y, r.pz AS a1z,
           e.p0x AS b0x, e.p0y AS b0y, e.p0z AS b0z,
           e.p1x AS b1x, e.p1y AS b1y, e.p1z AS b1z
    FROM dreps r
    JOIN dref f ON f.family_id = r.family_id
    JOIN dedges e ON e.family_id = r.family_id
  )
  GROUP BY family_id, deg_id, n_slots
)
SELECT CAST(family_id AS BIGINT) AS family_id,
       CAST(deg_id AS BIGINT) AS deg_id,
       CAST(n_slots AS BIGINT) AS n_deg_edges,
       inside = 1 AS is_hole
FROM dpar
"""
