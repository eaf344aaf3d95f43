"""S2ShapeNestingQuery as a distributed query (s2shape_nesting_query.h:
ComputeShapeNesting — depth and first_parent of every loop in a shape).

Input: loop FAMILIES — (family_id, member_id, seq, x, y, z), each family
an independent set of non-crossing loops (the reference's per-shape loop
set).  For every member loop P the query reports

* ``depth``     — number of OTHER family members containing P
  (even = shell, odd = hole, the nesting parity the reference derives),
* ``parent_id`` — the immediate parent: the container with the greatest
  depth (ties -> lowest member_id; -1 for top-level shells).

Containment of P is tested at P's vertex 0 via crossing parity along the
geodesic from the south-pole reference point — the identical banded
pure-double sign chain as loop_pair_distance (predicates.
edges_cross_batch robust=False), so every verdict replays bit-for-bit in
the DuckDB oracle.  Like the reference (which requires a valid polygon),
results are meaningful only for non-crossing loop sets; loops covering
the south pole invert their parity (both sides replay the same
convention regardless).

One shuffle (groupBy family); families are independent and small, so the
pass distributes across them — at 10^12 scale the family count carries
the parallelism, not the per-family kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..kernels import predicates

__all__ = ["loop_nesting", "loop_nesting_oracle_sql"]

_REF = np.array([0.0, 0.0, -1.0])  # south-pole reference (shared with
# loop_pair_distance's containment parity)


def _contains_parity(V0: np.ndarray, V1: np.ndarray, probe: np.ndarray) -> bool:
    n = len(V0)
    R = np.broadcast_to(_REF, (n, 3))
    P = np.broadcast_to(probe, (n, 3))
    return bool(predicates.edges_cross_batch(R, P, V0, V1, robust=False).sum() % 2)


def loop_nesting(
    spark: SparkSession,
    loops: DataFrame,
    family_col: str = "family_id",
    member_col: str = "member_id",
    seq_col: str = "seq",
) -> DataFrame:
    """Output: (family_id, member_id, depth, parent_id)."""

    def one_family(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([member_col, seq_col])
        fam = pdf[family_col].iloc[0]
        members = []
        for mid, grp in pdf.groupby(member_col, sort=True):
            V = grp[["x", "y", "z"]].to_numpy(np.float64)
            members.append((int(mid), V, np.roll(V, -1, axis=0)))
        contains = {}  # (container, probe) -> bool
        for cm, c0, c1 in members:
            for pm, p0, _ in members:
                if cm == pm:
                    continue
                contains[(cm, pm)] = _contains_parity(c0, c1, p0[0])
        depth = {
            pm: sum(contains[(cm, pm)] for cm, _, _ in members if cm != pm)
            for pm, _, _ in members
        }
        rows = []
        for pm, _, _ in members:
            containers = [cm for cm, _, _ in members
                          if cm != pm and contains[(cm, pm)]]
            if containers:
                # immediate parent: deepest container, ties -> lowest id
                parent = min(containers, key=lambda c: (-depth[c], c))
            else:
                parent = -1
            rows.append((fam, pm, depth[pm], parent))
        return pd.DataFrame(
            rows, columns=[family_col, member_col, "depth", "parent_id"]
        )

    return loops.groupBy(family_col).applyInPandas(
        one_family,
        f"{family_col} long, {member_col} long, depth long, parent_id long",
    )


def loop_nesting_oracle_sql(verts_sql: str) -> str:
    """DuckDB replay over a (family_id, member_id, seq, x, y, z) source:
    closed edges via modular next-vertex join, the banded crossing
    parity from the south pole to each probe's vertex 0, then depth =
    container count and parent = deepest container (ties -> lowest
    member_id) — the identical decision procedure as ``loop_nesting``."""
    from .polygon_distance import _cross_pred_sql

    return f"""
WITH nsrc AS MATERIALIZED ({verts_sql}),
verts AS MATERIALIZED (
  SELECT family_id, member_id,
         row_number() OVER (PARTITION BY family_id, member_id ORDER BY seq) - 1
           AS vi,
         x, y, z
  FROM nsrc
),
cnt AS MATERIALIZED (
  SELECT family_id, member_id, count(*) AS n
  FROM verts GROUP BY family_id, member_id
),
edges AS MATERIALIZED (
  SELECT v0.family_id, v0.member_id,
         v0.x AS p0x, v0.y AS p0y, v0.z AS p0z,
         v1.x AS p1x, v1.y AS p1y, v1.z AS p1z
  FROM verts v0
  JOIN cnt c ON c.family_id = v0.family_id AND c.member_id = v0.member_id
  JOIN verts v1 ON v1.family_id = v0.family_id
               AND v1.member_id = v0.member_id
               AND v1.vi = (v0.vi + 1) % c.n
),
v0s AS MATERIALIZED (
  SELECT family_id, member_id, x AS px, y AS py, z AS pz
  FROM verts WHERE vi = 0
),
par AS MATERIALIZED (
  SELECT family_id, container, probe,
         sum(CASE WHEN {_cross_pred_sql()} THEN 1 ELSE 0 END) % 2 AS inside
  FROM (
    SELECT e.family_id, e.member_id AS container, v.member_id AS probe,
           CAST(0.0 AS DOUBLE) AS a0x, CAST(0.0 AS DOUBLE) AS a0y,
           CAST(-1.0 AS DOUBLE) AS a0z,
           v.px AS a1x, v.py AS a1y, v.pz AS a1z,
           e.p0x AS b0x, e.p0y AS b0y, e.p0z AS b0z,
           e.p1x AS b1x, e.p1y AS b1y, e.p1z AS b1z
    FROM v0s v
    JOIN edges e ON e.family_id = v.family_id AND e.member_id != v.member_id
  )
  GROUP BY family_id, container, probe
),
depth AS MATERIALIZED (
  SELECT family_id, probe AS member_id, sum(inside) AS depth
  FROM par GROUP BY family_id, probe
),
parents AS (
  SELECT p.family_id, p.probe AS member_id, p.container,
         row_number() OVER (
           PARTITION BY p.family_id, p.probe
           ORDER BY dc.depth DESC, p.container ASC
         ) AS rnk
  FROM par p
  JOIN depth dc ON dc.family_id = p.family_id AND dc.member_id = p.container
  WHERE p.inside = 1
)
SELECT CAST(d.family_id AS BIGINT) AS family_id,
       CAST(d.member_id AS BIGINT) AS member_id,
       CAST(d.depth AS BIGINT) AS depth,
       CAST(COALESCE(pr.container, -1) AS BIGINT) AS parent_id
FROM depth d
LEFT JOIN parents pr ON pr.family_id = d.family_id
                    AND pr.member_id = d.member_id AND pr.rnk = 1
"""
