"""Distributed S2Builder snapping (kernels.builder) over tables.

* ``snap_points``    — add (snap_cell, sx, sy, sz) to a point table: one
  Arrow-batched pass, no shuffle.  The snap-cell assignment is pure
  ``parent(leaf(p), L)``, so a SQL oracle recomputes it exactly.
* ``snap_dedup``     — the canonical "merge vertices within the snap
  radius" builder step as a dataflow: group by snap cell, keep the
  minimum id as the representative, count merged members (one hash-agg
  shuffle — the same shape as exact_dedup).
* ``snap_chains``    — per-chain snap + degenerate-edge removal via one
  groupBy(chain) applyInPandas pass; emits the cleaned vertex sequence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels import builder, cellid


def snap_points(
    points: DataFrame, level: int, xyz: tuple[str, str, str] = ("x", "y", "z")
) -> DataFrame:
    """Adds snap_cell (biased) + snapped coordinates sx, sy, sz."""
    x, y, z = xyz
    in_fields = points.schema.fieldNames()
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in points.schema.fields)
    schema += ", snap_cell long, sx double, sy double, sz double"

    def batches(it):
        for pdf in it:
            if len(pdf) == 0:
                out = pdf.copy()
                for c, dt in [("snap_cell", "int64"), ("sx", "float64"),
                              ("sy", "float64"), ("sz", "float64")]:
                    out[c] = pd.Series(dtype=dt)
                yield out
                continue
            P = pdf[[x, y, z]].to_numpy(np.float64)
            cells = builder.snap_cells(P, level)
            S = builder.snap_to_cell_centers(P, level)
            out = pdf.copy()
            out["snap_cell"] = cellid.to_biased(cells)
            out["sx"], out["sy"], out["sz"] = S[:, 0], S[:, 1], S[:, 2]
            yield out

    return points.mapInPandas(batches, schema)


def snap_dedup(
    points: DataFrame,
    level: int,
    id_col: str = "pid",
    xyz: tuple[str, str, str] = ("x", "y", "z"),
) -> DataFrame:
    """(snap_cell, keeper_id, n_merged): vertices merged by the snap grid
    — the builder's vertex-merging step as one hash agg."""
    snapped = snap_points(points, level, xyz)
    return snapped.groupBy("snap_cell").agg(
        F.min(id_col).alias("keeper_id"),
        F.count(F.lit(1)).alias("n_merged"),
    )


def snap_chains(
    chains: DataFrame,
    level: int,
    chain_col: str = "chain_id",
    seq_col: str = "seq",
) -> DataFrame:
    """Per-chain snap + simplify: (chain_id, seq, sx, sy, sz) with
    degenerate (snap-collapsed) edges removed and seq re-numbered."""

    def one_chain(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(seq_col)
        V = pdf[["x", "y", "z"]].to_numpy(np.float64)
        out = builder.build_polyline(V, level)
        return pd.DataFrame(
            {
                chain_col: pdf[chain_col].iloc[0],
                seq_col: np.arange(out.shape[0], dtype=np.int64),
                "sx": out[:, 0],
                "sy": out[:, 1],
                "sz": out[:, 2],
            }
        )

    return chains.groupBy(chain_col).applyInPandas(
        one_chain,
        f"{chain_col} long, {seq_col} long, sx double, sy double, sz double",
    )


def snap_round_chains(
    chains: DataFrame,
    level: int,
    chain_col: str = "chain_id",
    seq_col: str = "seq",
) -> DataFrame:
    """Per-chain topology-safe snap ROUNDING (kernels.builder.
    snap_round_chain — the S2Builder edge-replacement pass): every input
    edge is replaced by the chain of snap sites within the snap radius
    of that edge.  (chain_id, seq, snap_cell, sx, sy, sz) with seq
    re-numbered; snap_cell is the biased level-L cell id of each output
    vertex."""
    from ..kernels import cellid

    def one_chain(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(seq_col)
        V = pdf[["x", "y", "z"]].to_numpy(np.float64)
        out = builder.snap_round_chain(V, level)
        cells = cellid.to_biased(builder.snap_cells(out, level)) if len(out) else np.empty(0, np.int64)
        return pd.DataFrame(
            {
                chain_col: pdf[chain_col].iloc[0],
                seq_col: np.arange(out.shape[0], dtype=np.int64),
                "snap_cell": cells.astype(np.int64),
                "sx": out[:, 0],
                "sy": out[:, 1],
                "sz": out[:, 2],
            }
        )

    return chains.groupBy(chain_col).applyInPandas(
        one_chain,
        f"{chain_col} long, {seq_col} long, snap_cell long, "
        "sx double, sy double, sz double",
    )


def snap_round_oracle_sql(table_sql: str, level: int) -> str:
    """DuckDB replay of snap_round_chains over a chain table
    (``table_sql`` must yield chain_id, seq, x, y, z):

    encode every vertex (forward Hilbert CTE) -> parent site cells ->
    DECODE each distinct site to its center (oracle.cell_center_xyz_cte,
    the new inverse-Hilbert CTE, bitwise-equal to cellid.to_point) ->
    chord2 of every site against every same-chain INPUT edge (the pinned
    point_edge_chord2_sql twin) -> per-edge insertion ordered by the
    pinned -dot along the edge -> window-collapse consecutive duplicate
    cells -> renumber.  Every float op mirrors the kernel, so the full
    snap-rounding pass is hash-compare bit-exact."""
    from .. import oracle
    from ..kernels.builder import snap_radius_chord2
    from ..kernels.measures import point_edge_chord2_sql

    r2 = repr(snap_radius_chord2(level))
    chord2 = point_edge_chord2_sql("c", "ea", "eb")
    return f"""
WITH verts AS MATERIALIZED ({table_sql}),
xyz AS MATERIALIZED (SELECT chain_id, seq, x, y, z FROM verts),
{oracle.leaf_from_xyz_cte("xyz")},
vc AS MATERIALIZED (
  SELECT chain_id, seq, x AS vx, y AS vy, z AS vz,
         {oracle.parent_sql_expr("cell_leaf", level)} AS vcell
  FROM leaf
),
sites0 AS MATERIALIZED (SELECT DISTINCT chain_id, vcell FROM vc),
{oracle.cell_center_xyz_cte("sites0", "vcell", level, out_name="sites")},
edges AS MATERIALIZED (
  SELECT chain_id, seq AS eidx,
         vx AS eax, vy AS eay, vz AS eaz, vcell AS acell,
         lead(vx) OVER w AS ebx, lead(vy) OVER w AS eby,
         lead(vz) OVER w AS ebz, lead(vcell) OVER w AS bcell
  FROM vc WINDOW w AS (PARTITION BY chain_id ORDER BY seq)
  QUALIFY lead(vx) OVER w IS NOT NULL
),
ins AS MATERIALIZED (
  SELECT e.chain_id, e.eidx, s.vcell,
         -(((s.cx * e.eax) + (s.cy * e.eay)) + (s.cz * e.eaz)) AS ord
  FROM edges e JOIN sites s ON s.chain_id = e.chain_id
  WHERE ({chord2}) <= {r2}
    AND s.vcell != e.acell AND s.vcell != e.bcell
),
firstv AS (
  SELECT chain_id, -1 AS eidx, 0.0 AS ord, vcell
  FROM (SELECT chain_id, vcell,
               row_number() OVER (PARTITION BY chain_id ORDER BY seq) AS rn
        FROM vc)
  WHERE rn = 1
),
items AS (
  SELECT chain_id, eidx, ord, vcell FROM ins
  UNION ALL
  SELECT chain_id, eidx, 1e300 AS ord, bcell AS vcell FROM edges
  UNION ALL
  SELECT chain_id, eidx, ord, vcell FROM firstv
),
ordered AS MATERIALIZED (
  SELECT chain_id, vcell,
         row_number() OVER (PARTITION BY chain_id ORDER BY eidx, ord, vcell) AS rn
  FROM items
),
collapsed AS (
  SELECT chain_id, vcell, rn,
         lag(vcell) OVER (PARTITION BY chain_id ORDER BY rn) AS prevcell
  FROM ordered
),
keptv AS MATERIALIZED (
  SELECT chain_id, vcell, rn,
         count(*) OVER (PARTITION BY chain_id) AS n
  FROM collapsed WHERE prevcell IS NULL OR vcell != prevcell
),
final0 AS MATERIALIZED (
  SELECT chain_id,
         row_number() OVER (PARTITION BY chain_id ORDER BY rn) - 1 AS seq,
         vcell
  FROM keptv WHERE n >= 2
),
{oracle.cell_center_xyz_cte("final0", "vcell", level, out_name="fin", prefix="e_")}
SELECT chain_id, seq, vcell AS snap_cell, cx AS sx, cy AS sy, cz AS sz FROM fin
"""
