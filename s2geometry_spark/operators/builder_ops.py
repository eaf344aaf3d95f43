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
