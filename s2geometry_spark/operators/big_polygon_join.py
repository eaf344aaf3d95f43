"""Containment join against a LARGE polygon table (no broadcast).

`contains_join` (term-indexer + broadcast) assumes the polygon set fits
on the driver — the north-star case.  At 10^12 scale the polygon side can
itself be a big table; this operator keeps the same two-phase shape with
every step distributed:

1. **index terms** — each polygon's covering + ancestor terms are computed
   INSIDE a mapInPandas pass (the RegionCoverer port runs per-row in the
   executors; no driver materialization), yielding an exploded
   (term_cell, is_covering, poly_id) table — S2's own distributed-indexing
   design (s2region_term_indexer.cc:23-72).
2. **candidate join** — point query terms (pure-SQL explode) equi-join the
   term table; with a big polygon side Catalyst picks a shuffle hash join
   keyed on the term cell, AQE handling skewed hot terms.
3. **refinement** — candidates shuffle on poly_id and cogroup with the
   polygon payload; one vectorized crossing-parity batch per polygon
   group (kernels.predicates), never per-row Python.

Polygon table schema: (poly_id string, loops array<array<array<double>>>)
— loops -> vertices -> [x, y, z].
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels import cellid
from ..kernels.coverer import CovererOptions, RegionCoverer
from ..kernels.predicates import compute_origin_inside, polygon_contains_points
from ..kernels.regions import Loop, Polygon
from .contains_join import (
    DEFAULT_LEVEL_MOD,
    DEFAULT_MAX_CELLS,
    DEFAULT_MAX_LEVEL,
    DEFAULT_MIN_LEVEL,
    RegionIndex,
    point_query_terms,
)

TERM_SCHEMA = "term_cell long, is_covering boolean, poly_id string"


def polygons_to_df(spark: SparkSession, regions: dict[str, object]) -> DataFrame:
    """Helper: driver dict -> the big-table layout (for tests/fixtures)."""
    rows = []
    for rid, region in regions.items():
        loops = region.loops if isinstance(region, Polygon) else [region]
        rows.append((rid, [np.asarray(lp.vertices).tolist() for lp in loops]))
    return spark.createDataFrame(
        rows, schema="poly_id string, loops array<array<array<double>>>"
    )


def polygon_index_terms(
    polygons: DataFrame,
    min_level: int = DEFAULT_MIN_LEVEL,
    max_level: int = DEFAULT_MAX_LEVEL,
    level_mod: int = DEFAULT_LEVEL_MOD,
    max_cells: int = DEFAULT_MAX_CELLS,
) -> DataFrame:
    """(term_cell, is_covering, poly_id): coverings + ancestor terms,
    computed executor-side per Arrow batch."""

    def batches(it):
        opts = CovererOptions(
            max_cells=max_cells,
            min_level=min_level,
            max_level=max_level,
            level_mod=level_mod,
        )
        coverer = RegionCoverer(opts)
        true_max = opts.true_max_level()
        for pdf in it:
            cells_out, cov_out, pid_out = [], [], []
            for row in pdf.itertuples(index=False):
                loops = [
                    Loop(np.stack([np.asarray(v, np.float64) for v in lv]))
                    for lv in row.loops
                ]
                region = Polygon(loops) if len(loops) > 1 else loops[0]
                covering = coverer.get_covering(region)
                # GetIndexTermsForCanonicalCovering (optimize_for_space=False)
                prev_id = None
                for v in covering.tolist():
                    arr = np.array([v], dtype=np.uint64)
                    lv = int(cellid.level(arr)[0])
                    b = int(cellid.to_biased(arr)[0])
                    if lv < true_max:
                        cells_out.append(b); cov_out.append(True); pid_out.append(row.poly_id)
                    cells_out.append(b); cov_out.append(False); pid_out.append(row.poly_id)
                    lvl = lv
                    while True:
                        lvl -= level_mod
                        if lvl < min_level:
                            break
                        anc = cellid.parent(arr, lvl)
                        if prev_id is not None:
                            pa = np.array([prev_id], dtype=np.uint64)
                            if int(cellid.level(pa)[0]) > lvl and int(
                                cellid.parent(pa, lvl)[0]
                            ) == int(anc[0]):
                                break
                        cells_out.append(int(cellid.to_biased(anc)[0]))
                        cov_out.append(False)
                        pid_out.append(row.poly_id)
                    prev_id = v
            yield pd.DataFrame(
                {"term_cell": cells_out, "is_covering": cov_out, "poly_id": pid_out}
            )

    return polygons.mapInPandas(batches, TERM_SCHEMA)


def contains_join_big(
    spark: SparkSession,
    points: DataFrame,
    polygons: DataFrame,
    point_id: str = "pid",
    cell: str = "cell",
    xyz: tuple[str, str, str] = ("x", "y", "z"),
    **index_opts,
) -> DataFrame:
    """All (point, polygon) pairs with the polygon containing the point —
    both sides arbitrarily large."""
    opts = CovererOptions(
        max_cells=index_opts.get("max_cells", DEFAULT_MAX_CELLS),
        min_level=index_opts.get("min_level", DEFAULT_MIN_LEVEL),
        max_level=index_opts.get("max_level", DEFAULT_MAX_LEVEL),
        level_mod=index_opts.get("level_mod", DEFAULT_LEVEL_MOD),
    )
    terms = polygon_index_terms(polygons, **index_opts)

    # a tiny shim index carrying just the level parameters for the
    # pure-SQL point query-term generator
    class _Opts:
        min_level = opts.min_level
        level_mod = opts.level_mod
        true_max_level = opts.true_max_level()

    q = point_query_terms(points, _Opts, cell=cell)
    x, y, z = xyz
    cand = (
        q.join(terms, ["term_cell", "is_covering"])
        .select(point_id, x, y, z, "poly_id")
        .dropDuplicates([point_id, "poly_id"])
    )

    # refinement: cogroup candidates with polygon payloads per poly_id;
    # one parity kernel call per (polygon, batch)
    out_schema = f"{point_id} long, poly_id string"

    def refine(key, cand_pdf: pd.DataFrame, poly_pdf: pd.DataFrame):
        if len(cand_pdf) == 0 or len(poly_pdf) == 0:
            return pd.DataFrame({point_id: pd.Series(dtype="int64"),
                                 "poly_id": pd.Series(dtype="object")})
        loops = [
            np.stack([np.asarray(v, np.float64) for v in lv])
            for lv in poly_pdf.iloc[0]["loops"]
        ]
        flags = [compute_origin_inside(v) for v in loops]
        pts = cand_pdf[[x, y, z]].to_numpy(np.float64)
        inside = polygon_contains_points(loops, flags, pts)
        keep = cand_pdf.loc[inside, [point_id]].copy()
        keep["poly_id"] = key[0]
        return keep

    return (
        cand.groupBy("poly_id")
        .cogroup(polygons.groupBy("poly_id"))
        .applyInPandas(refine, out_schema)
    )
