"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes each implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the DuckDB
equivalent.  Geospatial inputs are derived deterministically from the
integer keys of the driver's parquet tables via exact integer arithmetic
(kernels.geotag), so the NumPy engine path and the pure-SQL oracle path
produce bit-identical cell ids.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s2geometry_spark import functions as s2f
from s2geometry_spark import oracle
from s2geometry_spark.operators import tiling

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _order_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> deterministic sphere points with leaf cell ids (biased)."""
    orders = _load(spark, sf_dir, "orders")
    pts = orders.select(F.col("o_orderkey").alias("pid"), *tiling.triplet_exprs("o_orderkey"))
    return tiling.with_cell_from_triplet(pts)


# ---------- queries ----------


def q_tile_counts_l5(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _order_points(spark, sf_dir)
    return tiling.tile_counts(df, 5)


def q_tile_counts_l12(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _order_points(spark, sf_dir)
    return tiling.tile_counts(df, 12)


def q_tile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _order_points(spark, sf_dir)
    return tiling.tile_rollup(df, [2, 5, 8], cell="cell")


def q_cell_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leaf encode + token round-trip surface (rows-only check: token text
    is engine-only; the leaf id itself is oracle-checked elsewhere)."""
    df = _order_points(spark, sf_dir)
    return df.select(
        "pid",
        "cell",
        s2f.cell_token("cell").alias("token"),
        s2f.cell_level("cell").alias("lvl"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tile_counts_l5": q_tile_counts_l5,
        "tile_counts_l12": q_tile_counts_l12,
        "tile_rollup": q_tile_rollup,
        "cell_tokens": q_cell_tokens,
    }


# ---------- oracle SQL (DuckDB) ----------


def _leaf_sql(select: str) -> str:
    cte = oracle.leaf_cell_sql_cte("orders", "o_orderkey", keep_cols="o_orderkey AS pid")
    return f"WITH {cte} {select}"


def oracle_sql() -> dict[str, str]:
    p5 = oracle.parent_sql_expr("cell_leaf", 5)
    p12 = oracle.parent_sql_expr("cell_leaf", 12)
    rollup_parts = " UNION ALL ".join(
        f"SELECT {lvl} AS level, {oracle.parent_sql_expr('cell_leaf', lvl)} AS cell_lvl, "
        f"COUNT(*) AS cnt FROM leaf GROUP BY 2"
        for lvl in (2, 5, 8)
    )
    return {
        "tile_counts_l5": _leaf_sql(
            f"SELECT {p5} AS cell_l5, COUNT(*) AS cnt FROM leaf GROUP BY 1"
        ),
        "tile_counts_l12": _leaf_sql(
            f"SELECT {p12} AS cell_l12, COUNT(*) AS cnt FROM leaf GROUP BY 1"
        ),
        "tile_rollup": _leaf_sql(rollup_parts),
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tiling assignment + per-tile counts on sf0.001."""
    return q_tile_counts_l5(spark, "/root/testdata/sf0.001")
