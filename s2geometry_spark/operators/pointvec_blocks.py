"""Distributed EncodedS2PointVector CELL_IDS storage op (SURVEY.md §2.3;
reference encoded_s2point_vector.cc:62-944).

Per level-``tile_level`` tile, the tile's points (in key order) are
encoded with kernels.pointvec — the reference's block-packed CELL_IDS
container: points snapped to level-``snap_level`` cell centers become
16-value blocks of base+offset+nibble-deltas over the bit-pair-
interleaved (sj, tj) value space; raw points ride along as 24-byte
exceptions; tiles where under 5% of points are encodable fall back to
the UNCOMPRESSED format, exactly as EncodeS2PointVectorCompact decides.
The buffer is decoded back and the row reports:

  (tile, n_points, n_snapped, fmt, level, base_bytes, n_blocks,
   enc_bytes, round_trip_ok)

The DuckDB oracle replays EVERY size decision analytically from the
key column alone — ChooseBestLevel's 5% rule, ChooseBase's excluded-
bits arithmetic, GetBlockCode's delta/overlap ladder and offset-width
rule per 16-value block, nibble packing, the EncodedStringVector
offset table and the varint header — so any drift in the codec's
logic hash-mismatches; ``round_trip_ok`` is pinned TRUE.

Scale: one hash shuffle on the tile key; per-group state is the tile's
point vector (bounded by tile occupancy, the coverer's max-cells
discipline).  Lazy per-index random access into the encoded buffer is
the C++ class's mmap concern, which Parquet pages + Arrow batches
replace (SURVEY.md §2.3 scope note).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import functions as s2f
from ..kernels import cellid, pointvec
from ..kernels.geotag import int_triplet_from_key, xyz_from_triplet

_SCHEMA = (
    "tile long, n_points long, n_snapped long, fmt int, level int, "
    "base_bytes int, n_blocks long, enc_bytes long, round_trip_ok boolean"
)


def tile_point_block_codec(
    df: DataFrame,
    tile_level: int = 5,
    snap_level: int = 12,
    cell: str = "cell",
    key: str = "key",
) -> DataFrame:
    """``df`` must carry an integer ``key`` column and the biased-int64
    leaf cell-id column ``cell`` derived from it (with_cell_from_triplet).
    Points with key % 5 == 0 stay raw (exception rows); the rest snap to
    their level-``snap_level`` cell center."""

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        # vectorize the whole coordinate pipeline ONCE per bucket (the
        # per-tile Arrow-group version spent its wall on ~30-row NumPy
        # calls x thousands of groups); per tile only the byte codec
        # loops remain
        order = np.lexsort(
            (pdf["k"].to_numpy(np.int64), pdf["tile"].to_numpy(np.int64))
        )
        tiles = pdf["tile"].to_numpy(np.int64)[order]
        keys = pdf["k"].to_numpy(np.int64)[order]
        x, y, z = xyz_from_triplet(*int_triplet_from_key(keys))
        leaf = cellid.from_xyz(x, y, z)
        snap = cellid.parent(leaf, snap_level)
        cx, cy, cz = cellid.to_point(snap)
        snap_mask = keys % 5 != 0
        pts_all = np.where(
            snap_mask[:, None],
            np.stack([cx, cy, cz], axis=1),
            np.stack([x, y, z], axis=1),
        )
        f_all, si_all, ti_all, lv_all = pointvec._cell_points(pts_all)
        rows = []
        starts = np.flatnonzero(
            np.r_[True, tiles[1:] != tiles[:-1]]
        ).tolist() + [len(tiles)]
        for a, b in zip(starts[:-1], starts[1:]):
            pts = pts_all[a:b]
            cp = (f_all[a:b], si_all[a:b], ti_all[a:b], lv_all[a:b])
            buf = pointvec.encode_point_vector(pts, "compact", cell_points=cp)
            dec = pointvec.decode_point_vector(buf)
            info = pointvec.point_vector_info(buf)
            rows.append(
                {
                    "tile": int(tiles[a]),
                    "n_points": b - a,
                    "n_snapped": int((lv_all[a:b] == snap_level).sum()),
                    "fmt": info["fmt"],
                    "level": info["level"],
                    "base_bytes": info["base_bytes"],
                    "n_blocks": info["n_blocks"],
                    "enc_bytes": len(buf),
                    "round_trip_ok": bool(
                        dec.shape == pts.shape and (dec == pts).all()
                    ),
                }
            )
        return pd.DataFrame(rows)

    keyed = df.select(
        s2f.parent_expr(cell, tile_level).alias("tile"), F.col(key).alias("k")
    ).withColumn("bkt", F.pmod(F.col("tile"), F.lit(1024)))
    return keyed.groupBy("bkt").applyInPandas(per_bucket, _SCHEMA)


def _bw(e: str) -> str:
    """bit_width(e) for e >= 0 in DuckDB SQL."""
    return f"(CASE WHEN {e} = 0 THEN 0 ELSE length(bin(CAST({e} AS BIGINT))) END)"


def _varint_len(e: str) -> str:
    return (
        f"(CASE WHEN {e} < 128 THEN 1 WHEN {e} < 16384 THEN 2 "
        f"WHEN {e} < 2097152 THEN 3 WHEN {e} < 268435456 THEN 4 ELSE 5 END)"
    )


def point_block_codec_oracle_sql(
    leaf_cte: str, tile_level: int = 5, snap_level: int = 12
) -> str:
    """Analytic replay of EncodeS2PointVectorCompact's size computation
    in pure integer SQL — no codec code shared with the engine.

    ``leaf_cte`` must end in CTE ``leaf`` with columns (key, face, i, j,
    cell_leaf) — the leaf_cell_sql_cte family exposes all of them.
    """
    from .. import oracle

    shift = 30 - snap_level
    # sj = (face & 3) << level | i_level ; tj = (face & 4) << (level - 2) | j_level
    sj = f"((face % 4) * {1 << snap_level} + (i // {1 << shift}))"
    tj = f"((face // 4) * {1 << snap_level} + (j // {1 << shift}))"
    # InterleaveUint32BitPairs: sj pair k -> v bits 4k..4k+1, tj -> 4k+2..4k+3
    n_pairs = (snap_level + 2 + 1) // 2 + 1
    v_terms = " + ".join(
        f"(((sj // {1 << (2 * k)}) % 4) + 4 * ((tj // {1 << (2 * k)}) % 4)) "
        f"* {1 << (4 * k)}"
        for k in range(n_pairs)
    )
    tile_expr = oracle.parent_sql_expr("cell_leaf", tile_level)
    max_bits = 2 * snap_level + 3

    def can_encode(dmn: str, dmx: str, db: str, ob: str) -> str:
        md = f"((1 << {db}) - 1 - CASE WHEN have_exc THEN 16 ELSE 0 END)"
        dmn_m = f"({dmn} - ({dmn} & ((1 << ({db} - {ob})) - 1)))"
        return (
            f"(((1 << {db}) - 1) >= CASE WHEN have_exc THEN 16 ELSE 0 END "
            f"AND {dmn_m} + {md} >= {dmx})"
        )

    return f"""WITH {leaf_cte},
rows_v AS (
  SELECT {tile_expr} AS tile, key,
         key % 5 <> 0 AS is_snap,
         {sj} AS sj, {tj} AS tj
  FROM leaf
),
vals AS (
  SELECT tile, key, is_snap,
         CASE WHEN is_snap THEN {v_terms} ELSE NULL END AS v,
         (row_number() OVER (PARTITION BY tile ORDER BY key) - 1) // 16 AS blk
  FROM rows_v
),
tiles AS (
  SELECT tile, count(*) AS n, count(v) AS n_snap,
         min(v) AS v_min, max(v) AS v_max
  FROM vals GROUP BY tile
),
tfmt AS (
  SELECT *, (n_snap > 0 AND n_snap * 20 > n) AS is_cell,
         n_snap < n AS have_exc
  FROM tiles
),
tbase AS (
  SELECT *, CASE WHEN NOT is_cell THEN 0 ELSE
    greatest({_bw("xor(v_min, v_max)")},
             CASE WHEN have_exc OR n = 1 THEN 8 ELSE 4 END) END AS eb
  FROM tfmt
),
tbase2 AS (
  SELECT *, CASE WHEN NOT is_cell THEN 0
                 ELSE v_min - (v_min & ((1 << eb) - 1)) END AS base0
  FROM tbase
),
tbase3 AS (
  SELECT *, CASE WHEN base0 = 0 THEN 0 ELSE
    (({max_bits} - bit_count((base0 & -base0) - 1) + 7) // 8) * 8 END AS base_bits
  FROM tbase2
),
tbase4 AS (
  SELECT *, CASE WHEN base0 = 0 OR NOT is_cell THEN 0 ELSE
    v_min - (v_min & ((1 << greatest(0, {max_bits} - base_bits)) - 1)) END AS base
  FROM tbase3
),
blks0 AS (
  SELECT v.tile, v.blk, count(*) AS bn, count(v.v) AS bsnap,
         min(v.v) AS b_min, max(v.v) AS b_max
  FROM vals v JOIN tfmt t ON t.tile = v.tile AND t.is_cell
  GROUP BY v.tile, v.blk
),
blks1 AS (
  SELECT b.*, t.have_exc, t.base, t.n,
         b.b_min - t.base AS d_min, b.b_max - t.base AS d_max
  FROM blks0 b JOIN tbase4 t ON t.tile = b.tile
),
blks2 AS (
  SELECT *, CASE WHEN bsnap = 0 THEN 4 ELSE
    ((greatest(1, {_bw("(b_max - b_min)")} - 1) + 3) // 4) * 4 END AS db0
  FROM blks1
),
blks3 AS (
  SELECT *,
    CASE WHEN bsnap = 0 THEN 4
         WHEN {can_encode("d_min", "d_max", "db0", "0")} THEN db0
         WHEN {can_encode("d_min", "d_max", "db0", "4")} THEN db0
         ELSE db0 + 4 END AS db1,
    CASE WHEN bsnap = 0 THEN 0
         WHEN {can_encode("d_min", "d_max", "db0", "0")} THEN 0
         WHEN {can_encode("d_min", "d_max", "db0", "4")} THEN 4
         WHEN {can_encode("d_min", "d_max", "(db0 + 4)", "0")} THEN 0
         ELSE 4 END AS ob
  FROM blks2
),
blks4 AS (
  SELECT *, CASE WHEN bn = 1 AND NOT have_exc THEN 8 ELSE db1 END AS db
  FROM blks3
),
blks5 AS (
  SELECT *, ((1 << db) - 1 - CASE WHEN have_exc THEN 16 ELSE 0 END) AS md
  FROM blks4
),
blks6 AS (
  SELECT *, CASE WHEN bsnap = 0 OR d_max <= md THEN 0 ELSE
    (({_bw("((d_max - md + ((1 << (db - ob)) - 1)) - ((d_max - md + ((1 << (db - ob)) - 1)) & ((1 << (db - ob)) - 1)))")}
      - (db - ob) + 7) // 8) * 8 END AS offset_bits
  FROM blks5
),
blks AS (
  SELECT tile, blk,
         1 + offset_bits // 8 + (bn * (db // 4) + 1) // 2
           + 24 * (bn - bsnap) AS block_bytes
  FROM blks6
),
btot AS (
  SELECT tile, count(*) AS nb, sum(block_bytes) AS tot
  FROM blks GROUP BY tile
),
sized AS (
  SELECT t.tile, t.n, t.n_snap, t.is_cell, t.base_bits,
         b.nb, b.tot,
         ((greatest({_bw("b.tot")}, 1) - 1) // 8) + 1 AS off_len
  FROM tbase4 t LEFT JOIN btot b ON b.tile = t.tile
)
SELECT CAST(tile AS BIGINT) AS tile,
       CAST(n AS BIGINT) AS n_points,
       CAST(n_snap AS BIGINT) AS n_snapped,
       CAST(CASE WHEN is_cell THEN 1 ELSE 0 END AS INT) AS fmt,
       CAST(CASE WHEN is_cell THEN {snap_level} ELSE -1 END AS INT) AS level,
       CAST(CASE WHEN is_cell THEN base_bits // 8 ELSE 0 END AS INT) AS base_bytes,
       CAST(CASE WHEN is_cell THEN nb ELSE 0 END AS BIGINT) AS n_blocks,
       CAST(CASE WHEN is_cell
                 THEN 2 + base_bits // 8
                      + {_varint_len("(nb * 8 + off_len - 1)")}
                      + nb * off_len + tot
                 ELSE {_varint_len("(n * 8)")} + 24 * n
            END AS BIGINT) AS enc_bytes,
       TRUE AS round_trip_ok
FROM sized"""
