"""Distributed EncodedS2CellIdVector storage op (SURVEY.md §2.3).

Per level-``level`` tile, the sorted DISTINCT leaf ids under the tile
are encoded with kernels.cellcodec (the reference wire format of
encoded_s2cell_id_vector.cc:62-151), decoded back, and summarized:

  (tile, n_cells, enc_bytes, lb_mid, ids_xor, min_id, max_id)

* ``enc_bytes`` — actual encoded buffer length; the DuckDB oracle
  recomputes it ANALYTICALLY from the raw ids (shift selection via a
  trailing-zero cascade, the 8-way base-length minimization, fixed
  delta width, varint header) so any drift in the codec's size logic
  hash-mismatches.
* ``lb_mid`` — ``lower_bound`` of the tile's unsigned-midpoint id over
  the ENCODED buffer (encoded_s2cell_id_vector.h:105-116); the oracle
  counts ids below the same midpoint.
* ``ids_xor/min_id/max_id`` — computed from the DECODED ids, so a
  round-trip corruption anywhere breaks value parity.

Scale: one hash shuffle on the tile key; per-group state is the tile's
distinct-leaf vector (bounded by tile occupancy — pick the level so
tiles bound memory, exactly the coverer's max-cells discipline).  The
C++ class's lazy random access is a pointer-into-mmap concern that
Parquet pages + Arrow batches replace (SURVEY.md §2.3 scope note).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import functions as s2f
from ..kernels import cellcodec
from ..kernels.cellid import from_biased, to_biased

_BIAS = 1 << 63

_SCHEMA = (
    "tile long, n_cells long, enc_bytes long, lb_mid long, "
    "ids_xor long, min_id long, max_id long"
)


def tile_cell_vector_codec(
    df: DataFrame, level: int = 4, cell: str = "cell"
) -> DataFrame:
    """df must carry a biased-int64 leaf cell-id column ``cell``."""

    def per_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        tile = int(pdf["tile"].iloc[0])
        biased = np.unique(pdf["c"].to_numpy(np.int64))
        # signed order of biased ids == unsigned order of true ids, so
        # the unique() result is already sorted for lower_bound
        ids = from_biased(biased)
        buf = cellcodec.encode_cell_ids(ids)
        dec = cellcodec.decode_cell_ids(buf)
        dec_b = to_biased(dec).astype(np.int64)
        u_min = int(ids[0])
        u_max = int(ids[-1])
        mid = u_min + (u_max - u_min) // 2
        return pd.DataFrame(
            [
                {
                    "tile": tile,
                    "n_cells": len(dec_b),
                    "enc_bytes": len(buf),
                    "lb_mid": cellcodec.lower_bound(buf, mid),
                    "ids_xor": int(np.bitwise_xor.reduce(dec_b)),
                    "min_id": int(dec_b.min()),
                    "max_id": int(dec_b.max()),
                }
            ]
        )

    keyed = df.select(
        s2f.parent_expr(cell, level).alias("tile"), F.col(cell).alias("c")
    )
    return keyed.groupBy("tile").applyInPandas(per_tile, _SCHEMA)


def _ctz_cascade_sql(src: str) -> str:
    """CTE chain: trailing-zero count of ``uor`` with the power 2^ctz
    accumulated arithmetically (HUGEINT has no variable shift)."""
    steps = [(32, 1 << 32), (16, 1 << 16), (8, 1 << 8), (4, 1 << 4), (2, 4), (1, 2)]
    ctes = [f"z0 AS (SELECT *, uor AS zx, CAST(1 AS HUGEINT) AS zp, 0 AS zc FROM {src})"]
    for i, (bits, p) in enumerate(steps):
        ctes.append(
            f"z{i + 1} AS (SELECT * EXCLUDE (zx, zp, zc),\n"
            f"  CASE WHEN zx % {p} = 0 THEN zx // {p} ELSE zx END AS zx,\n"
            f"  CASE WHEN zx % {p} = 0 THEN zp * {p} ELSE zp END AS zp,\n"
            f"  CASE WHEN zx % {p} = 0 THEN zc + {bits} ELSE zc END AS zc\n"
            f"  FROM z{i})"
        )
    return ",\n".join(ctes)


def cell_vector_codec_oracle_sql(leaf_cte: str, parent_expr: str) -> str:
    """Analytic replay of EncodeS2CellIdVector's size computation
    (encoded_s2cell_id_vector.cc:92-150) in pure integer SQL over
    HUGEINT — no codec code shared with the engine."""
    db_case = "CASE " + " ".join(
        f"WHEN tdelta < {1 << (8 * k)} THEN {k}" for k in range(1, 8)
    ) + " ELSE 8 END"
    top_full = "CASE " + " ".join(
        f"WHEN db = {k} THEN tdelta >= {1 << (8 * k - 1)}" for k in range(1, 8)
    ) + " ELSE tdelta >= 9223372036854775808 END"
    len_rows = ", ".join(f"({k}, {1 << (64 - 8 * k)})" for k in range(1, 8))
    return f"""
WITH {leaf_cte},
ids AS (SELECT DISTINCT {parent_expr} AS tile, cell_leaf AS c FROM leaf),
uids AS (SELECT tile, c, CAST(c AS HUGEINT) + {_BIAS} AS u FROM ids),
agg AS (
  SELECT tile, COUNT(*) AS n,
         MIN(u) AS umin, MAX(u) AS umax,
         bit_or(u) AS uor, bit_and(u) AS uand,
         bit_xor(c) AS ids_xor, MIN(c) AS min_id, MAX(c) AS max_id
  FROM uids GROUP BY tile),
mid AS (
  SELECT *, umin + (umax - umin) // 2 AS tgt FROM agg),
lb AS (
  SELECT a.tile, COUNT(*) FILTER (WHERE u.u < a.tgt) AS lb_mid
  FROM mid a JOIN uids u ON u.tile = a.tile GROUP BY a.tile),
{_ctz_cascade_sql("mid")},
-- even shift (cap 56), then +1 when every id has the bit above set
-- (all-same-level rule, encoded_s2cell_id_vector.cc:104-110)
sh AS (
  SELECT *, CASE WHEN (uand // pcap) % 2 = 1 THEN pcap * 2 ELSE pcap END AS pshift,
         CASE WHEN (uand // pcap) % 2 = 1 THEN ccap + 1 ELSE ccap END AS shift,
         (uand // pcap) % 2 = 1 AS shift_odd
  FROM (
    SELECT *, CASE WHEN zc - (zc % 2) > 56 THEN CAST({1 << 56} AS HUGEINT)
                   WHEN zc % 2 = 1 THEN zp // 2 ELSE zp END AS pcap,
              LEAST(56, zc - (zc % 2)) AS ccap
    FROM z6)),
-- 8-way base-length minimization (cc:112-133); len 0 => base 0
cand AS (
  SELECT s.*, l.len, (s.umin // l.b) * l.b AS tbase
  FROM sh s CROSS JOIN (VALUES (0, CAST({1 << 64} AS HUGEINT)), {len_rows}) l(len, b)),
sized AS (
  SELECT *, len + n * db AS tbytes FROM (
    SELECT *, {db_case} AS db FROM (
      SELECT *, (umax - tbase) // pshift AS tdelta FROM cand))),
best AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY tile ORDER BY tbytes, len) AS rn
    FROM sized) WHERE rn = 1),
-- odd shift costs a 2nd header byte only when it survives the
-- drop-to-even rule (cc:134-137) and shift >= 5
fin AS (
  SELECT *,
    CASE WHEN shift_odd AND {top_full} AND shift >= 5 THEN 2 ELSE 1 END AS hdr,
    CASE WHEN n * 8 + db - 1 < 128 THEN 1
         WHEN n * 8 + db - 1 < 16384 THEN 2
         WHEN n * 8 + db - 1 < 2097152 THEN 3
         WHEN n * 8 + db - 1 < 268435456 THEN 4
         ELSE 5 END AS vb
  FROM best)
SELECT CAST(tile AS BIGINT) AS tile,
       CAST(n AS BIGINT) AS n_cells,
       CAST(hdr + len + vb + n * db AS BIGINT) AS enc_bytes,
       CAST(l.lb_mid AS BIGINT) AS lb_mid,
       CAST(ids_xor AS BIGINT) AS ids_xor,
       CAST(min_id AS BIGINT) AS min_id,
       CAST(max_id AS BIGINT) AS max_id
FROM fin JOIN lb l USING (tile)
"""
