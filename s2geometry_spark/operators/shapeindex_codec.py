"""Distributed MutableS2ShapeIndex serialization
(mutable_s2shape_index.cc:1988-2030 + s2shape_index.cc:69-372 via
kernels/shapeindexcodec) — closes the last delegated §2.3/§1.3 row.

Per FACE, the distributed build's posting lists (face, level, ci, cj,
eid) become one reference-format index blob: the face's cell ids in
unsigned order through the EncodedS2CellIdVector codec, and each
cell's clipped-shape list (shape = eid % num_shapes here — a
deterministic multi-shape assignment that exercises the shape-delta
arms) through the tagged-varint S2ShapeIndexCell encoding, framed by
an EncodedStringVector.  The blob is decoded back and the row reports

  (face, n_cells, n_postings, n_multi, enc_bytes, round_trip_ok)

The DuckDB oracle replays the ENTIRE pipeline analytically: the BFS
posting replay, per-clipped contiguity/shape-delta varint arms, the
EncodeEdges run decomposition (gaps-and-islands + the lone-last-edge
shortcut), per-cell multi-clipped headers, the EncodedS2CellIdVector
size arithmetic (ctz cascade + 8-way base-length argmin — the
cell_vector_codec recipe), and the string-vector framing;
``round_trip_ok`` is pinned TRUE.

Scale note: per-face groups are the natural serialization unit for
this fixture (6 bounded blobs); a planetary index shards blobs by the
density-tree partitioner instead, same plan shape (one hash shuffle on
the blob key, bounded per-group state).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels import cellid, hilbert, shapeindexcodec

_SCHEMA = (
    "face long, n_cells long, n_postings long, n_multi long, "
    "enc_bytes long, round_trip_ok boolean"
)


def face_index_codec(
    postings: DataFrame,
    num_shapes: int = 4,
    max_edges_per_cell: int = 10,
) -> DataFrame:
    """``postings``: (face, level, ci, cj, eid) finalized posting rows
    (shape_index_postings)."""

    def per_face(pdf: pd.DataFrame) -> pd.DataFrame:
        face = int(pdf["face"].iloc[0])
        lvl = pdf["level"].to_numpy(np.int64)
        ci = pdf["ci"].to_numpy(np.int64)
        cj = pdf["cj"].to_numpy(np.int64)
        eid = pdf["eid"].to_numpy(np.int64)
        # cell id = parent(level) over the min-corner leaf
        i = ci << (30 - lvl)
        j = cj << (30 - lvl)
        leaf = hilbert.from_face_ij(np.full(len(pdf), face), i, j)
        cells = np.zeros(len(pdf), np.uint64)
        for L in np.unique(lvl):
            m = lvl == L
            cells[m] = cellid.parent(leaf[m], int(L))
        order = np.lexsort((eid, cells))
        cells, eid = cells[order], eid[order]
        uniq, starts = np.unique(cells, return_index=True)
        # np.unique returns ascending uint64 == unsigned index order
        bodies = []
        n_multi = 0
        bounds = list(starts) + [len(cells)]
        for a, b in zip(bounds[:-1], bounds[1:]):
            es = eid[a:b]
            clipped = []
            for sid in range(num_shapes):
                se = es[es % num_shapes == sid]
                if len(se):
                    clipped.append((sid, False, sorted(int(v) for v in se)))
            if len(clipped) > 1:
                n_multi += 1
            bodies.append(clipped)
        buf = shapeindexcodec.encode_shape_index(
            uniq, bodies, num_shapes, max_edges_per_cell
        )
        me, dids, dbodies = shapeindexcodec.decode_shape_index(buf, num_shapes)
        ok = (
            me == max_edges_per_cell
            and dids.tolist() == uniq.tolist()
            and dbodies == bodies
        )
        return pd.DataFrame(
            [
                {
                    "face": face,
                    "n_cells": len(uniq),
                    "n_postings": len(cells),
                    "n_multi": n_multi,
                    "enc_bytes": len(buf),
                    "round_trip_ok": bool(ok),
                }
            ]
        )

    return postings.groupBy("face").applyInPandas(per_face, _SCHEMA)


def _vl(e: str) -> str:
    """varint byte length of a non-negative integer expression."""
    return (
        f"(CASE WHEN {e} < 128 THEN 1 WHEN {e} < 16384 THEN 2 "
        f"WHEN {e} < 2097152 THEN 3 WHEN {e} < 268435456 THEN 4 ELSE 5 END)"
    )


def _bw(e: str) -> str:
    return f"(CASE WHEN {e} = 0 THEN 0 ELSE length(bin(CAST({e} AS BIGINT))) END)"


_BIAS = 1 << 63


def face_index_codec_oracle_sql(
    postings_ctes: str,
    num_shapes: int = 4,
    max_edges_per_cell: int = 10,
    max_level: int = 8,
) -> str:
    """Analytic size replay of the whole index serialization in pure
    integer SQL: per-clipped varint arms + EncodeEdges run
    decomposition (s2shape_index.cc:69-190, 290-323), per-cell
    multi-clipped headers, the EncodedS2CellIdVector size arithmetic
    (encoded_s2cell_id_vector.cc:92-150 — the cell_vector_codec
    recipe keyed by face), and the string-vector framing
    (encoded_uint_vector.h:203-226).  ``postings_ctes`` must end in
    CTE ``post`` (face, level, ci, cj, eid)."""
    from .. import oracle

    pk = "face, level, ci, cj"
    parent_case = (
        "CASE level "
        + " ".join(
            f"WHEN {L} THEN {oracle.parent_sql_expr('cell_leaf', L)}"
            for L in range(max_level + 1)
        )
        + " END"
    )
    # EncodedS2CellIdVector size replay (cellvec recipe, tile := face)
    db_case = "CASE " + " ".join(
        f"WHEN tdelta < {1 << (8 * k)} THEN {k}" for k in range(1, 8)
    ) + " ELSE 8 END"
    top_full = "CASE " + " ".join(
        f"WHEN db = {k} THEN tdelta >= {1 << (8 * k - 1)}" for k in range(1, 8)
    ) + " ELSE tdelta >= 9223372036854775808 END"
    len_rows = ", ".join(f"({k}, {1 << (64 - 8 * k)})" for k in range(1, 8))
    ctz_steps = [(32, 1 << 32), (16, 1 << 16), (8, 1 << 8), (4, 16), (2, 4), (1, 2)]
    ctz = ["z0 AS (SELECT *, uor AS zx, CAST(1 AS HUGEINT) AS zp, 0 AS zc FROM vagg)"]
    for i, (bits, p) in enumerate(ctz_steps):
        ctz.append(
            f"z{i + 1} AS (SELECT * EXCLUDE (zx, zp, zc),\n"
            f"  CASE WHEN zx % {p} = 0 THEN zx // {p} ELSE zx END AS zx,\n"
            f"  CASE WHEN zx % {p} = 0 THEN zp * {p} ELSE zp END AS zp,\n"
            f"  CASE WHEN zx % {p} = 0 THEN zc + {bits} ELSE zc END AS zc\n"
            f"  FROM z{i})"
        )
    ctz_sql = ",\n".join(ctz)
    return f"""WITH {postings_ctes},
cl0 AS (SELECT {pk}, eid, eid % {num_shapes} AS sid FROM post),
clip AS (
  SELECT {pk}, sid, count(*) AS n, min(eid) AS e0, max(eid) AS e1
  FROM cl0 GROUP BY {pk}, sid
),
-- EncodeEdges run decomposition (gaps-and-islands per clipped)
runs0 AS (
  SELECT {pk}, sid, eid,
         eid - row_number() OVER (PARTITION BY {pk}, sid ORDER BY eid) AS grp
  FROM cl0
),
runs AS (
  SELECT {pk}, sid, grp, min(eid) AS rstart, count(*) AS rcount
  FROM runs0 GROUP BY {pk}, sid, grp
),
runs2 AS (
  SELECT *,
    row_number() OVER (PARTITION BY {pk}, sid ORDER BY rstart) AS rk,
    count(*) OVER (PARTITION BY {pk}, sid) AS nruns,
    coalesce(lag(rstart + rcount)
             OVER (PARTITION BY {pk}, sid ORDER BY rstart), 0) AS rbase
  FROM runs
),
runsz AS (
  SELECT {pk}, sid, sum(CASE
    WHEN rk = nruns AND rcount = 1 THEN {_vl("(rstart - rbase)")}
    WHEN rcount < 8 THEN {_vl("((rstart - rbase) * 8 + rcount - 1)")}
    ELSE {_vl("((rcount - 8) * 8 + 7)")} + {_vl("(rstart - rbase)")}
    END) AS edges_bytes
  FROM runs2 GROUP BY {pk}, sid
),
clipsz0 AS (
  SELECT c.face, c.level, c.ci, c.cj, c.sid, c.n, c.e0, c.e1, r.edges_bytes,
    coalesce(lag(c.sid + 1)
             OVER (PARTITION BY c.face, c.level, c.ci, c.cj ORDER BY c.sid),
             0) AS sbase
  FROM clip c
  JOIN runsz r ON r.face = c.face AND r.level = c.level AND r.ci = c.ci
              AND r.cj = c.cj AND r.sid = c.sid
),
clipsz AS (
  SELECT {pk}, count(*) AS nclip,
    sum(CASE WHEN n <= 16 AND e1 - e0 = n - 1
         THEN {_vl("(e0 * 4)")} + {_vl("((sid - sbase) * 16 + n - 1)")}
         ELSE {_vl("((n - 1) * 8 + 1)")} + {_vl("(sid - sbase)")}
              + edges_bytes END) AS cb
  FROM clipsz0 GROUP BY {pk}
),
bodysz AS (
  SELECT {pk}, nclip,
    cb + CASE WHEN nclip > 1 THEN {_vl("(nclip * 8 + 3)")} ELSE 0 END
      AS body_bytes
  FROM clipsz
),
-- cell ids: min-corner leaf through the Hilbert chain, then parent
csrc AS (
  SELECT {pk}, ci << (30 - level) AS i, cj << (30 - level) AS j
  FROM (SELECT DISTINCT {pk} FROM post)
),
{oracle.leaf_from_face_ij_cte("csrc")},
cellsb AS (
  SELECT face, level, ci, cj, {parent_case} AS cb_id FROM leaf
),
vu AS (
  SELECT face AS tile, CAST(cb_id AS HUGEINT) + {_BIAS} AS u FROM cellsb
),
vagg AS (
  SELECT tile, COUNT(*) AS n, MIN(u) AS umin, MAX(u) AS umax,
         bit_or(u) AS uor, bit_and(u) AS uand
  FROM vu GROUP BY tile
),
{ctz_sql},
sh AS (
  SELECT *, CASE WHEN (uand // pcap) % 2 = 1 THEN pcap * 2 ELSE pcap END AS pshift,
         CASE WHEN (uand // pcap) % 2 = 1 THEN ccap + 1 ELSE ccap END AS shift,
         (uand // pcap) % 2 = 1 AS shift_odd
  FROM (
    SELECT *, CASE WHEN zc - (zc % 2) > 56 THEN CAST({1 << 56} AS HUGEINT)
                   WHEN zc % 2 = 1 THEN zp // 2 ELSE zp END AS pcap,
              LEAST(56, zc - (zc % 2)) AS ccap
    FROM z6)),
cand AS (
  SELECT s.*, l.len, (s.umin // l.b) * l.b AS tbase
  FROM sh s CROSS JOIN (VALUES (0, CAST({1 << 64} AS HUGEINT)), {len_rows}) l(len, b)),
csized AS (
  SELECT *, len + n * db AS tbytes FROM (
    SELECT *, {db_case} AS db FROM (
      SELECT *, (umax - tbase) // pshift AS tdelta FROM cand))),
cbest AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY tile ORDER BY tbytes, len) AS rn
    FROM csized) WHERE rn = 1),
cfin AS (
  SELECT tile,
    CASE WHEN shift_odd AND {top_full} AND shift >= 5 THEN 2 ELSE 1 END
      + len + CASE WHEN n * 8 + db - 1 < 128 THEN 1
                   WHEN n * 8 + db - 1 < 16384 THEN 2
                   WHEN n * 8 + db - 1 < 2097152 THEN 3 ELSE 4 END
      + n * db AS cv_bytes
  FROM cbest),
ftot AS (
  SELECT face, count(*) AS n_cells, sum(body_bytes) AS tot_body,
         sum(CASE WHEN nclip > 1 THEN 1 ELSE 0 END) AS n_multi
  FROM bodysz GROUP BY face
),
fpost AS (SELECT face, count(*) AS n_postings FROM post GROUP BY face)
SELECT t.face,
       CAST(t.n_cells AS BIGINT) AS n_cells,
       CAST(p.n_postings AS BIGINT) AS n_postings,
       CAST(t.n_multi AS BIGINT) AS n_multi,
       CAST({_vl(f"({max_edges_per_cell} * 4)")} + c.cv_bytes
            + {_vl("(t.n_cells * 8 + ((greatest(" + _bw("t.tot_body") + ", 1) - 1) // 8))")}
            + t.n_cells * (((greatest({_bw("t.tot_body")}, 1) - 1) // 8) + 1)
            + t.tot_body AS BIGINT) AS enc_bytes,
       TRUE AS round_trip_ok
FROM ftot t
JOIN fpost p ON p.face = t.face
JOIN cfin c ON c.tile = t.face
ORDER BY t.face"""
