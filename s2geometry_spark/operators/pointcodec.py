"""Distributed S2 point-compression storage op (SURVEY.md §2.3).

Per customer chain, the vertices are snapped to cell centers — level
``off_level`` for every ``off_mod``-th vertex (so they are OFF-center
at the encode level and exercise the raw-xyz tail of the format),
level ``level`` for the rest — then encoded with
kernels.pointcodec (the wire format of s2point_compression.cc:317-391),
decoded back, and summarized:

  (chain_id, n_pts, enc_bytes, n_off, n_runs, pi_xor, qi_xor)

* ``enc_bytes`` — actual buffer length; the DuckDB oracle recomputes it
  ANALYTICALLY (face-run gaps-and-islands, fixed first-point width,
  zigzag/interleave varint widths from bit lengths, off-center tail)
  from the raw vertices, so any drift in the codec's framing
  hash-mismatches.
* ``pi_xor/qi_xor`` — XORs of the DECODED (pi, qi) integer streams; a
  corruption anywhere in the derivative/interleave pipeline breaks
  value parity.  The kernel additionally asserts the decoded xyz equal
  the snapped xyz BIT-FOR-BIT (the reference's Roundtrip* contract,
  s2point_compression_test.cc) — exactness is possible because
  PiQitoST arithmetic is all powers of two.

Scale: one shuffle on the chain key; per-group state is one chain's
vertex list.  The C++ Encoder's streaming interface is replaced by
Parquet binary columns + Arrow batches (§2.3 scope note).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..kernels import cellid, pointcodec
from ..kernels.coords import face_si_ti_to_xyz, normalize

_SCHEMA = (
    "chain_id long, n_pts long, enc_bytes long, n_off long, "
    "n_runs long, pi_xor long, qi_xor long"
)


def chain_point_codec(
    chains: DataFrame,
    level: int = 18,
    off_level: int = 20,
    off_mod: int = 5,
    chain_col: str = "chain_id",
) -> DataFrame:
    """(chain_id, seq, x, y, z) -> one codec-witness row per chain."""

    def per_chain(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq")
        seq = pdf["seq"].to_numpy(np.int64)
        lvl = np.where(seq % off_mod == 0, off_level, level)
        leaf = cellid.from_xyz(
            pdf["x"].to_numpy(), pdf["y"].to_numpy(), pdf["z"].to_numpy()
        )
        cell = cellid.parent(leaf, lvl)
        face, si, ti = cellid.get_center_si_ti(cell)
        sx, sy, sz = normalize(*face_si_ti_to_xyz(face, si, ti))
        f2, si2, ti2, clvl = pointcodec.xyz_to_face_si_ti(sx, sy, sz)
        if not (
            np.array_equal(f2, face)
            and np.array_equal(si2, si)
            and np.array_equal(ti2, ti)
            and np.array_equal(clvl, lvl)
        ):
            raise AssertionError("XYZtoFaceSiTi did not invert the snap")
        xyz = np.stack([sx, sy, sz], axis=1)
        buf = pointcodec.encode_points_compressed(xyz, f2, si2, ti2, clvl, level)
        dec = pointcodec.decode_points_compressed(buf, level, len(xyz))
        if not np.array_equal(dec, xyz):
            raise AssertionError("compressed round-trip not bit-exact")
        pi = pointcodec.si_ti_to_pi_qi(si2, level)
        qi = pointcodec.si_ti_to_pi_qi(ti2, level)
        n_runs = 1 + int(np.count_nonzero(f2[1:] != f2[:-1])) if len(f2) else 0
        return pd.DataFrame(
            [
                {
                    "chain_id": int(pdf[chain_col].iloc[0]),
                    "n_pts": len(xyz),
                    "enc_bytes": len(buf),
                    "n_off": int(np.count_nonzero(clvl != level)),
                    "n_runs": n_runs,
                    "pi_xor": int(np.bitwise_xor.reduce(pi)),
                    "qi_xor": int(np.bitwise_xor.reduce(qi)),
                }
            ]
        )

    return chains.groupBy(chain_col).applyInPandas(per_chain, _SCHEMA)


def _bitlen_case(v: str, maxbits: int = 40) -> str:
    """SQL: number of bits in the non-negative integer ``v`` (0 -> 0)."""
    whens = " ".join(
        f"WHEN {v} < {1 << k} THEN {k}" for k in range(1, maxbits + 1)
    )
    return f"(CASE WHEN {v} = 0 THEN 0 {whens} ELSE 64 END)"


def _varint_len(v: str) -> str:
    """SQL: varint byte count of the non-negative integer ``v``."""
    bl = _bitlen_case(v)
    return f"GREATEST(1, ({bl} + 6) // 7)"


def point_codec_oracle_sql(
    verts_sql: str,
    level: int = 18,
    off_level: int = 20,
    off_mod: int = 5,
) -> str:
    """Analytic replay of S2EncodePointsCompressed's framing in pure
    integer SQL over the leaf coordinates — no codec code shared with
    the engine.  ``verts_sql`` must end in columns
    (chain_id, seq, face, i, j) where (face, i, j) are LEAF cell
    coordinates (the oracle.leaf_from_xyz_cte output)."""
    # pi at the encode level for a point snapped to the center of its
    # level-``lvl`` cell: si = (2*i_lvl + 1) << (30 - lvl), then
    # SiTitoPiQi's si >> (31 - level) (s2point_compression.cc:182-202)
    MAXL = 30
    shift_enc = 1 << (MAXL + 1 - level)

    def pi_expr(col: str) -> str:
        return f"""CASE WHEN lvl = {off_level}
        THEN ((2 * ({col} // {1 << (30 - off_level)}) + 1) * {1 << (30 - off_level)}) // {shift_enc}
        ELSE ((2 * ({col} // {1 << (30 - level)}) + 1) * {1 << (30 - level)}) // {shift_enc} END"""

    zz = "CASE WHEN {d} >= 0 THEN 2 * ({d}) ELSE -2 * ({d}) - 1 END"
    first_bytes = (level + 7) // 8 * 2
    return f"""
WITH vsrc AS MATERIALIZED ({verts_sql}),
base AS MATERIALIZED (
  SELECT chain_id, seq, face,
         row_number() OVER (PARTITION BY chain_id ORDER BY seq) - 1 AS rn,
         CASE WHEN seq % {off_mod} = 0 THEN {off_level} ELSE {level} END AS lvl,
         i, j
  FROM vsrc),
pq AS MATERIALIZED (
  SELECT chain_id, seq, rn, face, lvl,
         {pi_expr("i")} AS pi,
         {pi_expr("j")} AS qi
  FROM base),
-- face runs (FaceRun::Encode, s2point_compression.cc:47-66)
runs0 AS (
  SELECT chain_id, face, rn,
         CASE WHEN lag(face) OVER w IS DISTINCT FROM face THEN 1 ELSE 0 END AS new_run
  FROM pq WINDOW w AS (PARTITION BY chain_id ORDER BY rn)),
runs1 AS (
  SELECT chain_id, face,
         sum(new_run) OVER (PARTITION BY chain_id ORDER BY rn) AS run_id
  FROM runs0),
runs AS (
  SELECT chain_id, count(*) AS cnt, face FROM runs1
  GROUP BY chain_id, run_id, face),
face_bytes AS (
  SELECT chain_id, count(*) AS n_runs,
         sum({_varint_len("(6 * cnt + face)")}) AS fb
  FROM runs GROUP BY chain_id),
-- 2nd-derivative + zigzag + interleave varint widths (cc:232-252)
deriv AS (
  SELECT chain_id, rn, pi, qi,
         pi - lag(pi) OVER w AS d1p, qi - lag(qi) OVER w AS d1q
  FROM pq WINDOW w AS (PARTITION BY chain_id ORDER BY rn)),
deriv2 AS (
  SELECT chain_id, rn, pi, qi,
         CASE WHEN rn = 1 THEN d1p ELSE d1p - lag(d1p) OVER w END AS dp,
         CASE WHEN rn = 1 THEN d1q ELSE d1q - lag(d1q) OVER w END AS dq
  FROM deriv WINDOW w AS (PARTITION BY chain_id ORDER BY rn)),
zzs AS (
  SELECT chain_id, rn,
         {zz.format(d="dp")} AS zp, {zz.format(d="dq")} AS zq
  FROM deriv2 WHERE rn >= 1),
var_bytes AS (
  SELECT chain_id,
         sum(GREATEST(1,
           (GREATEST(2 * {_bitlen_case("zp")} - 1,
                     2 * {_bitlen_case("zq")}) + 6) // 7)) AS vb
  FROM zzs GROUP BY chain_id),
-- off-center tail (cc:326-341)
offs AS (
  SELECT chain_id,
         count(*) FILTER (WHERE lvl <> {level}) AS n_off,
         COALESCE(sum({_varint_len("rn")} + 24)
                  FILTER (WHERE lvl <> {level}), 0) AS ob
  FROM pq GROUP BY chain_id),
agg AS (
  SELECT chain_id, count(*) AS n_pts,
         bit_xor(pi) AS pi_xor, bit_xor(qi) AS qi_xor
  FROM pq GROUP BY chain_id)
SELECT a.chain_id,
       CAST(a.n_pts AS BIGINT) AS n_pts,
       CAST(f.fb + {first_bytes} + COALESCE(v.vb, 0)
            + {_varint_len("o.n_off")} + o.ob AS BIGINT) AS enc_bytes,
       CAST(o.n_off AS BIGINT) AS n_off,
       CAST(f.n_runs AS BIGINT) AS n_runs,
       CAST(a.pi_xor AS BIGINT) AS pi_xor,
       CAST(a.qi_xor AS BIGINT) AS qi_xor
FROM agg a
JOIN face_bytes f USING (chain_id)
LEFT JOIN var_bytes v USING (chain_id)
JOIN offs o USING (chain_id)
"""
