"""Hilbert-curve lookup tables and (face,i,j) <-> S2CellId transcoding.

Re-derivation of the S2 cell-id bit layout from first principles of the
published algorithm (reference: s2coords_internal.h:38-81 for the traversal
tables, s2cell_id.cc:60-115 for the 4-bit lookup construction and
s2cell_id.cc:267-373 for FromFaceIJ / ToFaceIJOrientation).  Everything in
this module is vectorized NumPy over uint64 arrays -- no per-row Python.

NumPy 1.x hazard: mixing ``uint64`` arrays with Python ints promotes to
float64.  All constants here are pre-wrapped ``np.uint64`` scalars.
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64

# --- curve orientation flags (s2coords_internal.h:38-40) ---
SWAP_MASK = 0x01
INVERT_MASK = 0x02

# kIJtoPos[orientation][ij] (s2coords_internal.h:46-55)
IJ_TO_POS = np.array(
    [
        [0, 1, 3, 2],
        [0, 3, 1, 2],
        [2, 3, 1, 0],
        [2, 1, 3, 0],
    ],
    dtype=np.int64,
)

# kPosToIJ[orientation][pos] (s2coords_internal.h:63-72)
POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],
        [0, 2, 3, 1],
        [3, 2, 0, 1],
        [3, 1, 0, 2],
    ],
    dtype=np.int64,
)

# kPosToOrientation[pos] (s2coords_internal.h:80-82)
POS_TO_ORIENTATION = np.array([SWAP_MASK, 0, 0, INVERT_MASK + SWAP_MASK], dtype=np.int64)

LOOKUP_BITS = 4
MAX_LEVEL = 30
POS_BITS = 2 * MAX_LEVEL + 1  # 61
MAX_SIZE = 1 << MAX_LEVEL  # 2^30 leaf-cell grid


def _build_lookup_tables() -> tuple[np.ndarray, np.ndarray]:
    """Build the 1024-entry pos/ij tables (s2cell_id.cc:75-115 scheme).

    Key layout: ``iiiijjjjoo`` -> value ``ppppppppoo``.
    Built iteratively (BFS over 4 levels) rather than by recursion.
    """
    pos_tab = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint64)
    ij_tab = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint64)

    def init_cell(level, i, j, orig_orientation, pos, orientation):
        if level == LOOKUP_BITS:
            ij = (i << LOOKUP_BITS) + j
            pos_tab[(ij << 2) + orig_orientation] = U64((pos << 2) + orientation)
            ij_tab[(pos << 2) + orig_orientation] = U64((ij << 2) + orientation)
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = POS_TO_IJ[orientation]
        for k in range(4):
            init_cell(
                level,
                i + (int(r[k]) >> 1),
                j + (int(r[k]) & 1),
                orig_orientation,
                pos + k,
                orientation ^ int(POS_TO_ORIENTATION[k]),
            )

    for orient in (0, SWAP_MASK, INVERT_MASK, SWAP_MASK | INVERT_MASK):
        init_cell(0, 0, 0, orient, 0, orient)
    return pos_tab, ij_tab


LOOKUP_POS, LOOKUP_IJ = _build_lookup_tables()

# pre-wrapped uint64 constants for the hot loops
_C = {k: U64(k) for k in (0, 1, 2, 3, 4, 6, 8, 10, 15, 60, 61, 255)}

U32 = np.uint32
_D = {k: U32(k) for k in (1, 2, 3, 8, 10, 255)}


def _compose_lookup8() -> tuple[np.ndarray, np.ndarray]:
    """Compose the 4-bit tables into 8-bit ones (4 loop iterations instead
    of 8 in the hot transcoders; the chained-orientation composition is the
    same recurrence s2cell_id.cc:267-307 applies per nibble, so the result
    is bit-identical by construction).  uint32 keeps both 262144-entry
    tables at 1 MB each and the loop-carried arrays narrow."""
    idx = np.arange(1 << 18, dtype=np.uint64)
    # POS8: key = iiiiiiii jjjjjjjj oo -> value = pppppppppppppppp oo
    i8, j8, o = idx >> _C[10], (idx >> _C[2]) & _C[255], idx & _C[3]
    v1 = LOOKUP_POS[((i8 >> _C[4]) << _C[6]) | ((j8 >> _C[4]) << _C[2]) | o]
    v2 = LOOKUP_POS[
        ((i8 & _C[15]) << _C[6]) | ((j8 & _C[15]) << _C[2]) | (v1 & _C[3])
    ]
    pos8 = ((((v1 >> _C[2]) << _C[8]) | (v2 >> _C[2])) << _C[2]) | (v2 & _C[3])
    # IJ8: key = pppppppppppppppp oo -> value = iiiiiiii jjjjjjjj oo
    p16 = idx >> _C[2]
    w1 = LOOKUP_IJ[((p16 >> _C[8]) << _C[2]) | o]
    w2 = LOOKUP_IJ[((p16 & _C[255]) << _C[2]) | (w1 & _C[3])]
    ij1, ij2 = w1 >> _C[2], w2 >> _C[2]
    i_8 = ((ij1 >> _C[4]) << _C[4]) | (ij2 >> _C[4])
    j_8 = ((ij1 & _C[15]) << _C[4]) | (ij2 & _C[15])
    ij8 = (i_8 << _C[10]) | (j_8 << _C[2]) | (w2 & _C[3])
    return pos8.astype(np.uint32), ij8.astype(np.uint32)


LOOKUP_POS8, LOOKUP_IJ8 = _compose_lookup8()


def from_face_ij(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Vectorized FromFaceIJ (s2cell_id.cc:267-307): leaf cell id (uint64).

    face: int array in [0,6); i, j: int arrays in [0, 2^30).  Four 8-bit
    lookup rounds (tables composed from the reference's 4-bit scheme);
    bit-identical to the 4-bit form in ``_from_face_ij4`` (regression-
    tested in tests/test_cellid.py).
    """
    i = i.astype(np.uint32, copy=False)
    j = j.astype(np.uint32, copy=False)
    n = face.astype(np.uint64, copy=False) << _C[60]
    bits = (face & 1).astype(np.uint32, copy=False)
    for k in range(3, -1, -1):
        kk = U32(k * 8)
        key = (
            bits
            + (((i >> kk) & _D[255]) << _D[10])
            + (((j >> kk) & _D[255]) << _D[2])
        )
        v = LOOKUP_POS8[key]
        n = n | ((v >> _D[2]).astype(np.uint64) << U64(k * 16))
        bits = v & _D[3]
    return n * _C[2] + _C[1]


def _from_face_ij4(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """The original 8-round 4-bit-lookup form, kept as the regression
    reference for the composed tables (s2cell_id.cc:267-307 verbatim
    loop structure)."""
    face = face.astype(np.uint64, copy=False)
    i = i.astype(np.uint64, copy=False)
    j = j.astype(np.uint64, copy=False)
    n = face << _C[60]
    bits = face & _C[1]  # alternating faces flip orientation (kSwapMask)
    for k in range(7, -1, -1):
        kk = U64(k * LOOKUP_BITS)
        bits = bits + (((i >> kk) & _C[15]) << _C[6])
        bits = bits + (((j >> kk) & _C[15]) << _C[2])
        bits = LOOKUP_POS[bits]
        n = n | ((bits >> _C[2]) << U64(k * 2 * LOOKUP_BITS))
        bits = bits & _C[3]
    return n * _C[2] + _C[1]


def to_face_ij_orientation(
    cell_id: np.ndarray, want_orientation: bool = False
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray | None]:
    """Vectorized ToFaceIJOrientation (s2cell_id.cc:319-373).

    Returns (face, i, j, orientation-or-None) for uint64 cell ids.  Four
    8-bit lookup rounds; bit-identical to the 4-bit form in
    ``_to_face_ij_orientation4`` (regression-tested).
    """
    cell_id = cell_id.astype(np.uint64, copy=False)
    face = cell_id >> _C[61]
    bits = (face & _C[1]).astype(np.uint32)
    i = np.zeros(cell_id.shape, dtype=np.uint32)
    j = np.zeros(cell_id.shape, dtype=np.uint32)
    for k in range(3, -1, -1):
        # top round carries 6 of the 8 i/j bit-pairs (30 = 3*8 + 6)
        nbits = (MAX_LEVEL - 3 * 8) if k == 3 else 8
        mask = U64((1 << (2 * nbits)) - 1)
        chunk = ((cell_id >> U64(k * 16 + 1)) & mask).astype(np.uint32)
        v = LOOKUP_IJ8[bits + (chunk << _D[2])]
        kk = U32(k * 8)
        i = i | ((v >> _D[10]) << kk)
        j = j | (((v >> _D[2]) & _D[255]) << kk)
        bits = v & _D[3]
    orientation = None
    if want_orientation:
        # suffix "00" pairs flip kSwapMask (s2cell_id.cc:357-369)
        lsb = cell_id & (~cell_id + _C[1])
        flip = (lsb & U64(0x1111111111111110)) != 0
        orientation = np.where(flip, bits ^ _D[1], bits).astype(np.int64)
    return (
        face.astype(np.int64),
        i.astype(np.int64),
        j.astype(np.int64),
        orientation,
    )


def _to_face_ij_orientation4(
    cell_id: np.ndarray, want_orientation: bool = False
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray | None]:
    """The original 8-round 4-bit-lookup decode, kept as the regression
    reference for the composed tables."""
    cell_id = cell_id.astype(np.uint64, copy=False)
    face = cell_id >> _C[61]
    bits = face & _C[1]
    i = np.zeros(cell_id.shape, dtype=np.uint64)
    j = np.zeros(cell_id.shape, dtype=np.uint64)
    for k in range(7, -1, -1):
        nbits = (MAX_LEVEL - 7 * LOOKUP_BITS) if k == 7 else LOOKUP_BITS
        mask = U64((1 << (2 * nbits)) - 1)
        bits = bits + (((cell_id >> U64(k * 2 * LOOKUP_BITS + 1)) & mask) << _C[2])
        bits = LOOKUP_IJ[bits]
        kk = U64(k * LOOKUP_BITS)
        i = i + ((bits >> _C[6]) << kk)
        j = j + (((bits >> _C[2]) & _C[15]) << kk)
        bits = bits & _C[3]
    orientation = None
    if want_orientation:
        lsb = cell_id & (~cell_id + _C[1])
        flip = (lsb & U64(0x1111111111111110)) != 0
        orientation = np.where(flip, bits ^ _C[1], bits).astype(np.int64)
    return (
        face.astype(np.int64),
        i.astype(np.int64),
        j.astype(np.int64),
        orientation,
    )
