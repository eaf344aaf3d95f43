"""S2PaddedCell, vectorized (s2padded_cell.cc:40-169).

An S2Cell whose (u,v) bound is expanded by a fixed padding on all sides
— the workhorse of MutableS2ShapeIndex's recursive edge subdivision and
S2CrossingEdgeQuery's index descent.  The reference is an in-memory
recursion helper (parent→child field updates, s2padded_cell.cc:62-80);
here every accessor is a columnar kernel over arrays of cell ids, and
the incremental child construction is unnecessary: computing a child's
fields directly from its own id is bitwise-identical to the reference's
parent-corner/middle-corner splice (both sides are exactly-rounded
products of exact integers with power-of-two scale factors — asserted
in tests/test_paddedcell.py).

shrink_to_fit (s2padded_cell.cc:128-168) is the piece distributed query
plans use: the smallest cell whose padded bound contains an R2 rect —
the index-descent seed cell for an edge's face-clipped UV bbox.
"""

from __future__ import annotations

import numpy as np

from . import cellid, coords, hilbert

DBL_EPSILON = 2.220446049250313e-16
#: MutableS2ShapeIndex's kCellPadding = kMaxDiag(0)/2-style constant is
#: owned by operators/shape_index; this module is padding-agnostic.


def padded_fields(ids: np.ndarray, padding: float) -> dict:
    """Per-cell constructor fields (s2padded_cell.cc:40-60):
    level, orientation, ij_lo_i, ij_lo_j, and the PADDED uv bound
    (u_lo, u_hi, v_lo, v_hi).

    Uses the generic decode path for face cells too — for a face cell
    ToFaceIJOrientation yields orientation == face & 1 and
    IJLevelToBoundUV yields [-1, 1]^2, identical to the reference's
    fast path (regression-asserted in tests).
    """
    ids = np.asarray(ids, np.uint64)
    lvl = cellid.level(ids).astype(np.int64)
    face, i, j, orient = hilbert.to_face_ij_orientation(
        ids, want_orientation=True
    )
    size = cellid.get_size_ij(lvl).astype(np.int64)
    ij_lo_i = i.astype(np.int64) & -size
    ij_lo_j = j.astype(np.int64) & -size
    u_lo = coords.st_to_uv(coords.ij_to_st_min(ij_lo_i)) - padding
    u_hi = coords.st_to_uv(coords.ij_to_st_min(ij_lo_i + size)) + padding
    v_lo = coords.st_to_uv(coords.ij_to_st_min(ij_lo_j)) - padding
    v_hi = coords.st_to_uv(coords.ij_to_st_min(ij_lo_j + size)) + padding
    return {
        "level": lvl,
        "orientation": np.asarray(orient, np.int64),
        "ij_lo_i": ij_lo_i,
        "ij_lo_j": ij_lo_j,
        "u_lo": u_lo,
        "u_hi": u_hi,
        "v_lo": v_lo,
        "v_hi": v_hi,
        "face": np.asarray(face, np.int64),
        "size": size,
    }


def middle_rect(ids: np.ndarray, padding: float) -> tuple:
    """middle() (s2padded_cell.cc:82-93): the 2*padding-wide strip
    around the cell's center lines — (u_lo, u_hi, v_lo, v_hi)."""
    f = padded_fields(ids, padding)
    u = coords.st_to_uv(coords.si_ti_to_st(2 * f["ij_lo_i"] + f["size"]))
    v = coords.st_to_uv(coords.si_ti_to_st(2 * f["ij_lo_j"] + f["size"]))
    return u - padding, u + padding, v - padding, v + padding


def get_center(ids: np.ndarray) -> tuple:
    """GetCenter (s2padded_cell.cc:95-100) — normalized."""
    f = padded_fields(ids, 0.0)
    si = 2 * f["ij_lo_i"] + f["size"]
    ti = 2 * f["ij_lo_j"] + f["size"]
    return coords.normalize(*coords.face_si_ti_to_xyz(f["face"], si, ti))


def get_entry_vertex(ids: np.ndarray) -> tuple:
    """GetEntryVertex (s2padded_cell.cc:102-113): the vertex where the
    Hilbert curve enters the cell — (0,0) unless axes inverted."""
    f = padded_fields(ids, 0.0)
    inv = (f["orientation"] & hilbert.INVERT_MASK) != 0
    i = f["ij_lo_i"] + np.where(inv, f["size"], 0)
    j = f["ij_lo_j"] + np.where(inv, f["size"], 0)
    return coords.normalize(*coords.face_si_ti_to_xyz(f["face"], 2 * i, 2 * j))


def get_exit_vertex(ids: np.ndarray) -> tuple:
    """GetExitVertex (s2padded_cell.cc:115-126): (1,0) unless swapped or
    inverted (but not both), then (0,1)."""
    f = padded_fields(ids, 0.0)
    o = f["orientation"]
    plain = (o == 0) | (o == hilbert.SWAP_MASK + hilbert.INVERT_MASK)
    i = f["ij_lo_i"] + np.where(plain, f["size"], 0)
    j = f["ij_lo_j"] + np.where(plain, 0, f["size"])
    return coords.normalize(*coords.face_si_ti_to_xyz(f["face"], 2 * i, 2 * j))


def _bit_width(x: np.ndarray) -> np.ndarray:
    """absl::bit_width for positive ints < 2^53 — exact via frexp."""
    _, e = np.frexp(x.astype(np.float64))
    return e.astype(np.int64)


def shrink_to_fit(
    ids: np.ndarray,
    padding: float,
    ru_lo: np.ndarray,
    ru_hi: np.ndarray,
    rv_lo: np.ndarray,
    rv_hi: np.ndarray,
) -> np.ndarray:
    """ShrinkToFit (s2padded_cell.cc:128-168): per (cell, rect) row, the
    smallest descendant cell whose padded bound still contains ``rect``
    (requires rect to intersect the cell's padded bound).

    Returns uint64 cell ids.  The whole case analysis — center-line
    quick reject, padding + 1.5*DBL_EPSILON expansion, ij span, xor
    bit-width level choice — is replicated branch-for-branch.
    """
    ids = np.asarray(ids, np.uint64)
    f = padded_fields(ids, padding)
    lvl, size = f["level"], f["size"]
    # quick rejection: rect contains the cell's center line on an axis
    u_mid = coords.st_to_uv(coords.si_ti_to_st(2 * f["ij_lo_i"] + size))
    v_mid = coords.st_to_uv(coords.si_ti_to_st(2 * f["ij_lo_j"] + size))
    u_mid = np.where(lvl == 0, 0.0, u_mid)
    v_mid = np.where(lvl == 0, 0.0, v_mid)
    keep = ((ru_lo <= u_mid) & (u_mid <= ru_hi)) | (
        (rv_lo <= v_mid) & (v_mid <= rv_hi)
    )
    pad = padding + 1.5 * DBL_EPSILON
    i_min = np.maximum(f["ij_lo_i"], coords.st_to_ij(coords.uv_to_st(ru_lo - pad)))
    i_max = np.minimum(
        f["ij_lo_i"] + size - 1, coords.st_to_ij(coords.uv_to_st(ru_hi + pad))
    )
    j_min = np.maximum(f["ij_lo_j"], coords.st_to_ij(coords.uv_to_st(rv_lo - pad)))
    j_max = np.minimum(
        f["ij_lo_j"] + size - 1, coords.st_to_ij(coords.uv_to_st(rv_hi + pad))
    )
    ij_xor = (i_min ^ i_max) | (j_min ^ j_max)
    level_msb = (ij_xor << 1) + 1
    new_lvl = cellid.MAX_LEVEL - (_bit_width(level_msb) - 1)
    keep = keep | (new_lvl <= lvl)
    new_lvl = np.maximum(new_lvl, 0)  # safe parent() arg on kept rows
    leaf = hilbert.from_face_ij(
        f["face"].astype(np.uint64),
        np.maximum(i_min, 0),
        np.maximum(j_min, 0),
    )
    shrunk = cellid.parent(leaf, new_lvl)
    return np.where(keep, ids, shrunk)
