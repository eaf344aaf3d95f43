"""S2CellUnion set algebra over sorted uint64 NumPy arrays.

Reference semantics: s2cell_union.cc (Normalize :171-197, Denormalize
:204-233, Contains/Intersects :285-308, Union/Intersection/Difference
:347-452, Expand :454-484).  Coverings are small (<= max_cells), so these
run on the driver / inside per-group kernels; the distributed join forms
use the exploded-row DataFrames instead (operators/).
"""

from __future__ import annotations

import numpy as np

from . import cellid

U64 = np.uint64


def _are_siblings(a: int, b: int, c: int, d: int) -> bool:
    """AreSiblings (s2cell_union.cc): 4 children of one parent, in order."""
    if (a ^ b ^ c) != d:
        return False
    dd = np.array([d], dtype=np.uint64)
    if cellid.is_face(dd)[0]:
        return False
    lsb_ = int(cellid.lsb(dd)[0])
    mask = lsb_ << 1
    mask = ~(mask + (mask << 1)) & 0xFFFFFFFFFFFFFFFF
    idm = d & mask
    return (a & mask) == idm and (b & mask) == idm and (c & mask) == idm


def normalize(ids: np.ndarray) -> np.ndarray:
    """Sort; drop contained; merge 4 siblings -> parent, iterated."""
    vals = sorted(int(v) for v in np.asarray(ids, np.uint64).tolist())
    out: list[int] = []
    for v in vals:
        arr = np.array([v], dtype=np.uint64)
        if out:
            prev = np.array([out[-1]], dtype=np.uint64)
            if cellid.contains(prev, arr)[0]:
                continue
            while out and cellid.contains(arr, np.array([out[-1]], dtype=np.uint64))[0]:
                out.pop()
        while len(out) >= 3 and _are_siblings(out[-3], out[-2], out[-1], v):
            v = int(cellid.parent(np.array([v], dtype=np.uint64), cellid.level(np.array([v], dtype=np.uint64)) - 1)[0])
            del out[-3:]
        out.append(v)
    return np.array(out, dtype=np.uint64)


def denormalize(ids: np.ndarray, min_level: int, level_mod: int) -> np.ndarray:
    """Re-expand to the min_level/level_mod grid (s2cell_union.cc:204-233)."""
    out: list[int] = []
    for v in np.asarray(ids, np.uint64).tolist():
        arr = np.array([v], dtype=np.uint64)
        level = int(cellid.level(arr)[0])
        new_level = max(min_level, level)
        if level_mod > 1:
            new_level += (30 - (new_level - min_level)) % level_mod
            new_level = min(30, new_level)
        if new_level == level:
            out.append(v)
        else:
            cur = int(cellid.child_begin(arr, new_level)[0])
            end = int(cellid.child_end(arr, new_level)[0])
            step = 2 * int(cellid.lsb(np.array([cur], dtype=np.uint64))[0])
            while cur != end:
                out.append(cur)
                cur += step
    return np.array(out, dtype=np.uint64)


def contains_cell(union_ids: np.ndarray, targets: np.ndarray) -> np.ndarray:
    """Does the normalized union contain each target cell?  Binary search
    (s2cell_union.cc:285-297), vectorized via searchsorted."""
    u = np.asarray(union_ids, np.uint64)
    t = np.asarray(targets, np.uint64)
    if u.size == 0:
        return np.zeros(t.shape, dtype=bool)
    idx = np.searchsorted(u, t)  # first u >= t
    res = np.zeros(t.shape, dtype=bool)
    in_range = idx < u.size
    res[in_range] = cellid.range_min(u[idx[in_range]]) <= t[in_range]
    prev_ok = idx > 0
    if prev_ok.any():
        pi = idx[prev_ok] - 1
        res[prev_ok] |= cellid.range_max(u[pi]) >= t[prev_ok]
    return res


def intersects_cell(union_ids: np.ndarray, targets: np.ndarray) -> np.ndarray:
    """Does the normalized union intersect each target cell?"""
    u = np.asarray(union_ids, np.uint64)
    t = np.asarray(targets, np.uint64)
    if u.size == 0:
        return np.zeros(t.shape, dtype=bool)
    t_min = cellid.range_min(t)
    t_max = cellid.range_max(t)
    # first union cell whose range_max >= t_min
    u_max = cellid.range_max(u)
    idx = np.searchsorted(u_max, t_min)
    res = np.zeros(t.shape, dtype=bool)
    ok = idx < u.size
    res[ok] = cellid.range_min(u[idx[ok]]) <= t_max[ok]
    return res


def union(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return normalize(np.concatenate([np.asarray(a, U64), np.asarray(b, U64)]))


def intersection(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Two-pointer interval merge (semantics of s2cell_union.cc:371-422) —
    output of normalized inputs is normalized."""
    a = np.asarray(a, U64)
    b = np.asarray(b, U64)
    a_min, a_max = cellid.range_min(a), cellid.range_max(a)
    b_min, b_max = cellid.range_min(b), cellid.range_max(b)
    out = []
    i = j = 0
    while i < a.size and j < b.size:
        if a_max[i] < b_min[j]:
            i += 1
        elif b_max[j] < a_min[i]:
            j += 1
        # overlapping: the smaller (contained) cell is the intersection piece
        elif a_min[i] >= b_min[j] and a_max[i] <= b_max[j]:
            out.append(int(a[i]))
            i += 1
        elif b_min[j] >= a_min[i] and b_max[j] <= a_max[i]:
            out.append(int(b[j]))
            j += 1
        else:  # normalized unions can't partially overlap
            raise AssertionError("inputs not normalized")
    return np.array(out, dtype=np.uint64)


def difference(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """a \\ b, recursive per-cell subdivision (s2cell_union.cc:424-452)."""
    b = np.asarray(b, U64)
    out: list[int] = []

    def add_diff(cell: int):
        arr = np.array([cell], dtype=np.uint64)
        if not intersects_cell(b, arr)[0]:
            out.append(cell)
        elif not contains_cell(b, arr)[0]:
            for ch in cellid.child(np.repeat(arr, 4), np.arange(4)):
                add_diff(int(ch))

    for v in np.asarray(a, U64).tolist():
        add_diff(int(v))
    return normalize(np.array(out, dtype=np.uint64))


def expand_level(ids: np.ndarray, expand_level: int) -> np.ndarray:
    """Expand(level) (s2cell_union.cc:454-472): buffer by one cell width at
    expand_level by adding all neighbors."""
    ids = np.asarray(ids, U64)
    output: list[np.ndarray] = []
    for v in ids.tolist():
        arr = np.array([v], dtype=np.uint64)
        lvl = int(cellid.level(arr)[0])
        if lvl > expand_level:
            # finer than the buffer grid: replace by its ancestor
            arr = cellid.parent(arr, expand_level)
        output.append(arr)
        _, nbrs = cellid.append_all_neighbors(arr, expand_level)
        output.append(nbrs)
    return normalize(np.concatenate(output))


def expand_radius(ids: np.ndarray, min_radius_radians: float, max_level_diff: int) -> np.ndarray:
    """Expand(min_radius, max_level_diff) (s2cell_union.cc:474-484)."""
    from . import metrics

    ids = np.asarray(ids, U64)
    min_level = 30
    for v in ids.tolist():
        lvl = int(cellid.level(np.array([v], dtype=np.uint64))[0])
        min_level = min(min_level, lvl)
    radius_level = metrics.MIN_WIDTH.get_level_for_min_value(min_radius_radians)
    if radius_level == 0 and min_radius_radians > metrics.MIN_WIDTH.get_value(0):
        ids = expand_level(ids, 0)
    return expand_level(ids, min(min_level + max_level_diff, radius_level))


def leaf_cells_covered(ids: np.ndarray) -> int:
    ids = np.asarray(ids, U64)
    total = 0
    for v in ids.tolist():
        lsb_ = int(cellid.lsb(np.array([v], dtype=np.uint64))[0])
        total += lsb_  # each cell covers lsb<<... leaves: (lsb) per dim?
    return total
