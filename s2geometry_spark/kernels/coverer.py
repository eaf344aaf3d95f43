"""Faithful port of S2RegionCoverer (s2region_coverer.cc:90-486).

Deterministic by construction (like the reference, s2region_coverer.h:337):
the priority queue orders by the integer priority with insertion-order
tie-break via a monotonically increasing sequence number, and candidates
are expanded in the reference's exact order, so coverings are reproducible
run to run.  Runs on the driver for broadcast-scale region sets; per-row
point "coverings" use the term-indexer fast path instead (operators/).
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field

import numpy as np

from . import cellid, cellunion
from .regions import Cell

MAX_LEVEL = 30


@dataclass
class CovererOptions:
    """s2region_coverer.h:74-162."""

    max_cells: int = 8
    min_level: int = 0
    max_level: int = MAX_LEVEL
    level_mod: int = 1

    def true_max_level(self) -> int:
        if self.level_mod == 1:
            return self.max_level
        return self.max_level - (self.max_level - self.min_level) % self.level_mod


@dataclass
class _Candidate:
    cell: Cell
    is_terminal: bool
    children: list = field(default_factory=list)


class RegionCoverer:
    def __init__(self, options: CovererOptions | None = None):
        self.options = options or CovererOptions()

    # ---- internals (mirroring the reference structure) ----

    def _max_children_shift(self) -> int:
        return 2 * self.options.level_mod

    def _new_candidate(self, cell: Cell) -> _Candidate | None:
        """NewCandidate (s2region_coverer.cc:90-111)."""
        o = self.options
        if not self._region.may_intersect_cell(cell):
            return None
        is_terminal = False
        if cell.level >= o.min_level:
            if self._interior_covering:
                if self._region.contains_cell(cell):
                    is_terminal = True
                elif cell.level + o.level_mod > o.max_level:
                    return None
            else:
                if cell.level + o.level_mod > o.max_level or self._region.contains_cell(
                    cell
                ):
                    is_terminal = True
        return _Candidate(cell, is_terminal)

    def _expand_children(self, candidate: _Candidate, cell: Cell, num_levels: int) -> int:
        """ExpandChildren (s2region_coverer.cc:122-147)."""
        num_levels -= 1
        num_terminals = 0
        for child_id in cell.child_ids():
            child_cell = Cell(child_id)
            if num_levels > 0:
                if self._region.may_intersect_cell(child_cell):
                    num_terminals += self._expand_children(
                        candidate, child_cell, num_levels
                    )
                continue
            child = self._new_candidate(child_cell)
            if child is not None:
                candidate.children.append(child)
                if child.is_terminal:
                    num_terminals += 1
        return num_terminals

    def _add_candidate(self, candidate: _Candidate | None) -> None:
        """AddCandidate (s2region_coverer.cc:149-187)."""
        if candidate is None:
            return
        o = self.options
        if candidate.is_terminal:
            self._result.append(candidate.cell.id)
            return
        assert not candidate.children
        num_levels = 1 if candidate.cell.level < o.min_level else o.level_mod
        num_terminals = self._expand_children(candidate, candidate.cell, num_levels)
        shift = self._max_children_shift()
        if not candidate.children:
            return
        if (
            not self._interior_covering
            and num_terminals == (1 << shift)
            and candidate.cell.level >= o.min_level
        ):
            # add the parent instead of all terminal children (:163-171)
            candidate.is_terminal = True
            self._add_candidate(candidate)
        else:
            priority = -(
                (
                    ((candidate.cell.level << shift) + len(candidate.children))
                    << shift
                )
                + num_terminals
            )
            self._seq += 1
            heapq.heappush(self._pq, (priority, self._seq, candidate))

    def _adjust_level(self, level: int) -> int:
        o = self.options
        if o.level_mod > 1 and level > o.min_level:
            level -= (level - o.min_level) % o.level_mod
        return level

    def _adjust_cell_levels(self, cells: np.ndarray) -> np.ndarray:
        """AdjustCellLevels (s2region_coverer.cc:196-210)."""
        if self.options.level_mod == 1:
            return cells
        out: list[int] = []
        for v in cells.tolist():
            arr = np.array([v], dtype=np.uint64)
            level = int(cellid.level(arr)[0])
            new_level = self._adjust_level(level)
            if new_level != level:
                arr = cellid.parent(arr, new_level)
            vid = int(arr[0])
            va = np.array([vid], dtype=np.uint64)
            if out and cellid.contains(np.array([out[-1]], dtype=np.uint64), va)[0]:
                continue
            while out and cellid.contains(va, np.array([out[-1]], dtype=np.uint64))[0]:
                out.pop()
            out.append(vid)
        return np.array(out, dtype=np.uint64)

    def _get_initial_candidates(self) -> None:
        """GetInitialCandidates (s2region_coverer.cc:212-224)."""
        tmp = RegionCoverer(
            CovererOptions(
                max_cells=min(4, self.options.max_cells),
                max_level=self.options.max_level,
            )
        )
        cells = tmp.get_fast_covering(self._region)
        cells = self._adjust_cell_levels(cells)
        for v in cells.tolist():
            self._add_candidate(self._new_candidate(Cell(int(v))))

    def _get_covering_internal(self, region) -> None:
        """GetCoveringInternal (s2region_coverer.cc:226-305)."""
        o = self.options
        self._region = region
        self._pq: list = []
        self._seq = 0
        self._result: list[int] = []
        self._get_initial_candidates()
        while self._pq and (
            not self._interior_covering or len(self._result) < o.max_cells
        ):
            _, _, candidate = heapq.heappop(self._pq)
            if (
                self._interior_covering
                or candidate.cell.level < o.min_level
                or len(candidate.children) == 1
                or len(self._result) + len(self._pq) + len(candidate.children)
                <= o.max_cells
            ):
                for child in candidate.children:
                    if self._interior_covering and len(self._result) >= o.max_cells:
                        pass
                    else:
                        self._add_candidate(child)
            else:
                candidate.is_terminal = True
                self._add_candidate(candidate)
        self._pq = []
        self._region = None

        ids = cellunion.normalize(np.array(self._result, dtype=np.uint64))
        if o.min_level > 0 or o.level_mod > 1:
            ids = cellunion.denormalize(ids, o.min_level, o.level_mod)
        self._result_ids = ids

    # ---- public API ----

    def get_covering(self, region) -> np.ndarray:
        """GetCovering: uint64 cell ids of an exterior covering."""
        self._interior_covering = False
        self._get_covering_internal(region)
        return self._result_ids

    def get_interior_covering(self, region) -> np.ndarray:
        self._interior_covering = True
        self._get_covering_internal(region)
        return self._result_ids

    def get_fast_covering(self, region) -> np.ndarray:
        """GetFastCovering (s2region_coverer.cc:333-337)."""
        ids = np.array(region.get_cell_union_bound(), dtype=np.uint64)
        return self.canonicalize_covering(ids)

    def is_canonical(self, ids: np.ndarray) -> bool:
        """IsCanonical (s2region_coverer.cc:343-384)."""
        o = self.options
        min_level = o.min_level
        max_level = o.true_max_level()
        too_many = ids.size > o.max_cells
        same_parent_count = 1
        prev = None
        for v in np.asarray(ids, np.uint64).tolist():
            arr = np.array([v], dtype=np.uint64)
            if not cellid.is_valid(arr)[0]:
                return False
            level = int(cellid.level(arr)[0])
            if level < min_level or level > max_level:
                return False
            if o.level_mod > 1 and (level - min_level) % o.level_mod != 0:
                return False
            if prev is not None:
                pa = np.array([prev], dtype=np.uint64)
                if int(cellid.range_max(pa)[0]) >= int(cellid.range_min(arr)[0]):
                    return False
                if too_many and self._common_ancestor_level(prev, v) >= min_level:
                    return False
                plevel = level - o.level_mod
                prev_level = int(cellid.level(pa)[0])
                if (
                    plevel < min_level
                    or level != prev_level
                    or int(cellid.parent(arr, plevel)[0])
                    != int(cellid.parent(pa, plevel)[0])
                ):
                    same_parent_count = 1
                else:
                    same_parent_count += 1
                    if same_parent_count == (1 << (2 * o.level_mod)):
                        return False
            prev = v
        return True

    @staticmethod
    def _common_ancestor_level(a: int, b: int) -> int:
        """GetCommonAncestorLevel (s2cell_id.cc:193-207)."""
        aa = np.array([a], dtype=np.uint64)
        bb = np.array([b], dtype=np.uint64)
        bits = max(a ^ b, max(int(cellid.lsb(aa)[0]), int(cellid.lsb(bb)[0])))
        return max(61 - bits.bit_length(), -1) >> 1

    def canonicalize_covering(self, ids: np.ndarray) -> np.ndarray:
        """CanonicalizeCovering (s2region_coverer.cc:396-486)."""
        o = self.options
        ids = np.asarray(ids, np.uint64).copy()
        if o.max_level < MAX_LEVEL or o.level_mod > 1:
            new_ids = []
            for v in ids.tolist():
                arr = np.array([v], dtype=np.uint64)
                level = int(cellid.level(arr)[0])
                new_level = self._adjust_level(min(level, o.max_level))
                if new_level != level:
                    arr = cellid.parent(arr, new_level)
                new_ids.append(int(arr[0]))
            ids = np.array(new_ids, dtype=np.uint64)
        ids = cellunion.normalize(ids)
        if o.min_level > 0 or o.level_mod > 1:
            ids = cellunion.denormalize(ids, o.min_level, o.level_mod)
        excess = ids.size - o.max_cells
        if excess <= 0 or self.is_canonical(ids):
            return ids
        if excess * ids.size > 10000:
            # re-cover the cell union itself (avoids O(n^2))
            return self.get_covering(_CellUnionRegion(ids))
        lst = [int(v) for v in ids.tolist()]
        while len(lst) > o.max_cells:
            best_index, best_level = -1, -1
            for i in range(len(lst) - 1):
                level = self._common_ancestor_level(lst[i], lst[i + 1])
                level = self._adjust_level(level)
                if level > best_level:
                    best_level = level
                    best_index = i
            if best_level < o.min_level:
                break
            anc = int(
                cellid.parent(np.array([lst[best_index]], dtype=np.uint64), best_level)[0]
            )
            lst = self._replace_with_ancestor(lst, anc)
            while best_level > o.min_level:
                best_level -= o.level_mod
                anc = int(cellid.parent(np.array([anc], dtype=np.uint64), best_level)[0])
                if not self._contains_all_children(lst, anc):
                    break
                lst = self._replace_with_ancestor(lst, anc)
        return np.array(lst, dtype=np.uint64)

    def _replace_with_ancestor(self, lst: list[int], anc: int) -> list[int]:
        aa = np.array([anc], dtype=np.uint64)
        lo = int(cellid.range_min(aa)[0])
        hi = int(cellid.range_max(aa)[0])
        out = [v for v in lst if not (lo <= v <= hi)]
        import bisect

        bisect.insort(out, anc)
        return out

    def _contains_all_children(self, lst: list[int], anc: int) -> bool:
        o = self.options
        aa = np.array([anc], dtype=np.uint64)
        level = int(cellid.level(aa)[0]) + o.level_mod
        cur = int(cellid.child_begin(aa, level)[0])
        end = int(cellid.child_end(aa, level)[0])
        step = 2 * int(cellid.lsb(np.array([cur], dtype=np.uint64))[0])
        import bisect

        i = bisect.bisect_left(lst, int(cellid.range_min(aa)[0]))
        while cur != end:
            if i >= len(lst) or lst[i] != cur:
                return False
            i += 1
            cur += step
        return True


def get_simple_covering(region, start_point_xyz, level: int) -> np.ndarray:
    """GetSimpleCovering / FloodFill (s2region_coverer.cc:488-516): BFS over
    edge-neighbors at a FIXED level from the cell containing start_point,
    keeping every cell that may intersect the region.  Returns sorted ids.
    """
    x, y, z = (np.array([float(v)]) for v in start_point_xyz)
    start = cellid.parent(cellid.from_xyz(x, y, z), level)[0]
    frontier = [int(start)]
    seen = {int(start)}
    out = []
    while frontier:
        v = frontier.pop()
        if not region.may_intersect_cell(Cell(v)):
            continue
        out.append(v)
        for nbr in cellid.get_edge_neighbors(np.array([v], np.uint64)).reshape(-1):
            n = int(nbr)
            if n not in seen:
                seen.add(n)
                frontier.append(n)
    return np.sort(np.array(out, dtype=np.uint64))


class _CellUnionRegion:
    """S2CellUnion as a region (for CanonicalizeCovering's re-cover path)."""

    def __init__(self, ids: np.ndarray):
        self.ids = np.asarray(ids, np.uint64)

    def may_intersect_cell(self, cell: Cell) -> bool:
        return bool(
            cellunion.intersects_cell(self.ids, np.array([cell.id], dtype=np.uint64))[0]
        )

    def contains_cell(self, cell: Cell) -> bool:
        return bool(
            cellunion.contains_cell(self.ids, np.array([cell.id], dtype=np.uint64))[0]
        )

    def get_cell_union_bound(self) -> list[int]:
        # normalized parents at level max(0, level-1) of first/last give a
        # cheap bound; simplest correct option: the ids themselves
        return [int(v) for v in self.ids.tolist()]
