"""Polyline vertex alignment: dynamic-timewarp matching between two
S2 polylines (s2polyline_alignment.h:95-160, s2polyline_alignment.cc).

A vertex alignment ("warp") pairs each vertex of polyline ``a`` with at
least one vertex of polyline ``b`` along a monotone path through the
A×B grid; its cost is the sum of the CHORDAL distances ``|a_i - b_j|``
over the path (s2polyline_alignment.cc:206 — ``.Norm()``, not Norm2:
the comment in the header says "squared" but the code takes the plain
norm).  The optimal alignment minimizes that cost via the classic DP

    table[i][j] = cost(i, j) + min(table[i-1][j-1],
                                   table[i][j-1], table[i-1][j])

(s2polyline_alignment.h:67).  This module provides

* ``dtw_exact``           — full-window DP, cost + warp path
                            (GetExactVertexAlignment, .cc:294)
* ``dtw_cost``            — constant-space cost only
                            (GetExactVertexAlignmentCost, .cc:275)
* ``Window`` + ``dtw_windowed`` — banded DP over a per-row column
                            stride window (.cc:40-151, DynamicTimewarp
                            .cc:187)
* ``approx_alignment``    — FastDTW recursive halving
                            (GetApproxVertexAlignment, .cc:304-346)
* ``medoid_index``        — argmin-total-cost representative
                            (GetMedoidPolyline, .cc:352)
* ``consensus_polyline``  — DTW Barycenter Averaging
                            (GetConsensusPolyline, .cc:389)

FP discipline: every DP cell is computed as ``min3 + cost`` where
``cost = sqrt((dx*dx + dy*dy) + dz*dz)`` with pinned left association,
so the DuckDB oracle (operators/alignment.py) replays the identical
recurrence bit-for-bit.  The exact DP runs anti-diagonal-vectorized in
NumPy — n+m-1 vector steps instead of n*m scalar cells — which changes
the evaluation ORDER across cells but not any cell's value (each cell
depends only on fully-computed earlier diagonals).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "cost_matrix",
    "dtw_exact",
    "dtw_cost",
    "Window",
    "dtw_windowed",
    "approx_alignment",
    "medoid_index",
    "consensus_polyline",
]

_INF = np.inf

# Switchover constants of GetApproxVertexAlignment
# (s2polyline_alignment.cc:310-311)
_SIZE_SWITCHOVER = 32
_DENSITY_SWITCHOVER = 0.85


def cost_matrix(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """(n, m) chordal-distance matrix |A_i - B_j| with the pinned
    (dx*dx + dy*dy) + dz*dz sum order (vector.h Norm)."""
    dx = A[:, 0, None] - B[None, :, 0]
    dy = A[:, 1, None] - B[None, :, 1]
    dz = A[:, 2, None] - B[None, :, 2]
    return np.sqrt((dx * dx + dy * dy) + dz * dz)


def _dp_table(c: np.ndarray) -> np.ndarray:
    """Fill the full DP table anti-diagonally: each diagonal d holds
    cells (i, d-i); cell value = c + min(diag, up, left) exactly as
    s2polyline_alignment.cc:202-206 (boundary preds = +inf; (0,0) has
    no pred and is just c[0,0] — BoundsCheckedTableCost .cc:153 returns
    0.0 for the virtual (-1,-1) cell)."""
    n, m = c.shape
    t = np.full((n, m), _INF)
    t[0, 0] = c[0, 0]
    for d in range(1, n + m - 1):
        lo = max(0, d - (m - 1))
        hi = min(n - 1, d)
        i = np.arange(lo, hi + 1)
        j = d - i
        up = np.where(i > 0, t[np.maximum(i - 1, 0), j], _INF)
        left = np.where(j > 0, t[i, np.maximum(j - 1, 0)], _INF)
        diag = np.where(
            (i > 0) & (j > 0), t[np.maximum(i - 1, 0), np.maximum(j - 1, 0)], _INF
        )
        t[i, j] = np.minimum(np.minimum(diag, up), left) + c[i, j]
    return t


def _walk_back(t: np.ndarray) -> list[tuple[int, int]]:
    """Recover the forward warp path from a filled DP table with the
    reference's tie-break (diag if d<=u and d<=l, else up if u<=l,
    else left — s2polyline_alignment.cc:226-243)."""
    n, m = t.shape
    row, col = n - 1, m - 1
    path = []
    while row >= 0 and col >= 0:
        path.append((row, col))
        d = t[row - 1, col - 1] if (row > 0 and col > 0) else (
            0.0 if (row == 0 and col == 0) else _INF
        )
        u = t[row - 1, col] if row > 0 else _INF
        lft = t[row, col - 1] if col > 0 else _INF
        if d <= u and d <= lft:
            row -= 1
            col -= 1
        elif u <= lft:
            row -= 1
        else:
            col -= 1
    path.reverse()
    return path


def dtw_exact(A: np.ndarray, B: np.ndarray) -> tuple[float, list[tuple[int, int]]]:
    """GetExactVertexAlignment (s2polyline_alignment.cc:294): optimal
    (cost, warp_path); path is forward-ordered, front (0,0), back
    (n-1, m-1).  O(n*m) space and time."""
    if len(A) == 0 or len(B) == 0:
        raise ValueError("empty polyline")
    t = _dp_table(cost_matrix(A, B))
    return float(t[-1, -1]), _walk_back(t)


def dtw_cost(A: np.ndarray, B: np.ndarray) -> float:
    """GetExactVertexAlignmentCost (s2polyline_alignment.cc:275):
    cost only, O(max(n, m)) space — row-sequential recurrence
    ``cost[col] = min(left_diag_min, up) + c`` (bitwise equal to the
    full table: min is exact and associative)."""
    if len(A) == 0 or len(B) == 0:
        raise ValueError("empty polyline")
    c = cost_matrix(A, B)
    n, m = c.shape
    cost = np.full(m, _INF)
    for row in range(n):
        left_diag_min = 0.0 if row == 0 else _INF
        for col in range(m):
            up = cost[col]
            cost[col] = min(left_diag_min, up) + c[row, col]
            left_diag_min = min(cost[col], up)
    return float(cost[-1])


class Window:
    """Per-row column strides bounding the DP search region
    (s2polyline_alignment_internal.h Window; .cc:40-151).  Valid
    windows: contiguous non-empty strides, monotone starts/ends,
    strides[0].start == 0, strides[-1].end == cols."""

    def __init__(self, strides: list[tuple[int, int]], cols: int):
        self.strides = strides
        self.rows = len(strides)
        self.cols = cols

    @classmethod
    def from_warp_path(cls, path: list[tuple[int, int]]) -> "Window":
        """Window(WarpPath) constructor (s2polyline_alignment.cc:55-78):
        one stride per row covering the path's columns in that row."""
        rows = path[-1][0] + 1
        cols = path[-1][1] + 1
        strides: list[tuple[int, int]] = [None] * rows  # type: ignore
        prev_row = 0
        stride_start = 0
        stride_stop = 0
        for r, c in path:
            if r > prev_row:
                strides[prev_row] = (stride_start, stride_stop)
                stride_start = c
                prev_row = r
            stride_stop = c + 1
        strides[rows - 1] = (stride_start, stride_stop)
        return cls(strides, cols)

    def upsample(self, new_rows: int, new_cols: int) -> "Window":
        """Scale to a finer grid (s2polyline_alignment.cc:80-93)."""
        row_scale = new_rows / self.rows
        col_scale = new_cols / self.cols
        strides = []
        for row in range(new_rows):
            s, e = self.strides[int((row + 0.5) / row_scale)]
            strides.append((int(col_scale * s + 0.5), int(col_scale * e + 0.5)))
        return Window(strides, new_cols)

    def dilate(self, radius: int) -> "Window":
        """Square-structuring-element dilation
        (s2polyline_alignment.cc:102-113)."""
        strides = []
        for row in range(self.rows):
            p = max(0, row - radius)
            nx = min(row + radius, self.rows - 1)
            strides.append(
                (
                    max(0, self.strides[p][0] - radius),
                    min(self.strides[nx][1] + radius, self.cols),
                )
            )
        return Window(strides, self.cols)

    def is_valid(self) -> bool:
        if self.rows <= 0 or self.cols <= 0:
            return False
        if self.strides[0][0] != 0 or self.strides[-1][1] != self.cols:
            return False
        ps, pe = -1, -1
        for s, e in self.strides:
            if e <= s or s < ps or e < pe:
                return False
            ps, pe = s, e
        return True


def dtw_windowed(
    A: np.ndarray, B: np.ndarray, w: Window
) -> tuple[float, list[tuple[int, int]]]:
    """DynamicTimewarp over a search window
    (s2polyline_alignment.cc:187-246): cells outside the window read as
    +inf; per-cell arithmetic identical to the exact DP."""
    c = cost_matrix(A, B)
    n, m = c.shape
    t = np.full((n, m), _INF)
    prev = (0, m)  # ColumnStride::All() for the virtual row -1
    for row in range(n):
        s, e = w.strides[row]
        for col in range(s, e):
            if row == 0 and col == 0:
                t[0, 0] = c[0, 0]
                continue
            d = (
                t[row - 1, col - 1]
                if (row > 0 and col > 0 and prev[0] <= col - 1 < prev[1])
                else _INF
            )
            u = t[row - 1, col] if (row > 0 and prev[0] <= col < prev[1]) else _INF
            lft = t[row, col - 1] if col - 1 >= s else _INF
            t[row, col] = min(d, u, lft) + c[row, col]
        prev = (s, e)
    return float(t[-1, -1]), _walk_back(t)


def _half_resolution(V: np.ndarray) -> np.ndarray:
    """Every other vertex starting at 0 (HalfResolution,
    s2polyline_alignment.cc:248)."""
    return V[::2]


def approx_alignment(
    A: np.ndarray, B: np.ndarray, radius: int | None = None
) -> tuple[float, list[tuple[int, int]]]:
    """GetApproxVertexAlignment (s2polyline_alignment.cc:304-346):
    FastDTW — recursively halve, align, then refine on the upsampled
    path window dilated by ``radius``.  Default radius =
    max(n, m) ** 0.25 (.cc:341-346).  Falls back to the exact DP below
    the reference's size/density switchover points."""
    n, m = len(A), len(B)
    if radius is None:
        radius = int(max(n, m) ** 0.25)
    if radius < 0:
        raise ValueError("negative radius")
    if n - radius < _SIZE_SWITCHOVER or m - radius < _SIZE_SWITCHOVER:
        return dtw_exact(A, B)
    if max(n, m) * (2 * radius + 1) > n * m * _DENSITY_SWITCHOVER:
        return dtw_exact(A, B)
    _, proj = approx_alignment(_half_resolution(A), _half_resolution(B), radius)
    w = Window.from_warp_path(proj).upsample(n, m).dilate(radius)
    return dtw_windowed(A, B, w)


def medoid_index(polylines: list[np.ndarray], approx: bool = True) -> int:
    """GetMedoidPolyline (s2polyline_alignment.cc:352-368): index
    minimizing summed alignment cost to all others; lower-triangle
    evaluation with costs accumulated symmetrically, ties -> lowest
    index (np.argmin returns the first minimum)."""
    nvec = len(polylines)
    costs = np.zeros(nvec)
    for i in range(nvec):
        for j in range(i + 1, nvec):
            c = (
                approx_alignment(polylines[i], polylines[j])[0]
                if approx
                else dtw_cost(polylines[i], polylines[j])
            )
            costs[i] += c
            costs[j] += c
    return int(np.argmin(costs))


def consensus_polyline(
    polylines: list[np.ndarray],
    approx: bool = True,
    seed_medoid: bool = False,
    iteration_cap: int = 5,
    tol: float = 1e-15,
) -> np.ndarray:
    """GetConsensusPolyline (s2polyline_alignment.cc:389-428): DTW
    Barycenter Averaging — align the running consensus to every input,
    accumulate matched vertices per consensus slot, renormalize to the
    sphere; stop on convergence (max vertex angle <= tol, mirroring
    S2Polyline::ApproxEquals) or after ``iteration_cap`` rounds."""
    if not polylines:
        raise ValueError("empty collection")
    seed = medoid_index(polylines, approx) if seed_medoid else 0
    consensus = polylines[seed].copy()
    k = len(consensus)
    for _ in range(iteration_cap):
        acc = np.zeros((k, 3))
        for p in polylines:
            _, path = (
                approx_alignment(consensus, p) if approx else dtw_exact(consensus, p)
            )
            for ci, pi in path:
                acc[ci] += p[pi]
        acc /= np.linalg.norm(acc, axis=1, keepdims=True)
        moved = np.max(
            np.arccos(np.clip(np.sum(acc * consensus, axis=1), -1.0, 1.0))
        )
        consensus = acc
        if moved <= tol:
            break
    return consensus
