"""Polyline simplification: S2Polyline::SubsampleVertices
(s2polyline.cc:645, FindEndVertex s2polyline.cc:568; tests
s2polyline_test.cc SubsampleVertices*).

Greedy tolerance-guaranteed vertex subsampling: starting at vertex 0,
each step extends a "pie wedge" of ray directions (an S1Interval of
tangent-plane angles at the segment origin) that stays within
``tolerance`` of every skipped vertex, and takes the furthest vertex
reachable before the wedge empties or the along-ray monotonicity breaks.
The result is parametrically equivalent to the input (backtracking is
preserved) and every dropped vertex lies within ``tolerance`` of the
simplified polyline.

Everything here is scalar float arithmetic in PINNED expression shapes
(left-associated sums, reciprocal-multiply normalization — matching
util/math/vector.h Normalize) so the DuckDB oracle in
operators/simplify.py can replay every decision bit-for-bit: the output
is a list of kept vertex INDICES, so oracle parity is purely a matter of
identical branch decisions, which identical float ops guarantee.
"""

from __future__ import annotations

import math

__all__ = ["subsample_vertices"]

_PI = math.pi
_HALF_PI = math.pi / 2.0
_TWO_PI = 2.0 * math.pi
_DBL_EPS = 2.220446049250313e-16

# Ortho()'s fixed tie-break vector (s2pointutil.cc:48 — the non-test
# branch; the odd constants avoid axis-aligned degeneracies)
_ORTHO_TEMP = (0.012, 0.0053, 0.00457)


def _cross(ax, ay, az, bx, by, bz):
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _dot(ax, ay, az, bx, by, bz):
    return (ax * bx + ay * by) + az * bz


def _ortho(ax, ay, az):
    """s2pointutil.cc Ortho: cross with a near-axis constant vector,
    normalized by RECIPROCAL multiply (vector.h Normalize)."""
    tx, ty, tz = abs(ax), abs(ay), abs(az)
    lac = 0 if (tx > ty and tx > tz) else (2 if tx > ty else (1 if ty > tz else 2))
    k = lac - 1
    if k < 0:
        k = 2
    t = list(_ORTHO_TEMP)
    t[k] = 1.0
    cx, cy, cz = _cross(ax, ay, az, t[0], t[1], t[2])
    n = math.sqrt((cx * cx + cy * cy) + cz * cz)
    if n != 0.0:
        n = 1.0 / n
    return (cx * n, cy * n, cz * n)


def _angle(ax, ay, az, bx, by, bz):
    """S1Angle(a, b) = atan2(|a x b|, a . b) (vector.h:494)."""
    cx, cy, cz = _cross(ax, ay, az, bx, by, bz)
    return math.atan2(
        math.sqrt((cx * cx + cy * cy) + cz * cz), _dot(ax, ay, az, bx, by, bz)
    )


# ---- S1Interval (s1interval.cc) on (lo, hi) tuples -------------------
# Full = (-pi, pi); Empty = (pi, -pi); invariants per s1interval.h.


def _ivl_length(lo, hi):
    length = hi - lo
    if length >= 0:
        return length
    length += _TWO_PI
    return length if length > 0 else -1.0


def _ivl_fast_contains(lo, hi, p):
    if lo > hi:  # inverted
        return (p >= lo or p <= hi) and not (lo == _PI and hi == -_PI)
    return lo <= p <= hi


def _ivl_contains(lo, hi, p):
    if p == -_PI:
        p = _PI
    return _ivl_fast_contains(lo, hi, p)


def _ivl_intersection(lo, hi, ylo, yhi):
    """S1Interval::Intersection (s1interval.cc:257); y is never empty
    here (it is a singleton expanded by a positive margin)."""
    if _ivl_fast_contains(lo, hi, ylo):
        if _ivl_fast_contains(lo, hi, yhi):
            if _ivl_length(ylo, yhi) < _ivl_length(lo, hi):
                return (ylo, yhi)
            return (lo, hi)
        return (ylo, hi)
    if _ivl_fast_contains(lo, hi, yhi):
        return (lo, yhi)
    if _ivl_fast_contains(ylo, yhi, lo):
        return (lo, hi)
    return (_PI, -_PI)  # empty


def _rem2pi(x):
    """IEEE remainder(x, 2*pi) via fmod + wrap.  Both fmod and remainder
    are EXACT operations, and for |fmod| in (pi, 2pi) the +/-2pi
    adjustment is exact by Sterbenz, so this equals libm remainder
    bitwise except when fmod lands on +/-pi EXACTLY (remainder's
    ties-to-even may pick the other sign) — a measure-zero tie no
    jittered fixture hits.  Pinned to this form because DuckDB has fmod
    but not remainder; the oracle replays the identical wrap."""
    r = math.fmod(x, _TWO_PI)
    if r > _PI:
        r -= _TWO_PI
    elif r < -_PI:
        r += _TWO_PI
    return r


def _ivl_from_point_expanded(p, margin):
    """FromPoint(p).Expanded(margin) for 0 < margin <= pi/2 (the
    half-angle is asin(...) <= pi/2, so the full-interval short-circuit
    of Expanded can only fire through its 2-ulp slack near margin ==
    pi)."""
    if p == -_PI:
        p = _PI
    if 2.0 * margin + 2.0 * _DBL_EPS >= _TWO_PI:
        return (-_PI, _PI)
    lo = _rem2pi(p - margin)
    hi = _rem2pi(p + margin)
    if lo <= -_PI:
        lo = _PI
    return (lo, hi)


def _find_end_vertex(xs, ys, zs, tolerance, index):
    """FindEndVertex (s2polyline.cc:568): furthest vertex j > index such
    that the segment (index, j) passes within ``tolerance`` of all
    intermediate vertices, scanned with the wedge-of-ray-angles
    invariant."""
    n = len(xs)
    ox, oy, oz = xs[index], ys[index], zs[index]
    # tangent frame at the origin (s2pointutil.cc GetFrame): col2 = z =
    # origin, col1 = Ortho(origin), col0 = col1 x origin
    c1x, c1y, c1z = _ortho(ox, oy, oz)
    c0x, c0y, c0z = _cross(c1x, c1y, c1z, ox, oy, oz)
    lo, hi = -_PI, _PI  # current wedge: full
    last_distance = 0.0
    last_ok = index
    for j in range(index + 1, n):
        cx, cy, cz = xs[j], ys[j], zs[j]
        distance = _angle(ox, oy, oz, cx, cy, cz)
        # no simplified edges longer than 90 degrees (numeric stability)
        if distance > _HALF_PI and last_distance > 0:
            break
        # along-ray monotonicity (parametric equivalence), except inside
        # the initial tolerance disc around the origin
        if distance < last_distance and last_distance > tolerance:
            break
        last_distance = distance
        if distance <= tolerance:
            last_ok = j
            continue
        dirx = _dot(c0x, c0y, c0z, cx, cy, cz)
        diry = _dot(c1x, c1y, c1z, cx, cy, cz)
        center = math.atan2(diry, dirx)
        if not _ivl_contains(lo, hi, center):
            break
        # spherical law of sines: half-angle of the wedge that keeps the
        # ray within `tolerance` of this vertex
        sin_d = math.sin(distance)
        sin_t = math.sin(tolerance)
        if sin_d == 0.0 or sin_t > sin_d:
            # C++ computes asin(>1 or inf) = NaN here (reachable only for
            # candidates beyond 90 degrees, allowed while last_distance
            # == 0); the NaN-bounds target makes every FastContains
            # false, so Intersection returns Empty — replicate that
            # outcome exactly, then the NEXT candidate's Contains fails
            lo, hi = _PI, -_PI
            last_ok = j
            continue
        half_angle = math.asin(sin_t / sin_d)
        tlo, thi = _ivl_from_point_expanded(center, half_angle)
        lo, hi = _ivl_intersection(lo, hi, tlo, thi)
        last_ok = j
    # loop breaks AT the first vertex that cannot be included -> the
    # previous candidate (== last_ok, candidates being consecutive)
    return last_ok


def subsample_vertices(xs, ys, zs, tolerance: float) -> list[int]:
    """S2Polyline::SubsampleVertices: indices of the kept vertices.

    ``xs/ys/zs`` are unit-vector component sequences (plain floats);
    ``tolerance`` is radians.  Always keeps vertex 0; negative tolerance
    keeps everything; adjacent duplicate results are suppressed."""
    n = len(xs)
    if n == 0:
        return []
    indices = [0]
    tol = max(float(tolerance), 0.0)
    index = 0
    while index + 1 < n:
        nxt = _find_end_vertex(xs, ys, zs, tol, index)
        if (xs[nxt], ys[nxt], zs[nxt]) != (xs[index], ys[index], zs[index]):
            indices.append(nxt)
        index = nxt
    return indices
