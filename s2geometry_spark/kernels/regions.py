"""Driver-side region types: Cell, Cap, LatLngRect, Loop, Polygon.

These implement the S2Region protocol surface the coverer needs —
contains_point / contains_cell / may_intersect_cell / cell-union bound —
re-derived from the published semantics (s2cap.cc, s2cell.cc,
s2latlng_rect.cc, s2loop.cc).  Region objects live on the driver (polygon
sets are broadcast-scale); the per-row heavy lifting stays in the
vectorized kernels (predicates.loop_contains_points).

Loop/polygon cell relations use *exact* robust crossing tests rather than
the reference's conservative uv-clipping approximation — this satisfies the
S2Region contract (MayIntersect is allowed to be conservative; ours is
exact, so coverings can only be tighter).
"""

from __future__ import annotations

import math

import numpy as np

from . import cellid, coords, metrics, predicates

M_PI = math.pi
M_PI_2 = math.pi / 2
M_PI_4 = math.pi / 4
DBL_EPSILON = predicates.DBL_EPSILON


def chord2(p: np.ndarray, q: np.ndarray) -> float:
    """S1ChordAngle length2 = min(4, |p-q|^2) (s1chord_angle.h:352-358)."""
    d = np.asarray(p, float) - np.asarray(q, float)
    return min(4.0, float(d @ d))


def chord2_to_angle(length2: float) -> float:
    """S1ChordAngle::ToAngle = 2*asin(0.5*sqrt(length2))."""
    return 2.0 * math.asin(0.5 * math.sqrt(min(4.0, max(0.0, length2))))


def angle_to_chord2(radians: float) -> float:
    """S1ChordAngle(S1Angle): 4*sin^2(angle/2), clamped to [0,4]."""
    if radians < 0:
        return -1.0  # negative/empty sentinel, as in S1ChordAngle
    d = 2.0 * math.sin(0.5 * min(M_PI, radians))
    return d * d


# ---------- intervals ----------


class R1Interval:
    def __init__(self, lo: float, hi: float):
        self.lo, self.hi = lo, hi

    @staticmethod
    def empty() -> "R1Interval":
        return R1Interval(1.0, 0.0)

    @staticmethod
    def from_point_pair(a: float, b: float) -> "R1Interval":
        return R1Interval(min(a, b), max(a, b))

    def is_empty(self) -> bool:
        return self.lo > self.hi

    def contains(self, other) -> bool:
        if isinstance(other, R1Interval):
            if other.is_empty():
                return True
            return other.lo >= self.lo and other.hi <= self.hi
        return self.lo <= other <= self.hi

    def intersects(self, other: "R1Interval") -> bool:
        if self.lo <= other.lo:
            return other.lo <= self.hi and other.lo <= other.hi
        return self.lo <= other.hi and self.lo <= self.hi

    def expanded(self, margin: float) -> "R1Interval":
        if self.is_empty():
            return self
        return R1Interval(self.lo - margin, self.hi + margin)

    def union(self, other: "R1Interval") -> "R1Interval":
        if self.is_empty():
            return other
        if other.is_empty():
            return self
        return R1Interval(min(self.lo, other.lo), max(self.hi, other.hi))


class S1Interval:
    """Longitude interval on the circle [-pi, pi], may wrap (s1interval.h)."""

    def __init__(self, lo: float, hi: float):
        self.lo, self.hi = lo, hi

    @staticmethod
    def full() -> "S1Interval":
        return S1Interval(-M_PI, M_PI)

    @staticmethod
    def empty() -> "S1Interval":
        return S1Interval(M_PI, -M_PI)

    @staticmethod
    def from_point_pair(p1: float, p2: float) -> "S1Interval":
        if p1 == -M_PI:
            p1 = M_PI
        if p2 == -M_PI:
            p2 = M_PI
        if S1Interval._pos_distance(p1, p2) <= M_PI:
            return S1Interval(p1, p2)
        return S1Interval(p2, p1)

    @staticmethod
    def _pos_distance(a: float, b: float) -> float:
        d = b - a
        return d if d >= 0 else (b + M_PI) - (a - M_PI)

    def is_full(self) -> bool:
        return self.lo == -M_PI and self.hi == M_PI

    def is_empty(self) -> bool:
        return self.lo == M_PI and self.hi == -M_PI

    def is_inverted(self) -> bool:
        return self.lo > self.hi

    def contains_point(self, p: float) -> bool:
        if p == -M_PI:
            p = M_PI
        if self.is_inverted():
            return (p >= self.lo or p <= self.hi) and not self.is_empty()
        return self.lo <= p <= self.hi

    def contains(self, other: "S1Interval") -> bool:
        if self.is_inverted():
            if other.is_inverted():
                return other.lo >= self.lo and other.hi <= self.hi
            return (other.lo >= self.lo or other.hi <= self.hi) and not self.is_empty()
        if other.is_inverted():
            return self.is_full() or other.is_empty()
        return other.lo >= self.lo and other.hi <= self.hi

    def intersects(self, other: "S1Interval") -> bool:
        if self.is_empty() or other.is_empty():
            return False
        if self.is_inverted():
            return other.is_inverted() or other.lo <= self.hi or other.hi >= self.lo
        if other.is_inverted():
            return other.lo <= self.hi or other.hi >= self.lo
        return other.lo <= self.hi and other.hi >= self.lo

    def expanded(self, margin: float) -> "S1Interval":
        if margin <= 0:
            return self
        if self.is_empty():
            return self
        if self.get_length() + 2 * margin + 2 * DBL_EPSILON >= 2 * M_PI:
            return S1Interval.full()
        lo = math.remainder(self.lo - margin, 2 * M_PI)
        hi = math.remainder(self.hi + margin, 2 * M_PI)
        if lo <= -M_PI:
            lo = M_PI
        return S1Interval(lo, hi)

    def get_length(self) -> float:
        length = self.hi - self.lo
        if length >= 0:
            return length
        length += 2 * M_PI
        return length if length > 0 else -1.0

    def union(self, other: "S1Interval") -> "S1Interval":
        # conservative union adequate for bounds: cover both via point pairs
        if other.is_empty():
            return self
        if self.is_empty():
            return other
        if self.contains(other):
            return self
        if other.contains(self):
            return other
        lo_in = other.contains_point(self.lo)
        hi_in = other.contains_point(self.hi)
        if lo_in and hi_in:
            return S1Interval.full()
        if lo_in:
            return S1Interval(other.lo, self.hi)
        if hi_in:
            return S1Interval(self.lo, other.hi)
        # disjoint: pick the union with smaller total length
        a = S1Interval(self.lo, other.hi)
        b = S1Interval(other.lo, self.hi)
        return a if a.get_length() <= b.get_length() else b


# ---------- Cell ----------


class Cell:
    """S2Cell (s2cell.cc:64-71): face, level, uv bound from a cell id."""

    __slots__ = ("id", "face", "level", "u_lo", "u_hi", "v_lo", "v_hi")

    def __init__(self, cid: int):
        arr = np.array([cid], dtype=np.uint64)
        f, i, j, _ = cellid.to_face_ij_orientation(arr)
        self.id = int(cid)
        self.face = int(f[0])
        self.level = int(cellid.level(arr)[0])
        size = 1 << (30 - self.level)
        i_lo = int(i[0]) & -size
        j_lo = int(j[0]) & -size
        self.u_lo = float(coords.st_to_uv(coords.ij_to_st_min(np.float64(i_lo))))
        self.u_hi = float(coords.st_to_uv(coords.ij_to_st_min(np.float64(i_lo + size))))
        self.v_lo = float(coords.st_to_uv(coords.ij_to_st_min(np.float64(j_lo))))
        self.v_hi = float(coords.st_to_uv(coords.ij_to_st_min(np.float64(j_lo + size))))

    def get_vertex_raw(self, k: int) -> np.ndarray:
        """CCW order: (lo,lo),(hi,lo),(hi,hi),(lo,hi) (r2rect GetVertex)."""
        jj = (k >> 1) & 1
        ii = jj ^ (k & 1)
        u = self.u_hi if ii else self.u_lo
        v = self.v_hi if jj else self.v_lo
        x, y, z = coords.face_uv_to_xyz(
            np.array([self.face]), np.array([u]), np.array([v])
        )
        return np.array([x[0], y[0], z[0]])

    def get_vertex(self, k: int) -> np.ndarray:
        v = self.get_vertex_raw(k)
        return v / np.linalg.norm(v)

    def vertices(self) -> np.ndarray:
        return np.stack([self.get_vertex(k) for k in range(4)])

    def get_edge_raw(self, k: int) -> np.ndarray:
        """GetEdgeRaw (s2cell.cc:73-84): inward-facing edge normals."""
        f = self.face
        if k == 0:
            return _get_v_norm(f, self.v_lo)
        if k == 1:
            return _get_u_norm(f, self.u_hi)
        if k == 2:
            return -_get_v_norm(f, self.v_hi)
        return -_get_u_norm(f, self.u_lo)

    def get_center(self) -> np.ndarray:
        x, y, z = cellid.to_point(np.array([self.id], dtype=np.uint64))
        return np.array([x[0], y[0], z[0]])

    def get_center_raw(self) -> np.ndarray:
        x, y, z = cellid.to_point_raw(np.array([self.id], dtype=np.uint64))
        return np.array([x[0], y[0], z[0]])

    def contains_point(self, p) -> bool:
        """S2Cell::Contains(S2Point) (s2cell.cc:291-320)."""
        uv = _face_xyz_to_uv(self.face, p)
        if uv is None:
            return False
        u, v = uv
        eps = (5 / 3.0) * DBL_EPSILON
        return (
            self.u_lo - eps <= u <= self.u_hi + eps
            and self.v_lo - eps <= v <= self.v_hi + eps
        )

    def get_rect_bound(self) -> "LatLngRect":
        """S2Cell::GetRectBound (s2cell.cc:187-287)."""
        if self.level > 0:
            u = self.u_lo + self.u_hi
            v = self.v_lo + self.v_hi
            u_axis_z = float(coords.FACE_UVW_AXES[self.face][0][2])
            v_axis_z = float(coords.FACE_UVW_AXES[self.face][1][2])
            i = int(u < 0) if u_axis_z == 0 else int(u > 0)
            j = int(v < 0) if v_axis_z == 0 else int(v > 0)
            lat = R1Interval.from_point_pair(
                self._latitude(i, j), self._latitude(1 - i, 1 - j)
            )
            lng = S1Interval.from_point_pair(
                self._longitude(i, 1 - j), self._longitude(1 - i, j)
            )
            return LatLngRect(lat, lng).expanded_radians(2 * DBL_EPSILON, 2 * DBL_EPSILON).polar_closure()
        pole_min_lat = math.asin(math.sqrt(1.0 / 3)) - 0.5 * DBL_EPSILON
        bounds = {
            0: (R1Interval(-M_PI_4, M_PI_4), S1Interval(-M_PI_4, M_PI_4)),
            1: (R1Interval(-M_PI_4, M_PI_4), S1Interval(M_PI_4, 3 * M_PI_4)),
            2: (R1Interval(pole_min_lat, M_PI_2), S1Interval.full()),
            3: (R1Interval(-M_PI_4, M_PI_4), S1Interval(3 * M_PI_4, -3 * M_PI_4)),
            4: (R1Interval(-M_PI_4, M_PI_4), S1Interval(-3 * M_PI_4, -M_PI_4)),
            5: (R1Interval(-M_PI_2, -pole_min_lat), S1Interval.full()),
        }
        lat, lng = bounds[self.face]
        return LatLngRect(lat, lng).expanded_radians(DBL_EPSILON, 0.0)

    def _corner_xyz(self, i: int, j: int) -> np.ndarray:
        u = self.u_hi if i else self.u_lo
        v = self.v_hi if j else self.v_lo
        x, y, z = coords.face_uv_to_xyz(np.array([self.face]), np.array([u]), np.array([v]))
        return np.array([x[0], y[0], z[0]])

    def _latitude(self, i: int, j: int) -> float:
        p = self._corner_xyz(i, j)
        return math.atan2(p[2], math.sqrt(p[0] * p[0] + p[1] * p[1]))

    def _longitude(self, i: int, j: int) -> float:
        p = self._corner_xyz(i, j)
        return math.atan2(p[1], p[0])

    def child_ids(self) -> list[int]:
        arr = np.array([self.id] * 4, dtype=np.uint64)
        return [int(v) for v in cellid.child(arr, np.arange(4))]


def _get_u_norm(face: int, u: float) -> np.ndarray:
    """GetUNorm (s2coords.h:440-452)."""
    return np.array(
        {
            0: (u, -1, 0),
            1: (1, u, 0),
            2: (1, 0, u),
            3: (-u, 0, 1),
            4: (0, -u, 1),
            5: (0, -1, -u),
        }[face],
        dtype=float,
    )


def _get_v_norm(face: int, v: float) -> np.ndarray:
    """GetVNorm (s2coords.h:454-466)."""
    return np.array(
        {
            0: (-v, 0, 1),
            1: (0, -v, 1),
            2: (0, -1, -v),
            3: (v, -1, 0),
            4: (1, v, 0),
            5: (1, 0, v),
        }[face],
        dtype=float,
    )


def _face_xyz_to_uv(face: int, p) -> tuple[float, float] | None:
    """FaceXYZtoUV (s2coords.h:427-436)."""
    p = np.asarray(p, float)
    if face < 3:
        if p[face] <= 0:
            return None
    elif p[face - 3] >= 0:
        return None
    fa = np.array([face])
    u, v = coords.valid_face_xyz_to_uv(fa, p[0:1], p[1:2], p[2:3])
    return float(u[0]), float(v[0])


# ---------- LatLngRect ----------


class LatLngRect:
    def __init__(self, lat: R1Interval, lng: S1Interval):
        self.lat, self.lng = lat, lng

    @staticmethod
    def from_degrees(lat_lo, lng_lo, lat_hi, lng_hi) -> "LatLngRect":
        return LatLngRect(
            R1Interval(math.radians(lat_lo), math.radians(lat_hi)),
            S1Interval(math.radians(lng_lo), math.radians(lng_hi)),
        )

    @staticmethod
    def full() -> "LatLngRect":
        return LatLngRect(R1Interval(-M_PI_2, M_PI_2), S1Interval.full())

    def is_empty(self) -> bool:
        return self.lat.is_empty()

    def contains_latlng(self, lat: float, lng: float) -> bool:
        return self.lat.contains(lat) and self.lng.contains_point(lng)

    def contains_point(self, p) -> bool:
        p = np.asarray(p, float)
        lat = math.atan2(p[2], math.sqrt(p[0] ** 2 + p[1] ** 2))
        lng = math.atan2(p[1], p[0])
        return self.contains_latlng(lat, lng)

    def contains_rect(self, other: "LatLngRect") -> bool:
        return self.lat.contains(other.lat) and self.lng.contains(other.lng)

    def intersects_rect(self, other: "LatLngRect") -> bool:
        return self.lat.intersects(other.lat) and self.lng.intersects(other.lng)

    def expanded_radians(self, lat_margin: float, lng_margin: float) -> "LatLngRect":
        lat = self.lat.expanded(lat_margin)
        lng = self.lng.expanded(lng_margin)
        lat = R1Interval(max(lat.lo, -M_PI_2), min(lat.hi, M_PI_2))
        if lat.is_empty():
            return LatLngRect(R1Interval.empty(), S1Interval.empty())
        return LatLngRect(lat, lng)

    def polar_closure(self) -> "LatLngRect":
        if self.lat.lo == -M_PI_2 or self.lat.hi == M_PI_2:
            return LatLngRect(self.lat, S1Interval.full())
        return self

    def union(self, other: "LatLngRect") -> "LatLngRect":
        return LatLngRect(self.lat.union(other.lat), self.lng.union(other.lng))

    # S2Region protocol
    def contains_cell(self, cell: Cell) -> bool:
        """s2latlng_rect.cc:343-354."""
        return self.contains_rect(cell.get_rect_bound())

    def may_intersect_cell(self, cell: Cell) -> bool:
        """s2latlng_rect.cc:356-359 (cheap conservative test)."""
        return self.intersects_rect(cell.get_rect_bound())

    def get_center_latlng(self) -> tuple[float, float]:
        lat = 0.5 * (self.lat.lo + self.lat.hi)
        if self.lng.is_inverted():
            lng = math.remainder(0.5 * (self.lng.lo + self.lng.hi) + M_PI, 2 * M_PI)
        else:
            lng = 0.5 * (self.lng.lo + self.lng.hi)
        return lat, lng

    def get_cell_union_bound(self) -> list[int]:
        """Via the bounding cap of the rect (conservative)."""
        return self.get_cap_bound().get_cell_union_bound()

    def get_cap_bound(self) -> "Cap":
        """Conservative cap: centered at rect center, radius = max corner
        distance (simpler than the reference's pole-cap optimization but
        strictly conservative)."""
        if self.is_empty():
            return Cap.empty()
        if self.lng.is_full() or self.lng.get_length() >= 2 * M_PI - 1e-12:
            # full longitude ring: pole cap
            if abs(self.lat.hi) >= abs(self.lat.lo):
                pole = np.array([0.0, 0.0, 1.0])
                r = M_PI_2 - self.lat.lo
            else:
                pole = np.array([0.0, 0.0, -1.0])
                r = self.lat.hi + M_PI_2
            return Cap(pole, angle_to_chord2(min(M_PI, r)))
        clat, clng = self.get_center_latlng()
        c = np.array(
            [
                math.cos(clng) * math.cos(clat),
                math.sin(clng) * math.cos(clat),
                math.sin(clat),
            ]
        )
        r2 = 0.0
        for lat in (self.lat.lo, self.lat.hi):
            for lng in (self.lng.lo, self.lng.hi):
                corner = np.array(
                    [
                        math.cos(lng) * math.cos(lat),
                        math.sin(lng) * math.cos(lat),
                        math.sin(lat),
                    ]
                )
                r2 = max(r2, chord2(c, corner))
        # expand slightly for the "edges bulge outward" effect
        return Cap(c, min(4.0, r2 * 1.0000000001 + 4 * DBL_EPSILON))


# ---------- Cap ----------


class Cap:
    """S2Cap: center unit vector + squared-chord radius (s2cap.h:40-60)."""

    def __init__(self, center: np.ndarray, radius_chord2: float):
        self.center = np.asarray(center, float)
        self.radius2 = float(radius_chord2)

    @staticmethod
    def from_center_angle(center, radians: float) -> "Cap":
        return Cap(center, angle_to_chord2(radians))

    @staticmethod
    def from_latlng_degrees(lat: float, lng: float, radius_radians: float) -> "Cap":
        latr, lngr = math.radians(lat), math.radians(lng)
        c = np.array(
            [
                math.cos(lngr) * math.cos(latr),
                math.sin(lngr) * math.cos(latr),
                math.sin(latr),
            ]
        )
        return Cap.from_center_angle(c, radius_radians)

    @staticmethod
    def empty() -> "Cap":
        return Cap(np.array([1.0, 0, 0]), -1.0)

    @staticmethod
    def full() -> "Cap":
        return Cap(np.array([1.0, 0, 0]), 4.0)

    def is_empty(self) -> bool:
        return self.radius2 < 0

    def is_full(self) -> bool:
        return self.radius2 >= 4.0

    def radius_radians(self) -> float:
        if self.is_empty():
            return -1.0
        return chord2_to_angle(self.radius2)

    def complement(self) -> "Cap":
        if self.is_full():
            return Cap.empty()
        if self.is_empty():
            return Cap.full()
        return Cap(-self.center, 4.0 - self.radius2)

    def contains_point(self, p) -> bool:
        return chord2(self.center, p) <= self.radius2

    def contains_points(self, pts: np.ndarray) -> np.ndarray:
        d = np.asarray(pts, float) - self.center
        c2 = (d[:, 0] * d[:, 0] + d[:, 1] * d[:, 1]) + d[:, 2] * d[:, 2]
        return c2 <= self.radius2

    def expanded(self, radians: float) -> "Cap":
        if self.is_empty():
            return Cap.empty()
        # chord-angle sum: radius + angle (s1chord_angle operator+)
        return Cap.from_center_angle(
            self.center, min(M_PI, self.radius_radians() + radians)
        )

    def _intersects(self, cell: Cell, vertices: np.ndarray) -> bool:
        """S2Cap::Intersects(cell, vertices) (s2cap.cc:226-264)."""
        if self.radius2 >= 2.0:  # >= Right() chord2 == 2
            return False
        if self.is_empty():
            return False
        if cell.contains_point(self.center):
            return True
        sin2_angle = self.radius2 * (1 - 0.25 * self.radius2)  # sin^2(radius)
        for k in range(4):
            edge = cell.get_edge_raw(k)
            dot = float(self.center @ edge)
            if dot > 0:
                continue
            if dot * dot > sin2_angle * float(edge @ edge):
                return False
            dir_ = np.cross(edge, self.center)
            if float(dir_ @ vertices[k]) < 0 and float(dir_ @ vertices[(k + 1) & 3]) > 0:
                return True
        return False

    def contains_cell(self, cell: Cell) -> bool:
        """s2cap.cc:270-280."""
        vertices = cell.vertices()
        for k in range(4):
            if not self.contains_point(vertices[k]):
                return False
        return not self.complement()._intersects(cell, vertices)

    def may_intersect_cell(self, cell: Cell) -> bool:
        """s2cap.cc:283-291."""
        vertices = cell.vertices()
        for k in range(4):
            if self.contains_point(vertices[k]):
                return True
        return self._intersects(cell, vertices)

    def get_cell_union_bound(self) -> list[int]:
        """s2cap.cc:202-223: 4 vertex neighbors at the radius level."""
        if self.is_full() or self.is_empty():
            return [int(v) for v in cellid.from_face(np.arange(6))]
        level = metrics.MIN_WIDTH.get_level_for_min_value(self.radius_radians()) - 1
        if level < 0:
            return [int(v) for v in cellid.from_face(np.arange(6))]
        leaf = cellid.from_xyz(
            self.center[0:1], self.center[1:2], self.center[2:3]
        )
        _, nbrs = cellid.append_vertex_neighbors(leaf, level)
        return [int(v) for v in nbrs]

    def get_rect_bound_conservative(self) -> LatLngRect:
        lat = math.atan2(
            self.center[2], math.sqrt(self.center[0] ** 2 + self.center[1] ** 2)
        )
        lng = math.atan2(self.center[1], self.center[0])
        r = self.radius_radians()
        lat_iv = R1Interval(max(lat - r, -M_PI_2), min(lat + r, M_PI_2))
        if lat - r <= -M_PI_2 or lat + r >= M_PI_2:
            return LatLngRect(lat_iv, S1Interval.full())
        # conservative longitude spread
        cos_lat = math.cos(lat)
        if cos_lat <= math.sin(r):
            return LatLngRect(lat_iv, S1Interval.full())
        dl = math.asin(min(1.0, math.sin(r) / cos_lat)) * 1.0000001
        if dl >= M_PI:
            return LatLngRect(lat_iv, S1Interval.full())
        return LatLngRect(
            lat_iv,
            S1Interval(
                math.remainder(lng - dl, 2 * M_PI), math.remainder(lng + dl, 2 * M_PI)
            ),
        )


# ---------- Loop / Polygon ----------


def _any_edge_crossing(a: np.ndarray, b: np.ndarray, loop_v: np.ndarray) -> bool:
    """True if great-arc AB has an interior crossing with any loop edge.

    Vectorized triage over all loop edges; uncertainty band falls back to
    the scalar robust crossing (predicates.crossing_sign).
    """
    v = np.asarray(loop_v, float)
    m = v.shape[0]
    axb = np.cross(a, b)
    dets = v @ axb
    s = np.where(
        dets > predicates.MAX_DET_ERROR, 1, np.where(dets < -predicates.MAX_DET_ERROR, -1, 0)
    )
    s_c, s_d = s, np.roll(s, -1)
    fast_no = (s_c == s_d) & (s_d != 0)
    maybe = ~fast_no
    for ie in np.nonzero(maybe)[0]:
        c = v[ie]
        d = v[(ie + 1) % m]
        if predicates.crossing_sign(a, b, c, d) > 0:
            return True
    return False


class Loop:
    """Single closed geodesic ring (closed-set semantics like S2Loop)."""

    def __init__(self, vertices: np.ndarray, origin_inside: bool | None = None):
        self.vertices = np.asarray(vertices, float)
        assert self.vertices.shape[0] >= 3
        self.origin_inside = (
            predicates.compute_origin_inside(self.vertices)
            if origin_inside is None
            else bool(origin_inside)
        )
        self.bound = self._compute_bound()

    @staticmethod
    def make_regular(center_lat_deg, center_lng_deg, radius_radians, num_vertices):
        """S2Loop::MakeRegularLoop-style ring around a center (CCW)."""
        latr = math.radians(center_lat_deg)
        lngr = math.radians(center_lng_deg)
        z = np.array(
            [
                math.cos(lngr) * math.cos(latr),
                math.sin(lngr) * math.cos(latr),
                math.sin(latr),
            ]
        )
        x = np.asarray(predicates._ortho(z))
        y = np.cross(z, x)
        verts = []
        for i in range(num_vertices):
            ang = 2 * M_PI * i / num_vertices
            d = math.cos(radius_radians) * z + math.sin(radius_radians) * (
                math.cos(ang) * x + math.sin(ang) * y
            )
            verts.append(d / np.linalg.norm(d))
        return Loop(np.array(verts))

    def _compute_bound(self) -> LatLngRect:
        """Conservative lat-lng bound of the loop REGION (interior included).

        Boundary part: vertex extremes expanded by the max edge bulge.
        Interior part (s2loop.cc InitOriginAndBound): a loop whose interior
        contains a pole must extend the bound to that pole with full
        longitude — the vertex-derived rect only bounds the BOUNDARY, and
        e.g. a 70°-radius loop at Sydney contains the south pole while no
        vertex comes near it.
        """
        rect = self._compute_boundary_bound()
        north_in = self.contains_point(np.array([0.0, 0.0, 1.0]))
        south_in = self.contains_point(np.array([0.0, 0.0, -1.0]))
        if north_in or south_in:
            lat = R1Interval(
                -M_PI_2 if south_in else rect.lat.lo,
                M_PI_2 if north_in else rect.lat.hi,
            )
            rect = LatLngRect(lat, S1Interval.full())
        return rect

    def _compute_boundary_bound(self) -> LatLngRect:
        v = self.vertices
        lats = np.arctan2(v[:, 2], np.sqrt(v[:, 0] ** 2 + v[:, 1] ** 2))
        lngs = np.arctan2(v[:, 1], v[:, 0])
        # max edge arc
        nxt = np.roll(v, -1, axis=0)
        dots = np.clip((v * nxt).sum(axis=1), -1, 1)
        max_arc = float(np.arccos(dots).max()) if len(v) else 0.0
        margin = 0.5 * max_arc + 1e-12
        lat_iv = R1Interval(
            max(float(lats.min()) - margin, -M_PI_2),
            min(float(lats.max()) + margin, M_PI_2),
        )
        # longitude: if loop spans > half circle or touches poles, use full
        if (
            lat_iv.lo <= -M_PI_2 + 1e-9
            or lat_iv.hi >= M_PI_2 - 1e-9
            or self.origin_inside
        ):
            return LatLngRect(lat_iv if not self.origin_inside else R1Interval(-M_PI_2, M_PI_2), S1Interval.full())
        lng_sorted = np.sort(lngs)
        gaps = np.diff(np.concatenate([lng_sorted, lng_sorted[:1] + 2 * M_PI]))
        gi = int(np.argmax(gaps))
        if gaps[gi] <= 2 * margin:
            lng_iv = S1Interval.full()
        else:
            lo = lng_sorted[(gi + 1) % len(lng_sorted)] - margin
            hi = lng_sorted[gi] + margin
            lng_iv = S1Interval(
                math.remainder(lo, 2 * M_PI), math.remainder(hi, 2 * M_PI)
            )
        return LatLngRect(lat_iv, lng_iv)

    def contains_point(self, p) -> bool:
        return bool(
            predicates.loop_contains_points(
                self.vertices, self.origin_inside, np.asarray(p, float)[None, :]
            )[0]
        )

    def contains_points(self, pts: np.ndarray) -> np.ndarray:
        return predicates.loop_contains_points(self.vertices, self.origin_inside, pts)

    def _boundary_intersects_cell(self, cell: Cell, cell_verts: np.ndarray) -> bool:
        # any loop vertex inside the (closed) cell?
        for vtx in self.vertices:
            if cell.contains_point(vtx):
                return True
        # any loop edge crossing any cell edge?
        for k in range(4):
            if _any_edge_crossing(cell_verts[k], cell_verts[(k + 1) & 3], self.vertices):
                return True
        return False

    def contains_cell(self, cell: Cell) -> bool:
        """Exact: contains center, boundary does not touch the cell."""
        rb = cell.get_rect_bound()
        if not self.bound.contains_rect(rb):
            return False
        cell_verts = cell.vertices()
        if self._boundary_intersects_cell(cell, cell_verts):
            return False
        return self.contains_point(cell.get_center())

    def may_intersect_cell(self, cell: Cell) -> bool:
        rb = cell.get_rect_bound()
        if not self.bound.intersects_rect(rb):
            return False
        cell_verts = cell.vertices()
        if self._boundary_intersects_cell(cell, cell_verts):
            return True
        # no boundary contact: intersects iff cell center is inside
        return self.contains_point(cell.get_center())

    def get_cell_union_bound(self) -> list[int]:
        return self.get_cap_bound().get_cell_union_bound()

    def get_cap_bound(self) -> Cap:
        """Conservative cap over the loop's rect bound."""
        return self.bound.get_cap_bound()


class Polygon:
    """Set of loops; containment = XOR of loop containments
    (s2polygon.cc:704-729, odd-even / loop-depth semantics)."""

    def __init__(self, loops: list[Loop]):
        self.loops = loops
        bound = None
        for lp in loops:
            bound = lp.bound if bound is None else bound.union(lp.bound)
        self.bound = bound or LatLngRect.full()

    def contains_point(self, p) -> bool:
        inside = False
        for lp in self.loops:
            inside ^= lp.contains_point(p)
        return inside

    def contains_points(self, pts: np.ndarray) -> np.ndarray:
        return predicates.polygon_contains_points(
            [lp.vertices for lp in self.loops],
            [lp.origin_inside for lp in self.loops],
            pts,
        )

    def contains_cell(self, cell: Cell) -> bool:
        rb = cell.get_rect_bound()
        if not self.bound.contains_rect(rb):
            return False
        cell_verts = cell.vertices()
        for lp in self.loops:
            if lp._boundary_intersects_cell(cell, cell_verts):
                return False
        return self.contains_point(cell.get_center())

    def may_intersect_cell(self, cell: Cell) -> bool:
        rb = cell.get_rect_bound()
        if not self.bound.intersects_rect(rb):
            return False
        cell_verts = cell.vertices()
        for lp in self.loops:
            if lp._boundary_intersects_cell(cell, cell_verts):
                return True
        return self.contains_point(cell.get_center())

    def get_cell_union_bound(self) -> list[int]:
        return self.bound.get_cap_bound().get_cell_union_bound()


class RegionUnion:
    """S2RegionUnion (s2region_union.h): the union of member regions —
    composed predicates, usable anywhere an S2Region-shaped object is
    (RegionCoverer, RegionIndex)."""

    def __init__(self, regions: list):
        self.regions = regions

    def contains_point(self, p) -> bool:
        return any(r.contains_point(p) for r in self.regions)

    def contains_points(self, pts: np.ndarray) -> np.ndarray:
        out = np.zeros(np.atleast_2d(pts).shape[0], bool)
        for r in self.regions:
            out |= np.asarray(r.contains_points(pts), bool)
        return out

    def contains_cell(self, cell: Cell) -> bool:
        # sufficient (not necessary) test, like the reference's
        return any(r.contains_cell(cell) for r in self.regions)

    def may_intersect_cell(self, cell: Cell) -> bool:
        return any(r.may_intersect_cell(cell) for r in self.regions)

    def get_cell_union_bound(self) -> list[int]:
        out: list[int] = []
        for r in self.regions:
            out.extend(r.get_cell_union_bound())
        return out


class RegionIntersection:
    """S2RegionIntersection (s2region_intersection.h): the intersection
    of member regions."""

    def __init__(self, regions: list):
        self.regions = regions

    def contains_point(self, p) -> bool:
        return all(r.contains_point(p) for r in self.regions)

    def contains_points(self, pts: np.ndarray) -> np.ndarray:
        out = np.ones(np.atleast_2d(pts).shape[0], bool)
        for r in self.regions:
            out &= np.asarray(r.contains_points(pts), bool)
        return out

    def contains_cell(self, cell: Cell) -> bool:
        return all(r.contains_cell(cell) for r in self.regions)

    def may_intersect_cell(self, cell: Cell) -> bool:
        # conservative: the true intersection may still be empty
        return all(r.may_intersect_cell(cell) for r in self.regions)

    def get_cell_union_bound(self) -> list[int]:
        return self.regions[0].get_cell_union_bound() if self.regions else []
