"""Edge tessellation between geodesics and map projections
(S2EdgeTessellator, s2edge_tessellator.h; projections s2projections.h).

Rendering/interop pipelines need polylines that are straight in a MAP
PROJECTION to approximate geodesics (and vice versa) within a tolerance.
Two standard projections:

* ``PlateCarree`` — (lng_deg, lat_deg); the identity lat/lng chart.
* ``Mercator``    — (lng_rad, ln tan(pi/4 + lat/2)) web-mercator shape.

``tessellate_projected(proj, a, b, tol)``: vertices whose PROJECTED
polyline stays within ``tol`` radians of the geodesic ab — classic
recursive bisection: split while the projected midpoint of the current
span and the projection of the geodesic midpoint disagree by more than
the tolerance (the reference's original scheme; its newer version
halves the vertex count with a quadratic error model, same contract).

``tessellate_unprojected(proj, pa, pb, tol)``: the dual — geodesic
vertices approximating the straight projected segment pa->pb.
"""

from __future__ import annotations

import math

import numpy as np


class PlateCarree:
    """x = lng_deg, y = lat_deg."""

    def project(self, p: np.ndarray) -> tuple[float, float]:
        lat = math.asin(max(-1.0, min(1.0, float(p[2]))))
        lng = math.atan2(float(p[1]), float(p[0]))
        return math.degrees(lng), math.degrees(lat)

    def unproject(self, x: float, y: float) -> np.ndarray:
        la, ln = math.radians(y), math.radians(x)
        return np.array(
            [math.cos(la) * math.cos(ln), math.cos(la) * math.sin(ln), math.sin(la)]
        )

    def interpolate(self, t: float, a, b):
        # straight segment in projected space; take the short way in lng
        # (degrees) so geodesics crossing the +/-180 seam converge instead
        # of sweeping the long way through lng ~ 0 (same wrap Mercator
        # applies in radians)
        dx = b[0] - a[0]
        if dx > 180.0:
            dx -= 360.0
        elif dx < -180.0:
            dx += 360.0
        return (a[0] + t * dx, a[1] + t * (b[1] - a[1]))


class Mercator:
    """x = lng_rad, y = ln tan(pi/4 + lat/2) (conformal; poles excluded)."""

    MAX_LAT = math.radians(89.9)

    def project(self, p: np.ndarray) -> tuple[float, float]:
        lat = max(-self.MAX_LAT, min(self.MAX_LAT, math.asin(max(-1.0, min(1.0, float(p[2]))))))
        lng = math.atan2(float(p[1]), float(p[0]))
        return lng, math.log(math.tan(math.pi / 4.0 + lat / 2.0))

    def unproject(self, x: float, y: float) -> np.ndarray:
        lat = 2.0 * math.atan(math.exp(y)) - math.pi / 2.0
        return np.array(
            [
                math.cos(lat) * math.cos(x),
                math.cos(lat) * math.sin(x),
                math.sin(lat),
            ]
        )

    def interpolate(self, t: float, a, b):
        # straight segment in projected space; take the short way in lng
        dx = b[0] - a[0]
        if dx > math.pi:
            dx -= 2 * math.pi
        elif dx < -math.pi:
            dx += 2 * math.pi
        return (a[0] + t * dx, a[1] + t * (b[1] - a[1]))


def _angle(p: np.ndarray, q: np.ndarray) -> float:
    return math.acos(max(-1.0, min(1.0, float(np.dot(p, q)))))


def _geo_mid(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    m = a + b
    n = np.linalg.norm(m)
    if n < 1e-15:
        raise ValueError("antipodal edge cannot be tessellated")
    return m / n


def tessellate_projected(proj, a: np.ndarray, b: np.ndarray, tol: float) -> list:
    """Projected vertices (x, y) whose straight-line interpolation stays
    within ``tol`` radians of the geodesic ab."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    pa, pb = proj.project(a), proj.project(b)
    out = [pa]

    def recurse(va, pva, vb, pvb, depth):
        mid_geo = _geo_mid(va, vb)
        pm_line = proj.interpolate(0.5, pva, pvb)
        err = _angle(mid_geo, proj.unproject(*pm_line))
        if err <= tol or depth >= 30:
            out.append(pvb)
            return
        pm_geo = proj.project(mid_geo)
        recurse(va, pva, mid_geo, pm_geo, depth + 1)
        recurse(mid_geo, pm_geo, vb, pvb, depth + 1)

    recurse(a, pa, b, pb, 0)
    return out


def tessellate_unprojected(proj, pa, pb, tol: float) -> list[np.ndarray]:
    """Geodesic vertices approximating the straight PROJECTED segment
    pa->pb within ``tol`` radians."""
    va, vb = proj.unproject(*pa), proj.unproject(*pb)
    out = [va]

    def recurse(qa, vqa, qb, vqb, depth):
        qm = proj.interpolate(0.5, qa, qb)
        vm_line = _geo_mid(vqa, vqb)
        err = _angle(proj.unproject(*qm), vm_line)
        if err <= tol or depth >= 30:
            out.append(vqb)
            return
        vm = proj.unproject(*qm)
        recurse(qa, vqa, qm, vm, depth + 1)
        recurse(qm, vm, qb, vqb, depth + 1)

    recurse(pa, va, pb, vb, 0)
    return out
