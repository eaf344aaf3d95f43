"""S2LatLngRect Hausdorff (s2latlng_rect.cc:588-729).

Mirrors s2latlng_rect_test.cc's strategy: the sampled verifier
(VerifyGetDirectedHausdorffDistance, test.cc:904-940) checks the kernel
against a 0.1-resolution sweep of rect a where each sample's distance
to b comes from an INDEPENDENT port of S2LatLngRect::GetDistance using
libm trig (the kernel uses portable trig and chord-squared space
throughout — so sampling, trig, and distance representation are all
independent).  Fixed cases: containment => exactly 0, point-to-rect ==
GetDistance, the reference's near-pole and degenerate rect pairs."""

import math

import numpy as np

from s2geometry_spark.operators.rect_hausdorff import (
    directed_hausdorff_chord2,
    s1_directed_hausdorff,
)

PI = math.pi


def _chord2_to_rad(c2: float) -> float:
    return 2.0 * math.asin(min(1.0, 0.5 * math.sqrt(max(0.0, c2))))


def _directed(a, b) -> float:
    """Kernel result in radians for scalar rects (lat_lo, lat_hi,
    lng_lo, lng_hi)."""
    args = [np.array([v], np.float64) for v in (*a, *b)]
    # kernel argument order: alat_lo, alat_hi, alng_lo, alng_hi, b...
    c2 = directed_hausdorff_chord2(
        args[0], args[1], args[2], args[3], args[4], args[5], args[6], args[7]
    )
    return _chord2_to_rad(float(c2[0]))


def _rect_deg(lat_lo, lng_lo, lat_hi, lng_hi):
    def norm_lng(d):
        r = math.radians(d)
        while r > PI:
            r -= 2 * PI
        while r < -PI:
            r += 2 * PI
        return r

    return (
        math.radians(lat_lo),
        math.radians(lat_hi),
        norm_lng(lng_lo),
        norm_lng(lng_hi),
    )


# ---- independent S2LatLngRect::GetDistance(point) port (libm trig) ----


def _s1_contains(lo, hi, p):
    if p == -PI:
        p = PI
    if lo > hi:
        return (p >= lo or p <= hi) and not (lo == PI and hi == -PI)
    return lo <= p <= hi


def _s1_complement_center(lo, hi):
    if lo != hi:
        center = 0.5 * (lo + hi)
        if hi > lo:  # complement inverted
            return center + PI if center <= 0 else center - PI
        return center
    return hi + PI if hi <= 0 else hi - PI


def _to_point(lat, lng):
    return np.array(
        [math.cos(lng) * math.cos(lat), math.sin(lng) * math.cos(lat), math.sin(lat)]
    )


def _point_arc_dist(x, a, b):
    n = np.cross(a, b)
    if np.dot(x, np.cross(n, a)) > 0 and np.dot(x, np.cross(b, n)) > 0:
        s = abs(np.dot(x, n)) / np.linalg.norm(n)
        return math.asin(min(1.0, s))
    da = math.acos(max(-1.0, min(1.0, np.dot(x, a))))
    db = math.acos(max(-1.0, min(1.0, np.dot(x, b))))
    return min(da, db)


def _rect_point_distance(rect, lat, lng):
    lat_lo, lat_hi, lng_lo, lng_hi = rect
    if _s1_contains(lng_lo, lng_hi, lng):
        return max(0.0, max(lat - lat_hi, lat_lo - lat))
    cc = _s1_complement_center(lng_lo, lng_hi)
    a_lng = lng_hi if _s1_contains(lng_hi, cc, lng) else lng_lo
    lo = _to_point(lat_lo, a_lng)
    hi = _to_point(lat_hi, a_lng)
    return _point_arc_dist(_to_point(lat, lng), lo, hi)


def _verify(a, b):
    """VerifyGetDirectedHausdorffDistance (test.cc:904-940)."""
    got = _directed(a, b)
    res = 0.1
    lat_len = a[1] - a[0]
    lng_len = a[3] - a[2]
    if lng_len < 0:
        lng_len += 2 * PI
    n_lat = int(lat_len / res) + 1
    n_lng = int(lng_len / res) + 1
    dlat = lat_len / n_lat
    dlng = lng_len / n_lng
    max_d = 0.0
    for i in range(n_lng + 1):
        lng = a[2] + i * dlng
        if lng > PI:
            lng -= 2 * PI
        for j in range(n_lat + 1):
            lat = a[0] + j * dlat
            max_d = max(max_d, _rect_point_distance(b, lat, lng))
    assert max_d <= got + 1e-10, (a, b, max_d, got)
    assert max_d >= got - res, (a, b, max_d, got)


def test_contained_is_zero():
    a = _rect_deg(-10, 20, -5, 90)
    for b in [
        _rect_deg(-10, 20, -5, 90),
        _rect_deg(-10, 19, -5, 91),
        _rect_deg(-11, 20, -4, 90),
        _rect_deg(-11, 19, -4, 91),
    ]:
        assert _directed(a, b) == 0.0


def test_point_to_rect_equals_get_distance():
    # directed Hausdorff from a point-rect == the point's GetDistance
    for (plat, plng), b in [
        ((5, 8), _rect_deg(-10, 20, -5, 90)),
        ((-6, -100), _rect_deg(-10, 20, -5, 90)),
        ((5, 8), _rect_deg(4, -10, 80, 10)),
        ((-87, 1), _rect_deg(70, 170, 80, -170)),
    ]:
        a = _rect_deg(plat, plng, plat, plng)
        want = _rect_point_distance(b, math.radians(plat), a[2])
        assert abs(_directed(a, b) - want) < 1e-9


def test_rect_to_point_cases():
    a = _rect_deg(1, -8, 10, 20)
    for plat, plng in [(5, 8), (-6, -100), (-90, -20), (90, 0)]:
        _verify(a, _rect_deg(plat, plng, plat, plng))


def test_near_pole_cases():
    a = _rect_deg(-87, 0, -85, 3)
    for b in [
        _rect_deg(-89, 1, -88, 2),
        _rect_deg(-84, 1, -83, 2),
        _rect_deg(-88, 90, -86, 91),
        _rect_deg(-84, -91, -83, -90),
        _rect_deg(-90, 181, -89, 182),
        _rect_deg(-84, 181, -83, 182),
    ]:
        _verify(a, b)


def test_degenerate_cases():
    _verify(_rect_deg(0, 10, 90, 20), _rect_deg(-4, -10, 4, 0))
    _verify(_rect_deg(-4, -10, 4, 0), _rect_deg(0, 10, 90, 20))
    a = _rect_deg(-50, -10, 50, 10)
    b = _rect_deg(30, -10, 60, 10)
    _verify(a, b)
    # complement lng interval of a (inverted)
    c = (a[0], a[1], a[3], a[2])
    _verify(c, b)


def test_random_pairs():
    rng = np.random.default_rng(11)
    for _ in range(60):
        lats = np.sort(rng.uniform(-85, 85, 4))
        lngs = rng.uniform(-179, 179, 4)
        a = _rect_deg(lats[0], min(lngs[0], lngs[1]), lats[1], max(lngs[0], lngs[1]))
        b = _rect_deg(lats[2], min(lngs[2], lngs[3]), lats[3], max(lngs[2], lngs[3]))
        _verify(a, b)
        # complemented lng intervals (inverted wrap) like the reference
        a2 = (a[0], a[1], a[3], a[2])
        b2 = (b[0], b[1], b[3], b[2])
        _verify(a, b2)
        _verify(a2, b)
        _verify(a2, b2)


def test_s1_directed_hausdorff_sampled():
    rng = np.random.default_rng(7)
    for _ in range(200):
        xlo, xhi = rng.uniform(-PI, PI, 2)
        ylo, yhi = rng.uniform(-PI, PI, 2)
        got = float(
            s1_directed_hausdorff(
                np.array([xlo]), np.array([xhi]), np.array([ylo]), np.array([yhi])
            )[0]
        )
        # sampled: max over x of min angular distance to y
        xlen = xhi - xlo if xhi >= xlo else xhi - xlo + 2 * PI
        max_d = 0.0
        for t in np.linspace(0, 1, 400):
            p = xlo + t * xlen
            if p > PI:
                p -= 2 * PI
            if _s1_contains(ylo, yhi, p):
                d = 0.0
            else:
                dlo = abs(p - ylo)
                dhi = abs(p - yhi)
                d = min(
                    min(dlo, 2 * PI - dlo), min(dhi, 2 * PI - dhi)
                )
            max_d = max(max_d, d)
        assert max_d <= got + 1e-9
        assert max_d >= got - xlen / 399 - 1e-9
