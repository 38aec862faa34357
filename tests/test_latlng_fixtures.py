"""Port of the reference lat/lng conversion suite
(dilivia/s2/S2LatLngUnitTest.kt) against the cellid kernel's
latlng<->xyz conversions: pole and date-line special cases, random
roundtrips, and haversine distances."""

import math

import numpy as np

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel.distance import (
    chord2_between, chord2_to_radians)


def to_point(lat_deg, lng_deg) -> np.ndarray:
    x, y, z = ck.latlng_deg_to_xyz(np.array([float(lat_deg)]),
                                   np.array([float(lng_deg)]))
    return np.array([x[0], y[0], z[0]])


def to_latlng(p) -> tuple[float, float]:
    lat, lng = ck.xyz_to_latlng_deg(np.array([p[0]]), np.array([p[1]]),
                                    np.array([p[2]]))
    return float(lat[0]), float(lng[0])


def test_conversion_special_cases():
    # poles keep latitude exactly
    lat, _lng = to_latlng(to_point(90.0, 65.0))
    assert lat == 90.0
    lat, _lng = to_latlng(to_point(-90.0, math.degrees(1.0)))
    assert lat == -90.0
    # the date line maps to +-180 exactly
    _lat, lng = to_latlng(to_point(12.2, 180.0))
    assert abs(lng) == 180.0
    _lat, lng = to_latlng(to_point(0.1 * 180 / math.pi, -180.0))
    assert abs(lng) == 180.0


def test_conversion_random_roundtrip():
    rng = np.random.default_rng(20260817)
    p = rng.normal(size=(100000, 3))
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    lat, lng = ck.xyz_to_latlng_deg(p[:, 0], p[:, 1], p[:, 2])
    x, y, z = ck.latlng_deg_to_xyz(lat, lng)
    q = np.stack([x, y, z], axis=1)
    # approxEquals: within 1e-15 radians
    err = np.linalg.norm(np.cross(p, q), axis=1)
    assert float(err.max()) <= 1e-14


def _dist_deg(a, b) -> float:
    pa, pb = to_point(*a), to_point(*b)
    d2 = float(chord2_between(pa[0], pa[1], pa[2], pb[0], pb[1], pb[2]))
    return math.degrees(float(chord2_to_radians(d2)))


def test_distance():
    assert _dist_deg((90, 0), (90, 0)) == 0.0
    assert abs(_dist_deg((-37, 25), (-66, -155)) - 77.0) <= 1e-12
    assert abs(_dist_deg((0, 165), (0, -80)) - 115.0) <= 1e-12
    assert abs(_dist_deg((47, -127), (-47, 53)) - 180.0) <= 2e-6
