"""Port of the reference earth-conversion suite
(dilivia/s2/S2EarthUnitTest.kt) against
s2_geometry_kotlin_spark/kernel/distance.py (D8): angle/distance
conversions, solid angles, toLongitudeRadians pole handling, the
8-case initial-bearing fixture table, and point/latlng distances."""

import math

import numpy as np

from s2_geometry_kotlin_spark.kernel.distance import (
    EARTH_RADIUS_METERS, chord2_between, chord2_to_meters,
    chord2_to_radians, initial_bearing_rad, meters_to_chord2,
    radians_to_chord2, to_longitude_radians)

RADIUS_M = EARTH_RADIUS_METERS
RADIUS_KM = RADIUS_M / 1000.0
PI = math.pi


def meters_to_radians(m: float) -> float:
    return m / RADIUS_M


def radians_to_meters(r: float) -> float:
    return r * RADIUS_M


def test_angle_conversion():
    assert abs(meters_to_radians(RADIUS_M) - 1.0) <= 1e-15
    # chord-space roundtrips
    assert abs(chord2_to_meters(radians_to_chord2(2.0))
               - 2 * RADIUS_M) <= 1e-7 * RADIUS_M
    assert abs(chord2_to_meters(radians_to_chord2(PI))
               - RADIUS_M * PI) <= 1e-7
    assert abs(chord2_to_radians(meters_to_chord2(0.5 * RADIUS_M))
               - 0.5) <= 1e-15
    assert abs(meters_to_radians(radians_to_meters(0.3) * 1000 / 1000)
               - 0.3) <= 1e-15
    assert abs(radians_to_meters(meters_to_radians(2500.0))
               - 2500.0) <= 1e-9


def test_solid_angle_conversion():
    def square_km_to_steradians(km2):
        return km2 / RADIUS_KM ** 2

    def steradians_to_square_km(sr):
        return sr * RADIUS_KM ** 2

    assert abs(square_km_to_steradians(RADIUS_KM ** 2) - 1.0) <= 1e-15
    assert abs(steradians_to_square_km(0.5 ** 2)
               - (0.5 * RADIUS_KM) ** 2) <= 1e-15


def test_to_longitude_radians():
    one_radius = 1.0  # earth radius as an angle = 1 radian
    assert abs(to_longitude_radians(one_radius, 0.0) - 1.0) <= 1e-15
    assert to_longitude_radians(one_radius, 0.5) > \
        to_longitude_radians(one_radius, 0.4)
    assert abs(to_longitude_radians(one_radius, PI / 2)
               - 2 * PI) <= 1e-15
    assert abs(to_longitude_radians(one_radius, PI / 2 - 1e-4)
               - 2 * PI) <= 1e-15


BEARING_CASES = [
    ("westward on equator", (0, 50), (0, 100), 90.0),
    ("eastward on equator", (0, 50), (0, 0), -90.0),
    ("northward on meridian", (16, 28), (81, 28), 0.0),
    ("southward on meridian", (24, 64), (-27, 64), 180.0),
    ("towards north pole", (12, 76), (90, 50), 0.0),
    ("towards south pole", (-35, 105), (-90, -120), 180.0),
    ("Spain to Japan", (40.4379332, -3.749576),
     (35.6733227, 139.6403486), 29.2),
    ("Japan to Spain", (35.6733227, 139.6403486),
     (40.4379332, -3.749576), -27.2),
]


def test_initial_bearing():
    for name, a, b, want_deg in BEARING_CASES:
        got = math.degrees(initial_bearing_rad(
            math.radians(a[0]), math.radians(a[1]),
            math.radians(b[0]), math.radians(b[1])))
        diff = abs(math.remainder(got - want_deg, 360.0))
        assert diff <= 1e-2, (name, got, want_deg)


def ll(lat_deg, lng_deg):
    la, ln = math.radians(lat_deg), math.radians(lng_deg)
    return np.array([math.cos(la) * math.cos(ln),
                     math.cos(la) * math.sin(ln), math.sin(la)])


def _dist_m(a, b) -> float:
    d2 = float(chord2_between(a[0], a[1], a[2], b[0], b[1], b[2]))
    return float(chord2_to_meters(d2))


def test_get_distance():
    north = np.array([0.0, 0.0, 1.0])
    south = np.array([0.0, 0.0, -1.0])
    west = np.array([0.0, -1.0, 0.0])
    assert abs(_dist_m(north, south) - PI * RADIUS_M) <= 1e-7
    assert abs(_dist_m(west, west)) <= 1e-15
    assert abs(_dist_m(north, west) - PI / 2 * RADIUS_M) <= 1e-7
    assert abs(_dist_m(ll(0, -90), ll(-90, -38))
               - _dist_m(west, south)) <= 1e-7
    a = np.array([math.cos(0.6), math.sin(0.6), 0.0])
    b = np.array([math.cos(-0.4), math.sin(-0.4), 0.0])
    assert abs(_dist_m(a, b) / 1000.0 - RADIUS_KM) <= 1e-9
    assert abs(_dist_m(ll(80, 27), ll(55, -153))
               - 1000 * RADIUS_KM * PI / 4) <= 1e-7
