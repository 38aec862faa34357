"""Port of the applicable reference chord-angle fixtures
(dilivia/s2/S1ChordAngleUnitTest.kt) against the squared-chord helpers
in kernel/distance.py — our engine stores chord^2 as raw floats, so the
representational class cases (negative/infinity sentinels, successor)
do not map; what must hold are the conversions, the two-point
construction, the 4.0 cap, and chord-space arithmetic/trigonometry."""

import math

import numpy as np

from s2_geometry_kotlin_spark.kernel.distance import (
    chord2_points, chord2_to_radians, radians_to_chord2)

PI = math.pi


def deg2chord2(d):
    return float(radians_to_chord2(math.radians(d)))


def chord2deg(c2):
    return math.degrees(float(chord2_to_radians(c2)))


def test_two_point_constructor():
    x = np.array([1.0, 0.0, 0.0])
    y = np.array([0.0, 1.0, 0.0])
    z = np.array([0.0, 0.0, 1.0])
    assert float(chord2_points(z[None], z[None])[0]) == 0.0
    assert abs(chord2_to_radians(chord2_points((-x)[None], x[None])[0])
               - PI) <= 1e-15  # antipodal -> straight
    assert abs(chord2_to_radians(chord2_points((-y)[None], y[None])[0])
               - PI) <= 1e-15
    assert abs(float(chord2_points(x[None], y[None])[0]) - 2.0) <= 1e-15


def test_from_length2():
    assert chord2deg(0.0) == 0.0
    assert abs(chord2deg(1.0) - 60.0) <= 1e-12
    assert abs(chord2deg(2.0) - 90.0) <= 1e-12
    assert chord2deg(4.0) == 180.0
    # lengths above 4 cap at straight
    assert float(radians_to_chord2(PI)) == 4.0
    assert chord2deg(float(np.minimum(4.0, 5.0))) == 180.0


def test_to_from_angle_roundtrip():
    assert float(radians_to_chord2(0.0)) == 0.0
    assert float(radians_to_chord2(PI)) == 4.0
    assert float(chord2_to_radians(4.0)) == PI
    assert abs(float(chord2_to_radians(radians_to_chord2(1.0)))
               - 1.0) <= 1e-15


def test_trigonometry():
    # sin/cos/tan of the recovered angle match the angle itself
    k_iters = 40
    for it in range(k_iters + 1):
        radians = PI * it / k_iters
        rad2 = float(chord2_to_radians(radians_to_chord2(radians)))
        # the engine recovers angles via the 2*asin(chord/2) roundtrip
        # (not the chord-space sin/cos formulas), which costs ~2 ulp
        # near pi — 4e-15 instead of the reference's direct 1e-15
        assert abs(math.sin(rad2) - math.sin(radians)) <= 4e-15
        assert abs(math.cos(rad2) - math.cos(radians)) <= 4e-15
        tan_expected = math.tan(radians)
        tan_got = math.tan(rad2)
        if abs(tan_expected) < 1e12:  # skip the pole
            # d(tan)/d(angle) = 1 + tan^2 scales the roundtrip error
            assert abs(tan_got - tan_expected) <= \
                4e-15 * (1.0 + tan_expected ** 2)


def test_arithmetic_in_chord_space():
    """Chord-angle addition a(+)b = chord(angle(a)+angle(b)) via the
    cross-term formula; checked through the radians roundtrip the
    engine uses."""
    def add(c2a, c2b):
        return float(radians_to_chord2(
            float(chord2_to_radians(c2a)) + float(chord2_to_radians(c2b))))

    d30, d60, d90 = deg2chord2(30), deg2chord2(60), deg2chord2(90)
    assert abs(chord2deg(add(0.0, 0.0))) <= 1e-12
    assert abs(chord2deg(add(d30, d60)) - 90.0) <= 1e-12
    assert abs(chord2deg(add(d60, d30)) - 90.0) <= 1e-12
    assert abs(chord2deg(add(d90, d90)) - 180.0) <= 1e-12
    # saturation at straight
    assert add(d90, deg2chord2(120)) == 4.0
