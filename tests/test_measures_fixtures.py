"""Port of the reference triangle-measures suite
(dilivia/s2/S2MeasuresUnitTest.kt) against
s2_geometry_kotlin_spark/kernel/measures.py (angle / turn_angle /
triangle_area / girard_area): exact quadrant fixtures, relative
accuracy on tiny triangles, degenerate triangles, the Girard
robust-cross-product stress, near-180-degree edge decompositions of a
quarter- and half-sphere, and the rounding case where the true area is
zero but dmin > 0."""

import math

import numpy as np

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel.measures import (
    angle, girard_area, triangle_area, turn_angle)

PI = math.pi
PI_2 = math.pi / 2
PI_4 = math.pi / 4

PZ = np.array([0.0, 0.0, 1.0])
P000 = np.array([1.0, 0.0, 0.0])
P045 = np.array([1.0, 1.0, 0.0]) / math.sqrt(2)
P090 = np.array([0.0, 1.0, 0.0])
P180 = np.array([-1.0, 0.0, 0.0])


def ll(lat_rad, lng_rad):
    x, y, z = (math.cos(lat_rad) * math.cos(lng_rad),
               math.cos(lat_rad) * math.sin(lng_rad), math.sin(lat_rad))
    v = np.array([x, y, z])
    return v / np.linalg.norm(v)


def ll_deg(lat, lng):
    x, y, z = ck.latlng_deg_to_xyz(np.array([float(lat)]),
                                   np.array([float(lng)]))
    return np.array([x[0], y[0], z[0]])


def test_angle_methods():
    assert angle(P000, PZ, P045) == PI_4
    assert turn_angle(P000, PZ, P045) == -3 * PI_4

    assert angle(P045, PZ, P180) == 3 * PI_4
    assert turn_angle(P045, PZ, P180) == -PI_4

    assert angle(P000, PZ, P180) == PI
    assert turn_angle(P000, PZ, P180) == 0.0

    assert angle(PZ, P000, P045) == PI_2
    assert turn_angle(PZ, P000, P045) == PI_2

    assert angle(PZ, P000, PZ) == 0.0
    assert abs(turn_angle(PZ, P000, PZ)) == PI


def test_area_methods():
    assert triangle_area(P000, P090, PZ) == PI_2
    assert triangle_area(P045, PZ, P180) == 3 * PI_4

    # good RELATIVE accuracy for very small areas
    eps = 1e-10
    pepsx = np.array([eps, 0.0, 1.0])
    pepsx /= np.linalg.norm(pepsx)
    pepsy = np.array([0.0, eps, 1.0])
    pepsy /= np.linalg.norm(pepsy)
    expected1 = 0.5 * eps * eps
    assert abs(triangle_area(pepsx, pepsy, PZ) - expected1) \
        <= 1e-14 * expected1

    # degenerate triangles
    pr = np.array([0.257, -0.5723, 0.112])
    pr /= np.linalg.norm(pr)
    pq = np.array([-0.747, 0.401, 0.2235])
    pq /= np.linalg.norm(pq)
    assert triangle_area(pr, pr, pr) == 0.0
    assert abs(triangle_area(pr, pq, pr)) <= 1e-15
    assert triangle_area(P000, P045, P090) == 0.0

    # Girard stress: only passes if girard_area uses robust cross
    # products
    rng = np.random.default_rng(20260817)
    max_girard = 0.0
    for _ in range(10000):
        p0 = rng.normal(size=3)
        p0 /= np.linalg.norm(p0)
        d1 = rng.normal(size=3)
        d1 /= np.linalg.norm(d1)  # reference uses UNIT displacements
        d2 = rng.normal(size=3)
        d2 /= np.linalg.norm(d2)
        p1 = p0 + 1e-15 * d1
        p1 /= np.linalg.norm(p1)
        p2 = p0 + 1e-15 * d2
        p2 /= np.linalg.norm(p2)
        assert triangle_area(p0, p1, p2) <= 0.7e-30
        max_girard = max(max_girard, girard_area(p0, p1, p2))
    assert max_girard <= 1e-14, max_girard

    # very long and skinny triangle
    p045eps = np.array([1.0, 1.0, eps])
    p045eps /= np.linalg.norm(p045eps)
    expected2 = 5.8578643762690495119753e-11  # Mathematica
    assert abs(triangle_area(P000, p045eps, P090) - expected2) \
        <= 1e-9 * expected2

    # triangles with near-180-degree edges summing to a quarter sphere
    eps2 = 1e-14
    p000eps2 = np.array([1.0, 0.1 * eps2, eps2])
    p000eps2 /= np.linalg.norm(p000eps2)
    quarter1 = (triangle_area(p000eps2, P000, P045)
                + triangle_area(p000eps2, P045, P180)
                + triangle_area(p000eps2, P180, PZ)
                + triangle_area(p000eps2, PZ, P000))
    assert abs(quarter1 - PI) <= 1e-15

    p045eps2 = np.array([1.0, 1.0, eps2])
    p045eps2 /= np.linalg.norm(p045eps2)
    quarter2 = (triangle_area(p045eps2, P000, P045)
                + triangle_area(p045eps2, P045, P180)
                + triangle_area(p045eps2, P180, PZ)
                + triangle_area(p045eps2, PZ, P000))
    assert quarter2 == PI

    # hemisphere from four triangles with one near-180-degree edge and
    # one near-degenerate edge
    for _ in range(100):
        lng = 2 * PI * rng.random()
        p0 = ll(1e-20, lng)
        p1 = ll(0.0, lng)
        p2 = ll(0.0, lng + rng.random())
        p3 = ll(0.0, lng + PI)
        p4 = ll(0.0, lng + 5.0)
        area = (triangle_area(p0, p1, p2) + triangle_area(p0, p2, p3)
                + triangle_area(p0, p3, p4) + triangle_area(p0, p4, p1))
        assert abs(area - 2 * PI) <= 2e-15

    # zero-area triangle where rounding makes dmin > 0
    assert triangle_area(ll_deg(-45, -170), ll_deg(45, -170),
                         ll_deg(0, -170)) == 0.0
