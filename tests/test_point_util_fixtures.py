"""Port of the reference point-util suite
(dilivia/s2/S2PointUtilUnitTest.kt): the symbolic-origin choice that
every PIP parity walk depends on (exact value; far from the poles; not
nearly collinear with edges of any S2Cell larger than ~3 m), and the
Rodrigues rotation invariants down to 1e-15-radian angles."""

import math

import numpy as np

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel import predicates as pred
from s2_geometry_kotlin_spark.kernel.measures import turn_angle
from s2_geometry_kotlin_spark.kernel.regions import Cell
from s2_geometry_kotlin_spark.sources.layers import _rotate

MAX_LEVEL = 30


def test_origin_value():
    expected = np.array([-0.01, 0.01 * ck.sc_st_to_uv(2.0 / 3.0), 1.0])
    expected /= np.linalg.norm(expected)
    assert np.array_equal(pred.ORIGIN, expected)


def test_origin_not_near_pole():
    # ~66 km from the north pole: at least 50 km away
    distance_km = math.acos(pred.ORIGIN[2]) * 6371.01
    assert distance_km >= 50.0


def _min_expensive_level(p: np.ndarray) -> int:
    """Min level at which an edge of a containing cell is nearly
    collinear with the origin (triage determinant underflows)."""
    leaf = int(ck.from_xyz(*[np.array([c]) for c in p])[0])
    for level in range(MAX_LEVEL + 1):
        cell = Cell(ck.sc_parent(leaf, level))
        verts = cell.vertices()
        for k in range(4):
            a, b = verts[k], verts[(k + 1) % 4]
            det = float(np.cross(a, b) @ pred.ORIGIN)
            # triageSign returns 0 when |det| <= max error
            norm = float(np.linalg.norm(np.cross(a, b)))
            if abs(det) <= 3.2321 * 2.22e-16 * norm:
                return level
    return MAX_LEVEL + 1


def test_origin_not_collinear_with_large_cell_edges():
    assert _min_expensive_level(pred.ORIGIN) >= 22
    equator_point = np.array([pred.ORIGIN[0], pred.ORIGIN[1], 0.0])
    assert _min_expensive_level(equator_point) >= 22


def test_rotate_invariants():
    rng = np.random.default_rng(20260817)
    from s2_geometry_kotlin_spark.kernel.edges import (
        interpolate_at_distance)
    for _ in range(300):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        target = rng.normal(size=3)
        target /= np.linalg.norm(target)
        distance = math.pi * (1e-15 ** rng.random())
        if rng.integers(5) == 0:
            distance = math.pi - distance
        p = interpolate_at_distance(axis[None, :], target[None, :],
                                    np.array([distance]))[0]
        angle = 2 * math.pi * (1e-15 ** rng.random())
        if rng.integers(3) == 0:
            angle = -angle
        if rng.integers(10) == 0:
            angle = 0.0
        result = _rotate(p, axis, angle)
        # unit length
        assert abs(float(np.linalg.norm(result)) - 1.0) <= 1e-14
        # same distance from the axis
        def ang(u, v):
            return math.atan2(float(np.linalg.norm(np.cross(u, v))),
                              float(u @ v))
        assert abs(ang(result, axis) - ang(p, axis)) <= 1e-14
        # rotation angle correct, with error scaled by axis distance
        k_max_pos_err = 1e-15
        axis_dist = float(np.linalg.norm(np.cross(p, axis)))
        if axis_dist < k_max_pos_err:
            max_rot_err = 2 * math.pi
        else:
            max_rot_err = math.asin(min(1.0, k_max_pos_err / axis_dist))
        actual = turn_angle(p, axis, result) + math.pi
        rot_err = math.remainder(angle - actual, 2 * math.pi)
        assert rot_err <= max_rot_err + 1e-14, (angle, actual)
