"""S2EdgeCrosserUnitTest ports (edge/S2EdgeCrosserUnitTest.kt:67-260):
the full crossings table (including the sub-double-precision cases that
require exact arithmetic), the collinear-non-touching sweep and the
coincident zero-length-edge sweep, against P2/P3."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel.edges import interpolate
from s2_geometry_kotlin_spark.kernel.predicates import (
    crossing_sign, edge_or_vertex_crossing)

ORIGIN = np.array([-0.0099994664350250197, 0.0025924542609324121,
                   0.99994664350250195])


def n(v):
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


def check_crossing(a, b, c, d, robust, edge_or_vertex):
    r = robust
    if np.array_equal(a, c) or np.array_equal(a, d) or \
            np.array_equal(b, c) or np.array_equal(b, d):
        r = 0
    assert crossing_sign(a, b, c, d) == r
    assert edge_or_vertex_crossing(a, b, c, d) == edge_or_vertex


def check_crossings(a, b, c, d, robust, edge_or_vertex):
    a, b, c, d = n(a), n(b), n(c), n(d)
    check_crossing(a, b, c, d, robust, edge_or_vertex)
    check_crossing(b, a, c, d, robust, edge_or_vertex)
    check_crossing(a, b, d, c, robust, edge_or_vertex)
    check_crossing(b, a, d, c, robust, edge_or_vertex)
    check_crossing(a, a, c, d, -1, False)
    check_crossing(a, b, c, c, -1, False)
    check_crossing(a, a, c, c, -1, False)
    check_crossing(a, b, a, b, 0, True)
    check_crossings_swapped = (robust, edge_or_vertex != (robust == 0))
    check_crossing(c, d, a, b, *check_crossings_swapped)


def next_towards(x, y):
    return np.nextafter(x, y)


CASES = [
    # regular crossing
    (((1, 2, 1), (1.0, -3.0, 0.5), (1.0, -0.5, -3.0), (0.1, 0.5, 3.0)),
     1, True),
    # antipodal intersection
    (((1, 2, 1), (1.0, -3.0, 0.5), (-1.0, 0.5, 3.0),
      (-0.1, -0.5, -3.0)), -1, False),
    # same great circle, antipodal starts
    (((0, 0, -1), (0, 1, 0), (0, 0, 1), (0, 1, 1)), -1, False),
    # one vertex is the S2 origin
    (((1, 0, 0), tuple(ORIGIN), (1.0, -0.1, 1.0), (1.0, 1.0, -0.1)),
     1, True),
    (((1, 0, 0), tuple(ORIGIN), (-1.0, 0.1, -1.0), (-1.0, -1.0, 0.1)),
     -1, False),
    # shared endpoint
    (((2, 3, 4), (-1, 2, 5), (7, -2, 3), (2, 3, 4)), 0, False),
    # barely crossing near the middle
    (((1, 1, 1), (1.0, next_towards(1.0, 0.0), -1.0), (11, -12, -1),
      (10, 10, 1)), 1, True),
    (((1, 1, 1), (1.0, next_towards(1.0, 2.0), -1.0), (1, -1, 0),
      (1, 1, 0)), -1, False),
    # barely crossing near the ends (needs exact arithmetic)
    (((0, 0, 1), (2.0, -1e-323, 1.0), (1, -1, 1), (1e-323, 0.0, 1.0)),
     1, True),
    (((0, 0, 1), (2.0, 1e-323, 1.0), (1, -1, 1), (1e-323, 0.0, 1.0)),
     -1, False),
    # needs >2000 bits of determinant precision
    (((1.0, -1e-323, -1e-323), (1e-323, 1.0, 1e-323),
      (1.0, -1.0, 1e-323), (1, 1, 0)), 1, True),
    (((1.0, 1e-323, -1e-323), (-1e-323, 1.0, 1e-323),
      (1.0, -1.0, 1e-323), (1, 1, 0)), -1, False),
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_crossings_table(case):
    (a, b, c, d), robust, eov = CASES[case]
    check_crossings(a, b, c, d, robust, eov)


@pytest.mark.parametrize("seed", [91, 92])
def test_collinear_edges_that_dont_touch(seed):
    """:215-228: sub-segments [0.05, 0.95] of a random edge never
    cross the full edge."""
    rng = random.Random(seed)
    for _ in range(150):
        a = n([rng.gauss(0, 1) for _ in range(3)])
        d = n([rng.gauss(0, 1) for _ in range(3)])
        b = interpolate(a[None, :], d[None, :], 0.05)[0]
        c = interpolate(a[None, :], d[None, :], 0.95)[0]
        assert crossing_sign(a, b, c, d) <= 0


@pytest.mark.parametrize("seed", [93, 94])
def test_coincident_zero_length_edges_that_dont_touch(seed):
    """:231-278: EXACTLY-proportional zero-length edges with
    monotonically increasing norms never report a crossing.  Exact
    proportionality needs every non-zero component to share one
    mantissa: components are powers of two (the reference's skewed
    construction), so scaling preserves proportionality exactly."""
    rng = random.Random(seed)
    done = 0
    for _ in range(400):
        comp = []
        for _i in range(3):
            e = rng.getrandbits(31) & ((1 << rng.randrange(12)) - 1)
            comp.append(0.0 if e > 1022 else 2.0 ** (-e))
        p = np.asarray(comp)
        if float(p @ p) == 0.0:
            continue
        p = p / np.linalg.norm(p)
        if not p.any():
            continue
        a = (1 - 3e-16) * p
        b = (1 - 1e-16) * p
        c = p
        d = (1 + 2e-16) * p
        if abs(float(a @ a) - 1) > 5e-15 or \
                abs(float(d @ d) - 1) > 5e-15:
            continue
        assert crossing_sign(a, b, c, d) <= 0
        done += 1
    assert done >= 100
