"""S2EdgeCrossingsUnitTest ports (edge/S2EdgeCrossingsUnitTest.kt):
the M8 intersection invariants — grazing-intersection ordering
(:193-233), exact-collinear underflow (:237-247) and the
swap/reverse invariance sweep (:249-305)."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel.edges import edge_intersection
from s2_geometry_kotlin_spark.kernel.predicates import (
    crossing_sign, sign)

INTERSECTION_ERROR = 8.0 * 2.220446049250313e-16


def rand_point(rng):
    while True:
        p = np.array([rng.gauss(0, 1) for _ in range(3)])
        n = np.linalg.norm(p)
        if n > 1e-6:
            return p / n


def rand_frame(rng):
    x = rand_point(rng)
    y = np.cross(x, rand_point(rng))
    y /= np.linalg.norm(y)
    return x, y


def semicircle_point(rng, x, y):
    """chooseSemicirclePoint (:187-191): a point on the great circle of
    (x, y), perturbed by up to 1e-15 in a random direction."""
    s = 1 if rng.random() < 0.5 else -1
    t = rng.random() * 2 - 1
    p = x * math.cos(t) + s * y * math.sin(t)
    q = rand_point(rng)
    return p + 1e-15 * rng.random() * q


@pytest.mark.parametrize("seed", [51, 52])
def test_grazing_intersections(seed):
    """Near-collinear CD and CE crossing AB: the computed intersection
    points must order along AB consistently with sign(c,d,e) vs
    sign(c,a,b), whenever they are more than 2*kIntersectionError
    apart."""
    rng = random.Random(seed)
    done = 0
    attempts = 0
    while done < 150 and attempts < 20000:
        attempts += 1
        x, y = rand_frame(rng)
        a = semicircle_point(rng, x, y)
        b = semicircle_point(rng, x, y)
        c = semicircle_point(rng, x, y)
        d = semicircle_point(rng, x, y)
        e = semicircle_point(rng, x, y)
        a /= np.linalg.norm(a)
        b /= np.linalg.norm(b)
        c /= np.linalg.norm(c)
        d /= np.linalg.norm(d)
        e /= np.linalg.norm(e)
        ab = np.cross(a - b, a + b)
        if np.linalg.norm(ab) < 50 * 2.22e-16:
            continue
        if crossing_sign(a, b, c, d) <= 0 or \
                crossing_sign(a, b, c, e) <= 0:
            continue
        xcd = edge_intersection(a, b, c, d)
        xce = edge_intersection(a, b, c, e)
        abn = ab / np.linalg.norm(ab)
        gap = math.atan2(float(np.linalg.norm(np.cross(xcd, xce))),
                         float(xcd @ xce))
        if gap > 2 * INTERSECTION_ERROR:
            same = sign(c, d, e) == sign(c, a, b)
            assert same == (sign(abn, xcd, xce) > 0)
        done += 1
    assert done >= 100


def test_exact_intersection_underflow():
    """:237-247: exactly collinear edges whose normals underflow — the
    intersection must still be the correct point."""
    a0 = np.array([1.0, 0.0, 0.0])
    a1 = np.array([1.0, 2e-300, 0.0])
    b0 = np.array([1.0, 1e-300, 0.0])
    b1 = np.array([1.0, 3e-300, 0.0])
    got = edge_intersection(a0, a1, b0, b1)
    assert np.array_equal(got, np.array([1.0, 1e-300, 0.0]))


@pytest.mark.parametrize("seed", [53, 54])
def test_intersection_invariants(seed):
    """:249-305: the intersection point must not change when the edges
    are swapped and/or reversed (edges constructed with exactly equal
    lengths by swapping x/y coordinates)."""
    rng = random.Random(seed)
    done = 0
    attempts = 0
    while done < 400 and attempts < 20000:
        attempts += 1
        a = rand_point(rng)
        b = rand_point(rng)
        c = np.array([a[1], a[0], a[2]])
        d = np.array([b[1], b[0], b[2]])
        if crossing_sign(a, b, c, d) <= 0:
            continue
        # (the reference also asserts exactly equal Norm2 here, which
        # depends on its fixed (x^2+y^2)+z^2 association; numpy's dot
        # may associate differently, and this implementation does not
        # sort edges by length, so the precondition is moot)
        result = edge_intersection(a, b, c, d)
        if rng.random() < 0.5:
            a, b = b, a
        if rng.random() < 0.5:
            c, d = d, c
        if rng.random() < 0.5:
            a, b, c, d = c, d, a, b
        got = edge_intersection(a, b, c, d)
        assert np.array_equal(got, result), (seed, done)
        done += 1
    assert done >= 200
