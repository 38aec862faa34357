"""S2EdgeClippingUnitTest faceClipping port
(edge/S2EdgeClippingUnitTest.kt:42-209): the named edge cases plus the
randomized near-cube-edge stress, checking the full consistency
contract of getFaceSegments and clipToPaddedFace."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel.clipping import (
    clip_to_padded_face, get_face_segments, robust_cross)

FACE_CLIP_ERROR = 9 * (2 ** -0.5) * 2.220446049250313e-16 * 40


def face_uv_to_xyz(face, u, v):
    x, y, z = ck.sc_face_uv_to_xyz(face, float(u), float(v))
    return np.array([x, y, z])


def nrm(p):
    return p / np.linalg.norm(p)


def check_face_clipping(a_raw, b_raw):
    a = nrm(np.asarray(a_raw, dtype=np.float64))
    b = nrm(np.asarray(b_raw, dtype=np.float64))
    if np.array_equal(a, -b):
        return
    norm = robust_cross(a, b)
    if float(norm @ norm) == 0.0:
        return
    norm = nrm(norm)
    a_tangent = np.cross(norm, a)
    b_tangent = np.cross(b, norm)
    err = FACE_CLIP_ERROR

    segments = get_face_segments(a, b)
    n = len(segments)
    assert n >= 1
    # endpoints approximately equal A and B
    f0, a0, b0 = segments[0]
    fn, an, bn = segments[-1]
    assert _angle(a, face_uv_to_xyz(f0, a0[0], a0[1])) <= err
    assert _angle(b, face_uv_to_xyz(fn, bn[0], bn[1])) <= err
    for i, (face, sa, sb) in enumerate(segments):
        assert max(abs(sa[0]), abs(sa[1])) <= 1 + 1e-15
        assert max(abs(sb[0]), abs(sb[1])) <= 1 + 1e-15
        if i > 0:
            pf, pa, pb = segments[i - 1]
            assert pf != face
            # identical S2Point on both adjacent faces
            assert np.array_equal(
                face_uv_to_xyz(pf, pb[0], pb[1]),
                face_uv_to_xyz(face, sa[0], sa[1]))
            p = nrm(face_uv_to_xyz(face, sa[0], sa[1]))
            assert abs(float(p @ norm)) <= err
            assert float(p @ a_tangent) >= -err
            assert float(p @ b_tangent) >= -err

    # clipToPaddedFace angle-interval coverage
    rng = random.Random(int(abs(a_raw[0]) * 1e6) + 1)
    padding = 0.0 if rng.random() < 0.1 else \
        1e-10 * (1e-5 ** rng.random())
    x_axis, y_axis = a, a_tangent
    ab_angle = _angle(a, b)
    covered = []   # list of (lo, hi) with lo <= hi
    for face in range(6):
        clipped = clip_to_padded_face(a, b, face, padding)
        if clipped is None:
            continue
        a_uv, b_uv = clipped
        a_clip = nrm(face_uv_to_xyz(face, a_uv[0], a_uv[1]))
        b_clip = nrm(face_uv_to_xyz(face, b_uv[0], b_uv[1]))
        assert abs(float(a_clip @ norm)) <= err
        assert abs(float(b_clip @ norm)) <= err
        if _angle(a_clip, a) > err:
            assert abs(max(abs(a_uv[0]), abs(a_uv[1])) -
                       (1 + padding)) <= 1e-15
        if _angle(b_clip, b) > err:
            assert abs(max(abs(b_uv[0]), abs(b_uv[1])) -
                       (1 + padding)) <= 1e-15
        aa = math.atan2(float(a_clip @ y_axis), float(a_clip @ x_axis))
        bb = math.atan2(float(b_clip @ y_axis), float(b_clip @ x_axis))
        lo, hi = min(aa, bb), max(aa, bb)
        assert lo >= -err and hi <= ab_angle + err
        covered.append((lo, hi))
    # the union of face intervals must cover [0, angle(A,B)]
    covered.sort()
    reach = 0.0
    for lo, hi in covered:
        if lo <= reach + err:
            reach = max(reach, hi)
    assert reach >= ab_angle - err


def _angle(p, q) -> float:
    return math.atan2(float(np.linalg.norm(np.cross(p, q))),
                      float(p @ q))


NAMED = [
    ((1.0, -0.5, -0.5), (1.0, 0.5, 0.5)),   # single face
    ((1, 0, 0), (0, 1, 0)),                  # one cube edge
    ((0.75, 0.0, -1.0), (0.75, 0.0, 1.0)),   # two opposite edges
    ((1.0, 0.0, 0.75), (0.0, 1.0, 0.75)),    # two adjacent edges
    ((1.0, 0.9, 0.95), (-1.0, 0.95, 0.9)),   # four faces
]


@pytest.mark.parametrize("case", range(len(NAMED)))
def test_face_clipping_named(case):
    a, b = NAMED[case]
    check_face_clipping(a, b)
    check_face_clipping(b, a)
    check_face_clipping(tuple(-x for x in a), tuple(-x for x in b))


def perturbed_corner_or_midpoint(rng, p, q):
    """:154-174: points near cube corners / edge midpoints, sometimes
    perturbed by tiny amounts along coordinate axes."""
    a = (rng.randrange(3) - 1) * p + (rng.randrange(3) - 1) * q
    if rng.random() < 0.5:
        axis = rng.randrange(3)
        a = a.copy()
        a[axis] += (1 if rng.random() < 0.5 else -1) * \
            1e-6 * (1e-10 ** rng.random())
    return a


@pytest.mark.parametrize("seed", [81, 82])
def test_face_clipping_random_near_cube_edges(seed):
    rng = random.Random(seed)
    biunit = [(-1, -1), (1, -1), (1, 1), (-1, 1)]
    done = 0
    for _ in range(200):
        face = rng.randrange(6)
        i = rng.randrange(4)
        j = (i + 1) & 3
        p = face_uv_to_xyz(face, *biunit[i])
        q = face_uv_to_xyz(face, *biunit[j])
        a = perturbed_corner_or_midpoint(rng, p, q)
        b = perturbed_corner_or_midpoint(rng, p, q)
        if float(a @ a) == 0.0 or float(b @ b) == 0.0:
            continue
        check_face_clipping(a, b)
        done += 1
    assert done >= 150
