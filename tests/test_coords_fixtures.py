"""Port of the reference coordinate-transform suite
(dilivia/s2/coords/S2CoordsUnitTest.kt) against the cellid kernel:
Hilbert traversal-table identities, st<->uv boundary/inverse behavior,
cube-face frame properties (each face once, right-handed frames,
cross-face Hilbert continuity), face projections, u/v edge normals,
and xyzToFaceSiTi cell-center detection at every level."""

import math

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel.regions import _UNORM, _VNORM
from s2_geometry_kotlin_spark.kernel.tables import (
    IJ_TO_POS, INVERT_MASK, POS_TO_IJ, SWAP_MASK)


def swap_axes(ij: int) -> int:
    return ((ij >> 1) & 1) + ((ij & 1) << 1)


def invert_bits(ij: int) -> int:
    return ij ^ 3


def test_traversal_order():
    for r in range(4):
        for i in range(4):
            # consistency under axis swap
            assert IJ_TO_POS[r ^ SWAP_MASK][swap_axes(i)] == \
                IJ_TO_POS[r][i]
            assert swap_axes(POS_TO_IJ[r ^ SWAP_MASK][i]) == \
                POS_TO_IJ[r][i]
            # consistency under axis-direction reversal
            assert IJ_TO_POS[r ^ INVERT_MASK][invert_bits(i)] == \
                IJ_TO_POS[r][i]
            assert invert_bits(POS_TO_IJ[r ^ INVERT_MASK][i]) == \
                POS_TO_IJ[r][i]
            # the two tables are inverses
            assert IJ_TO_POS[r][POS_TO_IJ[r][i]] == i
            assert POS_TO_IJ[r][IJ_TO_POS[r][i]] == i


def test_st_uv_conversions():
    for s in (0.0, 0.5, 1.0):
        assert ck.sc_st_to_uv(s) == 2 * s - 1
    for u in (-1.0, 0.0, 1.0):
        assert ck.sc_uv_to_st(u) == 0.5 * (u + 1)
    x = 0.0
    while x <= 1.0:
        assert abs(ck.sc_uv_to_st(ck.sc_st_to_uv(x)) - x) <= 1e-15
        assert abs(ck.sc_st_to_uv(ck.sc_uv_to_st(2 * x - 1))
                   - (2 * x - 1)) <= 1e-15
        x += 0.0001


def _face_uv(face, u, v):
    return np.array(ck.sc_face_uv_to_xyz(face, u, v))


def test_face_uv_to_xyz():
    # each face center is a unit axis and each appears exactly once
    total = np.zeros(3)
    for face in range(6):
        center = _face_uv(face, 0.0, 0.0)
        assert abs(center[np.argmax(np.abs(center))]) == 1.0
        total += np.abs(center)
    assert np.array_equal(total, np.array([2.0, 2.0, 2.0]))

    # right-handed frames: (uAxis x vAxis) . norm == 1
    for face in range(6):
        u_axis = _face_uv(face, 1, 0) - _face_uv(face, 0, 0)
        v_axis = _face_uv(face, 0, 1) - _face_uv(face, 0, 0)
        assert float(np.cross(u_axis, v_axis) @ _face_uv(face, 0, 0)) \
            == 1.0

    # cross-face Hilbert continuity: the curve on each face ends where
    # the next face's curve begins
    for face in range(6):
        sign = -1.0 if face & SWAP_MASK else 1.0
        assert np.array_equal(_face_uv(face, sign, -sign),
                              _face_uv((face + 1) % 6, -1.0, -1.0))


def test_face_xyz_to_uvw_projection():
    # sc_xyz_to_face_uv projects the face center to (0,0) on its own
    # face, and the u/v axes to (+-1, 0) / (0, +-1)
    for face in range(6):
        u_axis = _face_uv(face, 1, 0) - _face_uv(face, 0, 0)
        v_axis = _face_uv(face, 0, 1) - _face_uv(face, 0, 0)
        n = _face_uv(face, 0, 0)
        f, u, v = ck.sc_xyz_to_face_uv(*n)
        assert (f, u, v) == (face, 0.0, 0.0)
        # points strictly inside the face project exactly (the +-1
        # corners lie on face boundaries where the face choice
        # tie-breaks, so probe at +-0.5)
        f, u, v = ck.sc_xyz_to_face_uv(*(n + 0.5 * u_axis))
        assert f == face and (u, v) == (0.5, 0.0)
        f, u, v = ck.sc_xyz_to_face_uv(*(n - 0.5 * u_axis))
        assert f == face and (u, v) == (-0.5, 0.0)
        f, u, v = ck.sc_xyz_to_face_uv(*(n + 0.5 * v_axis))
        assert f == face and (u, v) == (0.0, 0.5)
        f, u, v = ck.sc_xyz_to_face_uv(*(n - 0.5 * v_axis))
        assert f == face and (u, v) == (0.0, -0.5)


def test_uv_norms():
    # GetUNorm / GetVNorm are right-handed normals of the fixed-u /
    # fixed-v edges
    for face in range(6):
        x = -1.0
        while x <= 1.0:
            un = np.cross(_face_uv(face, x, -1), _face_uv(face, x, 1))
            got = _UNORM[face](x)
            ang = math.atan2(np.linalg.norm(np.cross(un, got)),
                             float(un @ got))
            assert ang == 0.0
            vn = np.cross(_face_uv(face, -1, x), _face_uv(face, 1, x))
            gotv = _VNORM[face](x)
            angv = math.atan2(np.linalg.norm(np.cross(vn, gotv)),
                              float(vn @ gotv))
            assert angv == 0.0
            x += 1.0 / 64.0


def test_xyz_to_face_si_ti():
    rng = np.random.default_rng(20260817)
    for level in range(0, 31, 3):
        for _ in range(40):
            p = rng.normal(size=3)
            p /= np.linalg.norm(p)
            leaf = int(ck.from_xyz(*[np.array([c]) for c in p])[0])
            cid = ck.sc_parent(leaf, level)
            center = np.array(ck.sc_center_xyz(cid))
            actual_level, face, si, ti = ck.sc_xyz_to_face_si_ti(center)
            assert actual_level == level, (level, actual_level)
            got = ck.sc_from_face_ij(face, si // 2, ti // 2)
            assert ck.sc_parent(got, level) == cid
            # a point near but not at the center detects level -1 with
            # the same (face, si, ti)
            moved = center + np.array([1e-13, 1e-13, 1e-13])
            lvl2, f2, s2, t2 = ck.sc_xyz_to_face_si_ti(moved)
            assert lvl2 == -1
            assert (f2, s2, t2) == (face, si, ti)
