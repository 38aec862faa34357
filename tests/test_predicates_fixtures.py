"""S2PredicatesUnitTest ports (S2PredicatesUnitTest.kt): the exactly
collinear sign cases (:55-102) and the full symbolic-perturbation
branch-coverage matrix (:423-476) — one fixture per submatrix branch of
the SoS ladder, with cyclic/antisymmetric consistency."""

from __future__ import annotations

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel.predicates import (
    expensive_sign, sign)


def n(*xyz):
    v = np.asarray(xyz, dtype=np.float64)
    return v / np.linalg.norm(v)


def test_sign_collinear_points():
    """:55-102: exactly collinear near-tangent points, exactly
    proportional normalized points, and the non-idempotent normalize
    pair — sign must be nonzero and cyclically/antisymmetrically
    consistent on all of them."""
    a = np.array([0.72571927877036835, 0.46058825605889098,
                  0.51106749730504852])
    b = np.array([0.7257192746638208, 0.46058826573818168,
                  0.51106749441312738])
    c = np.array([0.72571927671709457, 0.46058826089853633,
                  0.51106749585908795])
    assert np.array_equal(c - a, b - c)
    assert sign(a, b, c) != 0
    assert sign(a, b, c) == sign(b, c, a)
    assert sign(a, b, c) == -sign(c, b, a)

    x1 = np.array([0.99999999999999989, 1.4901161193847655e-08, 0.0])
    x2 = np.array([1.0, 1.4901161193847656e-08, 0.0])
    assert sign(x1, x2, -x1) != 0
    assert sign(x1, x2, -x1) == sign(x2, -x1, x1)
    assert sign(x1, x2, -x1) == -sign(-x1, x2, x1)

    x3 = n(1, 1, 1)
    x4 = 0.99999999999999989 * x3
    assert not np.array_equal(x3, x4)
    assert sign(x3, x4, -x3) != 0

    y0 = np.array([1.0, 1.0, 0.0])
    y1 = y0 / np.linalg.norm(y0)
    y2 = y1 / np.linalg.norm(y1)
    assert not np.array_equal(y1, y2)
    assert sign(y1, y2, -y1) != 0
    assert sign(y1, y2, -y1) == sign(y2, -y1, y1)
    assert sign(y1, y2, -y1) == -sign(-y1, y2, y1)


SYMBOLIC_CASES = [
    # (expected, a, b, c) — the i-th case zeroes every submatrix
    # determinant before the i-th (S2PredicatesUnitTest.kt:423-476)
    (1, (-3, -1, 0), (-2, 1, 0), (1, -2, 0)),     # det(M_1)
    (1, (-6, 3, 3), (-4, 2, -1), (-2, 1, 4)),     # det(M_2)
    (1, (0, -1, -1), (0, 1, -2), (0, 2, 1)),      # det(M_3)
    (1, (-1, 2, 7), (2, 1, -4), (4, 2, -8)),      # det(M_4)
    (1, (-4, -2, 7), (2, 1, -4), (4, 2, -8)),     # det(M_5) = c0
    (1, (0, -5, 7), (0, -4, 8), (0, -2, 4)),      # det(M_6) = -c1
    (1, (-5, -2, 7), (0, 0, -2), (0, 0, -1)),     # det(M_7)
    (1, (0, -2, 7), (0, 0, 1), (0, 0, 2)),        # det(M_8) = c2
    (1, (-3, 1, 7), (-1, -4, 1), (0, 0, 0)),      # det(M_9)
    (1, (-6, -4, 7), (-3, -2, 1), (0, 0, 0)),     # det(M_10) = -b0
    (-1, (0, -4, 7), (0, -2, 1), (0, 0, 0)),      # det(M_11) = b1
    (-1, (-1, -4, 5), (0, 0, -3), (0, 0, 0)),     # det(M_12) = a0
    (1, (0, -4, 5), (0, 0, -5), (0, 0, 0)),       # det(M_13) = 1
]


@pytest.mark.parametrize("case", range(len(SYMBOLIC_CASES)))
def test_symbolic_perturbation_branch(case):
    expected, a, b, c = SYMBOLIC_CASES[case]
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    c = np.asarray(c, dtype=np.float64)
    # preconditions of the fixture: lexicographic order and exact
    # collinearity through the origin
    assert tuple(a) < tuple(b) < tuple(c)
    assert float(a @ np.cross(b, c)) == 0.0
    assert expensive_sign(a, b, c) == expected
    assert expensive_sign(b, c, a) == expected
    assert expensive_sign(c, a, b) == expected
    assert expensive_sign(c, b, a) == -expected
    assert expensive_sign(b, a, c) == -expected
    assert expensive_sign(a, c, b) == -expected
