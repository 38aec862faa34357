"""S2WedgeRelationsUnitTest port (S2WedgeRelationsUnitTest.kt:25-181):
every named wedge case checked against wedge_contains,
wedge_intersects and get_wedge_relation simultaneously."""

from __future__ import annotations

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel.loop_relations import (
    wedge_contains, wedge_intersects)
from s2_geometry_kotlin_spark.kernel.validation import (
    WEDGE_EQUALS, WEDGE_IS_DISJOINT, WEDGE_IS_PROPERLY_CONTAINED,
    WEDGE_PROPERLY_CONTAINS, WEDGE_PROPERLY_OVERLAPS,
    get_wedge_relation)


def n(*xyz):
    v = np.asarray(xyz, dtype=np.float64)
    return v / np.linalg.norm(v)


CASES = [
    # (a0, ab1, a2, b0, b2, contains, intersects, relation)
    ((-1, 0, 10), (0, 0, 1), (1, 2, 10), (0, 1, 10), (1, -2, 10),
     False, True, WEDGE_PROPERLY_OVERLAPS),
    ((-1, -1, 10), (0, 0, 1), (1, -1, 10), (1, 0, 10), (-1, 1, 10),
     False, True, WEDGE_PROPERLY_OVERLAPS),
    ((-1, -1, 10), (0, 0, 1), (1, -1, 10), (-1, 0, 10), (1, 0, 10),
     True, True, WEDGE_PROPERLY_CONTAINS),
    ((2, 1, 10), (0, 0, 1), (-1, -1, 10), (2, 1, 10), (1, -5, 10),
     True, True, WEDGE_PROPERLY_CONTAINS),
    ((2, 1, 10), (0, 0, 1), (-1, -1, 10), (1, -2, 10), (-1, -1, 10),
     True, True, WEDGE_PROPERLY_CONTAINS),
    ((-2, 3, 10), (0, 0, 1), (4, -5, 10), (-2, 3, 10), (4, -5, 10),
     True, True, WEDGE_EQUALS),
    ((-2, 3, 10), (0, 0, 1), (4, -5, 10), (4, -5, 10), (-2, -3, 10),
     False, False, WEDGE_IS_DISJOINT),
    ((-2, 3, 10), (0, 0, 1), (0, 5, 10), (4, -5, 10), (-2, 3, 10),
     False, False, WEDGE_IS_DISJOINT),
    ((-2, 3, 10), (0, 0, 1), (4, -5, 10), (4, -5, 10), (-2, 3, 10),
     False, False, WEDGE_IS_DISJOINT),
    ((2, 1, 10), (0, 0, 1), (1, -5, 10), (2, 1, 10), (-1, -1, 10),
     False, True, WEDGE_IS_PROPERLY_CONTAINED),
    ((2, 1, 10), (0, 0, 1), (1, -5, 10), (-2, 1, 10), (1, -5, 10),
     False, True, WEDGE_IS_PROPERLY_CONTAINED),
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_wedge(case):
    a0, ab1, a2, b0, b2, contains, intersects, relation = CASES[case]
    a0, ab1, a2 = n(*a0), n(*ab1), n(*a2)
    b0, b2 = n(*b0), n(*b2)
    assert wedge_contains(a0, ab1, a2, b0, b2) == contains
    assert wedge_intersects(a0, ab1, a2, b0, b2) == intersects
    assert get_wedge_relation(a0, ab1, a2, b0, b2) == relation
