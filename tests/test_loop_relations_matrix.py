"""P8 canonical fixture: the FULL loopRelations matrix of
S2LoopUnitTest (region/S2LoopUnitTest.kt:744-871) — every named-loop
relation row, with the reference's own four-way identity harness
(nested / disjoint / covering / overlapping pairs, each checked with
complements), the containsNested equivalence and the compareBoundary
verdict."""

from __future__ import annotations

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel.loop_relations import (
    loop_contains_loop, loop_intersects_loop)
from s2_geometry_kotlin_spark.kernel.polygon_relations import (
    compare_boundary, contains_nested)
from s2_geometry_kotlin_spark.kernel.regions import Loop

CONTAINS, CONTAINED, DISJOINT, COVERS = 0x1, 0x2, 0x4, 0x8


def L(text: str) -> Loop:
    return Loop.from_latlng_text(text)


def sentinel(full: bool) -> Loop:
    lp = Loop.__new__(Loop)
    lp.vertices = np.array([[0.0, 0.0, -1.0 if full else 1.0]])
    lp.origin_inside = full
    lp._bound = None
    return lp


def invert(lp: Loop) -> Loop:
    """S2Loop.invert: the complementary region (reversed vertices; the
    sentinels swap)."""
    if lp.is_empty_or_full():
        return sentinel(not lp.is_full())
    return Loop(lp.vertices[::-1].copy())


def boundary_equals(a: Loop, b: Loop) -> bool:
    """S2Loop.boundaryEquals: identical cyclic vertex sequence, same
    orientation."""
    av, bv = a.vertices, b.vertices
    if len(av) != len(bv):
        return False
    if a.is_empty_or_full():
        return a.is_full() == b.is_full()
    n = len(av)
    for k in range(n):
        if all(np.array_equal(av[(k + i) % n], bv[i]) for i in range(n)):
            return True
    return False


# --- the reference's pair identities (S2LoopUnitTest.kt:230-305) -----------

def one_nested(a, b):
    assert loop_contains_loop(a, b)
    assert loop_contains_loop(b, a) == boundary_equals(a, b)
    assert loop_intersects_loop(a, b) == (not b.is_empty())
    assert loop_intersects_loop(b, a) == (not b.is_empty())


def one_disjoint(a, b):
    assert not loop_intersects_loop(a, b)
    assert not loop_intersects_loop(b, a)
    assert loop_contains_loop(a, b) == b.is_empty()
    assert loop_contains_loop(b, a) == a.is_empty()


def one_covering(a, b):
    assert loop_contains_loop(a, b) == a.is_full()
    assert loop_contains_loop(b, a) == b.is_full()
    complementary = boundary_equals(invert(a), b)
    assert loop_intersects_loop(a, b) == (not complementary)
    assert loop_intersects_loop(b, a) == (not complementary)


def one_overlapping(a, b):
    assert not loop_contains_loop(a, b)
    assert not loop_contains_loop(b, a)
    assert loop_intersects_loop(a, b)
    assert loop_intersects_loop(b, a)


def nested_pair(a, b):
    a1, b1 = invert(a), invert(b)
    one_nested(a, b)
    one_nested(b1, a1)
    one_disjoint(a1, b)
    one_covering(a, b1)


def disjoint_pair(a, b):
    nested_pair(invert(a), b)


def covering_pair(a, b):
    nested_pair(a, invert(b))


def overlapping_pair(a, b):
    a1, b1 = invert(a), invert(b)
    one_overlapping(a, b)
    one_overlapping(a1, b1)
    one_overlapping(a1, b)
    one_overlapping(a, b1)


def check_relation(a, b, flags, shared_edge):
    """testRelationWithDesc (S2LoopUnitTest.kt:317-354)."""
    if flags & CONTAINS:
        nested_pair(a, b)
    if flags & CONTAINED:
        nested_pair(b, a)
    if flags & COVERS:
        covering_pair(a, b)
    if flags & DISJOINT:
        disjoint_pair(a, b)
    elif not (flags & (CONTAINS | CONTAINED | COVERS)):
        overlapping_pair(a, b)
    if not shared_edge and (flags & (CONTAINS | CONTAINED | DISJOINT)):
        assert contains_nested(a, b) == loop_contains_loop(a, b)
    comparison = 0
    if (flags & CONTAINS) or ((flags & COVERS) and not shared_edge):
        comparison = 1
    if (flags & DISJOINT) or ((flags & CONTAINED) and not shared_edge):
        comparison = -1
    if not a.is_empty() and not b.is_empty():
        assert compare_boundary(a, b) == comparison


# --- named fixture loops (S2LoopUnitTest.kt:14-114) ------------------------

empty = sentinel(False)
full = sentinel(True)
north_hemi = L("0:-180, 0:-90, 0:0, 0:90")
north_hemi3 = L("0:-180, 0:-60, 0:60")
south_hemi = L("0:90, 0:0, 0:-90, 0:-180")
west_hemi = L("0:-180, -90:0, 0:0, 90:0")
east_hemi = L("90:0, 0:0, -90:0, 0:-180")
near_hemi = L("0:-90, -90:0, 0:90, 90:0")
far_hemi = L("90:0, 0:90, -90:0, 0:-90")
candy_cane = L("-20:150, -20:-70, 0:70, 10:-150, 10:70, -10:-70")
small_ne_cw = L("35:20, 45:20, 40:25")
arctic_80 = L("80:-150, 80:-30, 80:90")
antarctic_80 = L("-80:120, -80:0, -80:-120")
loop_a = L("0:178, -1:180, 0:-179, 1:-180")
loop_b = L("0:179, -1:180, 0:-178, 1:-180")
a_intersect_b = L("0:179, -1:180, 0:-179, 1:-180")
a_union_b = L("0:178, -1:180, 0:-178, 1:-180")
a_minus_b = L("0:178, -1:180, 0:179, 1:-180")
b_minus_a = L("0:-179, -1:180, 0:-178, 1:-180")
loop_c = L("0:178, 0:180, -1:180, 0:-179, 1:-179, 1:-180")
loop_d = L("0:178, -1:178, -1:180, 0:-179, 1:-179, 1:-180")
loop_e = L("0:30, 0:34, 0:36, 0:39, 0:41, 0:44, 30:44, 30:30")
loop_f = L("0:30, -30:30, -30:44, 0:44, 0:41, 0:39, 0:36, 0:34")
loop_g = L("0:30, 0:34, 10:34, 10:36, 0:36, 0:39, 10:39, 10:41, "
           "0:41, 0:44, 30:44, 30:30")
loop_h = L("0:30, 0:34, -10:34, -10:36, 0:36, 0:39, 10:39, 10:41, "
           "0:41, 0:44, 30:44, 30:30")
loop_i = L("10:34, 0:34, -10:34, -10:36, 0:36, 10:36")

MATRIX = [
    # (S2LoopUnitTest.kt:744-834)
    (full, full, CONTAINS | CONTAINED | COVERS, True),
    (full, north_hemi, CONTAINS | COVERS, False),
    (full, empty, CONTAINS | DISJOINT | COVERS, False),
    (north_hemi, full, CONTAINED | COVERS, False),
    (north_hemi, empty, CONTAINS | DISJOINT, False),
    (empty, full, CONTAINED | DISJOINT | COVERS, False),
    (empty, north_hemi, CONTAINED | DISJOINT, False),
    (empty, empty, CONTAINS | CONTAINED | DISJOINT, False),
    (north_hemi, north_hemi, CONTAINS | CONTAINED, True),
    (north_hemi, south_hemi, DISJOINT | COVERS, True),
    (north_hemi, east_hemi, 0, False),
    (north_hemi, arctic_80, CONTAINS, False),
    (north_hemi, antarctic_80, DISJOINT, False),
    (north_hemi, candy_cane, 0, False),
    (north_hemi3, north_hemi3, CONTAINS | CONTAINED, True),
    (north_hemi3, east_hemi, 0, False),
    (north_hemi3, arctic_80, CONTAINS, False),
    (north_hemi3, antarctic_80, DISJOINT, False),
    (north_hemi3, candy_cane, 0, False),
    (south_hemi, north_hemi, DISJOINT | COVERS, True),
    (south_hemi, south_hemi, CONTAINS | CONTAINED, True),
    (south_hemi, far_hemi, 0, False),
    (south_hemi, arctic_80, DISJOINT, False),
    (south_hemi, antarctic_80, CONTAINS, False),
    (south_hemi, candy_cane, 0, False),
    (candy_cane, north_hemi, 0, False),
    (candy_cane, south_hemi, 0, False),
    (candy_cane, arctic_80, DISJOINT, False),
    (candy_cane, antarctic_80, DISJOINT, False),
    (candy_cane, candy_cane, CONTAINS | CONTAINED, True),
    (near_hemi, west_hemi, 0, False),
    (small_ne_cw, south_hemi, CONTAINS, False),
    (small_ne_cw, west_hemi, CONTAINS, False),
    (small_ne_cw, north_hemi, COVERS, False),
    (small_ne_cw, east_hemi, COVERS, False),
    (loop_a, loop_a, CONTAINS | CONTAINED, True),
    (loop_a, loop_b, 0, False),
    (loop_a, a_intersect_b, CONTAINS, True),
    (loop_a, a_union_b, CONTAINED, True),
    (loop_a, a_minus_b, CONTAINS, True),
    (loop_a, b_minus_a, DISJOINT, True),
    (loop_b, loop_a, 0, False),
    (loop_b, loop_b, CONTAINS | CONTAINED, True),
    (loop_b, a_intersect_b, CONTAINS, True),
    (loop_b, a_union_b, CONTAINED, True),
    (loop_b, a_minus_b, DISJOINT, True),
    (loop_b, b_minus_a, CONTAINS, True),
    (a_intersect_b, loop_a, CONTAINED, True),
    (a_intersect_b, loop_b, CONTAINED, True),
    (a_intersect_b, a_intersect_b, CONTAINS | CONTAINED, True),
    (a_intersect_b, a_union_b, CONTAINED, False),
    (a_intersect_b, a_minus_b, DISJOINT, True),
    (a_intersect_b, b_minus_a, DISJOINT, True),
    (a_union_b, loop_a, CONTAINS, True),
    (a_union_b, loop_b, CONTAINS, True),
    (a_union_b, a_intersect_b, CONTAINS, False),
    (a_union_b, a_union_b, CONTAINS | CONTAINED, True),
    (a_union_b, a_minus_b, CONTAINS, True),
    (a_union_b, b_minus_a, CONTAINS, True),
    (a_minus_b, loop_a, CONTAINED, True),
    (a_minus_b, loop_b, DISJOINT, True),
    (a_minus_b, a_intersect_b, DISJOINT, True),
    (a_minus_b, a_union_b, CONTAINED, True),
    (a_minus_b, a_minus_b, CONTAINS | CONTAINED, True),
    (a_minus_b, b_minus_a, DISJOINT, False),
    (b_minus_a, loop_a, DISJOINT, True),
    (b_minus_a, loop_b, CONTAINED, True),
    (b_minus_a, a_intersect_b, DISJOINT, True),
    (b_minus_a, a_union_b, CONTAINED, True),
    (b_minus_a, a_minus_b, DISJOINT, False),
    (b_minus_a, b_minus_a, CONTAINS | CONTAINED, True),
    # loopRelationsWhenSameExceptPiecesStickingOutAndIn (:837-853)
    (loop_a, loop_c, 0, True),
    (loop_c, loop_a, 0, True),
    (loop_a, loop_d, CONTAINED, True),
    (loop_d, loop_a, CONTAINS, True),
    (loop_e, loop_f, DISJOINT, True),
    (loop_e, loop_g, CONTAINS, True),
    (loop_e, loop_h, 0, True),
    (loop_e, loop_i, 0, False),
    (loop_f, loop_g, DISJOINT, True),
    (loop_f, loop_h, 0, True),
    (loop_f, loop_i, 0, False),
    (loop_g, loop_h, CONTAINED, True),
    (loop_h, loop_g, CONTAINS, True),
    (loop_g, loop_i, DISJOINT, True),
    (loop_h, loop_i, CONTAINS, True),
]


@pytest.mark.parametrize("idx", range(len(MATRIX)))
def test_loop_relation_row(idx):
    a, b, flags, shared_edge = MATRIX[idx]
    check_relation(a, b, flags, shared_edge)
