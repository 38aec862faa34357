"""S2CellUnionUnitTest.normalize port (region/S2CellUnionUnitTest.kt:
113-313): randomized cell hierarchies where the normalized output is
KNOWN BY CONSTRUCTION, plus the full contains/intersects and
union/intersection/difference identity block."""

from __future__ import annotations

import bisect
import random

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel.coverer import (
    difference, intersect_with_cell, normalize)

MAX_LEVEL = ck.MAX_LEVEL


def _arr(x):
    return np.array([x], dtype=np.uint64)


def child_begin(cid: int) -> int:
    return int(ck.child_begin(_arr(cid))[0])


def next_id(cid: int) -> int:
    return int(ck.next_id(_arr(cid))[0])


def is_leaf(cid: int) -> bool:
    return bool(cid & 1)


def cell_contains(a: int, b: int) -> bool:
    return ck.sc_range_min(a) <= b <= ck.sc_range_max(a)


def cell_intersects(a: int, b: int) -> bool:
    return (ck.sc_range_min(a) <= ck.sc_range_max(b) and
            ck.sc_range_max(a) >= ck.sc_range_min(b))


def union_contains(cells: list, cid: int) -> bool:
    """S2CellUnion.contains(S2CellId): binary search on the normalized
    sorted list."""
    i = bisect.bisect_right(cells, cid)
    if i < len(cells) and ck.sc_range_min(cells[i]) <= cid:
        return True
    return i > 0 and ck.sc_range_max(cells[i - 1]) >= cid


def union_intersects(cells: list, cid: int) -> bool:
    i = bisect.bisect_right(cells, cid)
    if i < len(cells) and ck.sc_range_min(cells[i]) <= \
            ck.sc_range_max(cid):
        return True
    return i > 0 and ck.sc_range_max(cells[i - 1]) >= \
        ck.sc_range_min(cid)


def add_cells(rng: random.Random, cid: int | None, selected: bool,
              inp: list, expected: list, depth_budget: int = 64):
    """addCells (:113-182): randomly select cells so that the
    normalized result of `inp` is exactly `expected`."""
    if cid is None:
        for face in range(6):
            add_cells(rng, (face << 61) | (1 << 60), False, inp,
                      expected)
        return
    if is_leaf(cid):
        assert selected
        inp.append(cid)
        return
    level = ck.sc_level(cid)
    if not selected and rng.randrange(MAX_LEVEL - level) == 0:
        expected.append(cid)
        selected = True
    added = False
    if selected and rng.randrange(6) != 0:
        inp.append(cid)
        added = True
    num_children = 0
    child = child_begin(cid)
    for _pos in range(4):
        p = 12 if selected else 4
        if rng.randrange(p) == 0 and num_children < 3:
            add_cells(rng, child, selected, inp, expected)
            num_children += 1
        if selected and not added:
            add_cells(rng, child, selected, inp, expected)
        child = next_id(child)


@pytest.mark.parametrize("seed", range(40, 56))
def test_normalize_randomized(seed):
    rng = random.Random(seed)
    inp: list = []
    expected: list = []
    add_cells(rng, None, False, inp, expected)
    got = normalize(inp)
    assert got == sorted(expected)

    # contains/intersects of every input cell and its relatives
    for cid in inp:
        assert union_contains(got, cid)
        assert union_intersects(got, cid)
        lvl = ck.sc_level(cid)
        if lvl > 0:
            assert union_intersects(got, ck.sc_parent(cid, lvl - 1))
            if lvl > 1:
                assert union_intersects(got, ck.sc_parent(cid, lvl - 2))
                assert union_intersects(got, ck.sc_parent(cid, 0))
        if not is_leaf(cid):
            cb = child_begin(cid)
            assert union_contains(got, cb)
            assert union_intersects(got, cb)
    for cid in expected:
        if ck.sc_level(cid) > 0:
            assert not union_contains(
                got, ck.sc_parent(cid, ck.sc_level(cid) - 1))
            assert not union_contains(got, ck.sc_parent(cid, 0))

    # union / intersection / difference identities over random splits
    x, y, x_or_y = [], [], []
    for cid in inp:
        in_x = rng.randrange(2) == 0
        in_y = rng.randrange(2) == 0
        if in_x:
            x.append(cid)
        if in_y:
            y.append(cid)
        if in_x or in_y:
            x_or_y.append(cid)
    xc, yc = normalize(x), normalize(y)
    assert normalize(x + y) == normalize(x_or_y)
    x_and_y: list = []
    for yid in yc:
        u = intersect_with_cell(xc, yid)
        for xid in xc:
            if cell_contains(xid, yid):
                assert u == [yid]
            elif cell_contains(yid, xid):
                assert union_contains(normalize(u), xid)
        for uid in u:
            assert union_contains(xc, uid)
            assert cell_contains(yid, uid)
        x_and_y.extend(u)
    x_and_y = normalize(x_and_y)
    x_minus_y = difference(xc, yc)
    y_minus_x = difference(yc, xc)
    assert all(union_contains(xc, c) for c in x_minus_y)
    assert not any(union_intersects(yc, c) for c in x_minus_y)
    assert all(union_contains(yc, c) for c in y_minus_x)
    assert not any(union_intersects(xc, c) for c in y_minus_x)
    assert not any(union_intersects(normalize(y_minus_x), c)
                   for c in x_minus_y)
    assert normalize(x_minus_y + y_minus_x + x_and_y) == \
        normalize(x_or_y)

    # a fresh random cell set must relate to the union exactly as the
    # per-cell containment arithmetic says
    test, dummy = [], []
    add_cells(rng, None, False, test, dummy)
    for tid in test:
        c = any(cell_contains(e, tid) for e in expected)
        i = any(cell_intersects(e, tid) for e in expected)
        assert union_contains(got, tid) == c
        assert union_intersects(got, tid) == i
