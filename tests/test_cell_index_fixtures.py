"""Port of the reference cell-index suite
(dilivia/s2/index/cell/S2CellIndexUnitTest.kt) against
s2_geometry_kotlin_spark/kernel/cell_index.py.

quadraticValidate mirrors the reference: for every leaf-cell range the
index produces, the exact set of (cell_id, label) pairs containing the
range must match a brute-force scan, ranges must partition the entire
leaf id space, and visitIntersectingCells must return exactly the
brute-force intersection set for random/adversarial cell unions.
The contents-iterator duplicate-suppression semantics (monotonic
start_union calls report each pair exactly once; backward seeks may
re-report) are pinned by the incremental fixture."""

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel.cell_index import (
    LEAF_BEGIN, LEAF_END, CellIndex, ContentsIterator)
from s2_geometry_kotlin_spark.kernel.coverer import normalize


def cid(debug: str) -> int:
    return int(ck.from_debug_string(np.array([debug]))[0])


class Harness:
    def __init__(self):
        self.index = CellIndex()
        self.contents: list[tuple[int, int]] = []

    def add(self, cell, label: int):
        c = cid(cell) if isinstance(cell, str) else int(cell)
        self.index.add(c, label)
        self.contents.append((c, label))

    def add_union(self, cells: list[int], label: int):
        for c in cells:
            self.add(c, label)

    def quadratic_validate(self):
        self.index.build()
        # CellIterator visits each pair exactly once
        assert sorted(self.index.cells()) == sorted(self.contents)
        self.verify_index_contents()
        self.verify_range_iterators()

    def verify_index_contents(self):
        min_cell = LEAF_BEGIN
        n = self.index.num_ranges()
        for r in range(n):
            start = self.index.range_starts[r]
            limit = self.index.range_starts[r + 1]
            assert start == min_cell
            assert limit > min_cell
            assert limit & 1  # leaf ids are odd
            min_cell = limit
            expected = []
            for c, label in self.contents:
                if ck.sc_range_min(c) <= start and \
                        ck.sc_range_max(c) + 2 >= limit:
                    expected.append((c, label))
                else:
                    # the cell must not intersect the range at all
                    assert not (ck.sc_range_min(c) <= limit - 2
                                and ck.sc_range_max(c) >= start), hex(c)
            actual = []
            it = ContentsIterator(self.index)
            it.start_union(self.index, r)
            while not it.done():
                actual.append((it.cell_id(), it.label()))
                it.next()
            assert sorted(actual) == sorted(expected), r
        assert min_cell == LEAF_END

    def verify_range_iterators(self):
        # seeking anywhere inside a range lands on the range
        for r in range(self.index.num_ranges()):
            start = self.index.range_starts[r]
            limit = self.index.range_starts[r + 1]
            assert self.index.seek_range(start) == r
            assert self.index.seek_range(limit - 2) == r

    def test_intersection(self, target: list[int]):
        expected = []
        expected_labels = set()
        for c, label in self.index.cells():
            if any(ck.sc_range_min(t) <= ck.sc_range_max(c)
                   and ck.sc_range_max(t) >= ck.sc_range_min(c)
                   for t in target):
                expected.append((c, label))
                expected_labels.add(label)
        actual = []
        ok = self.index.visit_intersecting_cells(
            target, lambda c, lab: (actual.append((c, lab)), True)[1])
        assert ok
        assert sorted(actual) == sorted(expected)
        assert self.index.get_intersecting_labels(target) == \
            sorted(expected_labels)


def test_empty():
    Harness().quadratic_validate()


def test_one_face_cell():
    h = Harness()
    h.add("0/", 0)
    h.quadratic_validate()


def test_one_leaf_cell():
    h = Harness()
    h.add("1/012301230123012301230123012301", 12)
    h.quadratic_validate()


def test_duplicate_values():
    h = Harness()
    h.add("0/", 0)
    h.add("0/", 0)
    h.add("0/", 1)
    h.add("0/", 17)
    h.quadratic_validate()


def test_disjoint_cells():
    h = Harness()
    h.add("0/", 0)
    h.add("3/", 0)
    h.quadratic_validate()


def test_nested_cells():
    h = Harness()
    for cell, label in [("1/", 3), ("1/0", 15), ("1/000", 9),
                        ("1/00000", 11), ("1/012", 6), ("1/01212", 5),
                        ("1/312", 17), ("1/31200", 4), ("1/3120000", 10),
                        ("1/333", 20), ("1/333333", 18), ("5/", 3),
                        ("5/3", 31), ("5/3333", 27)]:
        h.add(cell, label)
    h.quadratic_validate()


def random_cell_union(rng) -> list[int]:
    ids = []
    for _ in range(10):
        p = rng.normal(size=3)
        p /= np.linalg.norm(p)
        leaf = int(ck.from_xyz(*[np.array([c]) for c in p])[0])
        ids.append(ck.sc_parent(leaf, int(rng.integers(0, 31))))
    return normalize(ids)


def test_random_cell_unions():
    rng = np.random.default_rng(20260817)
    h = Harness()
    for i in range(100):
        h.add_union(random_cell_union(rng), i)
    h.quadratic_validate()


def expect_contents(h: Harness, target: str, it: ContentsIterator,
                    expected: list[tuple[str, int]]):
    r = h.index.seek_range(ck.sc_range_min(cid(target)))
    it.start_union(h.index, r)
    actual = []
    while not it.done():
        actual.append((it.cell_id(), it.label()))
        it.next()
    assert sorted(actual) == sorted((cid(c), lab) for c, lab in expected)


def test_contents_iterator_suppresses_duplicates():
    h = Harness()
    for cell, label in [("2/1", 1), ("2/1", 2), ("2/10", 3),
                        ("2/100", 4), ("2/102", 5), ("2/1023", 6),
                        ("2/31", 7), ("2/313", 8), ("2/3132", 9),
                        ("3/1", 10), ("3/12", 11), ("3/13", 12)]:
        h.add(cell, label)
    h.quadratic_validate()
    it = ContentsIterator(h.index)
    expect_contents(h, "1/123", it, [])
    expect_contents(h, "2/100123", it,
                    [("2/1", 1), ("2/1", 2), ("2/10", 3), ("2/100", 4)])
    # a second call with the same key yields nothing more
    expect_contents(h, "2/100123", it, [])
    # a different branch yields only the new values
    expect_contents(h, "2/10232", it, [("2/102", 5), ("2/1023", 6)])
    expect_contents(h, "2/313", it, [("2/31", 7), ("2/313", 8)])
    expect_contents(h, "2/3132333", it, [("2/3132", 9)])
    expect_contents(h, "2/213", it, [])
    expect_contents(h, "3/1232", it, [("3/1", 10), ("3/12", 11)])
    expect_contents(h, "3/133210", it, [("3/13", 12)])
    expect_contents(h, "3/133210", it, [])
    expect_contents(h, "5/0", it, [])
    # moving backwards may re-report values
    expect_contents(h, "3/13221", it, [("3/1", 10), ("3/13", 12)])
    expect_contents(h, "2/31112", it, [("2/31", 7)])


def test_intersection_optimization():
    h = Harness()
    h.add("1/001", 1)
    h.add("1/333", 2)
    h.add("2/00", 3)
    h.add("2/0232", 4)
    h.index.build()
    h.test_intersection(normalize([cid("1/010"), cid("1/3")]))
    h.test_intersection(normalize([cid("2/010"), cid("2/011"),
                                   cid("2/02")]))


def test_intersection_random_unions():
    rng = np.random.default_rng(7)
    h = Harness()
    for i in range(100):
        h.add_union(random_cell_union(rng), i)
    h.index.build()
    for _ in range(200):
        h.test_intersection(random_cell_union(rng))


def test_intersection_semi_random_unions():
    rng = np.random.default_rng(99)
    for _ in range(100):
        h = Harness()
        cur = cid("1/0123012301230123")
        target = []
        for i in range(100):
            if rng.integers(10) == 0:
                h.add(cur, i)
            if rng.integers(4) == 0:
                target.append(cur)
            if rng.integers(2) == 0:
                u = np.array([cur], dtype=np.uint64)
                cur = int(ck.advance_wrap(u, 1)[0])
            if rng.integers(6) == 0 and ck.sc_level(cur) > 0:
                cur = ck.sc_parent(cur, ck.sc_level(cur) - 1)
            if rng.integers(6) == 0 and ck.sc_level(cur) < 30:
                cur = ck.sc_child(cur, 0)
        h.index.build()
        h.test_intersection(normalize(target))


def test_intersection_fixture():
    h = Harness()
    for cell, label in [("1/012301230123020021", 18),
                        ("1/012301230123020110", 40),
                        ("1/012301230123020112", 43),
                        ("1/01230123012302012", 56),
                        ("1/0123012301230211", 75),
                        ("1/0123012301230212", 76),
                        ("1/012301230123022", 85),
                        ("1/01230123012310", 93)]:
        h.add(cell, label)
    h.index.build()
    union = normalize([cid(s) for s in [
        "1/0123012301230123", "1/012301230123013",
        "1/0123012301230200", "1/012301230123020100",
        "1/012301230123020101", "1/012301230123020102",
        "1/01230123012302011", "1/01230123012302012",
        "1/0123012301230210", "1/0123012301230211",
        "1/01230123012310", "1/01230123012311"]])
    h.test_intersection(union)
