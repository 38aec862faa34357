"""S2CellIndex (dilivia/s2/index/cell/S2CellIndex.kt): a static index
of (cell_id, label) pairs supporting exact containment/intersection
queries over arbitrary overlapping cells.

Build is a sweep over "deltas" (range starts/ends of each cell) that
produces

- cell_tree: preorder (cell_id, label, parent) nodes where ancestors
  precede descendants, and
- range_nodes: a sorted partition of the FULL leaf-cell range, each
  range pointing at the deepest cell_tree node whose cell contains it
  (-1 for empty ranges), closed by a sentinel.

This is the driver-side twin of the distributed cell-keyed DataFrame
joins (operators/spatial_join, operators/cell_knn): the same
(range_min, range_max) containment algebra, materialized as a sweep
instead of an equi-join.  Cell ids are unsigned 64-bit ints."""

from __future__ import annotations

import bisect
from dataclasses import dataclass

from . import cellid as ck

DONE = -1
NONE_ID = 0
SENTINEL_ID = (1 << 64) - 1
LEAF_BEGIN = int(ck.begin(30))
LEAF_END = int(ck.end(30))


@dataclass
class CellNode:
    cell_id: int
    label: int
    parent: int


class CellIndex:
    def __init__(self):
        self._pending: list[tuple[int, int]] = []
        self.cell_tree: list[CellNode] = []
        self.range_starts: list[int] = []
        self.range_contents: list[int] = []
        self._built = False

    def add(self, cell_id: int, label: int) -> None:
        assert not self._built
        self._pending.append((int(cell_id), int(label)))

    def add_union(self, cell_ids, label: int) -> None:
        for cid in cell_ids:
            self.add(cid, label)

    def build(self) -> None:
        # deltas sorted by (start, cell_id DESC, label): larger cells
        # push first; removals (sentinel cell) pop before new pushes
        deltas: list[tuple[int, int, int]] = []
        for cid, label in self._pending:
            deltas.append((ck.sc_range_min(cid), SENTINEL_ID - cid, label))
            # removal: cell_id = sentinel -> inverted key 0 -> pops sort
            # before pushes at the same start.  rangeMax().next() is +2:
            # leaf ids are odd, spaced by 2
            deltas.append((ck.sc_range_max(cid) + 2, 0, -1))
        deltas.append((LEAF_BEGIN, SENTINEL_ID - NONE_ID, -1))
        deltas.append((LEAF_END, SENTINEL_ID - NONE_ID, -1))
        deltas.sort()
        self.cell_tree = []
        self.range_starts = []
        self.range_contents = []
        contents = DONE
        i = 0
        n = len(deltas)
        while i < n:
            start = deltas[i][0]
            while i < n and deltas[i][0] == start:
                _s, inv_cell, label = deltas[i]
                cell_id = SENTINEL_ID - inv_cell
                if label >= 0:
                    self.cell_tree.append(
                        CellNode(cell_id, label, contents))
                    contents = len(self.cell_tree) - 1
                elif cell_id == SENTINEL_ID:
                    contents = self.cell_tree[contents].parent
                i += 1
            self.range_starts.append(start)
            self.range_contents.append(contents)
        self._built = True

    # -- iteration -----------------------------------------------------

    def cells(self) -> list[tuple[int, int]]:
        """All (cell_id, label) pairs (CellIterator)."""
        assert self._built
        return [(n.cell_id, n.label) for n in self.cell_tree]

    def num_ranges(self) -> int:
        return len(self.range_starts) - 1  # last entry is the sentinel

    def seek_range(self, target_leaf: int) -> int:
        """Index of the first range with start_id >= ... i.e. the range
        CONTAINING target (RangeIterator.seek): upperBound - 1."""
        return bisect.bisect_right(self.range_starts, target_leaf) - 1

    def visit_intersecting_cells(self, target: list[int], visitor) -> bool:
        """visitIntersectingCells (S2CellIndex.kt:234-289): target is a
        normalized cell union (sorted, non-overlapping); each
        intersecting (cell_id, label) pair is visited at most once."""
        if not target:
            return True
        pos = 0
        contents = ContentsIterator(self)
        r = 0  # range index (begin)
        while True:
            cell = target[pos]
            lo, hi = ck.sc_range_min(cell), ck.sc_range_max(cell)
            if self._limit(r) <= lo:
                r = self.seek_range(lo)
            while self.range_starts[r] <= hi:
                contents.start_union(self, r)
                while not contents.done():
                    if not visitor(contents.cell_id(), contents.label()):
                        return False
                    contents.next()
                r += 1
            if r >= self.num_ranges() or pos + 1 >= len(target):
                break
            pos += 1
            if ck.sc_range_max(target[pos]) < self.range_starts[r]:
                # binary-search skip over target cells entirely inside
                # the leaf range just processed
                nxt = bisect.bisect_left(target, self.range_starts[r],
                                         pos + 1)
                if ck.sc_range_max(target[nxt - 1]) >= \
                        self.range_starts[r]:
                    nxt -= 1
                pos = nxt
                if pos >= len(target):
                    break
        return True

    def get_intersecting_labels(self, target: list[int]) -> list[int]:
        out: list[int] = []
        self.visit_intersecting_cells(
            target, lambda _c, lab: (out.append(lab), True)[1])
        return sorted(set(out))

    def _limit(self, r: int) -> int:
        return self.range_starts[r + 1] if r + 1 < len(self.range_starts) \
            else LEAF_END


class ContentsIterator:
    """Visits the (cell_id, label) pairs containing a leaf range, with
    duplicate suppression across monotonically increasing start_union
    calls (node_cutoff: preorder node indexes <= the cutoff were
    already reported)."""

    def __init__(self, index: CellIndex):
        self.index = index
        self.clear()

    def clear(self):
        self.prev_start_id = NONE_ID
        self.node_cutoff = -1
        self.next_node_cutoff = -1
        self._node: CellNode | None = None

    def start_union(self, index: CellIndex, range_idx: int):
        start = index.range_starts[range_idx]
        if start < self.prev_start_id:
            self.node_cutoff = -1  # can't eliminate duplicates
        self.prev_start_id = start
        contents = index.range_contents[range_idx]
        if contents <= self.node_cutoff:
            self._node = None
        else:
            self._node = index.cell_tree[contents]
        self.next_node_cutoff = contents

    def done(self) -> bool:
        return self._node is None

    def cell_id(self) -> int:
        return self._node.cell_id

    def label(self) -> int:
        return self._node.label

    def next(self):
        assert self._node is not None
        if self._node.parent <= self.node_cutoff:
            # already processed this node's ancestors
            self.node_cutoff = self.next_node_cutoff
            self._node = None
        else:
            self._node = self.index.cell_tree[self._node.parent]
