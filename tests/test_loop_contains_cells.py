"""Two more S2LoopUnitTest ports: the `contains` cell-vertex
exactly-one invariant (S2LoopUnitTest.kt:619-674) and the randomized
`loopRelations2` cell-range relation stress (:856-883)."""

from __future__ import annotations

import random

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel.loop_relations import (
    loop_contains_loop, loop_intersects_loop)
from s2_geometry_kotlin_spark.kernel.regions import Loop


def cell_loop_vertices(cid: int) -> np.ndarray:
    return ck.cell_vertices(np.array([cid], dtype=np.uint64))[0]


def test_each_cell_vertex_contained_by_exactly_one_cell():
    """S2LoopUnitTest.kt:648-673: for a full tiling at levels 0..2,
    every cell center AND cell vertex is contained by EXACTLY ONE of
    the cell loops (the semi-open containment invariant)."""
    for level in range(0, 3):
        loops = []
        points = []
        cid = int(ck.begin(level))
        end = int(ck.end(level))
        while cid != end:
            verts = cell_loop_vertices(cid)
            loops.append(Loop(verts))
            cx, cy, cz = ck.to_xyz(np.array([cid], dtype=np.uint64))
            points.append(np.array([cx[0], cy[0], cz[0]]))
            points.extend(verts)
            cid = int(ck.next_id(np.array([cid], dtype=np.uint64))[0])
        # dedup points exactly
        seen = {}
        for p in points:
            seen.setdefault(tuple(p), p)
        for p in seen.values():
            count = sum(1 for lp in loops if lp.contains_point(p))
            assert count == 1, (level, p)


def make_cell_loop(begin_id: int, end_id: int) -> Loop:
    """S2LoopUnitTest.makeCellLoop (:359-395): CCW loop bounding the
    union of the cell ids in [begin, end), built by sibling-edge
    cancellation then following the single remaining chain."""
    edges: dict[tuple, set] = {}
    keyed: dict[tuple, np.ndarray] = {}
    cid = begin_id
    while cid != end_id:
        verts = cell_loop_vertices(cid)
        for k in range(4):
            a = verts[k]
            b = verts[(k + 1) % 4]
            ka, kb = tuple(a), tuple(b)
            keyed[ka] = a
            keyed[kb] = b
            if kb in edges and ka in edges[kb]:
                edges[kb].remove(ka)
                if not edges[kb]:
                    del edges[kb]
            else:
                edges.setdefault(ka, set()).add(kb)
        cid = int(ck.next_id(np.array([cid], dtype=np.uint64))[0])
    out = []
    p = next(iter(sorted(edges)))
    while edges:
        targets = edges[p]
        assert len(targets) == 1
        nxt = next(iter(targets))
        out.append(keyed[p])
        del edges[p]
        p = nxt
    return Loop(np.asarray(out))


def skewed(rng: random.Random, max_log: int) -> int:
    base = rng.randrange(max_log + 1)
    return rng.getrandbits(31) & ((1 << base) - 1)


@pytest.mark.parametrize("seed", [11, 12])
def test_loop_relations2_randomized(seed):
    """:856-883: polygons made of adjacent same-level cell-id runs —
    contains/intersects must equal the cell-id range arithmetic."""
    rng = random.Random(seed)
    checked = 0
    for _ in range(300):
        raw = rng.getrandbits(64) | 1
        cid = raw & ((1 << 64) - 1)
        if not _valid(cid):
            continue
        lvl = rng.randrange(ck.sc_level(cid) + 1)
        cid = ck.sc_parent(cid, lvl)
        a_begin = _adv(cid, skewed(rng, 6))
        a_end = _adv(a_begin, skewed(rng, 6) + 1)
        b_begin = _adv(cid, skewed(rng, 6))
        b_end = _adv(b_begin, skewed(rng, 6) + 1)
        if not (_valid(a_end) and _valid(b_end)):
            continue
        # keep runs modest so the loop build stays fast
        if _dist(a_begin, a_end) > 40 or _dist(b_begin, b_end) > 40:
            continue
        a = make_cell_loop(a_begin, a_end)
        b = make_cell_loop(b_begin, b_end)
        contained = a_begin <= b_begin and b_end <= a_end
        intersects = a_begin < b_end and b_begin < a_end
        assert loop_contains_loop(a, b) == contained, \
            (seed, a_begin, a_end, b_begin, b_end)
        assert loop_intersects_loop(a, b) == intersects, \
            (seed, a_begin, a_end, b_begin, b_end)
        checked += 1
    assert checked >= 30


def _dist(a: int, b: int) -> int:
    lsb = a & (~a + 1)
    return (b - a) // (2 * lsb)


def _valid(cid: int) -> bool:
    if cid >> 61 > 5:
        return False
    # lowest set bit must be a valid level marker
    low = cid & (~cid + 1)
    return low != 0 and (low & 0x1555555555555555) != 0


def _adv(cid: int, n: int) -> int:
    return int(advance_scalar(cid, n))


def advance_scalar(cid: int, n: int) -> int:
    return int(ck.advance(np.array([cid], dtype=np.uint64), n)[0])
