"""Port of the reference padded-cell suite
(dilivia/s2/S2PaddedCellUnitTest.kt) against
s2_geometry_kotlin_spark/kernel/padded_cell.py: agreement with plain
cell bounds/centers through incremental child construction, space-
filling-curve entry/exit vertex identities (padding-independent,
continuous across nextWrap, inherited by first/last children), and the
shrink-to-fit recursion shortcut."""

import math

import numpy as np

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel.padded_cell import PaddedCell

MAX_LEVEL = 30


def random_cell_id(rng, level=None) -> int:
    p = rng.normal(size=3)
    p /= np.linalg.norm(p)
    leaf = int(ck.from_xyz(*[np.array([c]) for c in p])[0])
    if level is None:
        level = int(rng.integers(0, MAX_LEVEL + 1))
    return ck.sc_parent(leaf, level)


def compare_cell_to_padded(cid: int, pcell: PaddedCell, padding: float):
    assert pcell.id == cid
    assert pcell.level == ck.sc_level(cid)
    assert pcell.padding == padding
    u_lo, u_hi, v_lo, v_hi = ck.sc_bound_uv(cid)
    assert pcell.bound == ((u_lo - padding, u_hi + padding),
                           (v_lo - padding, v_hi + padding))
    center = np.array(ck.sc_center_xyz(cid))
    assert np.array_equal(pcell.get_center(), center)


def test_s2_cell_methods():
    rng = np.random.default_rng(20260817)
    for _ in range(200):
        cid = random_cell_id(rng)
        padding = 1e-15 ** rng.random()
        pcell = PaddedCell(cid, padding)
        compare_cell_to_padded(cid, pcell, padding)
        if ck.sc_level(cid) < MAX_LEVEL:
            for pos in range(4):
                i, j = pcell.get_child_ij(pos)
                child = pcell.child(i, j)
                compare_cell_to_padded(ck.sc_child(cid, pos), child,
                                       padding)


def _next_wrap(cid: int) -> int:
    u = np.array([cid], dtype=np.uint64)
    return int(ck.advance_wrap(u, 1)[0])


def test_entry_exit_vertices():
    rng = np.random.default_rng(7)
    for _ in range(300):
        cid = random_cell_id(rng)
        # entry/exit do not depend on padding
        assert np.array_equal(PaddedCell(cid, 0.0).get_entry_vertex(),
                              PaddedCell(cid, 0.5).get_entry_vertex())
        assert np.array_equal(PaddedCell(cid, 0.0).get_exit_vertex(),
                              PaddedCell(cid, 0.5).get_exit_vertex())
        # the curve is continuous: exit(cid) == entry(nextWrap(cid))
        assert np.array_equal(
            PaddedCell(cid, 0.0).get_exit_vertex(),
            PaddedCell(_next_wrap(cid), 0.0).get_entry_vertex())
        # entry(cell) == entry(first child); exit(cell) == exit(last)
        if ck.sc_level(cid) < MAX_LEVEL:
            assert np.array_equal(
                PaddedCell(cid, 0.0).get_entry_vertex(),
                PaddedCell(ck.sc_child(cid, 0), 0.0).get_entry_vertex())
            assert np.array_equal(
                PaddedCell(cid, 0.0).get_exit_vertex(),
                PaddedCell(ck.sc_child(cid, 3), 0.0).get_exit_vertex())


def test_shrink_to_fit():
    rng = np.random.default_rng(12345)
    for _ in range(300):
        # start with the desired result and work backwards
        result = random_cell_id(rng)
        u_lo, u_hi, v_lo, v_hi = ck.sc_bound_uv(result)
        size_u, size_v = u_hi - u_lo, v_hi - v_lo
        max_padding = 0.5 * min(size_u, size_v)
        padding = max_padding * rng.random()
        max_rect = ((u_lo + padding, u_hi - padding),
                    (v_lo + padding, v_hi - padding))

        def sample(iv):
            return iv[0] + (iv[1] - iv[0]) * rng.random()

        a = [sample(max_rect[0]), sample(max_rect[1])]
        b = [sample(max_rect[0]), sample(max_rect[1])]
        if ck.sc_level(result) < MAX_LEVEL:
            # ensure the rect intersects at least two children of
            # "result" along one axis
            axis = int(rng.integers(2))
            ij_size = int(ck.get_size_ij(ck.sc_level(result)))
            face, i0, j0 = ck.sc_to_face_ij(result)
            lo = (i0 & -ij_size, j0 & -ij_size)[axis]
            center = ck.sc_st_to_uv(
                (1.0 / float(ck.MAX_SI_TI)) * (2 * lo + ij_size))
            shared = (max(center - padding, max_rect[axis][0]),
                      min(center + padding, max_rect[axis][1]))
            mid = sample(shared)
            a[axis] = sample((max_rect[axis][0], mid))
            b[axis] = sample((mid, max_rect[axis][1]))
        rect = ((min(a[0], b[0]), max(a[0], b[0])),
                (min(a[1], b[1]), max(a[1], b[1])))
        # choose an arbitrary ancestor as the padded cell
        initial_level = int(rng.integers(0, ck.sc_level(result) + 1))
        initial = ck.sc_parent(result, initial_level)
        got = PaddedCell(initial, padding).shrink_to_fit(rect)
        assert got == result, (hex(initial), hex(got), hex(result))
