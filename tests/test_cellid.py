"""Golden-fixture tests for the S2 cell-id kernel.

Fixture values are copied from the reference unit tests
(/root/reference/src/test/kotlin/dilivia/s2/S2CellIdUnitTest.kt) per
FIXTURES.md §3; the kernel itself is a from-scratch numpy implementation.
"""

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel import cellid as c

U = np.uint64


def test_face_assignment():
    # S2CellIdUnitTest.kt:53-60
    lats = np.array([0.0, 0, 90, 0, 0, -90])
    lons = np.array([0.0, 90, 0, 180, -90, 0])
    ids = c.from_latlng_deg(lats, lons)
    assert ((ids >> U(61)).astype(int) == np.arange(6)).all()
    assert (c.level(ids) == 30).all()
    assert c.is_leaf(ids).all()


def test_from_face_pos_level_golden():
    # S2CellIdUnitTest.kt:71-83
    cid = c.from_face_pos_level(3, U(0x12345678), 26)
    arr = np.array([cid], dtype=np.uint64)
    assert c.is_valid(arr).all()
    assert int(cid) >> 61 == 3
    assert int(cid) & ((1 << 61) - 1) == 0x12345700
    assert int(c.level(arr)[0]) == 26
    assert not c.is_leaf(arr)[0]
    assert int(c.child_begin(arr, 28)[0]) & ((1 << 61) - 1) == 0x12345610
    assert int(c.child_begin(arr)[0]) & ((1 << 61) - 1) == 0x12345640
    assert int(c.immediate_parent(arr)[0]) & ((1 << 61) - 1) == 0x12345400
    assert int(c.parent(arr, 24)[0]) & ((1 << 61) - 1) == 0x12345000


def test_range_identities():
    rng = np.random.default_rng(1)
    lat = rng.uniform(-89, 89, 5000)
    lon = rng.uniform(-180, 180, 5000)
    ids = c.parent(c.from_latlng_deg(lat, lon), 12)
    # S2CellIdUnitTest.kt:85-93
    assert (c.range_min(ids) + c.range_max(ids) == U(2) * ids).all()
    assert (c.child_begin(ids, 30) == c.range_min(ids)).all()
    assert (c.next_id(np.atleast_1d(c.range_max(ids))) ==
            c.next_id(c.child_end(ids, 30) - U(2))).all()


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(7)
    lat = rng.uniform(-89.999, 89.999, 50000)
    lon = rng.uniform(-180, 180, 50000)
    ids = c.from_latlng_deg(lat, lon)
    f, i, j = c.to_face_ij_orientation(ids)
    assert (c.from_face_ij(f, i, j) == ids).all()


def test_center_reencode_all_levels():
    rng = np.random.default_rng(11)
    lat = rng.uniform(-89, 89, 2000)
    lon = rng.uniform(-180, 180, 2000)
    leaf = c.from_latlng_deg(lat, lon)
    for lvl in (0, 3, 8, 15, 22, 29, 30):
        p = c.parent(leaf, lvl)
        clat, clon = c.to_latlng_deg(p)
        assert (c.parent(c.from_latlng_deg(clat, clon), lvl) == p).all()


def test_center_si_ti_bit_pattern():
    # S2CellIdUnitTest.kt:103-136: level-k center si/ti lowest bits
    rng = np.random.default_rng(3)
    leaf = c.from_latlng_deg(rng.uniform(-80, 80, 500),
                             rng.uniform(-180, 180, 500))
    for lvl in range(0, 31):
        p = c.parent(leaf, lvl)
        _, si, ti = c.center_si_ti(p)
        mask = (1 << (30 - lvl + 1)) - 1
        expect = 1 << (30 - lvl)
        assert ((si & mask) == expect).all()
        assert ((ti & mask) == expect).all()


def test_tokens():
    # S2CellIdUnitTest.kt:287-314
    rng = np.random.default_rng(5)
    leaf = c.from_latlng_deg(rng.uniform(-89, 89, 10000),
                             rng.uniform(-180, 180, 10000))
    lvls = rng.integers(0, 31, 10000)
    ids = c.parent(leaf, lvls)
    toks = c.to_token(ids)
    assert max(len(t) for t in toks) <= 16
    assert (c.from_token(toks.tolist()) == ids).all()
    # malformed tokens -> none (id 0)
    bad = ["876b e99", "876bee99\n", "876[ee99", " 876bee99", ""]
    assert (c.from_token(bad) == 0).all()
    assert c.to_token(np.array([0], dtype=np.uint64))[0] == "X"
    assert c.from_token(["X"])[0] == 0


def test_debug_strings():
    # S2CellIdUnitTest.kt:548-568 style: "4/" and "3/02"
    f4 = np.atleast_1d(c.from_face(4))
    assert c.to_debug_string(f4)[0] == "4/"
    f3 = c.child(c.child(np.atleast_1d(c.from_face(3)), 0), 2)
    assert c.to_debug_string(f3)[0] == "3/02"
    assert c.from_debug_string(["3/02"])[0] == f3[0]
    assert c.from_debug_string(["4/"])[0] == c.from_face(4)


def test_hilbert_walk():
    # S2CellIdUnitTest.kt:139-207
    assert int(c.advance(np.atleast_1d(c.begin(0)), 7)[0]) == int(c.end(0))
    assert int(c.advance_wrap(np.atleast_1d(c.begin(0)), 7)[0]) == \
        int(c.from_face(1))
    assert int(c.distance_from_begin(np.atleast_1d(c.end(0)))[0]) == 6
    b = np.atleast_1d(c.begin(10))
    adv = c.advance(b, 123456)
    assert int(c.distance_from_begin(adv)[0]) - \
        int(c.distance_from_begin(b)[0]) == 123456


def test_common_ancestor_level():
    # S2CellIdUnitTest.kt:244-271
    def cal(a, b):
        return int(c.common_ancestor_level(np.array([a], dtype=np.uint64),
                                           np.array([b], dtype=np.uint64))[0])
    f0 = int(c.from_face(0))
    f5 = int(c.from_face(5))
    assert cal(f0, f0) == 0
    l30 = int(c.child_begin(np.atleast_1d(c.from_face(0)), 30)[0])
    assert cal(l30, l30) == 30
    assert cal(l30, f0) == 0
    f5_last = int(c.prev_id(np.atleast_1d(
        c.child_end(np.atleast_1d(c.from_face(5)), 30)))[0])
    assert cal(f5, f5_last) == 0
    assert cal(f0, f5) == -1
    a = int(c.child_begin(np.atleast_1d(c.from_face(2)), 30)[0])
    b = int(c.child_end(np.atleast_1d(c.from_face(3)), 20)[0])
    assert cal(a, b) == -1
    n9 = c.next_id(c.child_begin(np.atleast_1d(c.from_face(5)), 9))
    a = int(c.child_begin(n9, 15)[0])
    b = int(c.child_begin(c.child_begin(
        np.atleast_1d(c.from_face(5)), 9), 20)[0])
    assert cal(a, b) == 8
    a = int(c.child_begin(c.child_begin(
        np.atleast_1d(c.from_face(0)), 2), 30)[0])
    b = int(c.child_begin(c.next_id(c.child_begin(
        np.atleast_1d(c.from_face(0)), 2)), 5)[0])
    assert cal(a, b) == 1


def test_edge_neighbors():
    # S2CellIdUnitTest.kt:417-439
    nbrs = c.get_edge_neighbors(np.atleast_1d(c.from_face(1)))[0]
    out_faces = [5, 3, 2, 0]
    for i in range(4):
        arr = np.array([nbrs[i]], dtype=np.uint64)
        assert int(c.level(arr)[0]) == 0
        assert int(nbrs[i]) >> 61 == out_faces[i]
    k_max_ij = c.MAX_SIZE - 1
    for lvl in range(1, 31):
        cid = int(c.parent(c.from_face_ij(
            np.array([1]), np.array([0]), np.array([0])), lvl)[0])
        nbrs = c.get_edge_neighbors(np.array([cid], dtype=np.uint64))[0]
        size_ij = int(c.get_size_ij(lvl))
        assert int(nbrs[0]) == int(c.parent(c.from_face_ij(
            np.array([5]), np.array([k_max_ij]), np.array([k_max_ij])), lvl)[0])
        assert int(nbrs[1]) == int(c.parent(c.from_face_ij(
            np.array([1]), np.array([size_ij]), np.array([0])), lvl)[0])
        assert int(nbrs[2]) == int(c.parent(c.from_face_ij(
            np.array([1]), np.array([0]), np.array([size_ij])), lvl)[0])
        assert int(nbrs[3]) == int(c.parent(c.from_face_ij(
            np.array([0]), np.array([k_max_ij]), np.array([0])), lvl)[0])


def test_vertex_neighbors():
    # S2CellIdUnitTest.kt:442-465
    cid = int(c.from_xyz(np.array([0.0]), np.array([0.0]),
                         np.array([1.0]))[0])
    nbrs = sorted(c.get_vertex_neighbors(cid, 5))
    for i in range(4):
        ii = (1 << 29) - (1 if i < 2 else 0)
        jj = (1 << 29) - (1 if i in (0, 3) else 0)
        expect = int(c.parent(c.from_face_ij(
            np.array([2]), np.array([ii]), np.array([jj])), 5)[0])
        assert nbrs[i] == expect
    # corner of faces 0, 4, 5
    corner = int(c.from_face_pos_level(0, U(0), 30))
    nbrs = sorted(c.get_vertex_neighbors(corner, 0))
    assert len(nbrs) == 3
    assert nbrs == sorted([int(c.from_face(0)), int(c.from_face(4)),
                           int(c.from_face(5))])


def test_all_neighbors_consistent_with_vertex_neighbors():
    # S2CellIdUnitTest.kt:467-499: all-neighbors at level+1 equals the union
    # of vertex neighbors of the cell's 4 children minus the children.
    rng = np.random.default_rng(17)
    leaf = c.from_latlng_deg(rng.uniform(-85, 85, 50),
                             rng.uniform(-180, 180, 50))
    # S2CellIdUnitTest.kt:479-499 testAllNeighbors: allNeighbors(id, level)
    # plus id's descendants at `level` == vertex neighbors at `level` of all
    # of id's children at level+1.
    for n in range(50):
        base_lvl = int(rng.integers(1, 27))
        cid = int(c.parent(leaf[n:n + 1], base_lvl)[0])
        lvl = base_lvl + int(rng.integers(0, min(5, 29 - base_lvl) + 1))
        all_set = set(c.get_all_neighbors(cid, lvl))
        expected = set()
        arr = np.array([cid], dtype=np.uint64)
        ch = int(c.child_begin(arr, lvl + 1)[0])
        end = int(c.child_end(arr, lvl + 1)[0])
        while ch != end:
            all_set.add(c.sc_parent(ch, lvl))
            expected.update(c.get_vertex_neighbors(ch, lvl))
            ch = int(c.next_id(np.array([ch], dtype=np.uint64))[0])
        assert all_set == expected


def test_maximum_tile_and_contains():
    rng = np.random.default_rng(23)
    leaf = c.from_latlng_deg(rng.uniform(-85, 85, 100),
                             rng.uniform(-180, 180, 100))
    # Mirrors S2CellUnion.fromBeginEnd (S2CellUnion.kt:626-642): greedily
    # tile the leaf range [begin, end) with maximumTile.
    for n in range(100):
        begin = int(leaf[n])
        end = int(c.advance(leaf[n:n + 1],
                            int(rng.integers(1, 1 << 20)))[0])
        pos = begin
        total = 0
        while pos != end:
            tile = c.maximum_tile(pos, end)
            assert c.sc_range_min(tile) == pos
            assert c.sc_range_max(tile) < end
            total += (c.sc_range_max(tile) - c.sc_range_min(tile)) // 2 + 1
            pos = c.sc_range_max(tile) + 2
        assert total == (end - begin) // 2


def test_wrap_advance_identities():
    # advanceWrap by full period is identity (S2CellIdUnitTest.kt:139-207)
    rng = np.random.default_rng(29)
    leaf = c.from_latlng_deg(rng.uniform(-85, 85, 100),
                             rng.uniform(-180, 180, 100))
    for lvl in (0, 5, 15):
        ids = c.parent(leaf, lvl)
        period = 6 * (1 << (2 * lvl))
        assert (c.advance_wrap(ids, period) == ids).all()
        fwd = c.advance_wrap(ids, 123)
        assert (c.advance_wrap(fwd, -123) == ids).all()


def test_cell_area_invariants():
    """S2CellUnitTest area invariants: face exact areas sum to 4*pi;
    children's exact areas sum to the parent's; approx within 3% of
    exact; average within ~a factor at low levels (S2Cell.kt:205-250)."""
    import math
    import random

    import numpy as np

    from s2_geometry_kotlin_spark.kernel.cellid import (
        begin, cell_approx_area, cell_average_area, cell_exact_area,
        end, next_id, sc_child)
    total = 0.0
    cid = int(begin(0))
    stop = int(end(0))
    while cid != stop:
        total += cell_exact_area(cid)
        cid = int(next_id(np.array([cid], dtype=np.uint64))[0])
    assert abs(total - 4 * math.pi) < 1e-12

    rng = random.Random(17)
    # random cells at several levels: children partition the parent
    cid = int(begin(0))
    for lvl in range(0, 14):
        exact = cell_exact_area(cid)
        kids = [sc_child(cid, pos) for pos in range(4)]
        ksum = sum(cell_exact_area(k) for k in kids)
        assert abs(ksum - exact) <= 1e-12 * max(1.0, exact * 1e6)
        approx = cell_approx_area(cid)
        if lvl >= 2:
            assert abs(approx - exact) / exact < 0.03
        if lvl >= 5:
            assert abs(approx - exact) / exact < 0.001
        avg = cell_average_area(lvl)
        assert 0.4 < avg / exact < 2.5
        cid = kids[rng.randrange(4)]


def test_hilbert_continuity_walk():
    """S2CellIdUnitTest.continuity (:376-398): sequentially increasing
    cell ids form a continuous path — adjacent ids' centers within
    kMaxEdge of the walk level, advance_wrap consistency, and centers
    exactly on the (s,t) half-cell grid."""
    import math

    import numpy as np

    from s2_geometry_kotlin_spark.kernel import cellid as ck
    from s2_geometry_kotlin_spark.kernel import metrics

    level = 4
    max_dist = metrics.MAX_EDGE.get_value(level)
    cell_size = 1.0 / (1 << level)
    cid = int(ck.begin(level))
    end = int(ck.end(level))
    ids = []
    while cid != end:
        ids.append(cid)
        cid = int(ck.next_id(np.array([cid], dtype=np.uint64))[0])
    arr = np.array(ids, dtype=np.uint64)
    x, y, z = ck.to_xyz(arr)
    pts = np.stack([x, y, z], axis=1)
    nxt = np.roll(pts, -1, axis=0)
    ang = np.arctan2(np.linalg.norm(np.cross(pts, nxt), axis=1),
                     np.einsum("ij,ij->i", pts, nxt))
    assert float(ang.max()) <= max_dist
    # advance_wrap(1) == next_wrap; next_wrap.advance_wrap(-1) == id
    nw = ck.advance_wrap(arr, 1)
    assert np.array_equal(nw, np.roll(arr, -1))
    assert np.array_equal(ck.advance_wrap(nw, -1), arr)
    # centers lie exactly on the half-cell (s,t) grid
    for cid in ids[:64]:
        face = cid >> 61
        px, py, pz = ck.sc_center_xyz(cid)
        # project to (u, v) on the cell's own face
        denom = (px, py, pz, -px, -py, -pz)[face]
        u_num = {0: py, 1: -px, 2: -px, 3: pz, 4: pz, 5: -py}[face]
        v_num = {0: pz, 1: pz, 2: -py, 3: py, 4: -px, 5: -px}[face]
        for val in (u_num / denom, v_num / denom):
            st = ck.uv_to_st(np.array([val]))[0]
            assert abs(math.remainder(st, 0.5 * cell_size)) < 1e-15


def test_leaf_coverage_accuracy():
    """S2CellIdUnitTest.coverage (:401-414): every random point is
    within half the level-30 max diagonal of its leaf cell center."""
    import numpy as np

    from s2_geometry_kotlin_spark.kernel import cellid as ck
    from s2_geometry_kotlin_spark.kernel import metrics

    max_dist = 0.5 * metrics.MAX_DIAG.get_value(ck.MAX_LEVEL)
    rng = np.random.default_rng(121)
    p = rng.normal(size=(20000, 3))
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    ids = ck.from_xyz(p[:, 0], p[:, 1], p[:, 2])
    qx, qy, qz = ck.to_xyz(np.asarray(ids, dtype=np.uint64))
    q = np.stack([qx, qy, qz], axis=1)
    ang = np.arctan2(np.linalg.norm(np.cross(p, q), axis=1),
                     np.einsum("ij,ij->i", p, q))
    assert float(ang.max()) <= max_dist
