"""PIP kernel tests against reference S2LoopUnitTest fixtures
(/root/reference/src/test/kotlin/dilivia/s2/region/S2LoopUnitTest.kt and
FIXTURES.md §2)."""

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel import pip, predicates as pred


def make_loop(text: str) -> np.ndarray:
    """S2TextParser-style 'lat:lng, lat:lng, ...' degrees -> (n,3) xyz."""
    pts = []
    for tok in text.split(","):
        lat, lng = tok.strip().split(":")
        x, y, z = ck.latlng_deg_to_xyz(np.array([float(lat)]),
                                       np.array([float(lng)]))
        pts.append([x[0], y[0], z[0]])
    return np.array(pts, dtype=np.float64)


def contains(verts: np.ndarray, p) -> bool:
    oi = pip.compute_origin_inside(verts)
    return bool(pip.loop_contains_points(
        verts, np.asarray(p, dtype=np.float64)[None, :], oi)[0])


NORTH_HEMI = make_loop("0:-180, 0:-90, 0:0, 0:90")
SOUTH_HEMI = make_loop("0:90, 0:0, 0:-90, 0:-180")
WEST_HEMI = make_loop("0:-180, -90:0, 0:0, 90:0")
EAST_HEMI = make_loop("90:0, 0:0, -90:0, 0:-180")
CANDY_CANE = make_loop("-20:150, -20:-70, 0:70, 10:-150, 10:70, -10:-70")
ARCTIC_80 = make_loop("80:-150, 80:-30, 80:90")
ANTARCTIC_80 = make_loop("-80:120, -80:0, -80:-120")
SMALL_NE_CW = make_loop("35:20, 45:20, 40:25")

NP = np.array([0.0, 0.0, 1.0])
SP = np.array([0.0, 0.0, -1.0])


def test_hemispheres_with_rotations():
    # S2LoopUnitTest.kt:627-645 (containment invariant under vertex rotation)
    cases = [
        (NORTH_HEMI, NP, True), (NORTH_HEMI, SP, False),
        (SOUTH_HEMI, NP, False), (SOUTH_HEMI, SP, True),
        (WEST_HEMI, np.array([0.0, 1.0, 0.0]), False),
        (WEST_HEMI, np.array([0.0, -1.0, 0.0]), True),
        (EAST_HEMI, np.array([0.0, 1.0, 0.0]), True),
        (EAST_HEMI, np.array([0.0, -1.0, 0.0]), False),
    ]
    for verts, p, expect in cases:
        v = verts.copy()
        for _ in range(4):
            assert contains(v, p) == expect
            v = np.roll(v, -1, axis=0)


def test_candy_cane():
    # S2LoopUnitTest.kt:625
    x, y, z = ck.latlng_deg_to_xyz(np.array([5.0]), np.array([71.0]))
    assert contains(CANDY_CANE, np.array([x[0], y[0], z[0]]))


def test_empty_full():
    # S2LoopUnitTest.kt:620-623: kEmpty = (0,0,1), kFull = (0,0,-1)
    empty = np.array([[0.0, 0.0, 1.0]])
    full = np.array([[0.0, 0.0, -1.0]])
    assert not contains(empty, np.array([0.0, 0.0, 1.0]))
    assert contains(full, np.array([0.0, 0.0, -1.0]))
    # empty contains nothing / full contains everything
    rng = np.random.default_rng(2)
    lat = rng.uniform(-89, 89, 50)
    lon = rng.uniform(-180, 180, 50)
    x, y, z = ck.latlng_deg_to_xyz(lat, lon)
    pts = np.stack([x, y, z], axis=1)
    assert not pip.loop_contains_points(
        empty, pts, pip.compute_origin_inside(empty)).any()
    assert pip.loop_contains_points(
        full, pts, pip.compute_origin_inside(full)).all()


def test_arctic_antarctic():
    assert contains(ARCTIC_80, NP)
    assert not contains(ARCTIC_80, SP)
    assert contains(ANTARCTIC_80, SP)
    assert not contains(ANTARCTIC_80, NP)


def test_small_cw_loop_contains_poles():
    # An inverted (clockwise) small loop contains everything outside it,
    # including both poles (S2LoopUnitTest comment on small_ne_cw).
    assert contains(SMALL_NE_CW, NP)
    assert contains(SMALL_NE_CW, SP)
    # but not its own interior complement: a point inside the small CCW
    # triangle (40,22) is NOT contained by the inverted loop
    x, y, z = ck.latlng_deg_to_xyz(np.array([40.0]), np.array([21.0]))
    assert not contains(SMALL_NE_CW, np.array([x[0], y[0], z[0]]))


@pytest.mark.parametrize("level", [0, 1, 2])
def test_cell_vertex_contained_by_exactly_one_cell_loop(level):
    # S2LoopUnitTest.kt:647-672 — the SEMI_OPEN vertex-model gold test:
    # every cell center and cell corner is contained by exactly ONE of the
    # loops formed from the cells at that level.
    ids = []
    cid = int(ck.begin(level))
    end = int(ck.end(level))
    while cid != end:
        ids.append(cid)
        cid = int(ck.next_id(np.array([cid], dtype=np.uint64))[0])
    ids = np.array(ids, dtype=np.uint64)
    verts = ck.cell_vertices(ids)                    # (n,4,3)
    cx, cy, cz = ck.to_xyz(ids)
    centers = np.stack([cx, cy, cz], axis=1)
    points = {tuple(p) for p in centers.tolist()}
    for quad in verts:
        for p in quad.tolist():
            points.add(tuple(p))
    pts = np.array(sorted(points), dtype=np.float64)
    counts = np.zeros(len(pts), dtype=np.int64)
    for quad in verts:
        oi = pip.compute_origin_inside(quad)
        counts += pip.loop_contains_points(quad, pts, oi).astype(np.int64)
    assert (counts == 1).all(), \
        f"level {level}: {np.unique(counts, return_counts=True)}"


def test_brute_vs_vectorized_random():
    # vectorized parity must equal per-point scalar edgeOrVertexCrossing walk
    rng = np.random.default_rng(31)
    for trial in range(5):
        nv = int(rng.integers(3, 12))
        lat = rng.uniform(-60, 60, nv)
        lon = rng.uniform(-180, 180, nv)
        x, y, z = ck.latlng_deg_to_xyz(lat, lon)
        verts = np.stack([x, y, z], axis=1)
        lat = rng.uniform(-89, 89, 200)
        lon = rng.uniform(-180, 180, 200)
        x, y, z = ck.latlng_deg_to_xyz(lat, lon)
        pts = np.stack([x, y, z], axis=1)
        oi = pip.compute_origin_inside(verts)
        fast = pip.loop_contains_points(verts, pts, oi)
        for j in range(len(pts)):
            inside = oi
            c = verts[0]
            for i in range(1, nv + 1):
                d = verts[i % nv]
                inside ^= pred.edge_or_vertex_crossing(
                    pred.ORIGIN, pts[j], c, d)
                c = d
            assert inside == fast[j], f"trial {trial} point {j}"
