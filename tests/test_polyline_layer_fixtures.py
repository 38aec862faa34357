"""Port of the reference polyline-layer suite
(dilivia/s2/builder/layers/S2PolylineLayerUnitTest.kt) against
build_polyline_layer (s2_geometry_kotlin_spark/kernel/builder_snap.py)
and the undirected label propagation of the graph substrate.

The layer assembles ALL input edges (possibly from several polylines,
possibly reordered or reversed) into one output polyline via maximal
edge walks: backtracking chains, loops returning to the same vertex,
the early-walk-termination + walk-maximization heuristics, the 5-square
chessboard reordering, and crossing-split reconstruction."""

import math

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel.builder_snap import (
    IntLatLngSnap, build_polyline_layer)
from s2_geometry_kotlin_spark.kernel.textparser import parse_latlngs


def pts(text: str) -> np.ndarray:
    lls = parse_latlngs(text)
    lat = np.array([a for a, _ in lls])
    lng = np.array([b for _, b in lls])
    x, y, z = ck.latlng_deg_to_xyz(lat, lng)
    return np.stack([x, y, z], axis=1)


def check(input_strs, expected_str, snap=None, split=False,
          edge_types=("directed", "undirected")):
    for et in edge_types:
        got = build_polyline_layer([pts(s) for s in input_strs],
                                   snap=snap, edge_type=et,
                                   split_crossing_edges=split)
        if expected_str == "":
            assert got == [], et
            continue
        assert len(got) == 1, (et, [len(g) for g in got])
        want = pts(expected_str)
        assert got[0].shape == want.shape, \
            (et, got[0].shape, want.shape)
        assert np.allclose(got[0], want, atol=1e-14), (et, got[0], want)


def check_unchanged(s: str):
    check([s], s)


def test_no_edges():
    check([], "")


def test_one_edge():
    # even with undirected edges, the layer prefers the original
    # direction
    check_unchanged("3:4, 1:1")
    check_unchanged("1:1, 3:4")


def test_straight_line_with_backtracking():
    check_unchanged("0:0, 1:0, 2:0, 3:0, 2:0, 1:0, 2:0, 3:0, 4:0")


def test_early_walk_termination_with_end_loop1():
    # must NOT create two polylines when one suffices
    check(["0:0, 0:2, 0:1"], "0:0, 0:1, 0:2, 0:1",
          snap=IntLatLngSnap(2))


def test_early_walk_termination_with_end_loop2():
    # walk terminated early (one edge), then maximized by appending a
    # two-edge loop
    check(["0:0, 0:1", "0:2, 0:1", "0:1, 0:2"],
          "0:0, 0:1, 0:2, 0:1")


def test_simple_loop():
    check_unchanged("0:0, 0:5, 5:5, 5:0, 0:0")


def test_many_loops():
    # many overlapping loops returning to 2:2 — assembly must
    # reconstruct the ORIGINAL order
    check_unchanged(
        "0:0, 2:2, 2:4, 2:2, 2:4, 4:4, 4:2, 2:2, 4:4, 4:2, 2:2, 2:0, "
        "2:2, 2:0, 4:0, 2:2, 4:2, 2:2, 0:2, 0:4, 2:2, 0:4, 0:2, 2:2, "
        "0:4, 2:2, 0:2, 2:2, 0:0, 0:2, 2:2, 0:0")


def test_unordered_loops():
    # five diagonal-touching squares (the white squares of a 3x3
    # chessboard) reassembled into a single unbroken polyline
    check(
        ["3:3, 3:2, 2:2, 2:3, 3:3",
         "1:0, 0:0, 0:1, 1:1, 1:0",
         "3:1, 3:0, 2:0, 2:1, 3:1",
         "1:3, 1:2, 0:2, 0:1, 1:3",
         "1:1, 1:2, 2:2, 2:1, 1:1"],
        "3:3, 3:2, 2:2, 2:1, 3:1, 3:0, 2:0, 2:1, 1:1, 1:0, 0:0, 0:1, "
        "1:1, 1:2, 0:2, 0:1, 1:3, 1:2, 2:2, 2:3, 3:3")


def test_split_edges():
    # a loop whose first and last edges are identical-but-reversed and
    # whose two long edges are split into many pieces by crossings
    check(
        ["0:10, 0:0, 1:0, -1:2, 1:4, -1:6, 1:8, -1:10, -5:0, 0:0, 0:10"],
        "0:10, 0:9, 0:7, 0:5, 0:3, 0:1, 0:0, 1:0, 0:1, -1:2, 0:3, 1:4, "
        "0:5, -1:6, 0:7, 1:8, 0:9, -1:10, -5:0, 0:0, 0:1, 0:3, 0:5, "
        "0:7, 0:9, 0:10",
        snap=IntLatLngSnap(7), split=True)


def test_simple_edge_labels():
    """Undirected label propagation: each output edge carries the label
    set of the input edge that produced it (either direction)."""
    from s2_geometry_kotlin_spark.kernel.builder_graph import (
        build_polylines_undirected)
    inputs = [("0:0, 0:1, 0:2", frozenset({5})),
              ("0:3, 0:2", frozenset({5, 7})),
              ("0:3, 0:4, 0:5", frozenset()),
              ("0:6, 0:5", frozenset({11}))]
    vmap: dict[tuple, int] = {}
    verts: list[np.ndarray] = []

    def vid(p):
        t = tuple(p)
        if t not in vmap:
            vmap[t] = len(verts)
            verts.append(p)
        return vmap[t]

    edges: list[tuple[int, int]] = []
    labels: dict[frozenset, frozenset] = {}
    for text, lab in inputs:
        p = pts(text)
        for i in range(len(p) - 1):
            a, b = vid(p[i]), vid(p[i + 1])
            edges.append((a, b))
            labels[frozenset((a, b))] = lab
    und = [x for e in edges for x in (e, (e[1], e[0]))]
    walks = build_polylines_undirected(und, "walk")
    assert len(walks) == 1
    chain = [und[walks[0][0]][0]] + [und[e][1] for e in walks[0]]
    got = [labels[frozenset((chain[i], chain[i + 1]))]
           for i in range(len(chain) - 1)]
    assert got == [frozenset({5}), frozenset({5}), frozenset({5, 7}),
                   frozenset(), frozenset(), frozenset({11})]
