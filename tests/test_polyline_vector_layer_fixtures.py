"""Port of the reference polyline-VECTOR-layer suite
(src/test/kotlin/dilivia/s2/builder/layers/S2PolylineVectorLayerUnitTest.kt)
against build_polyline_vector_layer (kernel/builder_snap.py): edges
from many input polylines assemble into MULTIPLE output polylines —
PATH type splits at every vertex where the continuation is ambiguous,
WALK type allows repeated vertices/edges, sibling pairs may be
DISCARDed, duplicate edges MERGEd, and per-edge label sets are fetched
LabelFetcher-style.

The final reference case (indexedS2PolylineVectorLayerAddsShapes,
:216-231) is index plumbing — the Indexed variant just inserts the
layer's output into a MutableS2ShapeIndex — and is covered here by
round-tripping the output through this repo's shape-region machinery
instead.
"""

import numpy as np

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel.builder_snap import (
    IntLatLngSnap, build_polyline_vector_layer)
from s2_geometry_kotlin_spark.kernel.textparser import parse_latlngs


def pts(text: str) -> np.ndarray:
    lls = parse_latlngs(text)
    lat = np.array([a for a, _ in lls])
    lng = np.array([b for _, b in lls])
    x, y, z = ck.latlng_deg_to_xyz(lat, lng)
    return np.stack([x, y, z], axis=1)


def check(input_strs, expected_strs, edge_types=("directed",
                                                 "undirected"),
          **kw):
    """testS2PolylineVector (:38-59): exact output — count, order,
    direction, vertices."""
    for et in edge_types:
        got = build_polyline_vector_layer([pts(s) for s in input_strs],
                                          edge_type=et, **kw)
        assert len(got) == len(expected_strs), \
            (et, len(got), expected_strs)
        for g, exp in zip(got, expected_strs):
            want = pts(exp)
            assert g.shape == want.shape, (et, g.shape, want.shape, exp)
            assert np.allclose(g, want, atol=1e-14), (et, g, exp)


def check_unchanged(input_strs, **kw):
    check(input_strs, input_strs, **kw)


def test_no_edges():
    check_unchanged([])


def test_two_polylines():
    check_unchanged(["0:0, 1:1, 2:2", "4:4, 3:3"])


def test_joining_polylines():
    # polylines join when possible even if not adjacent in the input;
    # with undirected edges the direction is chosen so the polyline's
    # first edge was added before its last edge (:87-102)
    check(["1:1, 2:2", "3:3, 2:2", "0:0, 1:1"],
          ["3:3, 2:2", "0:0, 1:1, 2:2"], edge_types=("directed",))
    check(["1:1, 2:2", "3:3, 2:2", "0:0, 1:1"],
          ["3:3, 2:2, 1:1, 0:0"], edge_types=("undirected",))


def test_segment_network():
    # complex network of polylines meeting at shared vertices (:105-124)
    check_unchanged([
        "0:0, 1:1, 2:2",
        "2:2, 2:3, 2:4",
        "2:4, 3:4, 4:4",
        "2:2, 3:2, 4:2",
        "4:2, 4:3, 4:4",
        "1:0, 2:2",
        "0:1, 2:2",
        "5:4, 4:4",
        "4:5, 4:4",
        "2:4, 2:5, 1:5, 1:4, 2:4",
        "4:2, 6:1, 5:0",   # two nested loops
        "4:2, 7:0, 6:-1",
        "11:1, 11:0, 10:0, 10:1, 11:1",  # isolated loop
    ])


def test_multiple_intersecting_walks():
    # idempotency for directed edges when polylines share edges and
    # loops (:127-139); passes for undirected too
    inp = [
        "5:5, 5:6, 6:5, 5:5, 5:4, 5:3",
        "4:4, 5:5, 6:5, 5:6, 5:5, 5:6, 6:5, 5:5, 4:5",
        "3:5, 5:5, 5:6, 6:5, 5:5, 5:6, 6:6, 7:7",
    ]
    check_unchanged(inp, polyline_type="walk")


def test_early_walk_termination():
    # earlier polylines terminating in the middle of later ones force
    # non-maximal walks (:142-155)
    inp = [
        "0:1, 1:1",
        "1:0, 1:1, 1:2",
        "0:2, 1:2, 2:2",
        "2:1, 2:2, 2:3",
    ]
    check_unchanged(inp, polyline_type="walk")


def test_input_edge_starts_multiple_loops():
    # one input edge split into segments by sibling-pair cancellation;
    # each segment becomes one edge of a separate loop (:158-182)
    inp = [
        "0:10, 0:0",
        "0:6, 1:6, 1:7, 0:7, 0:8",
        "0:8, 1:8, 1:9, 0:9, 0:10",
        "0:2, 1:2, 1:3, 0:3, 0:4",
        "0:0, 1:0, 1:1, 0:1, 0:2",
        "0:4, 1:4, 1:5, 0:5, 0:6",
    ]
    expected = [
        "0:1, 0:0, 1:0, 1:1, 0:1",
        "0:3, 0:2, 1:2, 1:3, 0:3",
        "0:5, 0:4, 1:4, 1:5, 0:5",
        "0:7, 0:6, 1:6, 1:7, 0:7",
        "0:9, 0:8, 1:8, 1:9, 0:9",
    ]
    check(inp, expected, polyline_type="walk", sibling_pairs="discard",
          snap=IntLatLngSnap(7))


def test_simple_edge_labels():
    # labels propagate through undirected merge; each output edge's
    # label set unions both siblings' input edges (:185-213)
    polylines, label_sets = build_polyline_vector_layer(
        [pts("0:0, 0:1, 0:2"), pts("0:3, 0:2, 0:1"), pts("0:4, 0:5")],
        edge_type="undirected", duplicate_edges="merge",
        labels=[[1], [2], []])
    assert [[sorted(s) for s in pl] for pl in label_sets] == \
        [[[1], [1, 2], [2]], [[]]]
    assert len(polylines) == 2
    assert np.allclose(polylines[0], pts("0:0, 0:1, 0:2, 0:3"),
                       atol=1e-14)
    assert np.allclose(polylines[1], pts("0:4, 0:5"), atol=1e-14)


def test_indexed_layer_output_round_trips():
    # indexedS2PolylineVectorLayerAddsShapes (:216-231): the Indexed
    # variant inserts each output polyline as a shape; here the
    # equivalent check is that each output round-trips through the
    # repo's Polyline region type unchanged
    from s2_geometry_kotlin_spark.kernel.polyline import Polyline
    got = build_polyline_vector_layer([pts("0:0, 1:1"),
                                       pts("2:2, 3:3")])
    assert len(got) == 2
    for g, exp in zip(got, ["0:0, 1:1", "2:2, 3:3"]):
        shape = Polyline(g)
        assert np.allclose(shape.vertices, pts(exp), atol=1e-14)
