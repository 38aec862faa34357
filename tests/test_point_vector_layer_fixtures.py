"""Port of the reference point-vector-layer suite
(dilivia/s2/builder/layers/S2PointVectorLayerUnitTest.kt) against
process_edges (s2_geometry_kotlin_spark/kernel/builder_graph.py):
points are degenerate edges, MERGE unions their label sets, KEEP
retains copies, and non-degenerate edges are rejected."""

import numpy as np

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel.builder_graph import (
    DegenerateEdges, DuplicateEdges, EdgeType, GraphOptions,
    SiblingPairs, process_edges)
from s2_geometry_kotlin_spark.kernel.textparser import parse_latlngs


def pt(text: str) -> tuple:
    (lat, lng), = parse_latlngs(text)
    x, y, z = ck.latlng_deg_to_xyz(np.array([lat]), np.array([lng]))
    return (x[0], y[0], z[0])


def point_vector_layer(points_with_labels, duplicates: str):
    """(point, labels) pairs -> (points, label_sets) after the
    S2PointVectorLayer graph pass.  Raises ValueError on
    non-degenerate edges (the layer's INVALID_ARGUMENT)."""
    vmap: dict[tuple, int] = {}
    verts: list[tuple] = []

    def vid(p) -> int:
        if p not in vmap:
            vmap[p] = len(verts)
            verts.append(p)
        return vmap[p]

    edges = []
    ids = []
    for p, labels in points_with_labels:
        if isinstance(p, tuple) and len(p) == 2 and \
                isinstance(p[0], tuple):
            raise ValueError("Found non-degenerate edges")
        v = vid(p)
        edges.append((v, v))
        ids.append(list(labels))
    opts = GraphOptions(
        EdgeType.DIRECTED, DegenerateEdges.KEEP,
        DuplicateEdges.MERGE if duplicates == "MERGE"
        else DuplicateEdges.KEEP, SiblingPairs.KEEP)
    kept, kept_ids, _err = process_edges(opts, edges, input_ids=ids)
    return [verts[a] for a, _b in kept], [sorted(set(s))
                                          for s in kept_ids]


def _input():
    return [
        (pt("0:1"), [1]),
        (pt("0:2"), [1]),
        (pt("0:1"), [2]),
        (pt("0:4"), [2]),
        (pt("0:5"), [2]),
        (pt("0:5"), []),
        (pt("0:6"), []),
    ]


def test_merge_duplicates():
    points, labels = point_vector_layer(_input(), "MERGE")
    assert points == [pt("0:1"), pt("0:2"), pt("0:4"), pt("0:5"),
                      pt("0:6")]
    assert labels == [[1, 2], [1], [2], [2], []]


def test_keep_duplicates():
    points, labels = point_vector_layer(_input(), "KEEP")
    assert points == [pt("0:1"), pt("0:1"), pt("0:2"), pt("0:4"),
                      pt("0:5"), pt("0:5"), pt("0:6")]
    assert labels == [[1], [2], [1], [2], [2], [], []]


def test_non_degenerate_edge_rejected():
    import pytest
    with pytest.raises(ValueError, match="non-degenerate"):
        point_vector_layer([(pt("0:1"), []),
                            ((pt("0:3"), pt("0:4")), []),
                            (pt("0:5"), [])], "KEEP")
