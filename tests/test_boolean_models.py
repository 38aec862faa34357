"""B3 PolygonModel matrix: OPEN / SEMI_OPEN / CLOSED on touching
boundaries (S2BooleanOperation.kt:114-130; SEMI_OPEN default :287).

The solid rings are model-independent; the models decide which
degenerate features the touching boundaries produce:
- CLOSED is "the only model where polygons that touch at a vertex or
  along an edge intersect" (S2BooleanOperation.kt:126-127) -> the
  CLOSED intersection of adjacent polygons is their shared border
  (degenerate edge shells), of vertex-touching polygons the shared
  vertex (degenerate point shell).
- OPEN polygons contain neither vertices nor edges -> the OPEN union
  of adjacent polygons omits the shared border (degenerate edge holes,
  a slit), of vertex-touching polygons the pinch vertex (point hole).
- The symmetric difference slits the shared border in BOTH non-default
  models (OPEN: in neither operand; CLOSED: in both), and only
  SEMI_OPEN's exactly-one-owner rule keeps it solid.
"""

import numpy as np

from s2_geometry_kotlin_spark.kernel.booleanop import (
    BooleanResult, polygon_boolean, polygon_boolean_full)
from s2_geometry_kotlin_spark.kernel.regions import Loop, Polygon

from .test_booleanop_shared import E, W, polygon_area, pt


def _counts(r: BooleanResult):
    return (len(r.degenerate_edge_shells), len(r.degenerate_edge_holes),
            len(r.degenerate_point_shells), len(r.degenerate_point_holes))


def test_rings_model_independent():
    for op in ("intersection", "union", "difference",
               "symmetric_difference"):
        base = polygon_boolean(W, E, op)
        for model in ("OPEN", "SEMI_OPEN", "CLOSED"):
            r = polygon_boolean_full(W, E, op, model=model)
            assert len(r.polygon.loops) == len(base.loops)
            assert np.isclose(polygon_area(r.polygon), polygon_area(base))


def test_semi_open_emits_no_degeneracies():
    for op in ("intersection", "union", "difference",
               "symmetric_difference"):
        r = polygon_boolean_full(W, E, op, model="SEMI_OPEN")
        assert _counts(r) == (0, 0, 0, 0)


def test_closed_intersection_of_adjacent_is_shared_border():
    r = polygon_boolean_full(W, E, "intersection", model="CLOSED")
    # W/E share the 2-edge meridian chain lng=10 (interior vertex lat=5)
    assert len(r.polygon.loops) == 0
    assert _counts(r) == (2, 0, 0, 0)
    # OPEN intersection stays fully empty
    r = polygon_boolean_full(W, E, "intersection", model="OPEN")
    assert len(r.polygon.loops) == 0
    assert _counts(r) == (0, 0, 0, 0)


def test_open_union_of_adjacent_slits_shared_border():
    r = polygon_boolean_full(W, E, "union", model="OPEN")
    assert len(r.polygon.loops) == 1
    assert _counts(r) == (0, 2, 0, 0)
    # CLOSED union is solid
    r = polygon_boolean_full(W, E, "union", model="CLOSED")
    assert _counts(r) == (0, 0, 0, 0)


def test_sym_difference_slits_in_both_non_default_models():
    for model in ("OPEN", "CLOSED"):
        r = polygon_boolean_full(W, E, "symmetric_difference", model=model)
        assert len(r.polygon.loops) == 1
        assert _counts(r) == (0, 2, 0, 0)


def test_difference_never_emits_degeneracies():
    for model in ("OPEN", "SEMI_OPEN", "CLOSED"):
        r = polygon_boolean_full(W, E, "difference", model=model)
        assert _counts(r) == (0, 0, 0, 0)
        assert np.isclose(polygon_area(r.polygon), polygon_area(W))


def _touching_triangles():
    a = Polygon([Loop.from_latlng_text("-10:-10, 0:0, -10:10")])
    b = Polygon([Loop.from_latlng_text("10:10, 0:0, 10:-10")])
    if not a.contains_point(pt(-8, 0)):
        a = Polygon([Loop.from_latlng_text("-10:10, 0:0, -10:-10")])
    if not b.contains_point(pt(8, 0)):
        b = Polygon([Loop.from_latlng_text("10:-10, 0:0, 10:10")])
    return a, b


def test_closed_intersection_of_vertex_touch_is_the_point():
    a, b = _touching_triangles()
    r = polygon_boolean_full(a, b, "intersection", model="CLOSED")
    assert len(r.polygon.loops) == 0
    assert _counts(r) == (0, 0, 1, 0)
    assert np.allclose(r.degenerate_point_shells[0], pt(0, 0))
    for model in ("OPEN", "SEMI_OPEN"):
        r = polygon_boolean_full(a, b, "intersection", model=model)
        assert _counts(r) == (0, 0, 0, 0)


def test_open_union_of_vertex_touch_pinches_out_the_point():
    a, b = _touching_triangles()
    r = polygon_boolean_full(a, b, "union", model="OPEN")
    assert len(r.polygon.loops) == 2
    assert _counts(r) == (0, 0, 0, 1)
    assert np.allclose(r.degenerate_point_holes[0], pt(0, 0))
    for model in ("SEMI_OPEN", "CLOSED"):
        r = polygon_boolean_full(a, b, "union", model=model)
        assert _counts(r) == (0, 0, 0, 0)


def test_identical_operands_matrix():
    q = Polygon([Loop.from_latlng_text("20:40, 20:50, 30:50, 30:40")])
    q2 = Polygon([Loop.from_latlng_text("20:40, 20:50, 30:50, 30:40")])
    for op, nloops in [("intersection", 1), ("union", 1),
                       ("difference", 0), ("symmetric_difference", 0)]:
        for model in ("OPEN", "SEMI_OPEN", "CLOSED"):
            r = polygon_boolean_full(q, q2, op, model=model)
            assert len(r.polygon.loops) == nloops, (op, model)
            # stacked same-direction boundaries are regular in every
            # model: no degeneracies anywhere in this matrix
            assert _counts(r) == (0, 0, 0, 0), (op, model)


def test_polyline_model_on_coincident_edge():
    """PolylineModel x PolygonModel for a polyline following a polygon
    boundary edge (S2BooleanOperation.kt:115-127): SEMI_OPEN contains
    the edge only in the polygon's own direction; CLOSED in both;
    OPEN in neither."""
    import numpy as np

    from s2_geometry_kotlin_spark.kernel.booleanop import clip_polyline
    q = Polygon([Loop.from_latlng_text("0:0, 0:10, 10:10, 10:0")])
    fwd = np.stack([pt(0, 0), pt(0, 10)])    # same direction as ring
    rev = np.stack([pt(0, 10), pt(0, 0)])    # reversed

    def kept_len(line, model, keep_inside=True):
        return sum(len(p) for p in clip_polyline(
            line, q, keep_inside=keep_inside, polygon_model=model))

    # SEMI_OPEN: direction decides
    assert kept_len(fwd, "SEMI_OPEN") == 2
    assert kept_len(rev, "SEMI_OPEN") == 0
    assert kept_len(rev, "SEMI_OPEN", keep_inside=False) == 2
    # CLOSED: both directions intersect
    assert kept_len(fwd, "CLOSED") == 2
    assert kept_len(rev, "CLOSED") == 2
    # OPEN: neither does
    assert kept_len(fwd, "OPEN") == 0
    assert kept_len(rev, "OPEN") == 0
    # interior pieces are unaffected by the model
    mid = np.stack([pt(5, 3), pt(5, 7)])
    for model in ("OPEN", "SEMI_OPEN", "CLOSED"):
        assert kept_len(mid, model) == 2


def test_inverted_operand_degeneracies_de_morgan():
    """OPEN/CLOSED degeneracy emission for inverted operands
    (S2Polygon complement identities): for adjacent operands A, B
    sharing a border, c(A) n c(B) = c(A u B), so the CLOSED
    intersection of the complements must emit the shared border as
    degenerate edge SHELLS exactly where the OPEN union of the
    originals emits it as slit HOLES — the same measure-zero set seen
    from the two sides of De Morgan."""
    import numpy as np

    from s2_geometry_kotlin_spark.kernel.booleanop import \
        polygon_boolean_full
    from s2_geometry_kotlin_spark.operators.booleans import adjacent_layer

    def eset(edges):
        return {(tuple(np.round(u, 9)), tuple(np.round(v, 9)))
                for (u, v) in edges} | \
               {(tuple(np.round(v, 9)), tuple(np.round(u, 9)))
                for (u, v) in edges}

    pairs = {}
    for name, pid, poly in adjacent_layer():
        pairs.setdefault(pid // 2, []).append(poly)
    checked = 0
    for pid, (a, b) in sorted(pairs.items()):
        if len({tuple(np.round(v, 9)) for lp in a.loops
                for v in lp.vertices} &
               {tuple(np.round(v, 9)) for lp in b.loops
                for v in lp.vertices}) == 0:
            continue
        ca, cb = a.complement(), b.complement()
        # the path under test really is the inverted representation
        assert ca.inverted and cb.inverted
        closed_int = polygon_boolean_full(ca, cb, "intersection",
                                          model="CLOSED")
        open_union = polygon_boolean_full(a, b, "union", model="OPEN")
        assert open_union.degenerate_edge_holes, "fixture has a border"
        assert eset(closed_int.degenerate_edge_shells) == \
            eset(open_union.degenerate_edge_holes)
        # and the solid parts are complementary where defined: a point
        # strictly inside A u B is outside c(A) n c(B)
        from s2_geometry_kotlin_spark.kernel.measures import \
            loop_centroid
        c = loop_centroid(a.loops[0].vertices)
        c = c / np.linalg.norm(c)
        assert open_union.polygon.contains_point(c)
        assert not closed_int.polygon.contains_point(c)
        checked += 1
    assert checked >= 1
