"""S2Builder splitCrossingEdges + idempotent options, ported from
src/test/kotlin/dilivia/s2/builder/S2BuilderUnitTest.kt (line numbers
cited per case)."""

import math

import numpy as np

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel.builder_snap import (
    IdentitySnap, IntLatLngSnap, crossing_vertices,
    input_meets_guarantees, snap_loops, snap_polylines)
from s2_geometry_kotlin_spark.kernel.textparser import parse_latlngs


def pts(text):
    lls = parse_latlngs(text)
    x, y, z = ck.latlng_deg_to_xyz(np.array([t[0] for t in lls]),
                                   np.array([t[1] for t in lls]))
    return np.stack([x, y, z], axis=1)


def fmt(arr):
    lats = np.degrees(np.arcsin(np.clip(arr[:, 2], -1, 1)))
    lngs = np.degrees(np.arctan2(arr[:, 1], arr[:, 0]))
    return ", ".join(f"{round(la, 6):g}:{round(lo, 6):g}"
                     for la, lo in zip(lats, lngs))


def cyc(arr):
    """Canonical form of a ring under rotation AND reversal — the
    reference assembles self-split loops with UNDIRECTED edges
    precisely because splitting a directed loop at a self-intersection
    yields loops of inconsistent orientation (S2Builder.kt:505-511)."""
    seq = [tuple(np.round(v, 9)) for v in arr]

    def rot(s):
        k = s.index(min(s))
        return tuple(s[k:] + s[:k])
    return min(rot(seq), rot(seq[::-1]))


def test_idempotency_snaps_inadequately_separated_vertices():
    """S2BuilderUnitTest.kt:234-247: vertices closer than
    min_vertex_separation snap together even under idempotent=true."""
    out = snap_polylines([pts("0:0, 0:0.9, 0:2")],
                         IdentitySnap(math.radians(1.0)))
    assert [fmt(o) for o in out] == ["0:0, 0:2"]


def test_self_intersecting_polyline():
    """:455-473: with splitCrossingEdges the intersection point is
    added to both edges (E1 snap -> 2:2)."""
    out = snap_polylines([pts("3:1, 1:3, 1:1, 3:3")], IntLatLngSnap(1),
                         split_crossing_edges=True)
    assert [fmt(o) for o in out] == ["3:1, 2:2, 1:3, 1:1, 2:2, 3:3"]
    # without the option, no crossing vertex is materialized
    out = snap_polylines([pts("3:1, 1:3, 1:1, 3:3")], IntLatLngSnap(1))
    assert [fmt(o) for o in out] == ["3:1, 1:3, 1:1, 3:3"]


def test_self_intersecting_polygon():
    """:476-496: a self-crossing closed loop splits into two rings at
    the materialized crossing vertex."""
    out = snap_loops([pts("3:1, 1:3, 1:1, 3:3")], IntLatLngSnap(1),
                     split_crossing_edges=True)
    got = {cyc(o) for o in out}
    want = {cyc(pts("1:1, 1:3, 2:2")), cyc(pts("3:3, 3:1, 2:2"))}
    assert got == want


def test_idempotency_snaps_unsnapped_vertices():
    """:283-333: a vertex off the snap grid triggers snapping even
    when the separations are adequate (both processing orders)."""
    out = snap_polylines([pts("0:0, 0.01:0.6")], IntLatLngSnap(0))
    assert [fmt(o) for o in out] == ["0:0, 0:1"]
    out = snap_polylines([pts("0.01:0.4, 0:1")], IntLatLngSnap(0))
    assert [fmt(o) for o in out] == ["0:0, 0:1"]


def test_idempotency_does_not_snap_adequately_separated_vertices():
    """:362-388: IntLatLng(0) snaps '1.49:0, 0:2, 0.49:3' to
    '1:0, 0:2, 0:3'; building the OUTPUT again changes nothing."""
    o1 = snap_loops([pts("1.49:0, 0:2, 0.49:3")], IntLatLngSnap(0),
                    idempotent=True)
    assert [fmt(o) for o in o1] == ["1:0, 0:2, 0:3"]
    o2 = snap_loops([o1[0]], IntLatLngSnap(0), idempotent=True)
    assert np.array_equal(o1[0], o2[0])
    # the pass-through really is the idempotent shortcut
    assert input_meets_guarantees(
        o1[0], [(o1[0][i], o1[0][(i + 1) % 3]) for i in range(3)],
        IntLatLngSnap(0))


def test_idempotent_polyline_passthrough_bit_exact():
    """Already-snapped, adequately separated input passes through
    bit-for-bit (the S2Builder.kt:581-599 shortcut)."""
    inp = pts("1:0, 0:2, 0:5")
    out = snap_polylines([inp], IntLatLngSnap(0))
    assert np.array_equal(out[0], inp)


def test_identical_vertices_merge_with_zero_snap_radius():
    """:249-276 (both variants): identical vertices merge into one
    site even with a zero snap radius, with and without
    splitCrossingEdges; assembly of the three polylines + degenerate
    edge yields the triangle 0:0, 0:1, 1:0."""
    from s2_geometry_kotlin_spark.kernel.builder_graph import (
        POLYGON_LAYER_OPTIONS, EdgeType, GraphOptions, process_edges)
    for split in (False, True):
        lines = [pts("0:1, 1:0"), pts("0:0, 0:1"),
                 pts("0:1, 0:1"), pts("1:0, 0:0")]
        out = snap_polylines(lines, IdentitySnap(0.0),
                             split_crossing_edges=split,
                             idempotent=True)
        # the degenerate polyline produces no edge; the rest intern
        # identical vertices to shared sites
        vid, edges = {}, []
        for ln in out:
            for a in range(len(ln) - 1):
                for w in (tuple(ln[a]), tuple(ln[a + 1])):
                    vid.setdefault(w, len(vid))
                edges.append((vid[tuple(ln[a])], vid[tuple(ln[a + 1])]))
        go = GraphOptions(EdgeType.UNDIRECTED,
                          POLYGON_LAYER_OPTIONS.degenerate_edges,
                          POLYGON_LAYER_OPTIONS.duplicate_edges,
                          POLYGON_LAYER_OPTIONS.sibling_pairs)
        new_edges, _, err = process_edges(go, edges)
        assert err is None
        assert len(vid) == 3
        assert len(new_edges) == 3   # one directed triangle


def test_crossing_vertices_mutual_and_self():
    """splitCrossingEdges collects crossings across edges of ALL
    layers, including self-crossings (S2Builder.kt:489-520)."""
    e = [(pts("0:-5, 0:5")[0], pts("0:-5, 0:5")[1]),
         (pts("5:0, -5:0")[0], pts("5:0, -5:0")[1])]
    xp = crossing_vertices(e)
    assert len(xp) == 1
    lat = math.degrees(math.asin(xp[0][2]))
    lng = math.degrees(math.atan2(xp[0][1], xp[0][0]))
    assert abs(lat) < 1e-9 and abs(lng) < 1e-9


def test_snapping_does_not_rotate_vertices():
    """:503-530 (snappingDoesNotRotateVertices): snapping a polygon
    with the cell-id snap function preserves cyclic vertex order and
    moves no vertex by more than the snap radius; snapping the OUTPUT
    again changes nothing."""
    from s2_geometry_kotlin_spark.kernel.builder_snap import CellIdSnap
    inp = pts("49.9305505:-124.8345463, 49.9307448:-124.8299657, "
              "49.9332101:-124.8301996, 49.9331224:-124.8341368")
    snap = CellIdSnap(30)
    o1 = snap_loops([inp], snap)
    assert len(o1) == 1 and len(o1[0]) == 4
    # displacement bound: every output vertex within snap_radius of its
    # input vertex (order preserved up to rotation)
    import numpy as _np
    d = _np.linalg.norm(o1[0] - inp, axis=1)
    assert float(d.max()) <= 2.0 * math.sin(snap.snap_radius / 2) + 1e-15
    o2 = snap_loops([o1[0]], snap, idempotent=True)
    assert _np.array_equal(o1[0], o2[0])


def test_cellid_snapping_at_several_levels():
    """:395-425 (s2CellIdSnappingAtAllLevels, sampled levels): the
    snapped polygon is valid and every vertex moves by at most the
    snap radius."""
    import numpy as _np

    from s2_geometry_kotlin_spark.kernel.builder_snap import CellIdSnap
    from s2_geometry_kotlin_spark.kernel.validation import \
        find_validation_error
    loops = [pts("0:0, 0:2, 2:0"), pts("0:0, 0:-2, -2:-2, -2:0")]
    for level in (6, 10, 14, 20, 30):
        snap = CellIdSnap(level)
        out = snap_loops([lv.copy() for lv in loops], snap)
        assert out, f"level {level} collapsed everything"
        assert find_validation_error(out) is None, level
        max_chord = 2.0 * math.sin(min(snap.snap_radius, math.pi) / 2)
        for snapped in out:
            # every output vertex is within snap radius of SOME input
            # vertex or edge (vertices only move to nearby sites)
            allv = _np.concatenate(loops, axis=0)
            d = _np.linalg.norm(
                snapped[:, None, :] - allv[None, :, :], axis=2)
            assert float(d.min(axis=1).max()) <= max_chord + 1e-12, level
