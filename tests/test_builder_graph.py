"""Graph substrate parity: every processEdges case from the upstream
GraphUnitTest.kt (:203-520), exercised against
kernel/builder_graph.process_edges.  Ids in the expected output are
the merged input-id sets, as the reference's IdSetLexicon records."""

import pytest

from s2_geometry_kotlin_spark.kernel.builder_graph import (
    MISSING_SIBLINGS, DegenerateEdges, DuplicateEdges, EdgeType,
    GraphOptions, SiblingPairs, process_edges)

D = EdgeType.DIRECTED
U = EdgeType.UNDIRECTED
DE = DegenerateEdges
DUP = DuplicateEdges
SP = SiblingPairs


def run(options, inputs, expected, expected_error=None):
    """inputs/expected: list of (v0, v1) or (v0, v1, ids)."""
    edges = [(e[0], e[1]) for e in inputs]
    ids = [list(e[2]) if len(e) > 2 else [] for e in inputs]
    got_edges, got_ids, err = process_edges(options, edges, ids)
    assert err == expected_error, (err, expected_error)
    exp_edges = [(e[0], e[1]) for e in expected]
    exp_ids = [sorted(e[2]) if len(e) > 2 else [] for e in expected]
    assert got_edges == exp_edges, (got_edges, exp_edges)
    assert [sorted(i) for i in got_ids] == exp_ids, (got_ids, exp_ids)


def test_discard_degenerate_edges():
    run(GraphOptions(D, DE.DISCARD, DUP.KEEP, SP.KEEP),
        [(0, 0), (0, 0)], [])


def test_keep_duplicate_degenerate_edges():
    run(GraphOptions(D, DE.KEEP, DUP.KEEP, SP.KEEP),
        [(0, 0), (0, 0)], [(0, 0), (0, 0)])


def test_merge_duplicate_degenerate_edges():
    run(GraphOptions(D, DE.KEEP, DUP.MERGE, SP.KEEP),
        [(0, 0, [1]), (0, 0, [2])], [(0, 0, [1, 2])])


def test_merge_undirected_duplicate_degenerate_edges():
    run(GraphOptions(U, DE.KEEP, DUP.MERGE, SP.KEEP),
        [(0, 0, [1]), (0, 0), (0, 0), (0, 0, [2])],
        [(0, 0, [1, 2]), (0, 0, [1, 2])])


def test_converted_undirected_degenerate_edges():
    opts = GraphOptions(U, DE.KEEP, DUP.KEEP, SP.REQUIRE)
    run(opts, [(0, 0, [1]), (0, 0), (0, 0), (0, 0, [2])],
        [(0, 0, [1, 2]), (0, 0, [1, 2])])
    assert opts.edge_type == D


def test_merge_converted_undirected_duplicate_degenerate_edges():
    opts = GraphOptions(U, DE.KEEP, DUP.MERGE, SP.REQUIRE)
    run(opts, [(0, 0, [1]), (0, 0), (0, 0), (0, 0, [2])],
        [(0, 0, [1, 2])])
    assert opts.edge_type == D


def test_discard_excess_connected_degenerate_edges():
    opts = GraphOptions(D, DE.DISCARD_EXCESS, DUP.KEEP, SP.KEEP)
    run(opts, [(0, 0), (0, 1)], [(0, 1)])
    run(opts, [(0, 0), (1, 0)], [(1, 0)])
    run(opts, [(0, 1), (1, 1)], [(0, 1)])
    run(opts, [(1, 0), (1, 1)], [(1, 0)])


def test_discard_excess_isolated_degenerate_edges():
    run(GraphOptions(D, DE.DISCARD_EXCESS, DUP.KEEP, SP.KEEP),
        [(0, 0, [1]), (0, 0, [2])], [(0, 0, [1]), (0, 0, [2])])


def test_discard_excess_undirected_isolated_degenerate_edges():
    run(GraphOptions(U, DE.DISCARD_EXCESS, DUP.KEEP, SP.KEEP),
        [(0, 0, [1]), (0, 0), (0, 0, [2]), (0, 0)],
        [(0, 0, [1]), (0, 0), (0, 0, [2]), (0, 0)])


def test_discard_excess_converted_undirected_isolated_degenerates():
    opts = GraphOptions(U, DE.DISCARD_EXCESS, DUP.KEEP, SP.REQUIRE)
    run(opts, [(0, 0, [1]), (0, 0, [2]), (0, 0, [3]), (0, 0)],
        [(0, 0, [1, 2, 3]), (0, 0, [1, 2, 3])])
    assert opts.edge_type == D


def test_sibling_pairs_discard_merges_degenerate_edge_labels():
    for sp in (SP.DISCARD, SP.DISCARD_EXCESS):
        run(GraphOptions(D, DE.KEEP, DUP.KEEP, sp),
            [(0, 0, [1]), (0, 0, [2]), (0, 0, [3])],
            [(0, 0, [1, 2, 3]), (0, 0, [1, 2, 3]), (0, 0, [1, 2, 3])])


def test_keep_sibling_pairs():
    run(GraphOptions(D, DE.DISCARD, DUP.KEEP, SP.KEEP),
        [(0, 1), (1, 0)], [(0, 1), (1, 0)])


def test_merge_duplicate_sibling_pairs():
    run(GraphOptions(D, DE.DISCARD, DUP.MERGE, SP.KEEP),
        [(0, 1), (0, 1), (1, 0)], [(0, 1), (1, 0)])


def test_discard_sibling_pairs():
    opts = GraphOptions(D, DE.DISCARD, DUP.KEEP, SP.DISCARD)
    run(opts, [(0, 1), (1, 0)], [])
    run(opts, [(0, 1), (0, 1), (1, 0), (1, 0)], [])
    run(opts, [(0, 1), (0, 1), (0, 1), (1, 0)], [(0, 1), (0, 1)])
    run(opts, [(0, 1), (1, 0), (1, 0), (1, 0)], [(1, 0), (1, 0)])


def test_discard_sibling_pairs_merge_duplicates():
    opts = GraphOptions(D, DE.DISCARD, DUP.MERGE, SP.DISCARD)
    run(opts, [(0, 1), (0, 1), (1, 0), (1, 0)], [])
    run(opts, [(0, 1), (0, 1), (0, 1), (1, 0)], [(0, 1)])
    run(opts, [(0, 1), (1, 0), (1, 0), (1, 0)], [(1, 0)])


def test_discard_undirected_sibling_pairs():
    opts = GraphOptions(U, DE.DISCARD, DUP.KEEP, SP.DISCARD)
    run(opts, [(0, 1), (1, 0)], [(0, 1), (1, 0)])
    run(opts, [(0, 1), (0, 1), (1, 0), (1, 0)], [])
    run(opts, [(0, 1), (0, 1), (0, 1), (1, 0), (1, 0), (1, 0)],
        [(0, 1), (1, 0)])


def test_discard_excess_sibling_pairs():
    opts = GraphOptions(D, DE.DISCARD, DUP.KEEP, SP.DISCARD_EXCESS)
    run(opts, [(0, 1), (1, 0)], [(0, 1), (1, 0)])
    run(opts, [(0, 1), (0, 1), (1, 0), (1, 0)], [(0, 1), (1, 0)])
    run(opts, [(0, 1), (0, 1), (0, 1), (1, 0)], [(0, 1), (0, 1)])
    run(opts, [(0, 1), (1, 0), (1, 0), (1, 0)], [(1, 0), (1, 0)])


def test_discard_excess_sibling_pairs_merge_duplicates():
    opts = GraphOptions(D, DE.DISCARD, DUP.MERGE, SP.DISCARD_EXCESS)
    run(opts, [(0, 1), (0, 1), (1, 0), (1, 0)], [(0, 1), (1, 0)])
    run(opts, [(0, 1), (0, 1), (0, 1), (1, 0)], [(0, 1)])
    run(opts, [(0, 1), (1, 0), (1, 0), (1, 0)], [(1, 0)])


def test_discard_excess_undirected_sibling_pairs():
    opts = GraphOptions(U, DE.DISCARD, DUP.KEEP, SP.DISCARD_EXCESS)
    run(opts, [(0, 1), (1, 0)], [(0, 1), (1, 0)])
    run(opts, [(0, 1), (0, 1), (1, 0), (1, 0)],
        [(0, 1), (0, 1), (1, 0), (1, 0)])
    run(opts, [(0, 1), (0, 1), (0, 1), (1, 0), (1, 0), (1, 0)],
        [(0, 1), (1, 0)])


def test_create_sibling_pairs():
    opts = GraphOptions(D, DE.DISCARD, DUP.KEEP, SP.CREATE)
    run(opts, [(0, 1)], [(0, 1), (1, 0)])
    opts = GraphOptions(D, DE.DISCARD, DUP.KEEP, SP.CREATE)
    run(opts, [(0, 1), (0, 1)], [(0, 1), (0, 1), (1, 0), (1, 0)])


def test_require_sibling_pairs():
    opts = GraphOptions(D, DE.DISCARD, DUP.KEEP, SP.REQUIRE)
    run(opts, [(0, 1), (1, 0)], [(0, 1), (1, 0)])
    opts = GraphOptions(D, DE.DISCARD, DUP.KEEP, SP.REQUIRE)
    run(opts, [(0, 1)], [(0, 1), (1, 0)],
        expected_error=MISSING_SIBLINGS)


def test_create_undirected_sibling_pairs():
    opts = GraphOptions(D, DE.DISCARD, DUP.KEEP, SP.CREATE)
    run(opts, [(0, 1), (1, 0)], [(0, 1), (1, 0)])
    assert opts.edge_type == D
    opts = GraphOptions(U, DE.DISCARD, DUP.KEEP, SP.CREATE)
    run(opts, [(0, 1), (0, 1), (1, 0), (1, 0)], [(0, 1), (1, 0)])
    assert opts.edge_type == D
    opts = GraphOptions(U, DE.DISCARD, DUP.KEEP, SP.CREATE)
    run(opts, [(0, 1), (0, 1), (0, 1), (1, 0), (1, 0), (1, 0)],
        [(0, 1), (0, 1), (1, 0), (1, 0)])
    assert opts.edge_type == D


def test_create_sibling_pairs_merge_duplicates():
    opts = GraphOptions(D, DE.DISCARD, DUP.MERGE, SP.CREATE)
    run(opts, [(0, 1)], [(0, 1), (1, 0)])
    opts = GraphOptions(D, DE.DISCARD, DUP.MERGE, SP.CREATE)
    run(opts, [(0, 1), (0, 1)], [(0, 1), (1, 0)])


def test_create_undirected_sibling_pairs_merge_duplicates():
    opts = GraphOptions(D, DE.DISCARD, DUP.MERGE, SP.CREATE)
    run(opts, [(0, 1), (1, 0)], [(0, 1), (1, 0)])
    assert opts.edge_type == D
    opts = GraphOptions(U, DE.DISCARD, DUP.MERGE, SP.CREATE)
    run(opts, [(0, 1), (0, 1), (0, 1), (1, 0), (1, 0), (1, 0)],
        [(0, 1), (1, 0)])
    assert opts.edge_type == D


def test_polygon_layer_options_match_snap_cleanup():
    """The snap pipeline's _drop_degeneracies implements exactly the
    S2PolygonLayer graph policy (DegenerateEdges.DISCARD +
    SiblingPairs.DISCARD): on closed chains with injected duplicate
    vertices and sibling spikes, the edge multiset process_edges keeps
    equals the edges of the cleaned ring."""
    import random

    from s2_geometry_kotlin_spark.kernel.builder_snap import \
        _drop_degeneracies

    rng = random.Random(11)
    for _ in range(50):
        m = rng.randrange(3, 9)
        ring = list(range(m))
        chain = []
        for v in ring:
            chain.append(v)
            roll = rng.random()
            if roll < 0.25:
                chain.append(v)              # duplicate vertex
            elif roll < 0.45:
                w = m + rng.randrange(3)
                chain.extend([w, v])         # sibling spike
        cleaned = _drop_degeneracies(chain)
        edges = [(chain[i], chain[(i + 1) % len(chain)])
                 for i in range(len(chain))]
        opts = GraphOptions(D, DE.DISCARD, DUP.KEEP, SP.DISCARD)
        kept, _ids, err = process_edges(opts, edges)
        assert err is None
        exp = sorted((cleaned[i], cleaned[(i + 1) % len(cleaned)])
                     for i in range(len(cleaned))) if cleaned else []
        assert sorted(kept) == exp, (chain, cleaned, kept)


# ---------------------------------------------------------------------------
# Assembly: directed loops and polylines
# ---------------------------------------------------------------------------

def test_get_directed_loops_simple():
    """Mirror of getDirectedLoopsDegenerateEdges (GraphUnitTest.kt:64):
    a degenerate edge, a square, and a sibling pair partition into
    simple loops of sizes 1, 4 and 2."""
    from s2_geometry_kotlin_spark.kernel.builder_graph import \
        get_directed_loops
    edges = [(9, 9),
             (0, 1), (1, 2), (2, 3), (3, 0),
             (5, 6), (6, 5)]
    loops = get_directed_loops(edges)
    assert sorted(len(l) for l in loops) == [1, 2, 4]
    # every edge used exactly once
    assert sorted(e for l in loops for e in l) == list(range(7))


def test_get_directed_loops_open_chain_raises():
    from s2_geometry_kotlin_spark.kernel.builder_graph import \
        get_directed_loops
    with pytest.raises(ValueError, match="open chain"):
        get_directed_loops([(0, 1), (1, 2)])


def test_build_polylines_paths():
    """Directed PATH semantics: interior vertices have in == out == 1;
    branches and chain ends split paths; an isolated degenerate edge is
    its own loop-path."""
    from s2_geometry_kotlin_spark.kernel.builder_graph import \
        build_polylines
    edges = [(5, 5), (0, 1), (1, 2), (2, 3), (2, 4)]
    got = build_polylines(edges, "path")
    assert sorted(map(tuple, got)) == sorted(
        [(1, 2), (3,), (4,), (0,)])


def test_build_polylines_walks_consume_all_edges_greedily():
    from s2_geometry_kotlin_spark.kernel.builder_graph import \
        build_polylines
    # vertex 1 has outdegree > indegree: one maximal walk takes all
    got = build_polylines([(0, 1), (1, 0), (1, 2)], "walk")
    assert got == [[1, 0, 2]]


def test_build_polylines_walks_splice_loops():
    """A leftover loop sharing a vertex with a walk is spliced into it
    (PolylineBuilder.maximizeWalk) instead of emitted standalone."""
    from s2_geometry_kotlin_spark.kernel.builder_graph import \
        build_polylines
    edges = [(0, 4), (0, 1), (1, 2), (2, 0), (3, 0)]
    got = build_polylines(edges, "walk")
    assert got == [[4, 1, 2, 3, 0]]
    # pure loops with no walk to join become closed walks
    got = build_polylines([(0, 1), (1, 0)], "walk")
    assert got == [[0, 1]]


# ---------------------------------------------------------------------------
# Property-based invariants (hypothesis)
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


if HAVE_HYP:
    edge_lists = st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)), max_size=24)

    def _counts(edges):
        from collections import Counter
        return Counter(edges)

    @given(edge_lists)
    @settings(max_examples=150, deadline=None)
    def test_sibling_discard_preserves_directed_imbalance(edges):
        """SiblingPairs.DISCARD (directed) keeps exactly the per-pair
        excess: count(a,b) - count(b,a) copies where positive, for
        non-degenerate edges."""
        opts = GraphOptions(D, DE.KEEP, DUP.KEEP, SP.DISCARD)
        kept, _ids, err = process_edges(opts, list(edges))
        assert err is None
        cin = _counts(e for e in edges if e[0] != e[1])
        kept_nondeg = _counts(e for e in kept if e[0] != e[1])
        for e, k in kept_nondeg.items():
            assert k == max(0, cin[e] - cin[(e[1], e[0])])
        for e, c in cin.items():
            if c > cin[(e[1], e[0])]:
                assert kept_nondeg[e] == c - cin[(e[1], e[0])]

    @given(edge_lists)
    @settings(max_examples=150, deadline=None)
    def test_create_makes_every_edge_have_a_sibling(edges):
        opts = GraphOptions(D, DE.KEEP, DUP.KEEP, SP.CREATE)
        kept, _ids, err = process_edges(opts, list(edges))
        assert err is None
        c = _counts(kept)
        for (a, b), k in c.items():
            if a != b:
                assert c[(b, a)] == k, (edges, kept)
        assert opts.edge_type == D

    @given(edge_lists)
    @settings(max_examples=150, deadline=None)
    def test_merge_yields_distinct_edges_with_union_ids(edges):
        ids = [[k] for k in range(len(edges))]
        opts = GraphOptions(D, DE.KEEP, DUP.MERGE, SP.KEEP)
        kept, kept_ids, err = process_edges(opts, list(edges), ids)
        assert err is None
        assert len(set(kept)) == len(kept)
        # every input id survives somewhere, attached to its own edge
        for e, i in zip(kept, kept_ids):
            for input_id in i:
                assert edges[input_id] == e
        assert sorted(x for i in kept_ids for x in i) == \
            sorted(range(len(edges)))


def test_assemble_polygon_discards_and_classifies_degeneracies():
    """End-to-end over the substrate: a square with an interior sibling
    spike and an exterior one.  The plain polygon layer discards both;
    the degeneracy-keeping layer keeps them (DISCARD_EXCESS) and the
    B5 finder classifies interior as hole, exterior as shell."""
    import numpy as np

    from s2_geometry_kotlin_spark.kernel import cellid as ck
    from s2_geometry_kotlin_spark.kernel.builder_graph import \
        assemble_polygon

    lls = [(-1, -1), (-1, 1), (1, 1), (1, -1),   # square 0..3
           (0.0, 0.0), (5.0, 5.0)]               # interior pt, exterior pt
    lat = np.array([p[0] for p in lls], dtype=np.float64)
    lon = np.array([p[1] for p in lls], dtype=np.float64)
    x, y, z = ck.latlng_deg_to_xyz(lat, lon)
    verts = np.stack([x, y, z], axis=1)
    edges = [(0, 1), (1, 2), (2, 3), (3, 0),
             (0, 4), (4, 0),    # interior spike (sibling pair)
             (2, 5), (5, 2)]    # exterior spike
    rings, degs = assemble_polygon(verts, edges)
    assert len(rings) == 1 and sorted(rings[0]) == [0, 1, 2, 3]
    assert degs == []
    rings, degs, kept = assemble_polygon(verts, edges,
                                         keep_degeneracies=True)
    assert len(rings) == 1 and sorted(rings[0]) == [0, 1, 2, 3]
    verdicts = {tuple(sorted(kept[d.edge_id])): d.is_hole for d in degs}
    assert verdicts == {(0, 4): True, (2, 5): False}
    assert len(degs) == 4  # both directions of both spikes


def _undirected(pairs):
    """Each undirected input edge -> a sibling pair of directed copies."""
    out = []
    for a, b in pairs:
        out.append((a, b))
        out.append((b, a))
    return out


def test_undirected_degenerate_paths_mirrors_reference():
    """getPolylinesUndirectedDegeneratePaths (GraphUnitTest.kt:138):
    shapes '1:1,1:1' + '0:0,0:0, 0:1,0:1, 0:2,0:2' + '1:1,1:1' yield 7
    paths.  Vertices: p (1:1) = 9; 0:0/0:1/0:2 = 0/1/2."""
    from s2_geometry_kotlin_spark.kernel.builder_graph import \
        build_polylines_undirected
    pairs = [(9, 9)] + [(0, 0), (0, 1), (1, 1), (1, 2), (2, 2)] + [(9, 9)]
    edges = _undirected(pairs)
    polylines = build_polylines_undirected(edges, "path")
    assert len(polylines) == 7
    # every undirected edge used exactly once
    assert sum(len(p) for p in polylines) == len(pairs)


def test_undirected_degenerate_walks_mirrors_reference():
    """getPolylinesUndirectedDegenerateWalks (GraphUnitTest.kt:154):
    the same graph assembles into 2 maximal walks of sizes 2 and 5."""
    from s2_geometry_kotlin_spark.kernel.builder_graph import \
        build_polylines_undirected
    pairs = [(9, 9)] + [(0, 0), (0, 1), (1, 1), (1, 2), (2, 2)] + [(9, 9)]
    edges = _undirected(pairs)
    polylines = build_polylines_undirected(edges, "walk")
    assert sorted(len(p) for p in polylines) == [2, 5]


def test_sibling_map_validates_balance():
    from s2_geometry_kotlin_spark.kernel.builder_graph import \
        _sibling_map
    assert _sibling_map([(0, 1), (1, 0)]) == [1, 0]
    with pytest.raises(ValueError, match="sibling-paired"):
        _sibling_map([(0, 1)])


def test_get_directed_loops_degenerate_edges():
    """GraphUnitTest.getDirectedLoopsDegenerateEdges (:64-87): with
    DISCARD_EXCESS/KEEP/KEEP, a degenerate loop, a square and an
    out-and-back sibling pair partition into simple loops of sizes
    1, 4 and 2."""
    from s2_geometry_kotlin_spark.kernel.builder_graph import (
        DegenerateEdges, DuplicateEdges, EdgeType, GraphOptions,
        SiblingPairs, get_directed_loops, process_edges)
    # vertex ids: 0 = 1:1; 1..4 = square corners; 5 = 0:3, 6 = 3:3
    edges = [(0, 0),
             (1, 2), (2, 3), (3, 4), (4, 1),
             (5, 6), (6, 5)]
    opts = GraphOptions(EdgeType.DIRECTED, DegenerateEdges.DISCARD_EXCESS,
                        DuplicateEdges.KEEP, SiblingPairs.KEEP)
    kept, _ids, err = process_edges(opts, edges)
    assert err is None
    loops = get_directed_loops(kept)
    sizes = sorted(len(lp) for lp in loops)
    assert sizes == [1, 2, 4]


def test_get_directed_components_degenerate_edges():
    """GraphUnitTest.getDirectedComponentsDegenerateEdges (:89-108):
    a degenerate edge and a square, with sibling pairs CREATEd, yield
    two components: [1 loop of 1 edge] and [2 loops of 4 edges]."""
    import numpy as np

    from s2_geometry_kotlin_spark.kernel import cellid as ck
    from s2_geometry_kotlin_spark.kernel.builder_graph import (
        DegenerateEdges, DuplicateEdges, EdgeType, GraphOptions,
        SiblingPairs, get_directed_components, process_edges)

    def pt(lat, lng):
        x, y, z = ck.latlng_deg_to_xyz(np.array([float(lat)]),
                                       np.array([float(lng)]))
        return np.array([x[0], y[0], z[0]])

    verts = np.array([pt(1, 1), pt(0, 0), pt(0, 2), pt(2, 2), pt(2, 0)])
    edges = [(0, 0), (1, 2), (2, 3), (3, 4), (4, 1)]
    opts = GraphOptions(EdgeType.DIRECTED, DegenerateEdges.DISCARD_EXCESS,
                        DuplicateEdges.MERGE, SiblingPairs.CREATE)
    kept, ids, _err = process_edges(opts, edges)
    from s2_geometry_kotlin_spark.kernel.builder_graph import NO_INPUT_ID
    min_ids = [min(s) if s else NO_INPUT_ID for s in ids]
    comps = get_directed_components(kept, verts, "KEEP",
                                    min_input_ids=min_ids)
    sizes = sorted(sorted(len(lp) for lp in c) for c in comps)
    assert sizes == [[1], [4, 4]]


def test_get_undirected_components_degenerate_edges():
    """GraphUnitTest.getUndirectedComponentsDegenerateEdges (:110-136):
    the same graph with undirected edges yields two components whose
    two complements each contain one loop (sizes 1 and 4)."""
    import numpy as np

    from s2_geometry_kotlin_spark.kernel import cellid as ck
    from s2_geometry_kotlin_spark.kernel.builder_graph import (
        DegenerateEdges, DuplicateEdges, EdgeType, GraphOptions,
        NO_INPUT_ID, SiblingPairs, get_undirected_components,
        process_edges)

    def pt(lat, lng):
        x, y, z = ck.latlng_deg_to_xyz(np.array([float(lat)]),
                                       np.array([float(lng)]))
        return np.array([x[0], y[0], z[0]])

    verts = np.array([pt(1, 1), pt(0, 0), pt(0, 2), pt(2, 2), pt(2, 0)])
    und = []
    ids = []
    k = 0
    for a, b in [(0, 0), (1, 2), (2, 3), (3, 4), (4, 1)]:
        und.append((a, b))
        ids.append([k])
        und.append((b, a))
        ids.append([])
        k += 1
    opts = GraphOptions(EdgeType.UNDIRECTED,
                        DegenerateEdges.DISCARD_EXCESS,
                        DuplicateEdges.KEEP, SiblingPairs.DISCARD_EXCESS)
    kept, kept_ids, _err = process_edges(opts, und, input_ids=ids)
    min_ids = [min(s) if s else NO_INPUT_ID for s in kept_ids]
    comps = get_undirected_components(kept, verts,
                                      min_input_ids=min_ids,
                                      loop_type="circuit")
    assert len(comps) == 2
    shapes = sorted(
        [sorted(len(lp) for lp in slot) for slot in c]
        for c in comps)
    assert shapes == [[[1], [1]], [[4], [4]]]
