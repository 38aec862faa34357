"""Port of the reference min-distance-target suite
(dilivia/s2/index/S2MinDistanceTargetsUnitTest.kt) against the distance
kernels (point/edge/cell chord distances) and PIP containment.

Two behaviors are pinned:
- updateMinDistance returns true only on STRICT improvement — our
  kernels must return bit-identical distances on repeated evaluation
  for every target/geometry combination;
- visitContainingShapes reduces every target to point-containment
  probes (edge midpoint, cell center, one chain start per connected
  component, reference point for full polygons) visited in shape-id
  order with early termination.
"""

import math

import numpy as np

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel.edges import (
    cell_edge_chord2, cell_point_chord2, edge_edge_chord2,
    point_edge_chord2_pairwise)
from s2_geometry_kotlin_spark.kernel.pip import polygon_contains_points
from s2_geometry_kotlin_spark.kernel.textparser import (
    make_point, parse_latlngs)


def pts(text: str) -> np.ndarray:
    lls = parse_latlngs(text)
    lat = np.array([a for a, _ in lls])
    lng = np.array([b for _, b in lls])
    x, y, z = ck.latlng_deg_to_xyz(lat, lng)
    return np.stack([x, y, z], axis=1)


def leaf_of(text: str) -> int:
    p = make_point(text)
    return int(ck.from_xyz(np.array([p[0]]), np.array([p[1]]),
                           np.array([p[2]]))[0])


class MinDist:
    """S2MinDistance: an accumulator updated only on strict decrease."""

    def __init__(self):
        self.d2 = math.inf

    def update(self, d2: float) -> bool:
        if d2 < self.d2:
            self.d2 = d2
            return True
        return False


EDGE = pts("0:-1, 0:1")
CELL0 = leaf_of("0:0")


def _pt_edge2(p, a, b) -> float:
    return float(point_edge_chord2_pairwise(p[None, :], a[None, :],
                                            b[None, :])[0])


def test_point_target_update_min_distance_strictness():
    p = make_point("1:0")
    dist = MinDist()
    assert dist.update(_pt_edge2(p, EDGE[0], EDGE[1]))
    assert not dist.update(_pt_edge2(p, EDGE[0], EDGE[1]))
    dist = MinDist()
    assert dist.update(float(np.asarray(
        cell_point_chord2([CELL0], p[None, :])).ravel()[0]))
    assert not dist.update(float(np.asarray(
        cell_point_chord2([CELL0], p[None, :])).ravel()[0]))


def test_edge_target_update_min_distance_strictness():
    a, b = make_point("1:0"), make_point("1:1")
    dist = MinDist()
    d2 = float(edge_edge_chord2(a[None, :], b[None, :],
                                EDGE[0][None, :], EDGE[1][None, :])[0])
    assert dist.update(d2)
    assert not dist.update(float(edge_edge_chord2(
        a[None, :], b[None, :], EDGE[0][None, :], EDGE[1][None, :])[0]))
    dist = MinDist()

    def cell_edge(cid, a, b):
        return float(cell_edge_chord2(cid, a[None, :], b[None, :])[0])

    assert dist.update(cell_edge(CELL0, a, b))
    assert not dist.update(cell_edge(CELL0, a, b))


def test_cell_target_update_min_distance_strictness():
    cell1 = leaf_of("0:1")
    dist = MinDist()
    d2 = float(cell_edge_chord2(cell1, EDGE[0][None, :],
                                EDGE[1][None, :])[0])
    assert dist.update(d2)
    assert not dist.update(float(cell_edge_chord2(
        cell1, EDGE[0][None, :], EDGE[1][None, :])[0]))
    from s2_geometry_kotlin_spark.kernel.edges import cell_cell_chord2
    dist = MinDist()
    assert dist.update(float(cell_cell_chord2(cell1, CELL0)))
    assert not dist.update(float(cell_cell_chord2(cell1, CELL0)))


# ---------------------------------------------------------------------------
# visitContainingShapes
# ---------------------------------------------------------------------------

class Shape:
    def __init__(self, dim: int, data):
        self.dim = dim
        self.data = data  # points array / polyline array / list of loops

    def contains(self, p: np.ndarray) -> bool:
        if self.dim < 2:
            return False
        loops = self.data
        if loops == "full":
            return True
        if loops == "empty":
            return False
        return bool(polygon_contains_points(loops, p[None, :])[0])

    def component_starts(self):
        """One representative vertex per connected component (chain
        starts); None entries mean 'use the reference point' (full)."""
        if self.dim == 0:
            return [self.data[k] for k in range(len(self.data))]
        if self.dim == 1:
            return [self.data[0]]
        if self.data == "full":
            return ["full"]
        if self.data == "empty":
            return []
        return [lp[0] for lp in self.data]


def parse_index(text: str) -> list[Shape]:
    parts = text.split("#")
    shapes: list[Shape] = []
    pt_part = parts[0].strip()
    if pt_part:
        shapes.append(Shape(0, pts(", ".join(
            tok.strip() for tok in pt_part.split("|") if tok.strip()))))
    for tok in parts[1].split("|"):
        tok = tok.strip()
        if tok:
            shapes.append(Shape(1, pts(tok)))
    for tok in parts[2].split("|"):
        tok = tok.strip()
        if not tok:
            continue
        if tok in ("full", "empty"):
            shapes.append(Shape(2, tok))
        else:
            shapes.append(Shape(2, [pts(lp.strip())
                                    for lp in tok.split(";")]))
    return shapes


def visit_containing_shapes(index: list[Shape],
                            probe_points: list[np.ndarray],
                            max_shapes: int) -> list[int]:
    """Visit (in shape-id order, per probe) the shapes containing each
    probe point, stopping once max_shapes distinct ids are collected."""
    ids: set[int] = set()
    for p in probe_points:
        for sid, shape in enumerate(index):
            if shape.contains(p):
                ids.add(sid)
                if len(ids) >= max_shapes:
                    return sorted(ids)
    return sorted(ids)


INDEX1 = "1:1 # 1:1, 2:2 # 0:0, 0:3, 3:0 | 6:6, 6:9, 9:6 | 0:0, 0:4, 4:0"
INDEX2 = ("1:1 # 1:1, 2:2 # 0:0, 0:3, 3:0 | 6:6, 6:9, 9:6 "
          "| -1:-1, -1:5, 5:-1")


def test_point_target_visit_containing_shapes():
    index = parse_index(INDEX1)
    probes = [make_point("1:1")]
    got1 = visit_containing_shapes(index, probes, 1)
    assert len(got1) == 1 and set(got1) <= {2, 4}
    assert visit_containing_shapes(index, probes, 5) == [2, 4]


def test_edge_target_visit_containing_shapes():
    index = parse_index(INDEX1)
    a, b = make_point("1:2"), make_point("2:1")
    mid = a + b
    mid /= np.linalg.norm(mid)
    got1 = visit_containing_shapes(index, [mid], 1)
    assert len(got1) == 1 and set(got1) <= {2, 4}
    assert visit_containing_shapes(index, [mid], 5) == [2, 4]


def test_cell_target_visit_containing_shapes():
    index = parse_index(INDEX2)
    cid = leaf_of("1:1")
    center = np.array(ck.sc_center_xyz(cid))
    got1 = visit_containing_shapes(index, [center], 1)
    assert len(got1) == 1 and set(got1) <= {2, 4}
    assert visit_containing_shapes(index, [center], 5) == [2, 4]
    # a larger cell: the reference probes its center
    big = ck.sc_parent(cid, 5)
    center5 = np.array(ck.sc_center_xyz(big))
    assert visit_containing_shapes(index, [center5], 5) == [2, 4]


def test_cell_union_target_visit_containing_shapes():
    index = parse_index(INDEX2)
    c1 = np.array(ck.sc_center_xyz(leaf_of("1:1")))
    c2 = np.array(ck.sc_center_xyz(leaf_of("7:7")))
    got1 = visit_containing_shapes(index, [c1, c2], 1)
    assert len(got1) == 1 and set(got1) <= {2, 3, 4}
    assert visit_containing_shapes(index, [c1, c2], 5) == [2, 3, 4]


def test_shape_index_target_visit_containing_shapes():
    index = parse_index(
        "1:1 | 4:4 | 7:7 | 10:10 # 1:1, 1:2 | 4:4, 4:5 | 7:7, 7:8 "
        "| 10:10, 10:11 # 0:0, 0:3, 3:0 | 3:3, 3:6, 6:3 | 6:6, 6:9, 9:6 "
        "| 9:9, 9:12, 12:9")
    target = parse_index(
        "1:1 # 4:5, 5:4 # 20:20, 20:21, 21:20; 10:10, 10:11, 11:10")
    probes = []
    for shape in target:
        probes.extend(p for p in shape.component_starts()
                      if not isinstance(p, str))
    assert visit_containing_shapes(index, probes, 5) == [5, 6, 8]


def test_shape_index_target_empty_and_full():
    index = parse_index("# # empty | full")
    # point target: only the full polygon contains it
    assert visit_containing_shapes(index, [make_point("1:1")], 5) == [1]
    # full-polygon target: its reference point is contained -> probe it
    full_target = parse_index("# # full")
    probes = [make_point("0:0")]  # any point works for a full target
    assert full_target[0].contains(probes[0])
    assert visit_containing_shapes(index, probes, 5) == [1]
    # empty-polygon target: no connected components, no probes
    empty_target = parse_index("# # empty")
    assert empty_target[0].component_starts() == []
    assert visit_containing_shapes(index, [], 5) == []
