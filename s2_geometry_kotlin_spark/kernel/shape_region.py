"""S2ShapeIndexRegion / S2ShapeIndexBufferedRegion equivalents over a
mixed-geometry collection (region/S2ShapeIndexRegion.kt,
region/S2ShapeIndexBufferedRegion.kt) — the region adapters that let
the C1/C2 RegionCoverer cover an arbitrary collection of points,
polylines and polygons (boolean_mixed.LaxGeometry here, where the
reference uses an S2ShapeIndex).

Semantics (S2ShapeIndexRegion.kt:60-75):
- containsCell: the cell lies entirely in the collection's
  2-dimensional interior (lower-dimensional shapes cannot contain a
  cell);
- mayIntersectCell: any shape of any dimension may intersect the cell
  (conservative true is allowed and only costs covering tightness).

The buffered variant expands the region by a radius: a cell may
intersect iff its distance to the collection is <= radius, and is
contained iff the FULL cell lies within the buffered set — decided
conservatively via the cell's circumscribed cap
(S2ShapeIndexBufferedRegion.kt:48-62: "the implementation is
approximate but conservative").
"""

from __future__ import annotations

import math

import numpy as np

from . import cellid as ck
from .boolean_mixed import LaxGeometry
from .edges import cell_edge_chord2, cell_point_chord2
from .regions import Cap, Cell, Loop, Polygon


def _chord2(r: float) -> float:
    s = math.sin(min(r, math.pi) / 2.0)
    return 4.0 * s * s


class GeometryRegion:
    """S2ShapeIndexRegion over a LaxGeometry collection."""

    def __init__(self, geom: LaxGeometry):
        self.geom = geom
        solid = [lo for lo in geom.loops if len(lo) >= 3]
        self.polygon = Polygon([Loop(np.asarray(lo)) for lo in solid]) \
            if solid else None
        self._edges = self._all_edges()

    def _all_edges(self):
        a, b = [], []
        for ln in self.geom.lines:
            a.extend(ln[:-1])
            b.extend(ln[1:])
        for lo in self.geom.loops:
            lo = np.asarray(lo)
            n = len(lo)
            if n == 1:
                continue
            for i in range(n):
                a.append(lo[i])
                b.append(lo[(i + 1) % n])
        if not a:
            return None
        return np.asarray(a), np.asarray(b)

    def cap_bound(self) -> Cap:
        pts = list(self.geom.points)
        for ln in self.geom.lines:
            pts.extend(ln)
        for lo in self.geom.loops:
            pts.extend(np.asarray(lo))
        if self.geom.full or not pts:
            return Cap(np.array([0.0, 0.0, 1.0]),
                       4.0 if self.geom.full else -1.0)
        pts = np.asarray(pts)
        c = pts.sum(axis=0)
        n = float(np.linalg.norm(c))
        if n == 0.0:
            return Cap(np.array([0.0, 0.0, 1.0]), 4.0)
        c = c / n
        d = pts - c
        r2 = float((d * d).sum(axis=1).max())
        # pad: the cap must cover edge interiors, which bulge at most
        # as far as the farthest endpoint on a geodesic < pi
        return Cap(c, min(4.0, r2 * 1.000001 + 1e-12))

    def contains_cell(self, cell: Cell) -> bool:
        if self.geom.full:
            return True
        if self.polygon is None:
            return False
        return self.polygon.contains_cell(cell)

    def may_intersect_cell(self, cell: Cell) -> bool:
        if self.geom.full:
            return True
        if self.polygon is not None and \
                self.polygon.may_intersect_cell(cell):
            return True
        for p in self.geom.points:
            if cell.contains_point(np.asarray(p)):
                return True
        if self._edges is not None:
            a, b = self._edges
            d2 = cell_edge_chord2(cell.id, a, b)
            if bool((d2 <= 0.0).any()):
                return True
        return False

    def contains_point(self, p: np.ndarray) -> bool:
        """Point membership in the collection's CLOSED point set (used
        by covering sanity checks)."""
        if self.geom.full:
            return True
        if self.polygon is not None and self.polygon.contains_point(p):
            return True
        if self._edges is not None:
            a, b = self._edges
            from .edges import point_edge_chord2
            if float(point_edge_chord2(p[None, :], a, b).min()) < 1e-24:
                return True
        return any(float(np.linalg.norm(np.asarray(q) - p)) < 1e-12
                   for q in self.geom.points)


class BufferedGeometryRegion:
    """S2ShapeIndexBufferedRegion: GeometryRegion expanded by
    `radius` radians.  mayIntersectCell is exact to the distance
    kernels; containsCell is conservative via the circumscribed cap
    (false negatives only cost covering tightness,
    S2ShapeIndexBufferedRegion.kt:48-62)."""

    def __init__(self, geom: LaxGeometry, radius: float):
        self.base = GeometryRegion(geom)
        self.radius = float(radius)

    def cap_bound(self) -> Cap:
        c = self.base.cap_bound()
        if c.is_empty():
            return c
        r = 2.0 * math.asin(min(1.0, math.sqrt(
            max(0.0, c.radius2)) / 2.0))
        return Cap(c.center, _chord2(min(math.pi, r + self.radius)))

    def _dist2_to_cell(self, cell: Cell) -> float:
        if self.base.geom.full:
            return 0.0
        best = 4.0
        g = self.base.geom
        if g.points:
            d2 = cell_point_chord2(np.array([cell.id], dtype=np.uint64),
                                   np.asarray(g.points))
            best = min(best, float(d2.min()))
        if self.base._edges is not None:
            a, b = self.base._edges
            best = min(best, float(cell_edge_chord2(cell.id, a, b).min()))
        if self.base.polygon is not None and \
                self.base.polygon.may_intersect_cell(cell):
            best = 0.0
        return best

    def may_intersect_cell(self, cell: Cell) -> bool:
        return self._dist2_to_cell(cell) <= _chord2(self.radius)

    def contains_cell(self, cell: Cell) -> bool:
        # conservative: the whole circumscribed cap of the cell lies
        # within the buffered set iff dist(center, geometry) +
        # cap_radius <= radius
        center = cell.center()
        g = self.base.geom
        if g.full:
            return True
        d2 = 4.0
        if g.points:
            pd = np.asarray(g.points) - center
            d2 = min(d2, float((pd * pd).sum(axis=1).min()))
        if self.base._edges is not None:
            from .edges import point_edge_chord2
            a, b = self.base._edges
            d2 = min(d2, float(
                point_edge_chord2(center[None, :], a, b).min()))
        if self.base.polygon is not None and \
                self.base.polygon.contains_point(center):
            d2 = 0.0
        d = 2.0 * math.asin(min(1.0, math.sqrt(max(0.0, d2)) / 2.0))
        r2 = 0.0
        for v in cell.vertices():
            dv = center - v
            r2 = max(r2, float(dv @ dv))
        cell_r = 2.0 * math.asin(min(1.0, math.sqrt(r2) / 2.0))
        return d + cell_r <= self.radius
