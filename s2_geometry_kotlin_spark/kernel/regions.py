"""Scalar region types implementing the S2Region contract used by the
coverer (SURVEY.md §1.2): cap_bound, may_intersect_cell, contains_cell,
contains_point.

These run driver-side over polygon *layers* (small); the per-page hot path
never touches them — it goes through the exploded covering DataFrame and
the vectorized PIP/distance kernels.

Reference semantics:
- S2Cap:        dilivia/s2/region/S2Cap.kt:77-485
- S2LatLngRect: dilivia/s2/region/S2LatLngRect.kt
- S2Loop:       dilivia/s2/region/S2Loop.kt (bound: 925-966)
- S2Polygon:    dilivia/s2/region/S2Polygon.kt
- S2Cell:       dilivia/s2/region/S2Cell.kt (contains: 528-542)
"""

from __future__ import annotations

import math

import numpy as np

from . import cellid as ck
from . import distance as dist
from . import pip
from . import predicates as pred

DBL_EPS = 2.220446049250313e-16


# ---------------------------------------------------------------------------
# Cell geometry helper (scalar)
# ---------------------------------------------------------------------------

_UNORM = [
    lambda u: np.array([u, -1.0, 0.0]),
    lambda u: np.array([1.0, u, 0.0]),
    lambda u: np.array([1.0, 0.0, u]),
    lambda u: np.array([-u, 0.0, 1.0]),
    lambda u: np.array([0.0, -u, 1.0]),
    lambda u: np.array([0.0, -1.0, -u]),
]
_VNORM = [
    lambda v: np.array([-v, 0.0, 1.0]),
    lambda v: np.array([0.0, -v, 1.0]),
    lambda v: np.array([0.0, -1.0, -v]),
    lambda v: np.array([v, -1.0, 0.0]),
    lambda v: np.array([1.0, v, 0.0]),
    lambda v: np.array([1.0, 0.0, v]),
]


class Cell:
    """Scalar S2Cell view over a cell id."""

    def __init__(self, cid: int):
        self.id = cid
        self.face = cid >> 61
        self.level = ck.sc_level(cid)
        self.u_lo, self.u_hi, self.v_lo, self.v_hi = ck.sc_bound_uv(cid)
        self._vertices: np.ndarray | None = None

    def vertices(self) -> np.ndarray:
        if self._vertices is None:
            out = np.empty((4, 3), dtype=np.float64)
            corners = ((self.u_lo, self.v_lo), (self.u_hi, self.v_lo),
                       (self.u_hi, self.v_hi), (self.u_lo, self.v_hi))
            for k, (u, v) in enumerate(corners):
                x, y, z = ck.sc_face_uv_to_xyz(self.face, u, v)
                n = math.sqrt(x * x + y * y + z * z)
                out[k] = (x / n, y / n, z / n)
            self._vertices = out
        return self._vertices

    def center(self) -> np.ndarray:
        return np.array(ck.sc_center_xyz(self.id))

    def edge_raw(self, k: int) -> np.ndarray:
        """Inward-facing normal of edge k (S2Cell.kt:129-135)."""
        if k == 0:
            return _VNORM[self.face](self.v_lo)
        if k == 1:
            return _UNORM[self.face](self.u_hi)
        if k == 2:
            return -_VNORM[self.face](self.v_hi)
        return -_UNORM[self.face](self.u_lo)

    def contains_point(self, p: np.ndarray) -> bool:
        """Closed-set uv test expanded by eps (S2Cell.kt:528-542)."""
        # project p onto this cell's face; None if on back hemisphere
        x, y, z = float(p[0]), float(p[1]), float(p[2])
        if (x, y, z, -x, -y, -z)[self.face] <= 0:
            return False
        # project onto this face (validFaceXyzToUv table, divide by the raw
        # signed component)
        denom = (x, y, z)[self.face % 3]
        u_num = {0: y, 1: -x, 2: -x, 3: z, 4: z, 5: -y}[self.face]
        v_num = {0: z, 1: z, 2: -y, 3: y, 4: -x, 5: -x}[self.face]
        uu, vv = u_num / denom, v_num / denom
        return (self.u_lo - DBL_EPS <= uu <= self.u_hi + DBL_EPS and
                self.v_lo - DBL_EPS <= vv <= self.v_hi + DBL_EPS)

    def children(self) -> list["Cell"]:
        return [Cell(ck.sc_child(self.id, pos)) for pos in range(4)]

    def rect_bound(self) -> "LatLngRect":
        verts = self.vertices()
        lat = [math.atan2(v[2], math.hypot(v[0], v[1])) for v in verts]
        lng = [math.atan2(v[1], v[0]) for v in verts]
        if self.level == 0:
            # face cells: fixed bounds (S2Cell.getRectBound level-0 cases)
            pole_min_lat = math.asin(math.sqrt(1.0 / 3.0)) - 2 * DBL_EPS
            bounds = {
                0: LatLngRect(-math.pi / 4, math.pi / 4,
                              -math.pi / 4, math.pi / 4),
                1: LatLngRect(-math.pi / 4, math.pi / 4,
                              math.pi / 4, 3 * math.pi / 4),
                2: LatLngRect(pole_min_lat, math.pi / 2,
                              -math.pi, math.pi),
                3: LatLngRect(-math.pi / 4, math.pi / 4,
                              3 * math.pi / 4, -3 * math.pi / 4),
                4: LatLngRect(-math.pi / 4, math.pi / 4,
                              -3 * math.pi / 4, -math.pi / 4),
                5: LatLngRect(-math.pi / 2, -pole_min_lat,
                              -math.pi, math.pi),
            }
            return bounds[self.face]
        # non-face cells never contain poles; vertex extremes + 2eps slack
        lat_lo = min(lat) - 2 * DBL_EPS
        lat_hi = max(lat) + 2 * DBL_EPS
        # longitude: cells at level>=1 span < 180 deg
        i = LngInterval.from_point(float(lng[0]))
        for t in lng[1:]:
            i = i.add_point(float(t))
        i = i.expanded(2 * DBL_EPS)
        return LatLngRect(max(lat_lo, -math.pi / 2),
                          min(lat_hi, math.pi / 2), i.lo, i.hi)


# ---------------------------------------------------------------------------
# S1 longitude interval (wrapping)
# ---------------------------------------------------------------------------

class LngInterval:
    """S1Interval semantics (dilivia/s2/S1Interval.kt): [lo, hi] going CCW;
    lo > hi means the interval wraps across +-pi.  Full is [-pi, pi]."""

    def __init__(self, lo: float, hi: float):
        self.lo = lo
        self.hi = hi

    @staticmethod
    def empty() -> "LngInterval":
        return LngInterval(math.pi, -math.pi)

    @staticmethod
    def full() -> "LngInterval":
        return LngInterval(-math.pi, math.pi)

    @staticmethod
    def from_point(p: float) -> "LngInterval":
        if p == -math.pi:
            p = math.pi
        return LngInterval(p, p)

    def is_empty(self) -> bool:
        return self.lo == math.pi and self.hi == -math.pi

    def is_full(self) -> bool:
        return self.lo == -math.pi and self.hi == math.pi

    def is_inverted(self) -> bool:
        return self.lo > self.hi

    def length(self) -> float:
        length = self.hi - self.lo
        if length >= 0:
            return length
        length += 2 * math.pi
        return length if length > 0 else -1.0

    def contains(self, p: float) -> bool:
        if p == -math.pi:
            p = math.pi
        if self.is_inverted():
            return (p >= self.lo or p <= self.hi) and not self.is_empty()
        return self.lo <= p <= self.hi

    def intersection(self, o: "LngInterval") -> "LngInterval":
        """S1Interval.intersection (S1Interval.kt): the wedge algebra
        used by subsampleVertices.  When the intersection has two
        components, the shorter operand is returned (the reference's
        documented tie-break)."""
        if o.is_empty():
            return LngInterval.empty()
        if self.is_full():
            return LngInterval(o.lo, o.hi)
        if self.contains(o.lo):
            if self.contains(o.hi):
                if o.length() < self.length():
                    return LngInterval(o.lo, o.hi)
                return LngInterval(self.lo, self.hi)
            return LngInterval(o.lo, self.hi)
        if self.contains(o.hi):
            return LngInterval(self.lo, o.hi)
        if o.contains(self.lo):
            return LngInterval(self.lo, self.hi)
        return LngInterval.empty()

    def contains_interval(self, o: "LngInterval") -> bool:
        if o.is_empty():
            return True
        if self.is_full():
            return True
        if self.is_inverted():
            if o.is_inverted():
                return o.lo >= self.lo and o.hi <= self.hi
            # reference guards with `&& !isEmpty()`: the empty interval
            # (pi, -pi) is inverted and must not contain the point
            # interval at exactly pi (S1Interval.contains semantics)
            return (o.lo >= self.lo or o.hi <= self.hi) and \
                not self.is_empty()
        if o.is_inverted():
            return self.is_full()
        return o.lo >= self.lo and o.hi <= self.hi

    def intersects(self, o: "LngInterval") -> bool:
        if self.is_empty() or o.is_empty():
            return False
        if self.is_inverted():
            return o.is_inverted() or o.lo <= self.hi or o.hi >= self.lo
        if o.is_inverted():
            return o.lo <= self.hi or o.hi >= self.lo
        return o.lo <= self.hi and o.hi >= self.lo

    @staticmethod
    def from_point_pair(p1: float, p2: float) -> "LngInterval":
        """Minimal interval containing both points (length <= pi)."""
        if p1 == -math.pi:
            p1 = math.pi
        if p2 == -math.pi:
            p2 = math.pi
        if _pos_angle(p2 - p1) <= math.pi:
            return LngInterval(p1, p2)
        return LngInterval(p2, p1)

    def union_interval(self, y: "LngInterval") -> "LngInterval":
        """Exact S1Interval union (S1Interval.kt union semantics)."""
        if y.is_empty():
            return self
        if self.is_empty():
            return y
        if self.contains(y.lo):
            if self.contains(y.hi):
                if self.contains_interval(y):
                    return self
                return LngInterval.full()
            return LngInterval(self.lo, y.hi)
        if self.contains(y.hi):
            return LngInterval(y.lo, self.hi)
        if y.contains_interval(self):
            return y
        dlo = _pos_angle(self.lo - y.hi)
        dhi = _pos_angle(y.lo - self.hi)
        if dlo < dhi:
            return LngInterval(y.lo, self.hi)
        return LngInterval(self.lo, y.hi)

    def add_point(self, p: float) -> "LngInterval":
        if p == -math.pi:
            p = math.pi
        if self.is_empty():
            return LngInterval.from_point(p)
        if self.contains(p):
            return self
        # extend on the side with smaller resulting length
        dlo = _pos_angle(self.lo - p)
        dhi = _pos_angle(p - self.hi)
        if dlo < dhi:
            return LngInterval(p, self.hi)
        return LngInterval(self.lo, p)

    def union(self, o: "LngInterval") -> "LngInterval":
        if o.is_empty():
            return self
        if self.is_empty():
            return o
        out = self.add_point(o.lo)
        return out.add_point(o.hi)

    def expanded(self, margin: float) -> "LngInterval":
        """S1Interval.expanded (S1Interval.kt:398-413) incl. negative
        margins (shrink, used by the polyline simplifier's avoidDisc)."""
        if margin >= 0:
            if self.is_empty() or margin == 0:
                return self
            if self.length() + 2 * margin + 2 * DBL_EPS >= 2 * math.pi:
                return LngInterval.full()
        else:
            if self.is_full():
                return self
            if self.length() + 2 * margin - 2 * DBL_EPS <= 0:
                return LngInterval.empty()
        lo = _wrap_angle(self.lo - margin)
        hi = _wrap_angle(self.hi + margin)
        if lo <= -math.pi:
            lo = math.pi
        return LngInterval(lo, hi)

    def fast_contains(self, p: float) -> bool:
        """S1Interval.fastContains: containment without the ±pi point
        normalization (assumes p in [-pi, pi])."""
        if self.is_inverted():
            return (p >= self.lo or p <= self.hi) and not self.is_empty()
        return self.lo <= p <= self.hi

    def intersection(self, y: "LngInterval") -> "LngInterval":
        """S1Interval.intersection (S1Interval.kt:461-489): the SHORTER
        of the two originals when the intersection would be two disjoint
        arcs."""
        if y.is_empty():
            return LngInterval.empty()
        if self.fast_contains(y.lo):
            if self.fast_contains(y.hi):
                return y if y.length() < self.length() else self
            return LngInterval(y.lo, self.hi)
        if self.fast_contains(y.hi):
            return LngInterval(self.lo, y.hi)
        if y.fast_contains(self.lo):
            return self
        return LngInterval.empty()


def _pos_angle(a: float) -> float:
    a = math.fmod(a, 2 * math.pi)
    return a + 2 * math.pi if a < 0 else a


def _wrap_angle(a: float) -> float:
    a = math.fmod(a, 2 * math.pi)
    if a > math.pi:
        a -= 2 * math.pi
    if a < -math.pi:
        a += 2 * math.pi
    return a


# ---------------------------------------------------------------------------
# Regions
# ---------------------------------------------------------------------------

class Cap:
    """Spherical disc: center xyz + squared-chord radius
    (S2Cap.kt:77; dist2 < 0 => empty, dist2 == 4 => full)."""

    def __init__(self, center: np.ndarray, radius2: float):
        self.center = np.asarray(center, dtype=np.float64)
        self.radius2 = radius2

    @staticmethod
    def from_latlng_radius_deg(lat: float, lon: float,
                               radius_deg: float) -> "Cap":
        x, y, z = ck.latlng_deg_to_xyz(np.array([lat]), np.array([lon]))
        r2 = float(dist.radians_to_chord2(math.radians(radius_deg)))
        return Cap(np.array([x[0], y[0], z[0]]), r2)

    def is_empty(self) -> bool:
        return self.radius2 < 0

    def is_full(self) -> bool:
        return self.radius2 >= 4.0

    def contains_point(self, p: np.ndarray) -> bool:
        d = self.center - p
        return float(d @ d) <= self.radius2

    def add_point(self, p: np.ndarray) -> "Cap":
        """S2Cap.addPoint (S2Cap.kt:224-235): grow to include p."""
        if self.is_empty():
            return Cap(np.asarray(p, dtype=np.float64), 0.0)
        d = self.center - np.asarray(p, dtype=np.float64)
        return Cap(self.center, max(self.radius2,
                                    min(4.0, float(d @ d))))

    def expanded(self, distance_rad: float) -> "Cap":
        """S2Cap.expanded (S2Cap.kt:262-266): all points within
        `distance_rad` of this cap; the empty cap stays empty."""
        assert distance_rad >= 0.0
        if self.is_empty():
            return Cap(self.center, -1.0)
        r = float(dist.chord2_to_radians(max(0.0, self.radius2)))
        return Cap(self.center,
                   float(dist.radians_to_chord2(r + distance_rad)))

    def radius_angle(self) -> float:
        """Opening angle in radians (S2Cap.kt radius); -1 when empty."""
        if self.is_empty():
            return -1.0
        return float(dist.chord2_to_radians(min(4.0, max(0.0,
                                                         self.radius2))))

    def add_cap(self, other: "Cap") -> "Cap":
        """S2Cap.addCap (S2Cap.kt:243-253): grow the radius about this
        cap's FIXED center until `other` is covered (union() may move
        the center; addCap never does).  The distance is rounded up so
        containment actually holds."""
        if self.is_empty():
            return other
        if other.is_empty():
            return self
        d = self.center - other.center
        need = float(dist.chord2_to_radians(min(4.0, float(d @ d)))) + \
            other.radius_angle()
        need2 = float(dist.radians_to_chord2(min(math.pi, need)))
        need2 = min(4.0, need2 * (1.0 + 4 * DBL_EPS) + 4 * DBL_EPS ** 2)
        return Cap(self.center, max(self.radius2, need2))

    def contains_cap(self, other: "Cap") -> bool:
        """S2Cap.contains(S2Cap) (S2Cap.kt:200-206): every point of
        `other` is inside this cap."""
        if self.is_full() or other.is_empty():
            return True
        d = self.center - other.center
        sep = float(dist.chord2_to_radians(min(4.0, float(d @ d))))
        return self.radius_angle() >= sep + other.radius_angle()

    def union(self, other: "Cap") -> "Cap":
        """S2Cap.union (S2Cap.kt:274-295): smallest cap enclosing both."""
        if self.radius2 < other.radius2:
            return other.union(self)
        if self.is_full() or other.is_empty():
            return self
        this_r = float(dist.chord2_to_radians(max(0.0, self.radius2)))
        other_r = float(dist.chord2_to_radians(max(0.0, other.radius2)))
        d = self.center - other.center
        distance = float(dist.chord2_to_radians(
            min(4.0, float(d @ d))))
        if this_r >= distance + other_r:
            return self
        result_r = 0.5 * (distance + this_r + other_r)
        from . import edges as ek
        result_center = ek.interpolate_at_distance(
            self.center[None, :], other.center[None, :],
            0.5 * (distance - this_r + other_r))[0]
        return Cap(result_center,
                   float(dist.radians_to_chord2(result_r)))

    def rect_bound(self) -> "LatLngRect":
        """S2Cap.rectBound (S2Cap.kt:340-388): lat band +- cap angle;
        lng full when a pole is inside, else +- asin(sin a / cos lat)."""
        if self.is_empty():
            return LatLngRect.empty()
        c = self.center
        center_lat = math.atan2(float(c[2]),
                                math.hypot(float(c[0]), float(c[1])))
        center_lng = math.atan2(float(c[1]), float(c[0]))
        cap_angle = float(dist.chord2_to_radians(max(0.0, self.radius2)))
        all_longitudes = False
        lat_lo = center_lat - cap_angle
        if lat_lo <= -math.pi / 2:
            lat_lo = -math.pi / 2
            all_longitudes = True
        lat_hi = center_lat + cap_angle
        if lat_hi >= math.pi / 2:
            lat_hi = math.pi / 2
            all_longitudes = True
        lng_lo, lng_hi = -math.pi, math.pi
        if not all_longitudes:
            sin_a = math.sin(cap_angle)
            sin_c = math.cos(center_lat)
            if sin_a <= sin_c:
                angle_a = math.asin(sin_a / sin_c)
                lng_lo = math.remainder(center_lng - angle_a, 2 * math.pi)
                lng_hi = math.remainder(center_lng + angle_a, 2 * math.pi)
        return LatLngRect(lat_lo, lat_hi, lng_lo, lng_hi)

    def complement(self) -> "Cap":
        if self.is_full():
            return Cap(-self.center, -1.0)
        if self.is_empty():
            return Cap(-self.center, 4.0)
        return Cap(-self.center, 4.0 - self.radius2)

    def _sin2(self) -> float:
        d2 = self.radius2
        return d2 * (1.0 - 0.25 * d2)

    def _intersects(self, cell: Cell, vertices: np.ndarray) -> bool:
        """Cap intersects cell, given no cell vertex is inside the cap
        (S2Cap.kt:419-466)."""
        if self.radius2 >= 2.0:  # >= 90 degrees
            return False
        if self.is_empty():
            return False
        if cell.contains_point(self.center):
            return True
        sin2_angle = self._sin2()
        for k in range(4):
            edge = cell.edge_raw(k)
            dot = float(self.center @ edge)
            if dot > 0:
                continue
            if dot * dot > sin2_angle * float(edge @ edge):
                return False
            # great circle through edge intersects cap; check the closest
            # point on the edge lies within the edge's arc
            dir_ = np.cross(edge, self.center)
            if float(dir_ @ vertices[k]) < 0 and \
                    float(dir_ @ vertices[(k + 1) & 3]) > 0:
                return True
        return False

    def contains_cell(self, cell: Cell) -> bool:
        vertices = cell.vertices()
        for k in range(4):
            if not self.contains_point(vertices[k]):
                return False
        return not self.complement()._intersects(cell, vertices)

    def may_intersect_cell(self, cell: Cell) -> bool:
        vertices = cell.vertices()
        for k in range(4):
            if self.contains_point(vertices[k]):
                return True
        return self._intersects(cell, vertices)

    def cap_bound(self) -> "Cap":
        return self


class LatLngRect:
    """lat interval x wrapping lng interval, radians."""

    def __init__(self, lat_lo: float, lat_hi: float,
                 lng_lo: float, lng_hi: float):
        self.lat_lo = lat_lo
        self.lat_hi = lat_hi
        self.lng = LngInterval(lng_lo, lng_hi)

    @staticmethod
    def from_degrees(lat_lo, lat_hi, lng_lo, lng_hi) -> "LatLngRect":
        return LatLngRect(math.radians(lat_lo), math.radians(lat_hi),
                          math.radians(lng_lo), math.radians(lng_hi))

    @staticmethod
    def empty() -> "LatLngRect":
        r = LatLngRect(1.0, -1.0, 0.0, 0.0)
        r.lng = LngInterval.empty()
        return r

    @staticmethod
    def full() -> "LatLngRect":
        r = LatLngRect(-math.pi / 2, math.pi / 2, 0.0, 0.0)
        r.lng = LngInterval.full()
        return r

    def is_empty(self) -> bool:
        return self.lat_lo > self.lat_hi or self.lng.is_empty()

    def contains_latlng(self, lat: float, lng: float) -> bool:
        return (self.lat_lo <= lat <= self.lat_hi and
                self.lng.contains(lng))

    def contains_point(self, p: np.ndarray) -> bool:
        lat = math.atan2(float(p[2]),
                         math.sqrt(float(p[0]) ** 2 + float(p[1]) ** 2))
        lng = math.atan2(float(p[1]), float(p[0]))
        return self.contains_latlng(lat, lng)

    def contains_rect(self, o: "LatLngRect") -> bool:
        if o.is_empty():
            return True
        return (self.lat_lo <= o.lat_lo and self.lat_hi >= o.lat_hi and
                self.lng.contains_interval(o.lng))

    def intersects_rect(self, o: "LatLngRect") -> bool:
        if self.is_empty() or o.is_empty():
            return False
        return (self.lat_lo <= o.lat_hi and o.lat_lo <= self.lat_hi and
                self.lng.intersects(o.lng))

    def union(self, o: "LatLngRect") -> "LatLngRect":
        if self.is_empty():
            return o
        if o.is_empty():
            return self
        r = LatLngRect(min(self.lat_lo, o.lat_lo),
                       max(self.lat_hi, o.lat_hi), 0, 0)
        r.lng = self.lng.union(o.lng)
        return r

    def get_vertex(self, k: int) -> tuple[float, float]:
        """(lat, lng) of vertex k CCW from lower-left."""
        lat = self.lat_lo if k in (0, 1) else self.lat_hi
        lng = self.lng.lo if k in (0, 3) else self.lng.hi
        return lat, lng

    def expanded_by_distance(self, distance_rad: float) -> "LatLngRect":
        """S2LatLngRect.expandedByDistance, positive case
        (S2LatLngRect.kt:435-447): union of the rect with the rect
        bounds of caps centered on each vertex."""
        assert distance_rad >= 0.0
        r2 = float(dist.radians_to_chord2(distance_rad))
        out = self
        for k in range(4):
            lat, lng = self.get_vertex(k)
            x, y, z = ck.latlng_deg_to_xyz(
                np.array([math.degrees(lat)]),
                np.array([math.degrees(lng)]))
            cap = Cap(np.array([x[0], y[0], z[0]]), r2)
            out = out.union(cap.rect_bound())
        return out

    def get_distance_latlng(self, lat: float, lng: float) -> float:
        """S2LatLngRect.getDistance(S2LatLng) (S2LatLngRect.kt:620-650):
        radians from the point to the rect (0 when inside)."""
        assert not self.is_empty()
        if self.lng.contains(lng):
            # directly north/south of the lat band
            return max(0.0, max(self.lat_lo - lat, lat - self.lat_hi))
        # nearest meridian boundary of the lng interval
        nearest_lng = self.lng.lo
        d_lo = abs(_wrap_angle(lng - self.lng.lo))
        d_hi = abs(_wrap_angle(lng - self.lng.hi))
        if d_hi < d_lo:
            nearest_lng = self.lng.hi
        # distance from point to the boundary segment of that meridian
        # between lat_lo and lat_hi, via the point-edge kernel
        px, py, pz = ck.latlng_deg_to_xyz(
            np.array([math.degrees(lat)]), np.array([math.degrees(lng)]))
        ax, ay, az = ck.latlng_deg_to_xyz(
            np.array([math.degrees(self.lat_lo)]),
            np.array([math.degrees(nearest_lng)]))
        bx, by, bz = ck.latlng_deg_to_xyz(
            np.array([math.degrees(self.lat_hi)]),
            np.array([math.degrees(nearest_lng)]))
        p = np.array([[px[0], py[0], pz[0]]])
        a = np.array([[ax[0], ay[0], az[0]]])
        b = np.array([[bx[0], by[0], bz[0]]])
        d2 = dist.point_edge_chord2(p, a, b)[0, 0]
        return float(dist.chord2_to_radians(d2))

    def contains_cell(self, cell: Cell) -> bool:
        return self.contains_rect(cell.rect_bound())

    def may_intersect_cell(self, cell: Cell) -> bool:
        # conservative: rect-bound intersection (slightly loose coverings
        # are still correct; the exact verify step rejects outsiders)
        return self.intersects_rect(cell.rect_bound())

    def cap_bound(self) -> Cap:
        """S2LatLngRect.getCapBound port (poleward cap vs mid cap)."""
        if self.is_empty():
            return Cap(np.array([1.0, 0.0, 0.0]), -1.0)
        if self.lat_lo + self.lat_hi < 0:
            pole_z, pole_angle = -1.0, math.pi / 2 + self.lat_hi
        else:
            pole_z, pole_angle = 1.0, math.pi / 2 - self.lat_lo
        pole_cap = Cap(np.array([0.0, 0.0, pole_z]),
                       float(dist.radians_to_chord2(pole_angle)))
        if self.lng.length() < 2 * math.pi - 1e-15 and \
                not self.lng.is_inverted():
            mid_lng = 0.5 * (self.lng.lo + self.lng.hi)
            mid_lat = 0.5 * (self.lat_lo + self.lat_hi)
            x, y, z = ck.latlng_deg_to_xyz(
                np.array([math.degrees(mid_lat)]),
                np.array([math.degrees(mid_lng)]))
            center = np.array([x[0], y[0], z[0]])
            r2 = 0.0
            for la in (self.lat_lo, self.lat_hi):
                for ln in (self.lng.lo, self.lng.hi):
                    cx, cy, cz = ck.latlng_deg_to_xyz(
                        np.array([math.degrees(la)]),
                        np.array([math.degrees(ln)]))
                    d = center - np.array([cx[0], cy[0], cz[0]])
                    r2 = max(r2, float(d @ d))
            mid_cap = Cap(center, r2 * (1 + 1e-14))
            if mid_cap.radius2 < pole_cap.radius2:
                return mid_cap
        return pole_cap


def edge_lat_lng_bound(a: np.ndarray,
                       b: np.ndarray) -> tuple:
    """(lat_lo, lat_hi, LngInterval) bound of geodesic edge AB — the
    S2LatLngRectBounder per-edge step (S2LatLngRectBounder.kt addPoint/
    addLatLng): vertex extremes, shorter-arc longitude pair, plus the
    edge-interior latitude extreme of the great circle (asin(|N_xy|/|N|)
    at +-(-Nx*Nz, -Ny*Nz, Nxy^2)) when that point lies within the arc.
    Returned WITHOUT the 4-eps conservative expansion (the loop bound
    adds it once over all edges)."""
    lat_a = math.atan2(float(a[2]),
                       math.hypot(float(a[0]), float(a[1])))
    lat_b = math.atan2(float(b[2]),
                       math.hypot(float(b[0]), float(b[1])))
    lat_lo, lat_hi = min(lat_a, lat_b), max(lat_a, lat_b)
    li = LngInterval.from_point_pair(
        math.atan2(float(a[1]), float(a[0])),
        math.atan2(float(b[1]), float(b[0])))
    nrm = np.cross(a, b)
    n2 = float(nrm @ nrm)
    nxy = math.hypot(float(nrm[0]), float(nrm[1]))
    if n2 > 0.0 and nxy > 0.0:
        # atan2(|N_xy|, |N_z|) is well-conditioned at BOTH extremes;
        # asin(|N_xy|/|N|) cannot resolve latitudes within ~1e-8 of the
        # pole (caught by the ported rectBounderMaxLatitudeRandom sweep)
        max_lat = math.atan2(nxy, abs(float(nrm[2])))
        p_ext = np.array([-nrm[0] * nrm[2], -nrm[1] * nrm[2],
                          nxy * nxy])
        p_ext /= np.linalg.norm(p_ext)
        for cand, lat_cand in ((p_ext, max_lat), (-p_ext, -max_lat)):
            if float(np.cross(a, cand) @ nrm) >= 0 and \
                    float(np.cross(cand, b) @ nrm) >= 0:
                lat_lo = min(lat_lo, lat_cand)
                lat_hi = max(lat_hi, lat_cand)
    # nxy == 0 with n2 > 0 means the great circle IS the equator
    # (normal = +-z): the edge's latitude extremes are its vertices,
    # already covered.  (A former elif here tried to handle "meridian
    # through a pole", but such edges have nrm[2] == 0 with nxy > 0 and
    # are handled by the main branch; the elif actually matched
    # equatorial edges, whose degenerate containment test 0 >= 0 always
    # passed and stretched every equator edge's bound to both poles —
    # ADVICE r5.)
    return lat_lo, lat_hi, li


class Loop:
    """Single ring, CCW interior-left (S2Loop semantics)."""

    def __init__(self, vertices: np.ndarray):
        self.vertices = np.asarray(vertices, dtype=np.float64)
        self.origin_inside = pip.compute_origin_inside(self.vertices)
        self._bound: LatLngRect | None = None

    @staticmethod
    def from_latlng_text(text: str) -> "Loop":
        pts = []
        for tok in text.split(","):
            lat, lng = tok.strip().split(":")
            x, y, z = ck.latlng_deg_to_xyz(np.array([float(lat)]),
                                           np.array([float(lng)]))
            pts.append([x[0], y[0], z[0]])
        return Loop(np.array(pts, dtype=np.float64))

    def is_empty_or_full(self) -> bool:
        """Canonical sentinel loops are exactly ONE vertex
        (S2Loop.isEmptyOrFull is `numVertices == 1`); origin_inside
        distinguishes empty from full.  A 2-vertex loop is malformed
        input, not a sentinel — classifying it here would make the
        "empty" loop contained by everything (ADVICE r4)."""
        return len(self.vertices) == 1

    def is_full(self) -> bool:
        return self.is_empty_or_full() and bool(self.origin_inside)

    def is_empty(self) -> bool:
        return self.is_empty_or_full() and not self.origin_inside

    def contains_point(self, p: np.ndarray) -> bool:
        return bool(pip.loop_contains_points(
            self.vertices, np.asarray(p)[None, :], self.origin_inside)[0])

    def contains_points(self, pts: np.ndarray) -> np.ndarray:
        return pip.loop_contains_points(self.vertices, pts,
                                        self.origin_inside)

    def rect_bound(self) -> LatLngRect:
        """Conservative bound: per-edge lat/lng extremes + pole checks
        (S2Loop.initBound, S2Loop.kt:925-966)."""
        if self._bound is not None:
            return self._bound
        n = len(self.vertices)
        if n < 3:
            if self.origin_inside:  # full loop
                b = LatLngRect(-math.pi / 2, math.pi / 2, -math.pi, math.pi)
            else:
                b = LatLngRect.empty()
            self._bound = b
            return b
        v = self.vertices
        lat_lo, lat_hi = math.pi, -math.pi
        li = LngInterval.empty()
        for i in range(n):
            elo, ehi, eli = edge_lat_lng_bound(v[i], v[(i + 1) % n])
            lat_lo = min(lat_lo, elo)
            lat_hi = max(lat_hi, ehi)
            li = li.union_interval(eli)
        lat_lo -= 4 * DBL_EPS
        lat_hi += 4 * DBL_EPS
        li = li.expanded(4 * DBL_EPS)
        b = LatLngRect(max(lat_lo, -math.pi / 2),
                       min(lat_hi, math.pi / 2), li.lo, li.hi)
        # pole handling (S2Loop.kt:946-966)
        if self.contains_point(np.array([0.0, 0.0, 1.0])):
            b = LatLngRect(b.lat_lo, math.pi / 2, -math.pi, math.pi)
        if b.lng.is_full() and \
                self.contains_point(np.array([0.0, 0.0, -1.0])):
            b.lat_lo = -math.pi / 2
        self._bound = b
        return b

    def _boundary_crosses_cell(self, cell: Cell) -> bool:
        """True if any loop edge may cross any cell edge — vectorized
        triage over all (loop edge x cell edge) pairs; uncertain pairs
        (including shared vertices) count as crossing, which is the
        conservative direction for both contains_cell (false negatives
        only cost covering tightness) and may_intersect_cell."""
        cv = cell.vertices()
        a = self.vertices
        b = np.roll(a, -1, axis=0)
        c = cv
        d = np.roll(cv, -1, axis=0)
        n_ab = np.cross(a, b)                    # (n,3)
        n_cd = np.cross(c, d)                    # (4,3)
        t = pred.triage_sign_dets
        acb = -t(n_ab @ c.T)                     # (n,4) -sign(a,b,c)
        bda = t(n_ab @ d.T)                      # sign(a,b,d)
        cbd = -t(b @ n_cd.T)                     # -sign(c,d,b)
        dac = t(a @ n_cd.T)                      # sign(c,d,a)
        crossing = (bda == acb) & (cbd == acb) & (dac == acb) & (acb != 0)
        uncertain = (acb == 0) | (bda == 0) | (cbd == 0) | (dac == 0)
        return bool((crossing | uncertain).any())

    def contains_cell(self, cell: Cell) -> bool:
        bound = self.rect_bound()
        if not bound.contains_rect(cell.rect_bound()):
            # cheap reject is conservative-safe for contains
            if not bound.intersects_rect(cell.rect_bound()):
                return False
        cv = cell.vertices()
        if not self.contains_points(cv).all():
            return False
        if self._boundary_crosses_cell(cell):
            return False
        # guard the loop-inside-cell case
        return not cell.contains_point(self.vertices[0])

    def may_intersect_cell(self, cell: Cell) -> bool:
        if not self.rect_bound().intersects_rect(cell.rect_bound()):
            return False
        cv = cell.vertices()
        if self.contains_points(cv).any():
            return True
        if cell.contains_point(self.vertices[0]):
            return True
        return self._boundary_crosses_cell(cell)

    def cap_bound(self) -> Cap:
        return self.rect_bound().cap_bound()


class CellRegion:
    """A single cell as an S2Region (S2Cell.kt:510-542)."""

    def __init__(self, cid: int):
        self.cell = Cell(cid)
        self.id = cid

    def contains_cell(self, other: Cell) -> bool:
        return ck.sc_range_min(self.id) <= other.id <= ck.sc_range_max(self.id)

    def may_intersect_cell(self, other: Cell) -> bool:
        return (ck.sc_range_min(other.id) <= ck.sc_range_max(self.id) and
                ck.sc_range_max(other.id) >= ck.sc_range_min(self.id))

    def contains_point(self, p: np.ndarray) -> bool:
        return self.cell.contains_point(p)

    def cap_bound(self) -> Cap:
        center = self.cell.center()
        r2 = 0.0
        for v in self.cell.vertices():
            d = center - v
            r2 = max(r2, float(d @ d))
        return Cap(center, r2 * (1 + 4 * DBL_EPS))


class Polygon:
    """Multi-loop polygon; containment = xor over loops
    (S2Polygon.kt:1357-1376).

    Loops are NORMALIZED + RE-ORIENTED on construction following the
    reference's initOriented (S2Polygon.kt:279-343):

    1. remember which input loops contain the fixed S2 origin;
    2. invert any loop whose curvature is negative (near-zero curvature:
       invert iff it contains the origin), so every stored loop encloses
       at most half the sphere (S2Polygon.kt:83-84);
    3. if the normalized xor region's origin-containment disagrees with
       the origin-containment the caller's loop set implied (step 5 of
       initOriented, S2Polygon.kt:340-342), the whole polygon is
       complemented via the ``inverted`` parity bit — so a single shell
       that legitimately encloses MORE than half the sphere round-trips
       instead of being silently replaced by its complement.
    """

    def __init__(self, loops: list[Loop]):
        from . import measures
        contained_origin: list[bool] = []
        normed = []
        for lp in loops:
            contained_origin.append(bool(lp.origin_inside))
            n = len(lp.vertices)
            if n >= 3:
                angle = measures.loop_curvature(lp.vertices)
                max_err = 9.73 * DBL_EPS * n  # S2LoopMeasures.kt:303,324
                if abs(angle) > max_err:
                    invert = angle < 0
                else:
                    invert = bool(lp.origin_inside)
            else:
                invert = False
            normed.append(Loop(lp.vertices[::-1].copy()) if invert else lp)
        self.loops = normed
        # initOriented steps 4-5: originLoop = deepest loop containing
        # the origin, else a TOP-LEVEL SHELL (the reference's loop(0) —
        # initNested orders loops parents-first, so its loop(0) is a
        # depth-0 shell; our loops keep caller order, so select by
        # depth); polygon xor-parity at the origin vs what the caller's
        # orientation of that loop implied.
        self.inverted = False
        if normed:
            polygon_contains_origin = False
            candidates = []
            for i, lp in enumerate(normed):
                if lp.origin_inside:
                    polygon_contains_origin ^= True
                    candidates.append(i)
            if not candidates and not any(contained_origin):
                # fast path (the common all-shells-away-from-origin
                # case): no orientation evidence involves the origin,
                # so the polygon is never the complement
                return
            from .polygon_relations import loop_depths
            depths = loop_depths(self)
            if candidates:
                origin_idx = max(candidates, key=lambda i: depths[i])
            else:
                origin_idx = depths.index(min(depths))
            if contained_origin[origin_idx] != polygon_contains_origin:
                self.inverted = True

    def is_valid(self) -> bool:
        """No self-intersections, cross-loop crossings, duplicate
        vertices or shared edges (S2Polygon.findValidationError via the
        crossing-pairs scanner, kernel/validation.py)."""
        from .validation import find_validation_error
        return find_validation_error(
            [lp.vertices for lp in self.loops]) is None

    def complement(self) -> "Polygon":
        """The complementary region (S2Polygon.initToComplement): same
        stored loops, flipped xor-parity bit — containment and bounds
        invert, boundaries coincide."""
        q = Polygon.__new__(Polygon)
        q.loops = self.loops
        q.inverted = not self.inverted
        return q

    def contains_point(self, p: np.ndarray) -> bool:
        inside = self.inverted
        for lp in self.loops:
            inside ^= lp.contains_point(p)
        return inside

    def contains_points(self, pts: np.ndarray) -> np.ndarray:
        out = np.full(len(pts), self.inverted, dtype=bool)
        for lp in self.loops:
            out ^= lp.contains_points(pts)
        return out

    def rect_bound(self) -> LatLngRect:
        if self.inverted:
            return LatLngRect.full()
        # bound of shell loops (depth 0); conservative: union of all loops
        b = LatLngRect.empty()
        for lp in self.loops:
            b = b.union(lp.rect_bound())
        return b

    def contains_cell(self, cell: Cell) -> bool:
        if len(self.loops) == 1 and not self.inverted:
            return self.loops[0].contains_cell(cell)
        # all cell vertices inside, no loop boundary crossing, polygon
        # does not sit inside the cell
        cv = cell.vertices()
        if not self.contains_points(cv).all():
            return False
        for lp in self.loops:
            if lp._boundary_crosses_cell(cell):
                return False
            if cell.contains_point(lp.vertices[0]):
                return False
        return True

    def may_intersect_cell(self, cell: Cell) -> bool:
        cv = cell.vertices()
        if self.contains_points(cv).any():
            return True
        for lp in self.loops:
            if cell.contains_point(lp.vertices[0]):
                return True
            if lp._boundary_crosses_cell(cell):
                return True
        return False

    def cap_bound(self) -> Cap:
        return self.rect_bound().cap_bound()
