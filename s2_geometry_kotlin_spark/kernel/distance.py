"""Distance kernels (SURVEY.md §2.5 D1-D3).

All comparisons happen in squared-chord space (S1ChordAngle semantics,
dilivia/s2/S1ChordAngle.kt:48-75): dist2 = min(4, |x-y|^2), monotonic with
angle, no trig until the final conversion.

Vectorized numpy: points are (n,3) float64 arrays.
"""

from __future__ import annotations

import numpy as np


def chord2_between(ax, ay, az, bx, by, bz):
    """Squared chord length between unit vectors (element-wise)."""
    dx = ax - bx
    dy = ay - by
    dz = az - bz
    return np.minimum(4.0, dx * dx + dy * dy + dz * dz)


def chord2_points(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n,3) x (m,3) -> (n,m) squared chord distances."""
    # |a-b|^2 = 2 - 2 a.b for unit vectors; computed via dot for speed.
    # The subtraction quantizes below ~1e-15, so near-zero pairs are
    # recomputed with the exact difference form (S1ChordAngle.between
    # uses (x-y).norm2() for exactly this reason).
    d = 2.0 - 2.0 * (a @ b.T)
    small = d < 1e-12
    if small.any():
        ii, jj = np.nonzero(small)
        diff = a[ii] - b[jj]
        d[ii, jj] = np.einsum("ij,ij->i", diff, diff)
    return np.minimum(4.0, np.maximum(0.0, d))


def chord2_to_radians(d2):
    return 2.0 * np.arcsin(0.5 * np.sqrt(np.clip(d2, 0.0, 4.0)))


def radians_to_chord2(rad):
    s = np.sin(0.5 * np.minimum(np.asarray(rad, dtype=np.float64), np.pi))
    return 4.0 * s * s


# S2Earth.kt:49-116 — radius must match the reference for metric parity
EARTH_RADIUS_METERS = 6371010.0


def chord2_to_meters(d2):
    return chord2_to_radians(d2) * EARTH_RADIUS_METERS


def meters_to_chord2(m):
    return radians_to_chord2(np.asarray(m, dtype=np.float64) /
                             EARTH_RADIUS_METERS)


def to_longitude_radians(distance_rad: float, latitude_rad: float) -> float:
    """Longitude radians spanning `distance` at a latitude
    (S2Earth.kt:81-85): capped at 2*pi at/near the poles instead of
    dividing by ~0."""
    import math
    scalar = math.cos(latitude_rad)
    if scalar == 0.0:
        return 2.0 * math.pi
    return min(distance_rad / scalar, 2.0 * math.pi)


def initial_bearing_rad(lat1: float, lng1: float, lat2: float,
                        lng2: float) -> float:
    """Initial bearing from point 1 to point 2, radians clockwise from
    north (S2Earth.getInitialBearing, S2Earth.kt:92-100) — the scalar
    twin of functions.bearing_deg (the JVM Column used by the
    bearing_to_paris oracle row)."""
    import math
    cos_lat2 = math.cos(lat2)
    lat_diff = lat2 - lat1
    lng_diff = lng2 - lng1
    haversine = math.sin(0.5 * lng_diff) ** 2
    x = math.sin(lat_diff) + math.sin(lat1) * cos_lat2 * 2 * haversine
    y = math.sin(lng_diff) * cos_lat2
    return math.atan2(y, x)


def point_edge_chord2(points: np.ndarray, a: np.ndarray,
                      b: np.ndarray) -> np.ndarray:
    """Min squared-chord distance from each point (m,3) to each edge
    (n,3)x(n,3) -> (m,n).

    Interior-vs-endpoint logic follows S2EdgeDistances.updateMinDistance
    (dilivia/s2/edge/S2EdgeDistances.kt:71-118): the interior distance
    applies when the point projects onto the edge's interior, i.e. when
    both (X . (N x A)) and ((B x N) . X) conditions hold; computed here
    via the standard perpendicular test.
    """
    m = len(points)
    n = len(a)
    # edge normals
    nrm = np.cross(a, b)                       # (n,3)
    nrm2 = np.einsum("ij,ij->i", nrm, nrm)     # (n,)
    # whether X projects inside the edge: sign((N x A) . X) > 0 and
    # sign((B x N) . X) > 0  (equivalent to the reference's interior test)
    na = np.cross(nrm, a)                      # (n,3)
    bn = np.cross(b, nrm)                      # (n,3)
    inside = (points @ na.T > 0) & (points @ bn.T > 0)   # (m,n)

    # interior distance: sin^2(theta) = (X.N)^2 / |N|^2;
    # chord2 = 2 * (1 - sqrt(1 - sin2)) for theta <= pi/2
    xn = points @ nrm.T                        # (m,n)
    with np.errstate(divide="ignore", invalid="ignore"):
        sin2 = np.where(nrm2[None, :] > 0.0, (xn * xn) / nrm2[None, :], 0.0)
    sin2 = np.clip(sin2, 0.0, 1.0)
    # stable form of 2*(1 - sqrt(1 - sin2)): the naive difference
    # underflows to 0 for distances below ~sqrt(eps) radians
    interior_d2 = 2.0 * sin2 / (1.0 + np.sqrt(1.0 - sin2))

    # endpoint distances
    da = chord2_points(points, a)              # (m,n)
    db = chord2_points(points, b)
    end_d2 = np.minimum(da, db)

    # the interior formula gives the distance to the closest of the two
    # intersection points of the perpendicular; valid only when the point
    # is on the near side (angle <= pi/2 to the closest arc point), which
    # `inside` plus min-with-endpoints handles conservatively
    return np.where(inside, np.minimum(interior_d2, end_d2), end_d2)
