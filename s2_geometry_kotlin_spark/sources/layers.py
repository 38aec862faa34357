"""Deterministic polygon layers (the broadcast/join side).

A small "admin"-like layer built from regular loops around the hot cities
(sources/pages.py CITIES) at several radii, plus reference fixture loops
(arctic, antimeridian diamond) — exercising hot-cell skew, pole handling,
and date-line wrap in the spatial join.

Regular loops are constructed like the reference's
S2Loop.makeRegularLoop: n vertices at angular radius r around a center,
CCW (interior = the cap around the center).
"""

from __future__ import annotations

import math

import numpy as np

from ..kernel import cellid as ck
from ..kernel.regions import Loop, Polygon
from .pages import CITIES


def _rotate(p: np.ndarray, axis: np.ndarray, angle: float) -> np.ndarray:
    """Rodrigues rotation of p about unit axis."""
    c, s = math.cos(angle), math.sin(angle)
    return (p * c + np.cross(axis, p) * s + axis * float(axis @ p) * (1 - c))


def regular_loop_vertices(lat_deg: float, lon_deg: float,
                          radius_deg: float, nv: int) -> np.ndarray:
    """CCW ring of nv vertices at angular radius around (lat, lon)."""
    x, y, z = ck.latlng_deg_to_xyz(np.array([lat_deg]), np.array([lon_deg]))
    center = np.array([x[0], y[0], z[0]])
    # start vector: any unit vector orthogonal to center
    tmp = np.array([0.0, 0.0, 1.0])
    if abs(float(center @ tmp)) > 0.9:
        tmp = np.array([1.0, 0.0, 0.0])
    east = np.cross(tmp, center)
    east /= np.linalg.norm(east)
    r = math.radians(radius_deg)
    start = _rotate(center, east, r)
    out = np.empty((nv, 3), dtype=np.float64)
    for k in range(nv):
        v = _rotate(start, center, 2 * math.pi * k / nv)
        out[k] = v / np.linalg.norm(v)
    return out


def fixture_layer() -> list[tuple[str, int, Polygon]]:
    """(layer, polygon_id, Polygon) rows — deterministic."""
    out: list[tuple[str, int, Polygon]] = []
    pid = 0
    # city polygons at two scales: a tight ring (hot-cell heavy) and a
    # wide ring (many cells, mixes uniform pages in)
    for idx, (lat_mic, lon_mic) in enumerate(CITIES):
        lat, lon = lat_mic / 1e6, lon_mic / 1e6
        out.append(("city_core", pid,
                    Polygon([Loop(regular_loop_vertices(lat, lon, 0.05, 12))])))
        pid += 1
        out.append(("city_metro", pid,
                    Polygon([Loop(regular_loop_vertices(lat, lon, 2.0, 16))])))
        pid += 1
    # a polygon with a hole: wide Paris ring minus the core
    shell = Loop(regular_loop_vertices(48.8566, 2.3522, 5.0, 16))
    hole = Loop(regular_loop_vertices(48.8566, 2.3522, 1.0, 12)[::-1].copy())
    out.append(("city_donut", pid, Polygon([shell, hole])))
    pid += 1
    # reference fixture loops (FIXTURES.md §2)
    out.append(("fixture", pid,
                Polygon([Loop.from_latlng_text("80:-150, 80:-30, 80:90")])))
    pid += 1  # arctic_80 (pole)
    out.append(("fixture", pid,
                Polygon([Loop.from_latlng_text(
                    "0:178, -1:180, 0:-179, 1:-180")])))
    pid += 1  # loop_a (antimeridian diamond)
    out.append(("fixture", pid,
                Polygon([Loop.from_latlng_text(
                    "-20:150, -20:-70, 0:70, 10:-150, 10:70, -10:-70")])))
    pid += 1  # candy_cane
    return out
