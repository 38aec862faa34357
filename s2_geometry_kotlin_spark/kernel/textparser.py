"""S2TextParser (dilivia/s2/S2TextParser.kt:46-145) — the human-readable
fixture notation used throughout the reference's test suite:

- points / loops / polylines: "lat:lng, lat:lng, ..."
- polygons: loops separated by ';' (holes in any winding; Polygon
  normalizes), "" = empty, "full" = full
- cell ids: "f/0123..." debug strings (face then child positions)
- cell unions: comma-separated debug strings
"""

from __future__ import annotations

import numpy as np

from . import cellid as ck
from .polyline import Polyline
from .regions import Loop, Polygon


def make_point(text: str) -> np.ndarray:
    lat, lng = (float(t) for t in text.split(":"))
    x, y, z = ck.latlng_deg_to_xyz(np.array([lat]), np.array([lng]))
    return np.array([x[0], y[0], z[0]])


def parse_latlngs(text: str) -> list[tuple[float, float]]:
    out = []
    for tok in text.split(","):
        tok = tok.strip()
        if not tok:
            continue
        lat, lng = tok.split(":")
        out.append((float(lat), float(lng)))
    return out


def make_loop(text: str) -> Loop:
    """S2TextParser.makeLoop; 'empty'/'full' specials use the reference's
    single-vertex encodings (z = +-1)."""
    if text == "empty":
        return Loop(np.array([[0.0, 0.0, 1.0]]))
    if text == "full":
        return Loop(np.array([[0.0, 0.0, -1.0]]))
    return Loop.from_latlng_text(text)


def make_polyline(text: str) -> Polyline:
    return Polyline.from_latlng_text(text)


def make_polygon(text: str) -> Polygon:
    """Loops separated by ';'.  Winding is normalized by Polygon
    (S2Polygon init inverts loops enclosing more than half the sphere)."""
    loops = [make_loop(part.strip()) for part in text.split(";")
             if part.strip()]
    return Polygon(loops)


def make_cellid(text: str) -> int:
    """Debug string 'f/0123...' -> uint64 id (S2CellId.fromDebugString)."""
    out = ck.from_debug_string([text])
    cid = int(out[0])
    if cid == 0:
        raise ValueError(f"invalid cell debug string: {text!r}")
    return cid


def make_cell_union(text: str) -> list[int]:
    """Comma-separated debug strings -> normalized cell union."""
    from .coverer import normalize
    return normalize([make_cellid(tok.strip())
                      for tok in text.split(",") if tok.strip()])


def _points_of(text: str) -> np.ndarray:
    lls = parse_latlngs(text)
    lat = np.array([t[0] for t in lls])
    lng = np.array([t[1] for t in lls])
    x, y, z = ck.latlng_deg_to_xyz(lat, lng)
    return np.stack([x, y, z], axis=1)


def make_index(text: str):
    """S2TextParser.makeIndex (S2TextParser.kt:170-204): the
    'points # polylines # polygons' notation of the reference's
    boolean-operation fixtures — shapes split on '|', lax-polygon loops
    split on ';', 'full' = the full polygon.  Returns a
    boolean_mixed.LaxGeometry."""
    from .boolean_mixed import LaxGeometry
    parts = text.split("#")
    if len(parts) != 3:
        raise ValueError(f"makeIndex needs 'p # l # poly': {text!r}")
    geom = LaxGeometry()
    for tok in parts[0].split("|"):
        tok = tok.strip()
        if tok:
            geom.points.append(make_point(tok))
    for tok in parts[1].split("|"):
        tok = tok.strip()
        if tok:
            geom.lines.append(_points_of(tok))
    for shape in parts[2].split("|"):
        shape = shape.strip()
        if not shape:
            continue
        if shape == "full":
            geom.full = True
            geom.full_count += 1
            continue
        for lptxt in shape.split(";"):
            lptxt = lptxt.strip()
            if lptxt:
                geom.loops.append(_points_of(lptxt))
    return geom


def index_edge_multisets(text: str) -> dict:
    """Expected-side of the parity harness: parse a makeIndex string
    and return its per-dimension sorted directed-edge multiset, the
    IndexMatchingLayer comparison form
    (S2BooleanOperationUnitTest.kt:54-100)."""
    from .boolean_mixed import MixedResult, _emit_geometry, _Operand, \
        MixedOptions
    geom = make_index(text)
    res = MixedResult()

    class _Raw:
        pass

    raw = _Raw()
    raw.points = list(geom.points)
    raw.lines = list(geom.lines)
    raw.loops = list(geom.loops)
    raw.full = geom.full
    _emit_geometry(res, raw)
    return {d: res.multiset(d) for d in (0, 1, 2)}
