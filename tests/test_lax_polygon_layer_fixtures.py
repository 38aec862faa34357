"""Port of the reference lax-polygon-layer suite
(dilivia/s2/builder/layers/S2LaxPolygonLayerUnitTest.kt, directed
cases) against lax_polygon_layer
(s2_geometry_kotlin_spark/kernel/builder_graph.py).

Pins the four DegenerateBoundaries modes over normal loops, degenerate
point shells/holes, sibling-pair filaments (which must stay EMBEDDED in
their loop under KEEP — LoopType.CIRCUIT assembly), the full-polygon
predicate, and duplicate-edge merging that preserves degeneracies."""

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel.builder_graph import (
    FULL_LOOP, lax_polygon_layer)
from s2_geometry_kotlin_spark.kernel.textparser import parse_latlngs

ALL_MODES = ["DISCARD", "DISCARD_HOLES", "DISCARD_SHELLS", "KEEP"]


def ring_pts(text: str) -> np.ndarray:
    lls = parse_latlngs(text)
    lat = np.array([a for a, _ in lls])
    lng = np.array([b for _, b in lls])
    x, y, z = ck.latlng_deg_to_xyz(lat, lng)
    return np.stack([x, y, z], axis=1)


def parse_lax(text: str) -> list:
    """'' -> no loops; 'full' -> the zero-vertex full loop."""
    out = []
    for part in text.split(";"):
        part = part.strip()
        if not part:
            continue
        if part == "full":
            out.append(np.zeros((0, 3)))
        else:
            out.append(ring_pts(part))
    return out


def canon(ring) -> tuple:
    if isinstance(ring, str):
        return ("full",)
    if len(ring) == 0:
        return ("full",)
    tups = [tuple(v) for v in ring]
    best = None
    for r in range(len(tups)):
        rot = tuple(tups[r:] + tups[:r])
        if best is None or rot < best:
            best = rot
    return best


def run(input_str: str, mode: str) -> list:
    loops = parse_lax(input_str)
    is_full = any(len(lp) == 0 for lp in loops)
    return lax_polygon_layer(loops, mode, is_full_predicate=is_full)


def check(input_str: str, expected_str: str, mode: str):
    got = sorted((canon(r) for r in run(input_str, mode)), key=repr)
    want = sorted((canon(r) for r in parse_lax(expected_str)), key=repr)
    assert got == want, (mode, got, want)


def check_unchanged(s: str, mode: str):
    check(s, s, mode)


@pytest.mark.parametrize("mode", ALL_MODES)
def test_empty(mode):
    check_unchanged("", mode)


@pytest.mark.parametrize("mode", ALL_MODES)
def test_full(mode):
    check_unchanged("full", mode)


@pytest.mark.parametrize("mode", ALL_MODES)
def test_one_normal_shell(mode):
    check_unchanged("0:0, 0:1, 1:1", mode)


@pytest.mark.parametrize("mode", ALL_MODES)
def test_two_normal_shells_one_normal_hole(mode):
    # the second two loops are nested; lax polygons use REVERSED
    # orientation for holes
    check_unchanged("0:1, 1:1, 0:0; 3:3, 3:6, 6:6, 6:3; "
                    "4:4, 5:4, 5:5, 4:5", mode)


def test_all_degenerate_shells():
    for mode in ("KEEP", "DISCARD_HOLES"):
        check_unchanged("1:1; 2:2, 3:3", mode)
    for mode in ("DISCARD", "DISCARD_SHELLS"):
        check("1:1; 2:2, 3:3", "", mode)


def test_all_degenerate_holes():
    for mode in ("KEEP", "DISCARD_SHELLS"):
        check_unchanged("full; 1:1; 2:2, 3:3", mode)
    for mode in ("DISCARD", "DISCARD_HOLES"):
        check("full; 1:1; 2:2, 3:3", "full", mode)


def test_some_degenerate_shells():
    normal = "0:0, 0:9, 9:0; 1:1, 7:1, 1:7"
    inp = normal + "; 3:2; 2:2, 2:3"
    check_unchanged(inp, "KEEP")
    check_unchanged(inp, "DISCARD_HOLES")
    check(inp, normal, "DISCARD")
    check(inp, normal, "DISCARD_SHELLS")


def test_some_degenerate_holes():
    for mode in ("KEEP", "DISCARD_SHELLS"):
        check_unchanged("0:0, 0:9, 9:0; 1:1; 2:2, 3:3", mode)
    for mode in ("DISCARD", "DISCARD_HOLES"):
        check("0:0, 0:9, 9:0; 1:1; 2:2, 3:3", "0:0, 0:9, 9:0", mode)


def test_normal_and_degenerate_shells_and_holes():
    # two normal shells and one normal hole
    normal = ("0:0, 0:9, 9:9, 9:0; 0:10, 0:19, 9:19, 9:10; "
              "1:11, 8:11, 8:18, 1:18")
    # the same loops augmented with degenerate interior filaments
    # (holes); one filament joins the second shell and the hole into a
    # single loop
    normal_with_degen_holes = (
        "0:0, 0:9, 1:8, 1:7, 1:8, 0:9, 9:9, 9:0; "
        "0:10, 0:19, 9:19, 9:10, 0:10, 1:11, 8:11, 8:18, 1:18, 1:11")
    degen_shells = "0:9, 0:10; 2:12; 3:13, 3:14; 20:20; 10:0, 10:1"
    degen_holes = "2:5; 3:6, 3:7; 8:8"
    inp = f"{normal_with_degen_holes}; {degen_shells}; {degen_holes}"
    check(inp, normal, "DISCARD")
    check(inp, f"{normal}; {degen_shells}", "DISCARD_HOLES")
    check(inp, f"{normal_with_degen_holes}; {degen_holes}",
          "DISCARD_SHELLS")
    check(inp, inp, "KEEP")


def test_duplicate_input_edges():
    # duplicate edges must merge WITHOUT losing degeneracies
    loops = [ring_pts("0:0, 0:5, 5:5, 5:0"),
             ring_pts("0:0"), ring_pts("1:1"), ring_pts("1:1"),
             ring_pts("2:2, 2:3"), ring_pts("2:2, 2:3")]
    got = sorted(canon(r) for r in
                 lax_polygon_layer(loops, "KEEP"))
    want = sorted(canon(r) for r in
                  parse_lax("0:0, 0:5, 5:5, 5:0; 1:1; 2:2, 2:3"))
    assert got == want
