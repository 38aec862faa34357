"""B1 as a Spark operator: snap-rounded layer ingestion feeding the
spatial join.

S2Builder snap rounding (builder/S2Builder.kt; kernel/builder_snap.py)
is a LAYER-PREP step like the B3 booleans: layers are broadcast-sized
by design, so the construction runs driver-side and the snapped result
flows through the standard covering-prejoin + PIP spatial join.  The
driver-visible query ingests a deterministic NOISY layer (each clean
city-core ring with every vertex duplicated and jittered — the dirty
digitized-twice shape real layers arrive in), snaps it to level-13 cell
centers, and counts page membership; the DuckDB oracle replays PIP over
the snapped polygon constants, proving the snapped output drives the
join identically in both engines (snap semantics themselves are
fixture-tested in tests/test_builder_snap.py).
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernel import metrics
from ..kernel.builder_snap import CellIdSnap, snap_loops
from ..kernel.regions import Loop, Polygon

SNAP_LEVEL = 13
SNAP_LEVEL_SPLIT = 16


def noisy_core_loops() -> list[tuple[int, np.ndarray]]:
    """(pair of the clean city_core rings, dirtied deterministically):
    every vertex appears twice plus a jittered copy displaced by 20% of
    the level-SNAP_LEVEL cell half-width — below the snap radius, so
    all three collapse to one site."""
    from ..sources.layers import fixture_layer
    jit = 0.2 * 0.5 * metrics.MIN_WIDTH.get_value(SNAP_LEVEL)
    out = []
    for layer, pid, poly in fixture_layer():
        if layer != "city_core":
            continue
        v = poly.loops[0].vertices
        noisy = []
        for k, p in enumerate(v):
            noisy.append(p)
            noisy.append(p)  # duplicate vertex
            # deterministic tangent displacement: rotate toward the
            # next vertex by the jitter angle
            q = v[(k + 1) % len(v)]
            t = q - (p @ q) * p
            t /= np.linalg.norm(t)
            noisy.append(p * math.cos(jit) + t * math.sin(jit))
        out.append((pid, np.asarray(noisy)))
    return out


_SNAPPED: list | None = None


def snapped_layer() -> list[tuple[str, int, Polygon]]:
    global _SNAPPED
    if _SNAPPED is None:
        snap = CellIdSnap(SNAP_LEVEL)
        _SNAPPED = [
            ("snapped_core", pid, Polygon([Loop(v) for v in
                                           snap_loops([noisy], snap)]))
            for pid, noisy in noisy_core_loops()]
    return _SNAPPED


def pages_in_snapped(pages: DataFrame, spark: SparkSession) -> DataFrame:
    """(url, polygon_id) membership in the snap-rounded noisy layer via
    the standard broadcast spatial join."""
    from .spatial_join import spatial_join
    joined = spatial_join(pages, spark, snapped_layer(),
                          strategy="broadcast")
    return joined.select("url", F.col("polygon_id").cast("long")
                         .alias("polygon_id"))


def selfcrossing_core_loops() -> list[tuple[int, np.ndarray]]:
    """Deterministic SELF-CROSSING variant of each clean city_core
    ring: swapping two consecutive vertices twists the ring into a
    bowtie, so edges (v0, v2) and (v1, v3) cross — the single
    self-intersecting input layer the S2Builder splitCrossingEdges
    option exists for (S2Builder.kt:489-520)."""
    from ..sources.layers import fixture_layer
    out = []
    for layer, pid, poly in fixture_layer():
        if layer != "city_core":
            continue
        v = poly.loops[0].vertices.copy()
        v[[1, 2]] = v[[2, 1]]
        out.append((pid, v))
    return out


_SELFSPLIT: list | None = None


def selfsplit_layer() -> list[tuple[str, int, Polygon]]:
    """Snap-round the self-crossing rings with split_crossing_edges:
    each bowtie splits at the materialized crossing vertex into its two
    lobes, assembled as one polygon (xor of disjoint lobes = union)."""
    global _SELFSPLIT
    if _SELFSPLIT is None:
        # finer snap than the noisy layer: the bowtie's small lobe
        # spans ~2 ring vertices (city_core radius 0.05 deg); level-13
        # sites (~1.3 km) would collapse it, level-16 (~150 m) keeps
        # both lobes as real rings
        snap = CellIdSnap(SNAP_LEVEL_SPLIT)
        _SELFSPLIT = []
        for pid, v in selfcrossing_core_loops():
            rings = snap_loops([v], snap, split_crossing_edges=True)
            _SELFSPLIT.append(("selfsplit_core", pid,
                               Polygon([Loop(r) for r in rings])))
    return _SELFSPLIT


def pages_in_selfsplit(pages: DataFrame,
                       spark: SparkSession) -> DataFrame:
    """(url, polygon_id) membership in the split-and-snapped bowtie
    layer via the standard broadcast spatial join."""
    from .spatial_join import spatial_join
    joined = spatial_join(pages, spark, selfsplit_layer(),
                          strategy="broadcast")
    return joined.select("url", F.col("polygon_id").cast("long")
                         .alias("polygon_id"))
