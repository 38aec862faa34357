"""B3 as a Spark operator: constructive polygon boolean ops feeding the
spatial join.

S2BooleanOperation (index/shape/S2BooleanOperation.kt:191-229,429) is a
LAYER-PREP step in the engine: polygon layers are broadcast-sized by
design (the 100-TB side is the pages table), so the construction itself
runs driver-side on the kernel (kernel/booleanop.py) and the result is
shipped to executors exactly like any other layer — covering prejoin +
PIP verify.  The oracle for each query proves the construction against
the DEFINITION: pages contained in A op B must equal the boolean
combination of the independent PIP verdicts against the operands A and B
(computed in DuckDB with the shared crossing-parity SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernel.booleanop import polygon_boolean
from ..kernel.regions import Polygon


def operand_pairs() -> list[tuple[Polygon, Polygon]]:
    """Deterministic fixture operand pairs covering the interesting
    regimes: proper boundary crossings (Paris/London lens), hole +
    no-crossing nesting (donut vs metro), and disjoint."""
    from ..sources.layers import fixture_layer
    # index by (layer name, order of appearance)
    named: dict[str, list[Polygon]] = {}
    for lname, _, poly in fixture_layer():
        named.setdefault(lname, []).append(poly)
    paris_core = named["city_core"][0]       # CITIES[0] = Paris
    paris_metro = named["city_metro"][0]
    london_metro = named["city_metro"][4]    # CITIES[4] = London
    sydney_metro = named["city_metro"][5]    # CITIES[5] = Sydney
    donut = named["city_donut"][0]
    return [
        (paris_metro, london_metro),   # lens (proper crossings)
        (donut, paris_metro),          # hole + nesting, no crossings
        (paris_metro, sydney_metro),   # disjoint
        (paris_core, paris_metro),     # full containment: A inside B, so
                                       # A∩B = A lands on the page-dense
                                       # core (non-zero driver evidence)
    ]


def operand_layer() -> list[tuple[str, int, Polygon]]:
    """Operands flattened for the oracle's pipjoin: pair k's polygons
    get ids 2k (A) and 2k+1 (B)."""
    out = []
    for k, (a, b) in enumerate(operand_pairs()):
        out.append(("boolop", 2 * k, a))
        out.append(("boolop", 2 * k + 1, b))
    return out


_RESULT_CACHE: dict[str, list] = {}


def result_layer(op: str) -> list[tuple[str, int, Polygon]]:
    """(op, pair_id, A op B) for every pair whose result is non-empty
    (an empty region simply contributes no join rows, matching the
    oracle)."""
    cached = _RESULT_CACHE.get(op)
    if cached is not None:
        return cached
    out = []
    for k, (a, b) in enumerate(operand_pairs()):
        res = polygon_boolean(a, b, op)
        if res.loops:
            out.append((op, k, res))
    _RESULT_CACHE[op] = out
    return out


def adjacent_pairs() -> list[tuple[Polygon, Polygon]]:
    """Operand pairs sharing an EXACT border chain — identical vertex
    coordinates on both sides, the adjacent-admin-polygons case the
    reference resolves through CrossingProcessor's vertex-crossing
    machinery (CrossingProcessor.kt) and this repo resolves through
    _kept_subedges' shared-edge classification.  Two lat/lng quad pairs
    split along a meridian chain through a page-dense city center, so
    the constructed union gets non-trivial driver evidence."""
    from ..kernel.regions import Loop

    def quad_pair(lat0, latm, lat1, lng0, lngm, lng1):
        west = Polygon([Loop.from_latlng_text(
            f"{lat0}:{lng0}, {lat0}:{lngm}, {latm}:{lngm}, "
            f"{lat1}:{lngm}, {lat1}:{lng0}")])
        east = Polygon([Loop.from_latlng_text(
            f"{lat0}:{lngm}, {lat0}:{lng1}, {lat1}:{lng1}, "
            f"{lat1}:{lngm}, {latm}:{lngm}")])
        return west, east

    return [
        # Paris split at its meridian (pages cluster at 48.8566, 2.3522)
        quad_pair(47.8566, 48.8566, 49.8566, 1.3522, 2.3522, 3.3522),
        # London split at its meridian (51.5072, -0.1276)
        quad_pair(50.5072, 51.5072, 52.5072, -1.1276, -0.1276, 0.8724),
    ]


def adjacent_layer() -> list[tuple[str, int, Polygon]]:
    """Adjacent operands flattened for the oracle's pipjoin (ids 2k/2k+1
    like operand_layer)."""
    out = []
    for k, (a, b) in enumerate(adjacent_pairs()):
        out.append(("adjop", 2 * k, a))
        out.append(("adjop", 2 * k + 1, b))
    return out


def adjacent_union_layer() -> list[tuple[str, int, Polygon]]:
    """The CONSTRUCTED union of each adjacent pair — built through the
    shared-boundary path (the border chain must vanish into a single
    outer ring)."""
    cached = _RESULT_CACHE.get("adjacent_union")
    if cached is not None:
        return cached
    out = []
    for k, (a, b) in enumerate(adjacent_pairs()):
        res = polygon_boolean(a, b, "union")
        if len(res.loops) != 1:
            raise ValueError(
                f"adjacent union pair {k}: expected a single merged "
                f"ring, got {len(res.loops)} loops — shared-border "
                "classification failed")
        out.append(("adj_union", k, res))
    _RESULT_CACHE["adjacent_union"] = out
    return out


def pages_in_adjacent_union(pages: DataFrame,
                            spark: SparkSession) -> DataFrame:
    """(url, pair_id) for pages inside the constructed union of each
    adjacent (exact-shared-border) operand pair; same broadcast
    covering-prejoin + PIP path as every layer join."""
    from .spatial_join import spatial_join
    joined = spatial_join(pages, spark, adjacent_union_layer(),
                          strategy="broadcast")
    return joined.select("url",
                         F.col("polygon_id").cast("long").alias("pair_id"))


def pages_in_boolean(pages: DataFrame, spark: SparkSession,
                     op: str) -> DataFrame:
    """(url, pair_id) for pages contained in A op B, per operand pair —
    the constructed polygon goes through the standard covering-prejoin
    broadcast spatial join (the pages side never reshuffles)."""
    from .spatial_join import spatial_join
    joined = spatial_join(pages, spark, result_layer(op),
                          strategy="broadcast")
    return joined.select("url",
                         F.col("polygon_id").cast("long").alias("pair_id"))


def boolean_oracle_select(op: str) -> str:
    """SQL over the `pipjoin(url, layer, polygon_id)` CTE built from
    operand_layer(): membership in the boolean result by DEFINITION."""
    if op == "intersection":
        return ("SELECT p1.url AS url, "
                "CAST(p1.polygon_id // 2 AS BIGINT) AS pair_id "
                "FROM pipjoin p1 JOIN pipjoin p2 ON p1.url = p2.url "
                "AND p2.polygon_id = p1.polygon_id + 1 "
                "WHERE p1.polygon_id % 2 = 0")
    if op == "union":
        return ("SELECT DISTINCT url, "
                "CAST(polygon_id // 2 AS BIGINT) AS pair_id FROM pipjoin")
    if op == "difference":
        return ("SELECT p1.url AS url, "
                "CAST(p1.polygon_id // 2 AS BIGINT) AS pair_id "
                "FROM pipjoin p1 WHERE p1.polygon_id % 2 = 0 "
                "AND NOT EXISTS (SELECT 1 FROM pipjoin p2 "
                "WHERE p2.url = p1.url "
                "AND p2.polygon_id = p1.polygon_id + 1)")
    if op == "symmetric_difference":
        return ("SELECT url, CAST(polygon_id // 2 AS BIGINT) AS pair_id "
                "FROM pipjoin GROUP BY 1, 2 HAVING COUNT(*) = 1")
    raise ValueError(op)
