"""Structured-streaming geospatial ingest.

The engine's streaming surface: an event stream (schema of the driver's
`events` table) is geotagged deterministically, assigned S2 cells with
the same Arrow kernel UDF as the batch path, and aggregated into
watermarked tumbling windows per coarse cell — the streaming analogue of
the hot-cells rollup.

The sandbox has no live source, so tests replay the events parquet
through the file stream source (one input file == one micro-batch) and
assert stream results == the batch computation on the same data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType,
                               StructField, StructType, TimestampType)

from .. import functions as s2f

EVENTS_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])


def geotag_events(df: DataFrame) -> DataFrame:
    """Deterministic event coordinates from user_id (same integer-mod
    derivation style as the pages synthesizer)."""
    lat = ((F.col("user_id") * 7919 + 12345) % 160000001 - 80000000) / 1e6
    lon = ((F.col("user_id") * 104729 + 54321) % 360000001 - 180000000) / 1e6
    return (df.withColumn("lat", lat).withColumn("lon", lon)
            .withColumn("cell_id", s2f.s2_cellid("lat", "lon")))


def windowed_cell_counts(df: DataFrame, window: str = "1 hour",
                         watermark: str = "2 hours",
                         level: int = 8) -> DataFrame:
    """Watermarked tumbling-window counts per level-`level` cell."""
    tagged = geotag_events(df)
    if tagged.isStreaming:
        tagged = tagged.withWatermark("ts", watermark)
    return (tagged
            .groupBy(F.window("ts", window).alias("w"),
                     s2f.cell_parent(F.col("cell_id"), level)
                     .alias(f"cell_l{level}"))
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    f"cell_l{level}", "n_events",
                    F.round("sum_value", 6).alias("sum_value_r")))


def stream_events_from_dir(spark: SparkSession, events_dir: str,
                           max_files_per_trigger: int = 1) -> DataFrame:
    """File-source replay: each parquet file in events_dir is a
    micro-batch."""
    return (spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .parquet(events_dir))


def run_stream_to_memory(spark: SparkSession, events_dir: str,
                         table: str = "stream_cells") -> None:
    """Drive the windowed aggregation to a memory sink until all input
    is processed (complete mode: late data folds into final counts)."""
    src = stream_events_from_dir(spark, events_dir)
    agg = windowed_cell_counts(src)
    q = (agg.writeStream.format("memory").queryName(table)
         .outputMode("complete").start())
    q.processAllAvailable()
    q.stop()


# ---------------------------------------------------------------------------
# custom stateful operator: per-cell session state via
# applyInPandasWithState (the "custom stateful operators" surface of the
# north star's streaming guidance)
# ---------------------------------------------------------------------------

CELL_STATE_SCHEMA = ("cell_l8 long, n_events long, n_users long, "
                     "first_seen timestamp, last_seen timestamp")
_STATE_SCHEMA = "n long, users array<long>, first timestamp, last timestamp"


def cell_session_state(df: DataFrame, level: int = 8) -> DataFrame:
    """Custom stateful per-cell tracker: running event count, distinct
    users (bounded set), first/last event time — state kept per level-8
    cell (NoTimeout: state lives for the stream; a production deploy
    would add a processing-time timeout to expire idle tiles).  The
    distributed analogue of an
    in-memory per-tile accumulator; state lives in the state store, keyed
    by cell, and survives micro-batches.

    Batch inputs fall back to the equivalent groupBy aggregate (same
    output schema) so stream==batch tests can compare results."""
    import pandas as pd

    tagged = geotag_events(df).withColumn(
        "cell_l8", s2f.cell_parent(F.col("cell_id"), level))

    if not tagged.isStreaming:
        return (tagged.groupBy("cell_l8")
                .agg(F.count("*").alias("n_events"),
                     F.countDistinct("user_id").alias("n_users"),
                     F.min("ts").alias("first_seen"),
                     F.max("ts").alias("last_seen")))

    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    def update(key, pdfs, state: GroupState):
        n = 0
        users: set[int] = set()
        first = None
        last = None
        if state.exists:
            n, users_l, first, last = state.get
            users = set(users_l)
        for pdf in pdfs:
            n += len(pdf)
            users.update(int(u) for u in pdf["user_id"].tolist())
            lo = pdf["ts"].min()
            hi = pdf["ts"].max()
            first = lo if first is None else min(first, lo)
            last = hi if last is None else max(last, hi)
        state.update((n, sorted(users)[:1000], first, last))
        yield pd.DataFrame({"cell_l8": [key[0]], "n_events": [n],
                            "n_users": [len(users)],
                            "first_seen": [first], "last_seen": [last]})

    return (tagged.groupBy("cell_l8")
            .applyInPandasWithState(
                update, CELL_STATE_SCHEMA, _STATE_SCHEMA, "update",
                GroupStateTimeout.NoTimeout))


def run_stateful_stream_to_memory(spark: SparkSession, events_dir: str,
                                  table: str = "stream_state") -> None:
    src = stream_events_from_dir(spark, events_dir)
    out = cell_session_state(src)
    q = (out.writeStream.format("memory").queryName(table)
         .outputMode("update").start())
    q.processAllAvailable()
    q.stop()
