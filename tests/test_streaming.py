"""Streaming-vs-batch equivalence: replay the events parquet through the
file stream source and assert the watermarked windowed cell counts equal
the batch computation."""

import shutil

import pytest


@pytest.fixture(scope="module")
def spark():
    from s2_geometry_kotlin_spark.session import get_spark
    s = get_spark("streaming-tests", cpus=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_stream_matches_batch(spark, tmp_path_factory):
    from s2_geometry_kotlin_spark import streaming as st

    # stage the events file into a directory; split into 3 micro-batches
    src = "/root/testdata/sf0.001/events.parquet"
    events_dir = str(tmp_path_factory.mktemp("events_stream"))
    batch = spark.read.parquet(src)
    batch.repartition(3).write.mode("overwrite").parquet(events_dir)

    st.run_stream_to_memory(spark, events_dir, table="stream_cells")
    got = {tuple(r) for r in spark.table("stream_cells").collect()}

    expect_df = st.windowed_cell_counts(spark.read.parquet(events_dir))
    expect = {tuple(r) for r in expect_df.collect()}
    assert got == expect
    assert len(got) > 0
    shutil.rmtree(events_dir, ignore_errors=True)


def test_stateful_stream_matches_batch(spark, tmp_path_factory):
    """applyInPandasWithState per-cell tracker: the LAST update emitted
    per cell across micro-batches equals the batch aggregate."""
    from s2_geometry_kotlin_spark import streaming as st

    src = "/root/testdata/sf0.001/events.parquet"
    events_dir = str(tmp_path_factory.mktemp("events_state"))
    batch = spark.read.parquet(src)
    batch.repartition(3).write.mode("overwrite").parquet(events_dir)

    st.run_stateful_stream_to_memory(spark, events_dir,
                                     table="stream_state")
    rows = spark.table("stream_state").collect()
    # update mode re-emits a cell's row each micro-batch it changes in;
    # the final (max n_events) row per cell is the converged state
    final = {}
    for r in rows:
        cur = final.get(r["cell_l8"])
        if cur is None or r["n_events"] > cur["n_events"]:
            final[r["cell_l8"]] = r
    got = {(k, v["n_events"], v["n_users"], v["first_seen"],
            v["last_seen"]) for k, v in final.items()}

    expect_df = st.cell_session_state(spark.read.parquet(events_dir))
    expect = {tuple(r) for r in expect_df.collect()}
    assert got == expect
    assert len(got) > 0
    shutil.rmtree(events_dir, ignore_errors=True)
