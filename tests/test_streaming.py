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
