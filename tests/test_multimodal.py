"""Multimodal plumbing: schemas, Arrow batch flow, deterministic fake
decode, and blob-free downstream shuffles."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from s2_geometry_kotlin_spark.session import get_spark
    s = get_spark("mm-tests", cpus=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_extract_features_deterministic(spark):
    from s2_geometry_kotlin_spark.operators import multimodal as mm
    media = mm.synth_media(spark, n=64)
    feats = mm.extract_features(media).orderBy("media_id")
    rows = feats.collect()
    assert len(rows) == 64
    assert rows[0]["n_bytes"] > 0
    # deterministic: second run identical
    rows2 = mm.extract_features(media).orderBy("media_id").collect()
    assert rows == rows2
    # features are blob-free (no binary columns downstream)
    assert "payload" not in feats.columns


def test_frame_sample_counts(spark):
    from s2_geometry_kotlin_spark.operators import multimodal as mm
    media = mm.synth_media(spark, n=16)
    frames = mm.frame_sample(media, every_n_bytes=64)
    agg = frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    sizes = {r["media_id"]: len(bytes(r["payload"]))
             for r in media.collect()}
    for row in agg:
        expect = (sizes[row["media_id"]] + 63) // 64
        assert row["n"] == expect


def test_real_decode_raises(spark):
    from s2_geometry_kotlin_spark.operators import multimodal as mm
    media = mm.synth_media(spark, n=4)
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        mm.extract_features(media, deterministic_fake=False).collect()
