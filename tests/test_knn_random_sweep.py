"""S2ClosestPointQueryUnitTest-style randomized brute-force comparison
for the kNN operators (index/point/S2ClosestPointQueryUnitTest.kt
pattern: random indexes, random targets, every result checked against
exhaustive search), run at the Spark-operator level so the
radius-escalation loop, the terminal whole-sphere round and the
window top-k are all exercised."""

import math
import random

import numpy as np
import pytest


def make_points(seed, n):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v


def brute_topk(pts, urls, q, k, farthest=False):
    d2 = ((pts - q) ** 2).sum(axis=1)
    keyed = sorted(zip(np.round(d2, 12), urls))
    if farthest:
        keyed = sorted(zip(np.round(-d2, 12), urls))
    return [u for _, u in keyed[:k]]


@pytest.mark.parametrize("seed", [111, 112])
def test_knn_points_matches_brute_force(seed):
    from s2_geometry_kotlin_spark.kernel import cellid as ck
    from s2_geometry_kotlin_spark.operators.knn import knn_points
    from s2_geometry_kotlin_spark.session import get_spark
    spark_s = get_spark("knn-sweep-tests", cpus=4, shuffle_partitions=4)
    spark_s.sparkContext.setLogLevel("ERROR")
    pts = make_points(seed, 1500)
    urls = [f"u{i:05d}" for i in range(len(pts))]
    ids = ck.from_xyz(pts[:, 0], pts[:, 1], pts[:, 2])
    rows = [(urls[i], float(pts[i, 0]), float(pts[i, 1]),
             float(pts[i, 2]), int(np.uint64(ids[i]).astype(np.int64)))
            for i in range(len(pts))]
    df = spark_s.createDataFrame(
        rows, "url string, x double, y double, z double, cell_id long")
    rng = random.Random(seed)
    queries = []
    for qi in range(6):
        lat = rng.uniform(-90, 90)
        lon = rng.uniform(-180, 180)
        queries.append((qi, lat, lon))
    # include a pole (sparse-corner stress)
    queries.append((6, 89.9, 0.0))
    for k in (1, 7, 60):
        got = knn_points(df, spark_s, queries, k,
                         n_pages_hint=len(pts))
        res = {}
        for r in got.collect():
            res.setdefault(r.query_id, []).append((r.rank, r.url))
        for (qi, lat, lon) in queries:
            q = np.array([
                math.cos(math.radians(lat)) * math.cos(math.radians(lon)),
                math.cos(math.radians(lat)) * math.sin(math.radians(lon)),
                math.sin(math.radians(lat))])
            want = brute_topk(pts, urls, q, k)
            got_urls = [u for _, u in sorted(res.get(qi, []))]
            assert got_urls == want, (seed, k, qi)


@pytest.mark.parametrize("seed", [113])
def test_knn_farthest_matches_brute_force(seed):
    from s2_geometry_kotlin_spark.kernel import cellid as ck
    from s2_geometry_kotlin_spark.operators.knn import knn_points_farthest
    from s2_geometry_kotlin_spark.session import get_spark
    spark_s = get_spark("knn-sweep-tests", cpus=4, shuffle_partitions=4)
    pts = make_points(seed, 800)
    urls = [f"u{i:05d}" for i in range(len(pts))]
    ids = ck.from_xyz(pts[:, 0], pts[:, 1], pts[:, 2])
    rows = [(urls[i], float(pts[i, 0]), float(pts[i, 1]),
             float(pts[i, 2]), int(np.uint64(ids[i]).astype(np.int64)))
            for i in range(len(pts))]
    df = spark_s.createDataFrame(
        rows, "url string, x double, y double, z double, cell_id long")
    queries = [(0, 10.0, 20.0), (1, -89.5, 0.0), (2, 45.0, 179.9)]
    for k in (1, 5):
        got = knn_points_farthest(df, spark_s, queries, k)
        res = {}
        for r in got.collect():
            res.setdefault(r.query_id, []).append((r.rank, r.url))
        for (qi, lat, lon) in queries:
            q = np.array([
                math.cos(math.radians(lat)) * math.cos(math.radians(lon)),
                math.cos(math.radians(lat)) * math.sin(math.radians(lon)),
                math.sin(math.radians(lat))])
            want = brute_topk(pts, urls, q, k, farthest=True)
            got_urls = [u for _, u in sorted(res.get(qi, []))]
            assert got_urls == want, (seed, k, qi)
