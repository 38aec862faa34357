"""IVF assignment kernels: the Arrow argmin path must agree with the
Catalyst higher-order fold exactly (same centroids, same tie-break)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from s2_geometry_kotlin_spark.session import get_spark
    s = get_spark("ivf-arrow-tests", cpus=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_arrow_assignment_matches_hof(spark):
    from s2_geometry_kotlin_spark.operators import similarity as sim

    sf = "/root/testdata/sf0.001"
    emb = (spark.read.parquet(f"{sf}/embeddings.parquet")
           .select("vec_id",
                   F.col("embedding").cast("array<double>").alias("v")))
    cents = sim._ivf_centroids(sim._ivf_train_path(sf))
    arrow = sim.ivf_assign_arrow(emb, cents).select("vec_id", "cid")
    hof = emb.withColumn(
        "cid", sim._ivf_assign_expr(cents, F.col("v")).cid
    ).select("vec_id", "cid")
    a = {r["vec_id"]: r["cid"] for r in arrow.collect()}
    h = {r["vec_id"]: r["cid"] for r in hof.collect()}
    assert a == h
    assert len(a) > 0


def test_clustered_embeddings_recall(spark):
    """VERDICT r4 item 4: on planted-cluster embeddings (the realistic
    regime) IVF recall@10 reaches >=0.8 at nprobe<=8 — here the
    k-means lists recover the planted clusters and every variant beats
    its isotropic counterpart ordering (bucketed < multiprobe < IVF)."""
    import tempfile

    from s2_geometry_kotlin_spark.operators import similarity as sim
    d = tempfile.mkdtemp(prefix="clustered_emb_t_")
    sim.write_clustered_embeddings(d, n=2500)
    brute = (sim.q_embed_topk_brute(spark, d)
             .select("query_id", "vec_id").cache())
    n = brute.count()
    assert n > 0

    def recall(df):
        return (df.select("query_id", "vec_id")
                .join(brute, ["query_id", "vec_id"]).count() / n)

    r_b = recall(sim.q_embed_ann_bucketed(spark, d))
    r_m = recall(sim.q_embed_ann_multiprobe(spark, d))
    r_i8 = recall(sim.ivf_topk(spark, d, nprobe=8))
    brute.unpersist()
    assert r_i8 >= 0.8
    assert r_b <= r_m <= r_i8


def test_minhash_candidates_only_superset(spark):
    """The bench stage split (verify=False) returns the raw LSH
    candidates — a superset of the verified pairs."""
    from s2_geometry_kotlin_spark.operators.dedup import \
        q_minhash_lsh_pairs
    sf = "/root/testdata/sf0.001"
    cand = {(r.doc_a, r.doc_b) for r in
            q_minhash_lsh_pairs(spark, sf, verify=False).collect()}
    verified = {(r.doc_a, r.doc_b) for r in
                q_minhash_lsh_pairs(spark, sf).collect()}
    assert verified <= cand


def test_ivf_auto_nprobe(spark):
    """VERDICT r5 item 7: auto-nprobe picks the smallest probe count
    whose ESTIMATED recall@10 meets the target, the estimate agrees
    with the measured recall at that setting, and the curve is a CDF
    (monotone non-decreasing, ending at 1.0 = probing every list is
    exhaustive search over the corpus used for the estimate)."""
    import tempfile

    from s2_geometry_kotlin_spark.operators import similarity as sim

    d = tempfile.mkdtemp(prefix="clustered_emb_auto_")
    sim.write_clustered_embeddings(d, n=2500)

    nprobe, curve = sim.ivf_auto_nprobe(spark, d, recall_target=0.8)
    vals = [curve[p] for p in sorted(curve)]
    assert vals == sorted(vals)
    assert vals[-1] == 1.0
    assert curve[nprobe] >= 0.8
    if nprobe > 1:
        assert curve[nprobe - 1] < 0.8
    # clustered regime: k-means recovers the planted lists, so a small
    # probe count suffices (r5 measured ~1.0 recall at nprobe 2)
    assert nprobe <= 4

    # the estimate is exact here (estimate corpus == search corpus):
    # measured recall at the chosen nprobe must match the curve value
    brute = {(r["query_id"], r["vec_id"])
             for r in sim.q_embed_topk_brute(spark, d)
             .select("query_id", "vec_id").collect()}
    ann = {(r["query_id"], r["vec_id"])
           for r in sim.ivf_topk(spark, d, nprobe=nprobe)
           .select("query_id", "vec_id").collect()}
    measured = len(ann & brute) / max(1, len(brute))
    assert abs(measured - curve[nprobe]) < 0.02
