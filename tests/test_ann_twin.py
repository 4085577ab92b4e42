"""Pin the ANN / SimHash python twins (which back the VALUES-literal DuckDB
oracles) against the live Spark queries at sf0.001."""

from pyspark.sql import functions as F

import linguistjs_spark.operators.dedup as DD
import linguistjs_spark.operators.similarity as SIM
from linguistjs_spark import ann_twin as AT

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _qvec(spark, vid):
    return [r[0] for r in _emb(spark).filter(F.col("vec_id") == vid)
            .select(F.explode("embedding")).collect()]


def test_lsh_topk_twin(spark):
    got = [(r["vec_id"], r["sr"]) for r in
           SIM.lsh_topk(SIM.with_lsh_buckets(_emb(spark), bits=8),
                        _qvec(spark, 1), k=10, bits=8, probe_hamming=2)
           .select("vec_id", F.round(F.col("score"), 4).alias("sr")).collect()]
    assert got == AT.lsh_topk_expected(SF, 1, k=10, bits=8, probe_hamming=2)


def test_ivf_topk_twin(spark):
    emb = _emb(spark)
    cents = SIM.ivf_centroids(emb, n_centroids=8)
    idx = SIM.with_ivf_buckets(emb, cents)
    got = [(r["vec_id"], r["sr"]) for r in
           SIM.ivf_topk(idx, cents, _qvec(spark, 2), k=10, n_probe=3)
           .select("vec_id", F.round(F.col("score"), 4).alias("sr")).collect()]
    assert got == AT.ivf_topk_expected(SF, 2, k=10, n_centroids=8, n_probe=3)


def test_simhash_pairs_twin_is_exhaustive_truth(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted((r["a"], r["b"], r["hamming"]) for r in
                 DD.simhash_near_pairs(DD.with_simhash(docs), max_hamming=3).collect())
    # the twin enumerates ALL pairs: equality proves the 16-bit-slice
    # pigeonhole bucket join loses nothing at hamming<=3
    assert got == AT.simhash_pairs_expected(SF, max_hamming=3)


def test_margin_knn_twin_and_planted_recovery(spark):
    """Twin parity at sf0.001 (exact tuple equality including rounded
    doubles), plus the mining contract: every planted translation pair
    (src x, scaled copy at x + 1e6) whose buckets collide is recovered as
    a mutual-best pair with cos_r == 1.0."""
    emb = _emb(spark).select("vec_id", "embedding")
    src = emb.filter(F.col("vec_id") % 2 == 0)
    tgt = emb.filter(F.col("vec_id") % 2 == 1)
    planted = src.filter(F.col("vec_id") < 40).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.25)).alias("embedding"),
    )
    got = [
        (r["src_id"], r["tgt_id"], r["cr"], r["mr"])
        for r in SIM.margin_knn_pairs(
            src, tgt.unionByName(planted), k=4, threshold=1.05, bits=8)
        .select("src_id", "tgt_id",
                F.round(F.col("cos"), 4).alias("cr"),
                F.round(F.col("margin"), 4).alias("mr"))
        .orderBy("src_id", "tgt_id").collect()
    ]
    want = AT.margin_knn_expected(SF, k=4, threshold=1.05, bits=8,
                                  probe_hamming=1)
    assert got == want
    # scaled copies are cosine-invariant, so each planted pair that was
    # mined must sit at exact cosine 1.0
    planted_mined = [t for t in got if t[1] >= 1_000_000]
    assert planted_mined, "no planted translation recovered"
    for s, t, cr, mr in planted_mined:
        if t == s + 1_000_000:
            assert cr == 1.0 and mr >= 1.05


def test_margin_knn_plan_has_no_cartesian(spark):
    """Candidate generation must stay equi-join-shaped: no
    CartesianProduct / BroadcastNestedLoopJoin anywhere, and the kNN
    window exchanges must move (id, cos) edges, not embedding vectors."""
    emb = _emb(spark).select("vec_id", "embedding")
    src = emb.filter(F.col("vec_id") % 2 == 0)
    tgt = emb.filter(F.col("vec_id") % 2 == 1)
    plan = (SIM.margin_knn_pairs(src, tgt, k=4, bits=8)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # window stages: every Exchange hashpartitioning on src_id/tgt_id must
    # not carry the embedding column
    for line in plan.splitlines():
        if "Exchange hashpartitioning(src_id" in line \
                or "Exchange hashpartitioning(tgt_id" in line:
            assert "embedding#" not in line, line
