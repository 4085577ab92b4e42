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
