"""Pin the pure-Python xxhash64/sketch twins bit-for-bit against the real
Spark expressions — the twins back the hash-domain correctness oracles
(simhash pairs, LSH planes) that DuckDB cannot restate."""

from pyspark.sql import functions as F

from linguistjs_spark.hash_twin import (
    oracle_hyperplane_bucket,
    oracle_minhash,
    oracle_shingles,
    oracle_simhash,
    spark_xxhash64,
)
from linguistjs_spark.operators.dedup import (
    minhash_signature,
    shingle_hashes,
    simhash_col,
)
from linguistjs_spark.operators.similarity import hyperplane_bucket


def test_xxhash64_twin_matches_spark(spark):
    rows = [("", 0, -1), ("a", 1, 7), ("hello world", -5, 3),
            ("x" * 31, 123456789, 0), ("y" * 32, -(1 << 62), 63),
            ("unicode ünïcødé £", 42, -42), ("z" * 100, 999, 2)]
    df = spark.createDataFrame(rows, "s string, l long, j long")
    out = df.select(
        F.xxhash64("s").alias("hs"),
        F.xxhash64("l").alias("hl"),
        F.xxhash64("l", "j").alias("hlj"),
        F.xxhash64("s", "j").alias("hsj"),
        F.xxhash64(F.array(F.col("l"), F.col("j"))).alias("harr"),
    ).collect()
    for r, (s, l, j) in zip(out, rows):
        assert r["hs"] == spark_xxhash64(s)
        assert r["hl"] == spark_xxhash64(l)
        assert r["hlj"] == spark_xxhash64(l, j)
        assert r["hsj"] == spark_xxhash64(s, j)
        assert r["harr"] == spark_xxhash64([l, j])


def test_sketch_twins_match_spark(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "one two",
        "",
        "word " * 40 + "tail",
        "Unicode wörds ärе fine tøø and repeat repeat repeat repeat",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    sh = shingle_hashes(F.col("text"), k=3)
    out = df.select(
        "doc_id",
        sh.alias("sh"),
        minhash_signature(sh, 8).alias("sig"),
        simhash_col(sh).alias("simh"),
    ).collect()
    for r in sorted(out, key=lambda r: r["doc_id"]):
        t = texts[r["doc_id"]]
        tw = oracle_shingles(t, 3)
        assert sorted(r["sh"]) == sorted(tw), t
        assert list(r["sig"]) == oracle_minhash(tw, 8), t
        assert r["simh"] == oracle_simhash(tw), t


def test_lsh_bucket_twin_matches_spark(spark):
    vecs = [[0.5, -1.25, 3.0, 0.125], [1.0, 1.0, 1.0, 1.0], [-2.5, 0.75, -0.5, 2.0]]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    out = df.select("vec_id", hyperplane_bucket(F.col("embedding"), 8).alias("b")).collect()
    for r in sorted(out, key=lambda r: r["vec_id"]):
        assert r["b"] == oracle_hyperplane_bucket(vecs[r["vec_id"]], 8)
