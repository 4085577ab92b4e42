"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k — one narrow projection (zip_with dot
product in whole-stage codegen) + a k-row TakeOrdered; the scan parallelises
perfectly and there is no shuffle besides the final top-k collect tree.

Scale path: LSH with deterministic pseudo-random hyperplanes (signs of
xxhash-derived plane components). Each vector gets a `bits`-bit bucket key in
one projection; queries probe their own bucket (optionally hamming<=1
neighbours), reducing the scanned fraction ~2^-bits while staying fully
native. An IVF variant would swap the plane-bucket for a centroid assignment
— same plumbing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    # sqrt(n1*n2) (not sqrt(n1)*sqrt(n2)): bit-identical to the DuckDB oracle
    # formulation so rounded scores compare exactly across engines
    sq = dot(a, a) * dot(b, b)
    return F.when(sq > 0, dot(a, b) / F.sqrt(sq)).otherwise(F.lit(0.0))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = embeddings.select(
        F.col(id_col), cosine(F.col(vec_col), q).alias("score")
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


# ---------------------------------------------------------------------------
# LSH (random hyperplane signs) — the scale path
# ---------------------------------------------------------------------------


def _plane_component(dim_idx: Column, plane: int) -> Column:
    """Deterministic pseudo-random plane component in [-1, 1): derived from
    xxhash64(dim, plane) so executors and driver agree without RNG state."""
    h = F.pmod(F.xxhash64(dim_idx, F.lit(plane)), F.lit(2000))
    return h.cast("double") / 1000.0 - 1.0


def hyperplane_bucket(vec: Column, bits: int = 12) -> Column:
    """bits-bit LSH bucket key: sign pattern of <vec, plane_j>."""
    dims = F.sequence(F.lit(0), F.size(vec) - 1)
    key = F.lit(0).cast("long")

    def _projector(plane: int):
        return lambda x, i: x.cast("double") * _plane_component(i, plane)

    for j in range(bits):
        proj = F.aggregate(
            F.zip_with(vec, dims, _projector(j)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(
            F.lit(0).cast("long")
        )
        key = key.bitwiseOR(bit)
    return key


def with_lsh_buckets(
    embeddings: DataFrame,
    bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Index-build projection: (id, embedding, bucket). At scale this frame
    would be written bucketed/partitioned by `bucket` so probes prune files."""
    return embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        hyperplane_bucket(F.col(vec_col), bits).alias("bucket"),
    )


def lsh_topk(
    indexed: DataFrame,
    query_vec: list[float],
    k: int = 10,
    bits: int = 12,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: score only vectors whose bucket is within `probe_hamming`
    bits of the query bucket (multi-probe LSH)."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    qbucket = hyperplane_bucket(q, bits)
    candidates = indexed.filter(
        F.bit_count(F.col("bucket").bitwiseXOR(qbucket)) <= probe_hamming
    )
    scored = candidates.select(
        F.col(id_col), cosine(F.col(vec_col), q).alias("score")
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — centroid-bucketed variant
# ---------------------------------------------------------------------------


def ivf_centroids(
    embeddings: DataFrame, n_centroids: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic coarse quantizer: the n_centroids lowest-id vectors.

    A production deployment trains k-means centroids offline; the
    assignment/probe plumbing below is identical either way, which is the
    part that matters for the Spark engine."""
    rows = embeddings.orderBy(id_col).limit(n_centroids).collect()
    return [(i, list(r[vec_col])) for i, r in enumerate(rows)]


def with_ivf_buckets(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (argmax cosine) in one
    native projection; at scale the output is written partitioned by
    `centroid` so probes prune whole partitions."""
    v = F.col(vec_col)
    entries = []
    for cid, cvec in centroids:
        c = F.array(*[F.lit(float(x)) for x in cvec])
        entries.append(
            F.struct(cosine(v, c).alias("score"), F.lit(cid).alias("cid"))
        )
    best = F.greatest(*entries)
    return embeddings.select(
        F.col(id_col), v.alias(vec_col), best.cid.alias("centroid")
    )


def ivf_topk(
    indexed: DataFrame,
    centroids: list[tuple[int, list[float]]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k scanning only the n_probe nearest centroid buckets."""
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a) * sum(y * y for y in b))
        return d / na if na else 0.0

    probe = sorted(centroids, key=lambda c: -cos(query_vec, c[1]))[:n_probe]
    probe_ids = [cid for cid, _ in probe]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cand = indexed.filter(F.col("centroid").isin(probe_ids))
    scored = cand.select(F.col(id_col), cosine(F.col(vec_col), q).alias("score"))
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup detection: bucket self-join + exact cosine
    verify — the embedding analog of MinHash LSH dedup."""
    idx = with_lsh_buckets(embeddings, bits, id_col, vec_col)
    l, r = idx.alias("l"), idx.alias("r")
    pairs = l.join(
        r,
        (F.col("l.bucket") == F.col("r.bucket"))
        & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
    ).select(
        F.col(f"l.{id_col}").alias("a"),
        F.col(f"r.{id_col}").alias("b"),
        cosine(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}")).alias("score"),
    )
    return pairs.filter(F.col("score") >= threshold)
