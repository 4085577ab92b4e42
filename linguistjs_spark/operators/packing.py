"""Sequence packing for LLM pretraining data prep (graft first-class
component): assign every document a position in a fixed-token-budget
training sequence ("pack") using the concatenate-and-chunk scheme —
documents are laid end-to-end in a deterministic order and the stream is
cut every ``max_tokens`` tokens, so a document may span consecutive packs
(GPT-style pretraining packing; the alternative greedy no-split bin-pack
needs a sequential running-state reset and cannot be expressed as a
window — deliberately out of scope).

Scale design (the part that matters at 10^12 docs):
  - A GLOBAL concatenation order would need one total sort — a
    single-partition bottleneck. Instead documents are deterministically
    bucketed and each bucket is an INDEPENDENT token stream (standard
    practice in distributed pretraining prep: shards are packed
    separately). Pack identity is the composite (bucket, pack_id).
  - The per-bucket layout is ONE window cumsum: shuffle by bucket, sort
    within bucket, running total — no joins, no Python, all codegen.
    ``n_buckets`` sizes the sort runs: at 10^12 docs and 2^14 buckets a
    bucket holds ~6e7 docs, a few GB of (id, count) pairs per task with
    spill — and bucket count is a free knob.
  - Token counts are the one regexp_count scan from text_stats (JVM-side);
    pass ``n_tokens_col`` to reuse a precomputed column instead.

Every value is integer arithmetic over a deterministic order, so a literal
SQL window restates it exactly (oracle-checkable without tolerance).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text_stats import bpe_token_count_col


def pack_sequences(
    docs: DataFrame,
    max_tokens: int = 2048,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_col: Column | None = None,
    n_tokens_col: Column | None = None,
) -> DataFrame:
    """Per-document pack assignment: ``(id, bucket, n_tokens, start_offset,
    pack_id, end_pack_id, n_spans)``.

    ``start_offset`` is the document's token offset within its bucket's
    stream; ``pack_id = start_offset // max_tokens`` is the pack its first
    token lands in; ``end_pack_id`` is the pack of its last token (equal to
    pack_id for empty docs by convention); ``n_spans`` counts the packs it
    touches. Buckets default to ``xxhash64(id) % n_buckets``; pass
    ``bucket_col`` for an oracle-friendly or locality-preserving scheme.
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    bucket = (
        bucket_col
        if bucket_col is not None
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
    ).cast("long")
    n_tok = (
        n_tokens_col
        if n_tokens_col is not None
        else bpe_token_count_col(F.col(text_col))
    )
    n_tok = F.coalesce(n_tok.cast("long"), F.lit(0))

    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    lit_max = F.lit(int(max_tokens))
    pack_id = F.floor(start / lit_max)
    # last token's pack; empty docs stay in their start pack
    end_pack = F.greatest(
        pack_id, F.floor((start + F.col("n_tokens") - 1) / lit_max)
    )
    return (
        docs.select(
            F.col(id_col), bucket.alias("bucket"), n_tok.alias("n_tokens")
        )
        .withColumn("start_offset", start)
        .withColumn("pack_id", pack_id)
        .withColumn("end_pack_id", end_pack)
        .withColumn("n_spans", F.col("end_pack_id") - F.col("pack_id") + 1)
    )


def packing_summary(packed: DataFrame, max_tokens: int) -> DataFrame:
    """Per-bucket packing stats: doc/token totals, number of packs the
    bucket's stream cuts into, straddling-doc count, and an order-sensitive
    assignment checksum (``sum(pack_id * id)``) that pins every document's
    pack to the oracle, not just the totals. One groupBy on the bucket key
    (already the window's partitioning — no extra shuffle under AQE)."""
    id_col = packed.columns[0]
    return packed.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        (F.floor((F.sum("n_tokens") - 1) / max_tokens) + 1)
        .cast("long")
        .alias("n_packs"),
        F.sum((F.col("n_spans") > 1).cast("long")).alias("n_straddling"),
        F.sum(F.col("pack_id") * F.col(id_col)).cast("long").alias(
            "assign_checksum"
        ),
    )
