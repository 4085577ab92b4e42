"""Distributed BPE vocabulary learning (Sennrich et al. 2016) in
DataFrame algebra.

A training-data pipeline that feeds a tokenizer needs to LEARN that
tokenizer from the corpus; byte-pair encoding is the standard algorithm
(Sennrich, Haddow & Birch, "Neural Machine Translation of Rare Words with
Subword Units", ACL 2016 — the public ``subword-nmt/learn_bpe.py``
semantics are reimplemented here from the paper's description, not
ported). The reference engine has no tokenizer tier at all; this is one
of the "operations a large-scale training-data pipeline would need".

Spark-first shape — the key scale observation is that after the FIRST
groupBy, everything operates on the *distinct-word* table, not the
corpus:

  corpus (10^12 docs)
    -> explode whitespace tokens -> groupBy word   [the ONE corpus-sized
       shuffle, map-side combined; ~10^8 distinct words at web scale]
    -> per merge iteration over the word table only:
         adjacent-pair explode -> groupBy (a,b) SUM(cnt)   [tiny shuffle]
         -> argmax pair (ONE bounded driver row, same stance as the ANN
            query-vector collects)
         -> greedy left-to-right merge as an F.aggregate fold (zero
            shuffle, all codegen), localCheckpoint to truncate lineage
            (the resumable-pagerank pattern).

Encoding then never touches per-document arrays either:
``bpe_token_counts`` encodes each DISTINCT word once (driver-built fold
expression over the word table) and weights by the word count — corpus
text is read exactly once, in the word-count pass.

Determinism contract: pair counts are integers; ties break by
(count DESC, left ASC, right ASC) where string order is Spark's UTF-8
binary comparison — the python twin sorts by ``encode('utf-8')`` to
match. Words are split into Unicode code points (Spark's ``split(w, '')``
advances zero-width matches by code point, same as python ``list(w)``);
the per-word terminal symbol is ``</w>`` exactly as in the paper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .model_filter import FASTTEXT_WS_RE, tokens_col

END_OF_WORD = "</w>"
_SENT = "\x00"  # fold carry sentinel; cannot collide: \x00 is a delimiter


def word_count_table(docs: DataFrame, text_col: str = "text",
                     max_word_chars: int = 1000) -> DataFrame:
    """``(word, cnt)`` over whitespace tokens — the one corpus-sized
    shuffle. Words longer than ``max_word_chars`` (unsegmented binary
    blobs; they would make the merge fold quadratic) are dropped, as is
    NULL/empty text. Tokenization is model_filter.tokens_col — ONE
    delimiter contract shared with the classifier tier."""
    toks = docs.select(
        F.explode(tokens_col(F.col(text_col))).alias("word")
    )
    return (
        toks.where(F.length("word") <= max_word_chars)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def symbols_col(word: Column) -> Column:
    """Code-point symbol array + the ``</w>`` terminal."""
    chars = F.filter(F.split(word, ""), lambda x: x != F.lit(""))
    return F.concat(chars, F.array(F.lit(END_OF_WORD)))


def pair_counts(vocab: DataFrame, syms_col: str = "syms",
                cnt_col: str = "cnt") -> DataFrame:
    """Adjacent-pair frequencies ``(a, b, n)`` over the word table.
    Every adjacent position counts (overlapping repeats included), each
    weighted by the word's corpus count — the paper's ``get_stats``."""
    s = F.col(syms_col)
    idx = F.when(F.size(s) >= 2, F.sequence(F.lit(1), F.size(s) - 1)) \
        .otherwise(F.array().cast("array<int>"))
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(s, i).alias("a"),
            F.element_at(s, i + 1).alias("b"),
        ),
    )
    return (
        vocab.select(F.explode(pairs).alias("p"), F.col(cnt_col))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum(cnt_col).alias("n"))
    )


def merge_pair_col(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right non-overlapping replacement of the adjacent
    pair ``(a, b)`` with the merged symbol — one in-array fold, zero
    shuffle. State = (out, carry): carry is the last symbol not yet
    committed; a match commits the merged symbol and clears the carry, so
    'aaaa' under (a,a) becomes ['aa','aa'], exactly the reference
    semantics."""
    merged = a + b
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(_SENT).alias("carry"),
    )

    def _step(acc: Column, x: Column) -> Column:
        take = (acc["carry"] == F.lit(a)) & (x == F.lit(b))
        return F.struct(
            F.when(take, F.concat(acc["out"], F.array(F.lit(merged))))
            .when(acc["carry"] == F.lit(_SENT), acc["out"])
            .otherwise(F.concat(acc["out"], F.array(acc["carry"])))
            .alias("out"),
            F.when(take, F.lit(_SENT)).otherwise(x).alias("carry"),
        )

    return F.aggregate(
        syms, init, _step,
        lambda acc: F.when(acc["carry"] == F.lit(_SENT), acc["out"])
        .otherwise(F.concat(acc["out"], F.array(acc["carry"]))),
    )


def learn_bpe(word_counts: DataFrame, num_merges: int,
              min_count: int = 2) -> tuple[list[tuple], DataFrame]:
    """Learn up to ``num_merges`` merges; returns ``(merges, vocab)``
    where merges is ``[(rank, left, right, pair_count), ...]`` and vocab
    is the word table with the final ``syms`` segmentation.

    Each iteration collects exactly ONE row (the argmax pair — bounded)
    and localCheckpoints the word table so the fold expressions don't
    stack across iterations. Stops early when the best pair's count
    drops below ``min_count`` (the paper's stopping criterion)."""
    vocab = word_counts.select(
        symbols_col(F.col("word")).alias("syms"), "cnt"
    ).localCheckpoint()
    merges: list[tuple] = []
    for rank in range(num_merges):
        best = (
            pair_counts(vocab)
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_count:
            break
        a, b, n = best[0]["a"], best[0]["b"], best[0]["n"]
        merges.append((rank, a, b, int(n)))
        vocab = vocab.withColumn(
            "syms", merge_pair_col(F.col("syms"), a, b)
        ).localCheckpoint()
    return merges, vocab


_FOLD_BATCH = 16  # merges per expression tree in the batched encode


def encode_word_col(word: Column, merges: list[tuple]) -> Column:
    """Segment one word with the learned merges, applied in rank order —
    a driver-built chain of folds in ONE expression. Intended for the
    DISTINCT-word table, never for per-document rows, and only for SHORT
    merge lists: every merge nests another F.aggregate, and past a few
    dozen the analyzer/codegen blow up. Real vocabularies (10k-50k
    merges) must go through :func:`encode_words_df`, which batches the
    folds with localCheckpoint barriers; this guard fails loud instead of
    letting the driver stack-overflow."""
    if len(merges) > 4 * _FOLD_BATCH:
        raise ValueError(
            f"{len(merges)} merges would nest {len(merges)} aggregate "
            "expressions in one tree — use encode_words_df for real "
            "merge counts"
        )
    syms = symbols_col(word)
    for _, a, b, _ in merges:
        syms = merge_pair_col(syms, a, b)
    return syms


def encode_words_df(words: DataFrame, merges: list[tuple],
                    word_col: str = "word",
                    fold_batch: int = _FOLD_BATCH) -> DataFrame:
    """Segment a word table with ANY number of merges: folds are applied
    ``fold_batch`` ranks at a time with a localCheckpoint between batches
    (the learn_bpe lineage-truncation stance), so expression depth is
    bounded regardless of vocabulary size. Adds ``syms`` to ``words``."""
    out = words.withColumn("syms", symbols_col(F.col(word_col)))
    for i in range(0, len(merges), fold_batch):
        syms = F.col("syms")
        for _, a, b, _ in merges[i:i + fold_batch]:
            syms = merge_pair_col(syms, a, b)
        out = out.withColumn("syms", syms)
        if i + fold_batch < len(merges):
            out = out.localCheckpoint()
    return out


def bpe_token_counts(docs: DataFrame, merges: list[tuple],
                     text_col: str = "text",
                     max_word_chars: int = 1000) -> DataFrame:
    """Corpus token frequencies under the learned segmentation:
    ``(token, n)``. The corpus is read once (word-count pass); encoding
    runs over the distinct-word table (batched folds) weighted by
    ``cnt``."""
    wc = word_count_table(docs, text_col, max_word_chars)
    enc = encode_words_df(wc, merges).select(
        F.explode("syms").alias("token"), "cnt"
    )
    return enc.groupBy("token").agg(F.sum("cnt").alias("n"))


def bpe_doc_token_counts(docs: DataFrame, merges: list[tuple],
                         id_col: str = "doc_id", text_col: str = "text",
                         max_word_chars: int = 1000) -> DataFrame:
    """Per-DOCUMENT token counts under the learned segmentation:
    ``(id_col, n_tokens)`` — the input sequence packing needs when the
    budget is tokenizer tokens, not the whitespace proxy.

    Shape mirrors model_filter: the distinct-word table is segmented once
    (fold expressions never run on per-document rows), becomes a
    (word, n_tok) dim, and per-doc counting is explode_outer -> left
    BroadcastHashJoin -> one groupBy sum. Words the dim misses (none when
    the dim is built from the same corpus) fall back to their unmerged
    symbol count; over-long words count 0, consistent with
    :func:`word_count_table` dropping them from learning."""
    words = F.filter(
        tokens_col(F.col(text_col)),
        lambda x: F.length(x) <= max_word_chars,
    )
    toks = docs.select(
        F.col(id_col), F.explode_outer(words).alias("word")
    )
    dim = encode_words_df(
        docs.select(F.explode(words).alias("word")).distinct(), merges
    ).select("word", F.size("syms").alias("n_tok"))
    j = toks.join(F.broadcast(dim), "word", "left")
    per_word = F.coalesce(
        F.col("n_tok"),
        F.when(F.col("word").isNotNull(),
               F.size(symbols_col(F.col("word")))),
        F.lit(0),
    )
    return j.groupBy(id_col).agg(
        F.sum(per_word).cast("long").alias("n_tokens")
    )


# ---------------------------------------------------------------------------
# python twin (oracle / parity)
# ---------------------------------------------------------------------------

import re as _re
from collections import Counter as _Counter

_WS_SPLIT = _re.compile(FASTTEXT_WS_RE)


def word_counts_local(texts, max_word_chars: int = 1000) -> dict[str, int]:
    c: _Counter = _Counter()
    for t in texts:
        for w in _WS_SPLIT.split(t or ""):
            if w and len(w) <= max_word_chars:
                c[w] += 1
    return dict(c)


def merge_word_local(syms: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def learn_bpe_local(word_counts: dict[str, int], num_merges: int,
                    min_count: int = 2):
    """Twin of :func:`learn_bpe` — same pair semantics, same UTF-8-binary
    tie-break. Returns ``(merges, vocab)`` with vocab as
    ``{word: [symbols]}``."""
    vocab = {w: list(w) + [END_OF_WORD] for w in word_counts}
    merges: list[tuple] = []
    for rank in range(num_merges):
        stats: _Counter = _Counter()
        for w, syms in vocab.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += c
        if not stats:
            break
        (a, b), n = min(
            stats.items(),
            key=lambda kv: (-kv[1], kv[0][0].encode("utf-8"),
                            kv[0][1].encode("utf-8")),
        )
        if n < min_count:
            break
        merges.append((rank, a, b, int(n)))
        vocab = {w: merge_word_local(s, a, b) for w, s in vocab.items()}
    return merges, vocab


def token_counts_local(word_counts: dict[str, int],
                       merges: list[tuple]) -> dict[str, int]:
    c: _Counter = _Counter()
    for w, n in word_counts.items():
        syms = list(w) + [END_OF_WORD]
        for _, a, b, _ in merges:
            syms = merge_word_local(syms, a, b)
        for s in syms:
            c[s] += n
    return dict(c)


def doc_token_counts_local(texts_with_ids, merges: list[tuple],
                           max_word_chars: int = 1000) -> dict:
    """Twin of :func:`bpe_doc_token_counts` over ``[(id, text), ...]``."""
    seg_cache: dict[str, int] = {}

    def n_tok(w: str) -> int:
        if w not in seg_cache:
            syms = list(w) + [END_OF_WORD]
            for _, a, b, _ in merges:
                syms = merge_word_local(syms, a, b)
            seg_cache[w] = len(syms)
        return seg_cache[w]

    out = {}
    for i, t in texts_with_ids:
        out[i] = sum(
            n_tok(w)
            for w in _WS_SPLIT.split(t or "")
            if w and len(w) <= max_word_chars
        )
    return out
