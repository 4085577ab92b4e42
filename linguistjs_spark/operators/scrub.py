"""PII/toxicity scrub + natural-language ID — native Column expressions.

The scrub is a regexp_replace chain over patterns constrained to the
Java/Python/RE2-identical subset (data/scrub.json) so the output is
byte-identical to the Python oracle per url (the north-star contract) and
DuckDB-checkable. Toxicity is a single regexp_count against a broadcast-sized
alternation. LangID is the fastText-fallback analog (SURVEY.md C10): per-lang
regexp_count scores + an array_max argmax — all JVM-side; a real fastText
model can be swapped in via a pandas UDF when the package is available.

Java regexes get a (?U) prefix so \\b/\\w are unicode like Python's re.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from ..hash_twin import spark_xxhash64
from ..metadata import load_langid_config, load_scrub_config


def _java(pat: str) -> str:
    """Unicode-class flag for JVM regex, matching Python re's default."""
    return "(?U)" + pat


def scrubbed_col(text: Column) -> Column:
    out = text
    for rule in load_scrub_config()["pii_rules"]:
        out = F.regexp_replace(out, _java(rule["pattern"]), rule["replacement"])
    # Presence gate: every PII rule's pattern requires a digit or '@'
    # (emails need '@'; IP/SSN/CC/phone need digits) — except the
    # email_local_residue cleanup, which fires on a literal '<EMAIL>'
    # (possibly pre-existing in the input) — so texts matching none of
    # those are provably fixpoints of the chain: one cheap scan replaces
    # six full regexp_replace passes for them, and the CASE WHEN branch
    # keeps the output byte-identical either way.
    # (tests/test_pipeline_parity.py::test_scrub_gate_is_exact fuzzes this.)
    return F.when(text.rlike("[0-9@]|<EMAIL>"), out).otherwise(text)


def tokens_col(text: Column) -> Column:
    """Lowered ``(?U)\\W+`` tokenization — the shared word stream for
    langid and toxicity scoring (compute once per row, pass to both)."""
    return F.split(F.lower(text), r"(?U)\W+")


# ---------------------------------------------------------------------------
# single-pass word-count table (stopword langid + toxicity in ONE token scan)
# ---------------------------------------------------------------------------

_N_BUCKETS = 512


@lru_cache(maxsize=1)
def _word_table():
    """Hash-bucketed literal word table shared by langid + toxicity.

    Every stopword (16 languages) and toxicity word gets a bitmask: bit i =
    "counts toward stopword language i" (languages in sorted order), the top
    bit = "counts toward toxicity". Words are bucketed by
    ``pmod(xxhash64(word), 512)`` — the same hash the Column expression
    computes per token via ``F.xxhash64`` (hash_twin.spark_xxhash64 is the
    pinned pure-Python twin) — so a token lookup is one O(1) ``element_at``
    plus an ~0-2-element bucket scan, instead of one array traversal per
    language (O(langs x |stopwords|) per token, the round-2 formulation).

    Returns (words_sql, masks_sql, stop_langs, tox_bit): two SQL literal
    strings (parsed with ONE F.expr call each — building 512 nested
    F.array/F.lit columns costs ~2500 py4j round-trips per plan otherwise)
    plus the sorted stopword-language list and the toxicity bit index.
    """
    conf = load_langid_config()
    scrub = load_scrub_config()
    stop_langs = sorted(conf["stopword_langs"])
    tox_bit = len(stop_langs)
    mask_by_word: dict[str, int] = {}
    for i, lang in enumerate(stop_langs):
        for w in set(conf["stopword_langs"][lang]):
            mask_by_word[w] = mask_by_word.get(w, 0) | (1 << i)
    for w in set(scrub["toxicity_words"]):
        mask_by_word[w] = mask_by_word.get(w, 0) | (1 << tox_bit)
    buckets: list[list[tuple[str, int]]] = [[] for _ in range(_N_BUCKETS)]
    for w in sorted(mask_by_word):
        buckets[spark_xxhash64(w) % _N_BUCKETS].append((w, mask_by_word[w]))
    words_sql = (
        "array(" + ",".join(
            "array(" + ",".join("'" + w.replace("'", "''") + "'" for w, _ in b) + ")"
            if b else "cast(array() as array<string>)"
            for b in buckets
        ) + ")"
    )
    masks_sql = (
        "array(" + ",".join(
            "array(" + ",".join(str(m) for _, m in b) + ")"
            if b else "cast(array() as array<int>)"
            for b in buckets
        ) + ")"
    )
    return words_sql, masks_sql, stop_langs, tox_bit


def token_counts_col(toks: Column) -> Column:
    """ONE fold over the token stream -> ``array<int>`` of per-language
    stopword hit counts (sorted language order) with the toxicity-word count
    as the final element (`_word_table` bit layout).

    O(tokens) regardless of language count, in TWO phases chosen by A/B
    (BASELINE.md round 3): (1) one ``transform`` maps each token to its
    bitmask — xxhash64 + O(1) bucket fetch + a <=2-element bucket scan —
    then drops the misses (the common case) with one int ``filter``;
    (2) one ``aggregate`` fold over the surviving hit masks increments the
    17 counters. The phase split matters: the earlier formulation did the
    lookup INSIDE the aggregate step, so every token paid the fold's
    struct/let machinery and the hot loop allocated per-token; hoisting the
    lookup into a primitive-int transform measured ~1.9x faster isolated.
    (The round-2 per-language ``F.filter``/``array_contains`` formulation —
    O(tokens x langs x |stopwords|) — is allocation-free and therefore
    hides well behind the pipeline's Python-UDF critical path, but loses
    in isolation and scales linearly in language count; see BASELINE.md
    round-3 A/B table before touching this again.)"""
    from .dedup import _let

    words_sql, masks_sql, stop_langs, tox_bit = _word_table()
    words_lit = F.expr(words_sql)
    masks_lit = F.expr(masks_sql)
    n_counters = tox_bit + 1
    pow2 = F.array(*[F.lit(1 << i) for i in range(n_counters)])

    def lookup(x: Column) -> Column:
        idx = (F.pmod(F.xxhash64(x), F.lit(_N_BUCKETS)) + 1).cast("int")
        # let-bind the position: HOF lambda children are interpreted with
        # no common-subexpression elimination, so a bare reference would
        # re-run the bucket probe per use
        return _let(
            F.array_position(F.element_at(words_lit, idx), x).cast("int"),
            lambda pos: F.when(
                pos > 0, F.element_at(F.element_at(masks_lit, idx), pos)
            ).otherwise(F.lit(0)),
        )

    def step(acc: Column, m: Column) -> Column:
        return F.transform(
            acc,
            lambda c, i: c
            + F.when(
                m.bitwiseAND(F.element_at(pow2, i + 1)) != 0, F.lit(1)
            ).otherwise(F.lit(0)),
        )

    hit_masks = F.filter(F.transform(toks, lookup), lambda m: m != 0)
    return F.aggregate(
        hit_masks, F.array_repeat(F.lit(0), n_counters), step
    )


def toxicity_hits_col(
    text: Column, toks: Column | None = None, counts: Column | None = None
) -> Column:
    """Count of toxicity-word occurrences. With a shared `counts` column
    (token_counts_col output) it is a free O(1) element read — the pipeline
    uses this so toxicity costs nothing beyond the langid fold. With only a
    pre-tokenized column the count is array membership over the token
    stream (every word in the list is \\w+-only and lowercase, so token
    equality equals the case-insensitive \\b-bounded regex count — same
    argument as the langid stopwords; cheaper than the full fold when
    langid is off); without either it falls back to the alternation scan."""
    conf = load_scrub_config()
    if counts is not None:
        _, _, _, tox_bit = _word_table()
        return F.element_at(counts, tox_bit + 1)
    if toks is not None:
        warr = F.array(*[F.lit(w) for w in sorted(set(conf["toxicity_words"]))])
        return F.size(F.filter(toks, lambda x: F.array_contains(warr, x)))
    pat = r"(?i)\b(" + "|".join(conf["toxicity_words"]) + r")\b"
    return F.regexp_count(text, F.lit(_java(pat)))


def _load_ft_model(model_path: str):
    """Prefer the real fasttext package; fall back to the repo's pure-numpy
    reader of the same PUBLIC ``.bin`` format (``fasttext_bin.load_model``)
    so a real model FILE is loadable — and the binary format testable —
    even where the package is absent (VERDICT r03 item 7). Both return the
    same ``predict(text, k)`` surface."""
    try:
        import fasttext

        return fasttext.load_model(model_path)
    except ImportError:
        from ..fasttext_bin import load_model

        return load_model(model_path)


def fasttext_nl_lang_col(text: Column, model_path: str):
    """Optional real-fastText langid (production hook). Iterator pandas UDF
    with a per-executor lazy model singleton — loaded once per python
    worker, predicted in batches. Returns None (caller keeps the built-in
    langid) unless the package is importable OR ``model_path`` is a real
    fastText ``.bin`` the built-in reader can serve."""
    try:
        import fasttext  # noqa: F401
    except ImportError:
        from ..fasttext_bin import is_fasttext_bin

        if not is_fasttext_bin(model_path):
            return None

    from pyspark.sql.functions import pandas_udf

    # the Iterator[...] hints are load-bearing: they select the
    # ITERATOR_OF_SERIES eval type (one model load per worker, amortized
    # over all batches); without them pyspark treats the generator as a
    # SERIES_TO_SERIES body and rejects it at runtime — caught by
    # tests/test_fasttext_hook.py the first time the hook actually ran.
    # `Iterator`/`pd` must be module-level names: postponed annotations
    # are evaluated against the module globals by pyspark's hint resolver.
    @pandas_udf("string")
    def ft_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        from linguistjs_spark.operators.scrub import _load_ft_model

        model = _load_ft_model(model_path)
        for s in batches:
            labels = []
            for t in s.fillna(""):
                pred = model.predict(t.replace("\n", " ")) if t else ((), ())
                # empty prediction (OOV-only input) -> NULL, same as no text
                labels.append(
                    pred[0][0].removeprefix("__label__") if pred[0] else None
                )
            yield pd.Series(labels, dtype=object)

    return ft_udf(text)


def nl_lang_col(
    text: Column, toks: Column | None = None, counts: Column | None = None
) -> Column:
    """argmax over per-language scores; ties break to the greater lang code,
    exactly like oracle._LangIdModel.predict (max over (score, lang)).

    Stopword scoring is ONE `token_counts_col` fold over the token stream
    (shared with toxicity when the pipeline passes `counts`): per-language
    hit counts come out of a single O(tokens) pass through the hash-bucketed
    word table, so the stage cost is flat in the number of languages
    (VERDICT r02 item 2 — the previous per-language `F.filter`/
    `array_contains` formulation re-traversed the token array 16 times).
    Every stopword is ``\\w+``-only, so token equality is exactly the
    ``\\b word \\b`` match count the Python oracle computes. Script scores
    stay as single char-class regexp_count scans (DFA-cheap), gated by one
    ASCII pre-scan: pure-ASCII text (the overwhelming majority of a web
    corpus) can't hit any script class, and CASE WHEN short-circuits per
    row, so those rows pay 1 scan, not 9. Per-language scores are merged at
    DRIVER time (a lang in both tables gets one summed expression)."""
    from .dedup import _let

    conf = load_langid_config()
    if counts is None:
        counts = token_counts_col(toks if toks is not None else tokens_col(text))
    _, _, stop_langs, _ = _word_table()
    bound = F.struct(
        counts.alias("c"), text.rlike("[^\\x00-\\x7F]").alias("has_non_ascii")
    )

    def build(b: Column) -> Column:
        cnts = b.getField("c")
        non_ascii = b.getField("has_non_ascii")
        score_parts: dict[str, list[Column]] = {}
        for lang, pat in conf["script_langs"].items():
            score_parts.setdefault(lang, []).append(
                F.when(
                    non_ascii, F.lit(3) * F.regexp_count(text, F.lit(_java(pat)))
                ).otherwise(F.lit(0))
            )
        for i, lang in enumerate(stop_langs):
            score_parts.setdefault(lang, []).append(F.element_at(cnts, i + 1))
        entries = []
        for lang in sorted(score_parts):
            total = score_parts[lang][0]
            for extra in score_parts[lang][1:]:
                total = total + extra
            entries.append(F.struct(total.alias("score"), F.lit(lang).alias("lang")))
        best = F.greatest(*entries)
        min_hits = conf["min_confidence_hits"]
        # let-bind `best`: referencing it twice (condition + value) would
        # duplicate the entire greatest(...) tree in the plan — runtime
        # subexpr elimination hides the execution cost, but the doubled
        # tree still inflates Catalyst analysis/optimization time
        return _let(
            best,
            lambda b: F.when(
                b.getField("score") >= min_hits, b.getField("lang")
            ).otherwise(F.lit(None)),
        )

    return _let(bound, build)
