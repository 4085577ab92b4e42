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

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import QualityFilterConfig
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


def toxicity_hits_col(text: Column, toks: Column | None = None) -> Column:
    """Count of toxicity-word occurrences. With a pre-tokenized column the
    count is array membership over the shared token stream (every word in
    the list is \\w+-only and lowercase, so token equality equals the
    case-insensitive \\b-bounded regex count — same argument as the langid
    stopwords); without one it falls back to the single alternation scan."""
    conf = load_scrub_config()
    if toks is not None:
        warr = F.array(*[F.lit(w) for w in sorted(set(conf["toxicity_words"]))])
        return F.size(F.filter(toks, lambda x: F.array_contains(warr, x)))
    pat = r"(?i)\b(" + "|".join(conf["toxicity_words"]) + r")\b"
    return F.regexp_count(text, F.lit(_java(pat)))


def fasttext_nl_lang_col(text: Column, model_path: str):
    """Optional real-fastText langid (production hook; the package is absent
    in this container). Iterator pandas UDF with a per-executor lazy model
    singleton — loaded once per python worker, predicted in batches."""
    try:
        import fasttext  # noqa: F401
    except ImportError:
        return None

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def ft_udf(batches):
        import fasttext

        model = fasttext.load_model(model_path)
        for s in batches:
            labels = [
                model.predict(t.replace("\n", " "))[0][0].removeprefix("__label__")
                if t
                else None
                for t in s.fillna("")
            ]
            yield pd.Series(labels, dtype=object)

    return ft_udf(text)


def nl_lang_col(text: Column, toks: Column | None = None) -> Column:
    """argmax over per-language scores; ties break to the greater lang code,
    exactly like oracle._LangIdModel.predict (max over (score, lang)).

    Stopword scoring tokenizes ONCE (split on ``(?U)\\W+`` of the lowered
    text, let-bound so the split runs once per row — or reusing a shared
    pre-tokenized column via `toks`) and counts per-language membership
    with array ops, instead of running one case-insensitive alternation
    regex scan per language — every stopword is ``\\w+``-only, so token
    equality is exactly the ``\\b word \\b`` match count the previous
    formulation (and the Python oracle) computes, at one regex traversal of
    the text instead of eight. Script scores stay as single char-class
    regexp_count scans (DFA-cheap). Per-language scores are merged at DRIVER
    time (a lang appearing in both tables gets one summed expression)."""
    from .dedup import _let

    conf = load_langid_config()
    if toks is None:
        toks = tokens_col(text)
    # One cheap pre-scan gates the 9 per-script scans: pure-ASCII text (the
    # overwhelming majority of a web corpus) can't hit any script class, and
    # CASE WHEN short-circuits per row, so those rows pay 1 scan, not 9.
    bound = F.struct(
        toks.alias("t"), text.rlike("[^\\x00-\\x7F]").alias("has_non_ascii")
    )

    def build(b: Column) -> Column:
        words = b.getField("t")
        non_ascii = b.getField("has_non_ascii")
        score_parts: dict[str, list[Column]] = {}
        for lang, pat in conf["script_langs"].items():
            score_parts.setdefault(lang, []).append(
                F.when(
                    non_ascii, F.lit(3) * F.regexp_count(text, F.lit(_java(pat)))
                ).otherwise(F.lit(0))
            )
        for lang, wlist in conf["stopword_langs"].items():
            warr = F.array(*[F.lit(w) for w in sorted(set(wlist))])
            score_parts.setdefault(lang, []).append(
                F.size(F.filter(words, lambda x: F.array_contains(warr, x)))
            )
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
