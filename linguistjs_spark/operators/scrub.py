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
    return out


def toxicity_hits_col(text: Column) -> Column:
    conf = load_scrub_config()
    pat = r"(?i)\b(" + "|".join(conf["toxicity_words"]) + r")\b"
    return F.regexp_count(text, F.lit(_java(pat)))


def nl_lang_col(text: Column) -> Column:
    """argmax over per-language scores; ties break to the greater lang code,
    exactly like oracle._LangIdModel.predict (max over (score, lang))."""
    conf = load_langid_config()
    entries = []
    for lang, pat in conf["script_langs"].items():
        score = F.lit(3) * F.regexp_count(text, F.lit(_java(pat)))
        entries.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    for lang, words in conf["stopword_langs"].items():
        pat = r"(?i)\b(" + "|".join(words) + r")\b"
        score = F.regexp_count(text, F.lit(_java(pat)))
        entries.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    # same lang can appear in both tables: sum its two scores before argmax
    arr = F.array(*entries)
    langs = F.array_distinct(F.transform(arr, lambda e: e.lang))
    summed = F.transform(
        langs,
        lambda l: F.struct(
            F.aggregate(
                F.filter(arr, lambda e: e.lang == l),
                F.lit(0),
                lambda acc, e: acc + e.score,
            ).alias("score"),
            l.alias("lang"),
        ),
    )
    best = F.array_max(summed)
    min_hits = conf["min_confidence_hits"]
    return F.when(best.score >= min_hits, best.lang).otherwise(F.lit(None))
