"""Flesch–Kincaid readability operator: twin bit-equality + band edges.

No transcendentals in the grade formula, so the python twin asserts
EXACT double equality (same three integer counts, same operation order).
The DuckDB restatement is swept by test_entry_queries.py via the
readability_bands registry row.
"""

import re

import pytest
from pyspark.sql import functions as F

from linguistjs_spark.operators.quality import _WORD_RUN_PAT
from linguistjs_spark.operators.text_stats import (
    SENTENCE_END_PAT,
    VOWEL_RUN_PAT,
    _FK_C,
    _FK_S,
    _FK_W,
    fk_band_col,
    fk_grade_col,
)


def _twin_grade(text):
    if text is None:
        return None
    w = len(re.findall(_WORD_RUN_PAT, text))
    if w == 0:
        return None
    s = max(len(re.findall(SENTENCE_END_PAT, text)), 1)
    y = len(re.findall(VOWEL_RUN_PAT, text.lower()))
    return _FK_W * (float(w) / float(s)) + _FK_S * (float(y) / float(w)) - _FK_C


def _twin_band(grade):
    if grade is None:
        return "nontext"
    if grade < 6:
        return "elementary"
    if grade < 9:
        return "middle"
    if grade < 13:
        return "high"
    return "college"


_ROWS = [
    (0, "The cat sat on the mat. It was warm."),          # simple prose
    (1, "Notwithstanding institutional heterogeneity, representativeness "
        "considerations predominate throughout contemporary epistemology."),
    (2, None),                                             # NULL text
    (3, ""),                                               # empty
    (4, "   \t\n  "),                                      # whitespace only
    (5, "no terminal punctuation here just a fragment"),   # sentences -> 1
    (6, "Yes! Go? Now... Stop!!"),                         # run punctuation
    (7, "bcd fgh jkl"),                                    # zero vowels
    (8, "a. e. i. o. u. y."),                              # vowel-only words
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(_ROWS, "doc_id long, text string")


def test_fk_grade_matches_twin_bitwise(docs):
    got = {
        r["doc_id"]: (r["grade"], r["band"])
        for r in docs.select(
            "doc_id",
            fk_grade_col(F.col("text")).alias("grade"),
            fk_band_col(fk_grade_col(F.col("text"))).alias("band"),
        ).collect()
    }
    for d, t in _ROWS:
        grade = _twin_grade(t)
        assert got[d][0] == grade, (d, got[d][0], grade)
        assert got[d][1] == _twin_band(grade), d


def test_fk_edges(docs):
    got = {
        r["doc_id"]: r["grade"]
        for r in docs.select(
            "doc_id", fk_grade_col(F.col("text")).alias("grade")
        ).collect()
    }
    # NULL / empty / whitespace-only -> no words -> NULL grade
    assert got[2] is None and got[3] is None and got[4] is None
    # fragment without terminal punctuation: sentence count floors at 1
    # (the twin floors identically; a 0-floor would divide by zero)
    assert got[5] == _twin_grade(_ROWS[5][1]) and got[5] is not None
    # '!!', '...' count as ONE sentence terminator run each
    assert got[6] == _twin_grade(_ROWS[6][1])
    # zero vowel runs: grade is finite (syllable term 0), not NULL/NaN
    assert got[7] == _FK_W * 3.0 - _FK_C


def test_fk_plan_native(docs):
    plan = (
        docs.select(fk_grade_col(F.col("text")).alias("g"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan
    assert "Exchange" not in plan  # pure projection, no shuffle
