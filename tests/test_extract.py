"""HTML->text extraction: byte-identity between the native Spark column
chain and the pure-python twin, plan shape (no Python eval, no shuffle),
and the driver-contract query."""

import random

import pytest
from pyspark.sql import functions as F

from linguistjs_spark.operators.extract import (
    extract_text,
    extract_text_col,
    extracted_pages,
    synth_html,
    synth_html_col,
)

ADVERSARIAL = [
    "", "<", ">", "<>", "a<b>c", "plain text",
    "<ſcript>x</ſcript>hello",   # U+017F long s: must NOT strip
    "<SCRIPT>var a='</div>';</ScRiPt>after",
    "<style media='x'>p{}</style>ok",
    "<!-- c --><p>one</p><!-- <p>no</p> -->",
    "a&amp;lt;b &nbsp;&quot;q&quot; &#39;s&apos;",
    "<p>a</p>\n\n\n\n<p>b</p>",
    "  \t\r\n hello \x0b\f world \n\n ",
    "<div\nclass='x'>multi\nline</div>",
    "<script>no close tag",
    "<br/><hr /><h3 id=1>T</h3>",
    "x \x1c\x1d\x1e\x1f y",                # \x1c-\x1f are NOT spec whitespace
    "<scripty>not script</scripty>",
    "<pé>unicode tagish</pé>",
    "text with K kelvin <K>tag</K>",  # U+212A: must NOT fold to k
    "&amp;amp;", "<td>a</td><em>i</em>",
    "<title >t</title >",
    "<p>trailing newline</p>\n",
]


def _fuzz_cases(n=300, seed=11):
    rng = random.Random(seed)
    alphabet = list("<>/ab &;#pdivscrptl-!\"'\n\t\r 139&ampltgnbsqéſK\x1c")
    return ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 120)))
            for _ in range(n)]


def test_twin_parity_adversarial_and_fuzz(spark):
    cases = ADVERSARIAL + _fuzz_cases()
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, h string"
    )
    got = {r.i: r.e for r in
           df.select("i", extract_text_col(F.col("h")).alias("e")).collect()}
    for i, c in enumerate(cases):
        assert got[i] == extract_text(c), (i, repr(c))


def test_twin_parity_fixture_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = (
        docs.select("doc_id", "text")
        .withColumn("html", synth_html_col(F.col("doc_id"), F.col("text")))
        .withColumn("ext", extract_text_col(F.col("html")))
        .collect()
    )
    assert rows
    for r in rows:
        assert r.html == synth_html(r.doc_id, r.text)
        assert r.ext == extract_text(r.html)


def test_extraction_spec_examples():
    # pin a few outputs so a spec change is a loud diff, not silent drift
    assert extract_text("<p>a</p><p>b</p>") == "a\n\nb"
    assert extract_text("<script>x</script>ok<style>y</style>") == "ok"
    assert extract_text("a&amp;lt;b") == "a&lt;b"
    assert extract_text("<em>i</em>t") == "i t"
    assert extract_text("<p>a</p>\n\n\n\n\n<p>b</p>") == "a\n\nb"


def test_extract_plan_is_native_no_shuffle(spark):
    pages = spark.createDataFrame(
        [("u", bytearray(b"<p>hi</p>"))], "url string, html binary"
    )
    plan = extracted_pages(pages)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # pure projection: no shuffle


def test_html_extract_query_matches_twin_md5(spark):
    import hashlib

    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    got = {r.doc_id: (r.ext_len, r.ext_md5)
           for r in entry_mod.q_html_extract(spark, sf).collect()}
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    for r in docs.collect():
        e = extract_text(synth_html(r.doc_id, r.text))
        assert got[r.doc_id] == (
            len(e), hashlib.md5(e.encode("utf-8")).hexdigest()
        ), r.doc_id


def test_pipeline_extract_html_stage(spark):
    """extract_html=True derives text from html for NULL-text rows only;
    result labels are identical to pre-extracting with the python twin."""
    import datetime

    from linguistjs_spark.config import QualityFilterConfig
    from linguistjs_spark.pipeline import run_pipeline

    t = datetime.datetime(2026, 1, 1)
    html_doc = synth_html(
        1, "the quick brown fox jumps over the lazy dog and runs away.\n"
           "it keeps running through the quiet green field all afternoon.")
    rows = [
        # html-only row: text must come from extraction
        ("https://a.example/page1.html", t, bytearray(html_doc.encode()), None),
        # provided text wins over html
        ("https://a.example/page2.html", t, bytearray(b"<p>ignored</p>"),
         "provided text stays exactly as given for this document row."),
        # binary html: never extracted, still binary-dropped
        ("https://a.example/blob", t, bytearray(b"PK\x03\x04\x00\x00junk"), None),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string"
    )
    cfg = QualityFilterConfig(extract_html=True)
    got = {r.url: r for r in run_pipeline(spark, pages, cfg).collect()}

    # equivalence: same pipeline with twin-extracted text provided up front
    pre_rows = [(rows[0][0], t, rows[0][2], extract_text(html_doc)),
                rows[1], rows[2]]
    pre = spark.createDataFrame(
        pre_rows, "url string, warc_ts timestamp, html binary, text string"
    )
    want = {r.url: r for r in
            run_pipeline(spark, pre, QualityFilterConfig()).collect()}

    assert set(got) == set(want)
    for url in got:
        g, w = got[url], want[url]
        assert (g.keep, g.keep_reason, g.lang, g.scrubbed_text) == \
               (w.keep, w.keep_reason, w.lang, w.scrubbed_text), url
    # binary html is never extracted; with no text the row is 'unreadable'
    # in BOTH variants (the F3 content sniff only reclassifies rows that
    # have text) — equivalence, not a new 'binary' label
    assert got["https://a.example/blob"].keep_reason == "unreadable"
    assert got["https://a.example/page1.html"].keep is True


def test_twin_parity_hypothesis(spark):
    """Property-based byte-parity: arbitrary tag-soup text drawn by
    hypothesis must extract identically in Spark and the python twin.
    One Spark job for the whole drawn corpus (collect examples first)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    soup = st.text(
        alphabet=st.sampled_from(
            list("<>/ab c&;#!-\"'\n\t\r\x0b\x0c\x1c\x1d scriptlyedivph123"
                 "&amp;&lt;nbsp;ſKé€\U0001F600")
        ),
        max_size=150,
    )
    drawn = []

    @settings(max_examples=150, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(soup)
    def collect_examples(s):
        drawn.append(s)

    collect_examples()
    cases = list(dict.fromkeys(drawn))  # dedupe, keep order
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, h string"
    )
    got = {r.i: r.e for r in
           df.select("i", extract_text_col(F.col("h")).alias("e")).collect()}
    for i, c in enumerate(cases):
        assert got[i] == extract_text(c), repr(c)


def test_noindex_flag_both_orders_and_case(spark):
    from linguistjs_spark.operators.extract import filter_noindex, noindex_col

    rows = [
        (1, '<meta name="robots" content="noindex">x'),
        (2, "<meta content='noindex, nofollow' name='robots'>x"),
        (3, '<META NAME="ROBOTS" CONTENT="NOINDEX">x'),
        (4, '<meta name="robots" content="index,follow">x'),
        (5, '<meta name="viewport" content="noindex">x'),  # wrong meta
        (6, "plain text, no tags"),
        (7, '<meta name="robots" class="z" content="all, noindex ">x'),
    ]
    df = spark.createDataFrame(
        [(i, h.encode()) for i, h in rows], "doc_id long, html binary"
    )
    got = {r.doc_id: r.f for r in
           df.select("doc_id", noindex_col(F.col("html")).alias("f")).collect()}
    assert got == {1: True, 2: True, 3: True, 4: False, 5: False,
                   6: False, 7: True}
    kept = {r.doc_id for r in filter_noindex(df).collect()}
    assert kept == {4, 5, 6}
