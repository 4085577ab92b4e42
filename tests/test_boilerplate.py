"""jusText-style boilerplate classifier: Spark-vs-twin parity (labels and
content bytes), handcrafted label-class and context-pass cases, plan shape
(no Python eval, no shuffle), and the driver-contract query."""

import random

from pyspark.sql import functions as F

from linguistjs_spark.operators.boilerplate import (
    LENGTH_LOW,
    classify_fragments,
    content_text,
    synth_linked_html,
    synth_linked_html_col,
    with_boilerplate,
)

GOOD_PARA = (
    "It is the case that the results of the scan were good for all of "
    "them, and they said that this was what you have to do when the data "
    "is not there for you to see in the report, because most of it was "
    "already there for all of them to use."
)
SALAD_PARA = (
    "key agg row scan slow fast table value part hash merge batch sort "
    "window vector column stream filter group order query line customer "
    "spark data big small join"
)


def _label_seq(html):
    return [lab for lab, _ in classify_fragments(html)]


def test_ctx_free_label_classes():
    # nav: link-dominated -> bad
    assert _label_seq('<div><a href="/">Home</a> <a href="/x">X</a></div>') \
        == ["bad"]
    # long stopword-rich paragraph -> good
    assert _label_seq("<p>" + GOOD_PARA + "</p>") == ["good"]
    # long stopword-poor paragraph -> bad
    assert _label_seq("<p>" + SALAD_PARA + "</p>") == ["bad"]
    # short linkless text alone -> short -> (edges are bad) -> bad
    assert _label_seq("<p>Read it now.</p>") == ["bad"]
    # short WITH a link -> ctx-free bad, not short
    assert _label_seq('<p>More <a href="/a">here</a>.</p>') == ["bad"]
    # copyright mark -> bad even when stopword-rich
    assert _label_seq("<p>" + GOOD_PARA + " ©2026</p>") == ["bad"]
    assert _label_seq("<p>" + GOOD_PARA + " &amp;copy; now</p>") == ["bad"]


def test_near_good_promotion_and_demotion():
    # plen in (LENGTH_LOW, LENGTH_HIGH], density >= high -> near-good.
    near = ("It is the case that they said this was what you would have "
            "to do about it for now.")
    assert LENGTH_LOW <= len(near) <= 200
    # isolated near-good: both neighbours bad -> bad
    assert _label_seq("<p>" + near + "</p>") == ["bad"]
    # next to a good paragraph -> promoted
    assert _label_seq("<p>" + GOOD_PARA + "</p><p>" + near + "</p>") \
        == ["good", "good"]


def test_short_context_pass_both_outcomes():
    short = "<p>Read it now.</p>"
    good = "<p>" + GOOD_PARA + "</p>"
    bad = '<div><a href="/">Home</a> <a href="/x">X</a></div>'
    # short BETWEEN two goods -> good
    assert _label_seq(good + short + good) == ["good", "good", "good"]
    # short between good and bad -> bad
    assert _label_seq(good + short + bad) == ["good", "bad", "bad"]
    # short at document start before a good -> bad (edge counts as bad)
    assert _label_seq(short + good) == ["bad", "good"]


def test_segmentation_and_empty_fragments():
    # raw newlines never split fragments; block tags do
    one = classify_fragments("<p>line one\nline two</p>")
    assert len(one) == 1 and one[0][1] == "line one line two"
    # empty fragments are dropped (not label-relevant neighbours)
    labs = _label_seq(
        "<p>" + GOOD_PARA + "</p><p>  </p><p>Read it now.</p><p>"
        + GOOD_PARA + "</p>"
    )
    assert labs == ["good", "good", "good"]
    # anchor cut by a block boundary: the inner text stays, link attribution
    # is cut at the boundary (documented regex-segmentation delta)
    frags = classify_fragments('<p><a href="/x">start <p> rest of anchor</p>')
    assert [t for _, t in frags] == ["start", "rest of anchor"]


def test_max_frags_cap():
    html = "".join(f"<p>para {i} text</p>" for i in range(50))
    assert len(classify_fragments(html, max_frags=10)) <= 10


def test_twin_parity_fuzz_and_adversarial(spark):
    rng = random.Random(17)
    words = ["the", "of", "and", "data", "scan", "table", "now", "it",
             "value", "they", "was", "for", "row", "x"]
    pieces = ["<p>", "</p>", "<div>", "</div>", '<a href="/x">', "</a>",
              "<br>", "&amp;", "&nbsp;", "&copy;", "©", "\n", "<h1>",
              "</h1>", "<!-- c -->", "<script>v</script>", "<", ">"]
    cases = ["", "<p></p>", "plain text with the of and them all here now",
             "<a>only</a>", "<p>" + GOOD_PARA + "</p>" * 3]
    for _ in range(120):
        n = rng.randint(0, 40)
        cases.append(" ".join(
            rng.choice(pieces) if rng.random() < 0.4 else rng.choice(words)
            for _ in range(n)
        ))
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, html string"
    )
    out = with_boilerplate(df).select(
        "i", "bp_labels", "bp_texts", "bp_content"
    ).collect()
    assert len(out) == len(cases)
    for r in out:
        want = classify_fragments(cases[r.i])
        assert list(r.bp_labels) == [lab for lab, _ in want], repr(cases[r.i])
        assert list(r.bp_texts) == [t for _, t in want], repr(cases[r.i])
        assert r.bp_content == content_text(cases[r.i]), repr(cases[r.i])


def test_twin_parity_fixture_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = (
        docs.select("doc_id", "text")
        .withColumn(
            "html", synth_linked_html_col(F.col("doc_id"), F.col("text"))
        )
        .transform(with_boilerplate)
        .select("doc_id", "text", "html", "bp_labels", "bp_content",
                "bp_n_good")
        .collect()
    )
    assert rows
    for r in rows:
        assert r.html == synth_linked_html(r.doc_id, r.text)
        want = classify_fragments(r.html)
        assert list(r.bp_labels) == [lab for lab, _ in want], r.doc_id
        assert r.bp_content == content_text(r.html), r.doc_id
        # every synthesized page keeps its stopword-rich body
        assert r.bp_n_good >= 1, r.doc_id


def test_null_and_binary_inputs(spark):
    df = spark.createDataFrame(
        [(0, bytearray(b"<p>" + GOOD_PARA.encode() + b"</p>")), (1, None)],
        "i long, html binary",
    )
    rows = {r.i: r for r in with_boilerplate(df).collect()}
    assert list(rows[0].bp_labels) == ["good"]
    assert list(rows[1].bp_labels) == [] and rows[1].bp_content == ""
    assert rows[1].bp_n_frags == 0 and rows[1].bp_n_good == 0


def test_plan_is_native_no_shuffle(spark):
    pages = spark.createDataFrame(
        [("u", bytearray(b"<p>hi</p>"))], "url string, html binary"
    )
    plan = (
        with_boilerplate(pages)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # pure projection: no shuffle


def test_boilerplate_query_matches_twin(spark):
    import hashlib

    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    got = {r.doc_id: (r.n_frags, r.n_good, r.content_len, r.content_md5)
           for r in entry_mod.q_boilerplate_stats(spark, sf).collect()}
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    )
    for r in docs.collect():
        frags = classify_fragments(synth_linked_html(r.doc_id, r.text))
        c = "\n".join(t for lab, t in frags if lab == "good")
        assert got[r.doc_id] == (
            len(frags),
            sum(1 for lab, _ in frags if lab == "good"),
            len(c),
            hashlib.md5(c.encode("utf-8")).hexdigest(),
        ), r.doc_id
