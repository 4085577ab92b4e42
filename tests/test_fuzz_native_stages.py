"""Property fuzz for the NATIVE (non-UDF) pipeline stages against the
Python oracle: PII-scrub byte identity, langid, and quality features.
The classify kernel has its own fuzz (test_fuzz_classify); these stages are
pure Column expressions, so each example evaluates one small Spark job over
a batch of generated texts."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from linguistjs_spark import oracle as O

# text generator: mixes plain words, PII-shaped fragments, unicode scripts,
# punctuation runs, and whitespace structure
_frag = st.one_of(
    st.text(alphabet="abcdefghijklmnop qrstuvwxyz\n\t", min_size=0, max_size=40),
    st.sampled_from([
        "a.b@example.com", "10.0.0.1", "123-45-6789", "+1 555 013 7777",
        "4111 1111 1111 1111", "the of and to in", "der die das und",
        "que los para", "Привет мир это", "这是 一个 测试", "x@y", "1.2.3",
        "@@@", "....", "  ", "\n\n\n", "0", "§±µ", "ß", "İı", "🎉🎉",
    ]),
)
texts = st.lists(
    st.builds(lambda parts: " ".join(parts), st.lists(_frag, max_size=8)),
    min_size=1,
    max_size=16,
)


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts)
def test_native_stages_match_oracle(spark, batch):
    from pyspark.sql import functions as F

    from linguistjs_spark.operators.quality import quality_struct
    from linguistjs_spark.operators.scrub import nl_lang_col, scrubbed_col

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(batch)], "i long, text string"
    )
    got = {
        r["i"]: r
        for r in df.select(
            "i",
            scrubbed_col(F.col("text")).alias("s"),
            nl_lang_col(F.col("text")).alias("nl"),
            quality_struct(F.col("text")).alias("q"),
        ).collect()
    }
    for i, t in enumerate(batch):
        r = got[i]
        assert r["s"].encode() == O.scrub_text(t).encode(), (t, r["s"])
        assert r["nl"] == O.langid(t), (t, r["nl"], O.langid(t))
        exp = O.quality_features(t)
        q = r["q"].asDict()
        assert q["n_words"] == exp["n_words"], t
        for k in ("mean_word_len", "symbol_ratio", "dup_line_ratio"):
            assert math.isclose(q[k], exp[k], rel_tol=0, abs_tol=1e-12), (t, k)


def test_langid_batch2_languages(spark):
    """The 8 round-2 stopword languages (pl/sv/tr/id/cs/ro/da/fi) resolve
    identically in the native argmax column and the python oracle."""
    from pyspark.sql import functions as F

    from linguistjs_spark import oracle as O
    from linguistjs_spark.operators.scrub import nl_lang_col

    cases = {
        "pl": "to nie jest tak jak po przez ale dla od tylko",
        "sv": "och att det som en av inte den till har om men",
        "tr": "bir bu ve ile ama gibi daha sonra kadar olarak var",
        "id": "yang dan di itu dengan untuk tidak ini dari dalam",
        "cs": "je se na to ale jako za po pro tak co jsem",
        "ro": "si de la cu un este nu ca mai pentru din sau",
        "da": "og at det en den til er som af ikke der han",
        "fi": "ja on ei se mutta kun niin joka tai jos vain nyt",
    }
    df = spark.createDataFrame(
        [(k, t) for k, t in cases.items()], "want string, text string"
    )
    got = {r.want: r.nl for r in
           df.select("want", nl_lang_col(F.col("text")).alias("nl")).collect()}
    for want, text in cases.items():
        assert got[want] == want, (want, got[want])
        assert O.langid(text) == want
