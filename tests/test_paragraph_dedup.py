"""CCNet-style paragraph dedup: first-occurrence semantics, in-order
reassembly, short-paragraph skew guard, empty-result documents."""

from pyspark.sql import functions as F

from linguistjs_spark.operators.dedup import paragraph_dedup


def _run(spark, rows, min_chars=8):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = paragraph_dedup(df, min_chars=min_chars)
    return {r.doc_id: r for r in out.collect()}


def test_first_occurrence_wins_and_order_preserved(spark):
    rows = [
        (1, "alpha paragraph\n--\nbeta paragraph"),
        (2, "beta paragraph\ngamma paragraph\nalpha paragraph"),
        (3, "gamma paragraph"),
    ]
    got = _run(spark, rows)
    # doc 1 is first for alpha+beta; '--' is short -> always kept
    assert got[1].text_dedup == "alpha paragraph\n--\nbeta paragraph"
    assert (got[1].n_paras, got[1].n_kept) == (3, 3)
    # doc 2 keeps only gamma (alpha/beta first seen in doc 1), order preserved
    assert got[2].text_dedup == "gamma paragraph"
    assert (got[2].n_paras, got[2].n_kept) == (3, 1)
    # doc 3's gamma already claimed by doc 2 (lower doc_id)
    assert got[3].text_dedup == ""
    assert (got[3].n_paras, got[3].n_kept) == (1, 0)


def test_short_paragraphs_never_dedup(spark):
    # identical short separators repeat corpus-wide; they are structural,
    # would be a mega-hot shuffle key, and must all survive
    rows = [(i, "---\nunique paragraph number %d\n---" % i) for i in range(20)]
    got = _run(spark, rows)
    for i in range(20):
        assert got[i].text_dedup == rows[i][1]
        assert got[i].n_kept == 3


def test_within_document_repeat_collapses(spark):
    rows = [(7, "same long paragraph\nsame long paragraph\nother long text")]
    got = _run(spark, rows)
    assert got[7].text_dedup == "same long paragraph\nother long text"
    assert (got[7].n_paras, got[7].n_kept) == (3, 2)


def test_empty_and_trailing_newline_docs(spark):
    rows = [(1, ""), (2, "long enough paragraph\n")]
    got = _run(spark, rows)
    assert got[1].text_dedup == "" and got[1].n_paras == 1 and got[1].n_kept == 1
    # trailing newline -> trailing empty paragraph, kept (short)
    assert got[2].text_dedup == "long enough paragraph\n"
    assert got[2].n_paras == 2 and got[2].n_kept == 2


def test_min_chars_boundary(spark):
    # exactly min_chars chars participates in dedup; one below does not
    rows = [(1, "12345678\n1234567"), (2, "12345678\n1234567")]
    got = _run(spark, rows, min_chars=8)
    assert got[1].text_dedup == "12345678\n1234567"
    assert got[2].text_dedup == "1234567"


def test_null_text_doc_survives_with_zero_kept(spark):
    df = spark.createDataFrame(
        [(1, "real paragraph here"), (2, None)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in paragraph_dedup(df).collect()}
    assert set(got) == {1, 2}
    assert (got[2].n_kept, got[2].text_dedup) == (0, "")
    # ADVICE r02: size(NULL split) is -1; the contract is n_paras=0, never
    # a negative sentinel leaking into downstream sums/ratios
    assert got[2].n_paras == 0


def test_plan_single_scan_no_join(spark, tmp_path):
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, f"para number {i}\n--\nshared paragraph text") for i in range(50)],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(p)
    out = paragraph_dedup(spark.read.parquet(p))
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "Join" not in final                 # no id-universe join
    assert final.count("Scan parquet") == 1    # one source scan


def test_near_dup_clusters_chain_and_components(spark):
    """Label propagation converges on a 5-hop chain (needs several rounds)
    and keeps disjoint components separate."""
    from linguistjs_spark.operators.dedup import near_dup_clusters

    pairs = spark.createDataFrame(
        # chain 10-11-12-13-14 (worst case for propagation) + pair 20-21
        [(10, 11), (11, 12), (12, 13), (13, 14), (20, 21)],
        "a long, b long",
    )
    got = {r.doc_id: r.cluster_id for r in near_dup_clusters(pairs).collect()}
    assert got == {10: 10, 11: 10, 12: 10, 13: 10, 14: 10, 20: 20, 21: 20}


def test_near_dup_clusters_converges_under_max_iter(spark):
    from linguistjs_spark.operators.dedup import near_dup_clusters

    # a long chain with max_iter too small must still return labels
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "a long, b long"
    )
    got = {r.doc_id: r.cluster_id
           for r in near_dup_clusters(pairs, max_iter=50).collect()}
    assert all(v == 0 for v in got.values()) and len(got) == 31


def test_cluster_representatives_quality_policy(spark):
    """Representative = max quality, ties to min id; NULL-quality members
    never outrank real ones (caller coalesces); min-id degenerate mode."""
    from linguistjs_spark.operators.dedup import cluster_representatives

    clusters = spark.createDataFrame(
        [(10, 10), (11, 10), (12, 10), (20, 20), (21, 20), (30, 30)],
        "doc_id long, cluster_id long",
    )
    docs = spark.createDataFrame(
        [(10, 5.0), (11, 9.0), (12, 9.0), (20, 1.0), (21, 1.0), (30, -1.0)],
        "doc_id long, qual double",
    )
    got = {
        r.cluster_id: (r.rep_id, r.n_members, r.rep_quality)
        for r in cluster_representatives(
            clusters, docs, quality_col="qual").collect()
    }
    # cluster 10: max qual 9.0 shared by 11 and 12 -> min id 11
    assert got == {10: (11, 3, 9.0), 20: (20, 2, 1.0), 30: (30, 1, -1.0)}
    # degenerate min-id mode needs no docs columns at all
    got_min = {
        r.cluster_id: r.rep_id
        for r in cluster_representatives(clusters, docs).collect()
    }
    assert got_min == {10: 10, 20: 20, 30: 30}


def test_dedup_survivors_composition(spark):
    """Unclustered docs pass through; each cluster contributes exactly its
    representative; text column survives untouched."""
    from linguistjs_spark.operators.dedup import dedup_survivors

    docs = spark.createDataFrame(
        [(i, f"text{i}", float(i % 3)) for i in range(8)],
        "doc_id long, text string, qual double",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (4, 4), (5, 4)], "doc_id long, cluster_id long",
    )
    out = dedup_survivors(docs, clusters, quality_col="qual")
    kept = sorted(r.doc_id for r in out.collect())
    # cluster {1,2}: qual 1.0 vs 2.0 -> 2; cluster {4,5}: 1.0 vs 2.0 -> 5
    assert kept == [0, 2, 3, 5, 6, 7]
    row = {r.doc_id: r.text for r in out.collect()}
    assert row[5] == "text5"


def test_crlf_and_lf_paragraphs_dedup_together(spark):
    rows = [(1, "shared paragraph body\r\nunique line one"),
            (2, "shared paragraph body\nunique line two")]
    got = _run(spark, rows)
    # CRLF doc 1 owns the shared paragraph; LF doc 2 loses it
    assert got[1].text_dedup == "shared paragraph body\nunique line one"
    assert got[2].text_dedup == "unique line two"
    assert got[1].n_paras == 2 and got[2].n_kept == 1
