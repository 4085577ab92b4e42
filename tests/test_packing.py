"""Sequence packing (operators/packing.py): concatenate-and-chunk
assignment semantics pinned by hand-computed fixtures, plus the plan
shape a 10^12-doc run needs (one bucket shuffle, window + aggregate,
no joins, no Python)."""

import pytest
from pyspark.sql import functions as F

from linguistjs_spark.operators.packing import pack_sequences, packing_summary
from linguistjs_spark.plans.explain_utils import count_nodes, formatted_plan


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_offsets_and_spans_hand_computed(spark):
    # one bucket (constant bucket_col); token counts are word counts here
    # (single-word "a"*k texts would BPE-split; plain words keep it 1:1)
    rows = [
        (1, "w " * 300),   # 300 tokens: pack 0, offset 0
        (2, "w " * 300),   # offset 300, ends at 599 -> straddles 0->1
        (3, None),         # NULL text: 0 tokens, stays in its start pack
        (4, "w " * 12),    # offset 600: pack 1
    ]
    packed = {
        r.doc_id: r
        for r in pack_sequences(
            _docs(spark, rows), max_tokens=512, bucket_col=F.lit(0)
        ).collect()
    }
    assert (packed[1].start_offset, packed[1].pack_id, packed[1].n_spans) == (0, 0, 1)
    assert (packed[2].start_offset, packed[2].pack_id, packed[2].end_pack_id) == (300, 0, 1)
    assert packed[2].n_spans == 2
    assert (packed[3].n_tokens, packed[3].pack_id, packed[3].n_spans) == (0, 1, 1)
    assert (packed[4].start_offset, packed[4].pack_id) == (600, 1)


def test_empty_doc_at_exact_boundary_keeps_start_pack(spark):
    # offset lands exactly on a pack boundary with 0 tokens: the naive
    # floor((o - 1)/max) would be the PREVIOUS pack; greatest() pins it
    rows = [(1, "w " * 512), (2, None), (3, "w")]
    packed = {
        r.doc_id: r
        for r in pack_sequences(
            _docs(spark, rows), max_tokens=512, bucket_col=F.lit(0)
        ).collect()
    }
    assert (packed[2].start_offset, packed[2].pack_id, packed[2].end_pack_id) == (512, 1, 1)
    assert packed[3].pack_id == 1


def test_buckets_are_independent_streams(spark):
    rows = [(i, "w " * 100) for i in range(8)]
    packed = pack_sequences(
        _docs(spark, rows), max_tokens=256,
        bucket_col=F.col("doc_id") % 2,
    ).collect()
    by_bucket = {}
    for r in packed:
        by_bucket.setdefault(r.bucket, []).append(r)
    for bucket, rs in by_bucket.items():
        rs.sort(key=lambda r: r.doc_id)
        # each bucket's offsets restart at 0 and step by its own docs only
        assert [r.start_offset for r in rs] == [0, 100, 200, 300]


def test_summary_totals_and_checksum(spark):
    rows = [(1, "w " * 10), (2, "w " * 10), (3, "w " * 10)]
    out = packing_summary(
        pack_sequences(_docs(spark, rows), max_tokens=16, bucket_col=F.lit(0)),
        16,
    ).collect()
    assert len(out) == 1
    r = out[0]
    # offsets 0,10,20 -> packs 0,0,1; doc 2 straddles (ends at 19)
    assert (r.n_docs, r.n_tokens, r.n_packs, r.n_straddling) == (3, 30, 2, 1)
    assert r.assign_checksum == 0 * 1 + 0 * 2 + 1 * 3


def test_rejects_nonpositive_budget(spark):
    with pytest.raises(ValueError):
        pack_sequences(_docs(spark, [(1, "x")]), max_tokens=0)


def test_plan_is_one_shuffle_no_join_no_python(spark, tmp_path):
    # parquet-backed input so the plan under test is the operator's, not
    # the createDataFrame local-relation plumbing
    path = str(tmp_path / "docs")
    _docs(spark, [(i, "w") for i in range(16)]).write.parquet(path)
    df = pack_sequences(
        spark.read.parquet(path), max_tokens=512, n_buckets=4,
    )
    plan = formatted_plan(packing_summary(df, 512))
    assert count_nodes(plan, "Join") == 0
    assert "Python" not in plan and "Arrow" not in plan
    # exactly the window's bucket shuffle: the groupBy keys on the same
    # bucket column, so its exchange folds into the window's
    assert count_nodes(plan, "Exchange") <= 2
    assert "Window" in plan
