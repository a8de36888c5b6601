"""Decontamination + duplicated-substring spans: semantics, edge cases,
partition invariance. Cross-engine value parity is driver-checked via the
__spark_entry__ oracles; these tests pin the operator semantics directly."""

import pytest
from pyspark.sql import functions as F

from morituri_spark.text.decontam import decontaminate, duplicate_span_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_exact_and_partial_overlap(spark):
    corpus = _docs(
        spark,
        [
            (0, "the quick brown fox jumps over the lazy dog tonight"),
            (1, "completely unrelated content with nothing shared at all xyz"),
            (2, "prefix text then the quick brown fox jumps over the lazy dog"),
        ],
    )
    bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    out = {r.doc_id: r for r in decontaminate(corpus, bench, n=13).collect()}
    assert out[0].contaminated and out[0].n_hits > 0
    assert not out[1].contaminated and out[1].n_hits == 0
    assert out[2].contaminated
    # doc 0 shares its full benchmark-substring gram set
    assert 0 < out[0].hit_ratio <= 1.0


def test_decontaminate_threshold_gates_flag_not_stats(spark):
    corpus = _docs(spark, [(0, "aaaa bbbb cccc dddd eeee ffff gggg")])
    bench = _docs(spark, [(1, "cccc dddd")])
    lo = decontaminate(corpus, bench, n=5, threshold=0.0).first()
    hi = decontaminate(corpus, bench, n=5, threshold=0.99).first()
    assert lo.n_hits == hi.n_hits and lo.n_grams == hi.n_grams
    assert lo.contaminated and not hi.contaminated


def test_decontaminate_short_doc_truncated_gram(spark):
    # doc shorter than n still emits one (truncated) gram => n_grams == 1
    corpus = _docs(spark, [(0, "tiny")])
    bench = _docs(spark, [(1, "tiny")])
    r = decontaminate(corpus, bench, n=13).first()
    assert r.n_grams == 1 and r.n_hits == 1 and r.hit_ratio == 1.0


def test_duplicate_spans_cross_doc_only(spark):
    boiler = "SHARED LICENSE HEADER BLOCK v1.0 "  # 33 chars
    docs = _docs(
        spark,
        [
            (0, boiler + "unique tail zero with its own words entirely"),
            (1, boiler + "different unique tail one qqq www eee rrr ttt"),
            (2, "no shared window here shared shared shared shared shared"),
        ],
    )
    out = {r.doc_id: r for r in duplicate_span_stats(docs, k=20).collect()}
    assert out[0].n_dup_windows > 0 and out[1].n_dup_windows > 0
    # doc 2's repeats are WITHIN one doc -> not cross-doc duplicated
    assert out[2].n_dup_windows == 0 and out[2].dup_ratio == 0.0
    # closed-form totals: len(bytes) - k + 1 windows at stride 1
    assert out[2].n_windows == len(docs.where("doc_id=2").first().text) - 19


def test_duplicate_spans_stride_subsamples(spark):
    docs = _docs(spark, [(0, "x" * 100), (1, "x" * 100)])
    full = duplicate_span_stats(docs, k=20, stride=1).first()
    sub = duplicate_span_stats(docs, k=20, stride=7).first()
    assert full.n_windows == 81
    assert sub.n_windows == (81 - 1) // 7 + 1
    # constant text: every window duplicated under both strides
    assert full.dup_ratio == 1.0 and sub.dup_ratio == 1.0


def test_duplicate_spans_partition_invariant(spark):
    rows = [(i, f"common shared prefix sentence across docs {i % 3}") for i in range(60)]
    docs = _docs(spark, rows)
    a = sorted(map(tuple, duplicate_span_stats(docs, k=16).collect()))
    b = sorted(map(tuple, duplicate_span_stats(docs.repartition(7), k=16).collect()))
    assert a == b


def test_min_docs_and_stride_validation(spark):
    docs = _docs(spark, [(0, "abc")])
    with pytest.raises(ValueError):
        duplicate_span_stats(docs, k=5, min_docs=1)
    with pytest.raises(ValueError):
        duplicate_span_stats(docs, k=5, stride=0)
