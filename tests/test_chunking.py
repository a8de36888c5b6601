"""Overlapping token-window chunking: counts, offsets, coverage, edges."""

import pytest
from pyspark.sql import functions as F

from morituri_spark.text.chunking import chunk_text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_counts_and_offsets(spark):
    # 10 tokens, chunk 4, overlap 1 -> stride 3: starts 0,3,6 cover 0..9
    docs = _docs(spark, [(0, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")])
    rows = sorted(
        chunk_text(docs, chunk_tokens=4, overlap=1).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [(r.chunk_id, r.start_token, r.n_chunk_tokens) for r in rows] == [
        (0, 0, 4),
        (1, 3, 4),
        (2, 6, 4),
    ]
    assert rows[0].chunk_text == "t0 t1 t2 t3"
    assert rows[2].chunk_text == "t6 t7 t8 t9"


def test_chunk_tail_runs_short(spark):
    # 11 tokens, chunk 4, stride 3 -> starts 0,3,6,9; last chunk 2 tokens
    docs = _docs(spark, [(0, " ".join(f"w{i}" for i in range(11)))])
    rows = sorted(
        chunk_text(docs, chunk_tokens=4, overlap=1).collect(),
        key=lambda r: r.chunk_id,
    )
    assert len(rows) == 4
    assert (rows[-1].start_token, rows[-1].n_chunk_tokens) == (9, 2)
    assert rows[-1].chunk_text == "w9 w10"


def test_every_token_covered(spark):
    docs = _docs(spark, [(i, " ".join(f"x{j}" for j in range(5 + i * 7))) for i in range(12)])
    rows = chunk_text(docs, chunk_tokens=8, overlap=3).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, set()).update(
            range(r.start_token, r.start_token + r.n_chunk_tokens)
        )
    for i in range(12):
        assert per_doc[i] == set(range(5 + i * 7)), f"doc {i} coverage gap"


def test_short_and_empty_docs(spark):
    docs = _docs(spark, [(0, "one two"), (1, "   "), (2, "")])
    rows = chunk_text(docs, chunk_tokens=128, overlap=32).collect()
    assert len(rows) == 1  # whitespace-only and empty emit nothing
    r = rows[0]
    assert (r.doc_id, r.chunk_id, r.n_chunk_tokens, r.chunk_text) == (0, 0, 2, "one two")


def test_whitespace_normalized(spark):
    docs = _docs(spark, [(0, "  a \t b\n  c  ")])
    r = chunk_text(docs, chunk_tokens=10, overlap=0).first()
    assert r.chunk_text == "a b c" and r.n_chunk_tokens == 3


def test_overlap_validation(spark):
    docs = _docs(spark, [(0, "a b")])
    with pytest.raises(ValueError):
        chunk_text(docs, chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_text(docs, chunk_tokens=4, overlap=-1)
