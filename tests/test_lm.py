"""lm_nll_scores (text/lm.py) vs an in-process reference."""

import math
import re

from morituri_spark.text.lm import doc_bigrams, lm_nll_scores


def _ref_scores(docs, gate_micro=7_000_000):
    toks = {
        i: [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
        for i, text in docs
    }
    bigrams = {i: list(zip(ts, ts[1:])) for i, ts in toks.items()}
    cbg, cctx, vocab = {}, {}, set()
    for bs in bigrams.values():
        for w1, w2 in bs:
            cbg[(w1, w2)] = cbg.get((w1, w2), 0) + 1
            cctx[w1] = cctx.get(w1, 0) + 1
            vocab.update((w1, w2))
    v = len(vocab)
    out = {}
    for i, bs in bigrams.items():
        if not bs:
            continue
        micros = sum(
            math.floor(
                -math.log((cbg[b] + 1.0) / (cctx[b[0]] + float(v))) * 1e6
                + 0.5 + 1e-8
            )
            for b in bs
        )
        out[i] = (
            len(bs),
            micros,
            round(micros / (len(bs) * 1e6), 6),
            micros > gate_micro * len(bs),
        )
    return out


def _run(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r["doc_id"]: (
            r["n_bigrams"], r["nll_micro"], r["avg_nll"], r["high_perplexity"]
        )
        for r in lm_nll_scores(df).collect()
    }


DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat on the cat"),
    (2, "The CAT, sat!  on... the mat"),   # same tokens as doc 0
    (3, "zq xv qqj zq wq"),                # gibberish: every bigram unseen elsewhere
    (4, "single"),                          # no bigrams -> absent
    (5, ""),                                # empty -> absent
    (6, "the cat"),
]


def test_lm_matches_reference(spark):
    got = _run(spark, DOCS)
    ref = _ref_scores(DOCS)
    assert got == ref
    assert 4 not in got and 5 not in got
    # normalization invariance: docs 0 and 2 tokenize identically
    assert got[0] == got[2]


def test_lm_gibberish_scores_worse(spark):
    got = _run(spark, DOCS)
    assert got[3][2] > got[0][2]


def test_lm_gate_is_integer_exact(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    # a gate of 0 flags everything with positive NLL (all real docs)
    rows = lm_nll_scores(df, nll_gate_micro=0).collect()
    assert all(r["high_perplexity"] for r in rows)


def test_doc_bigrams_order_and_filtering(spark):
    df = spark.createDataFrame([(1, "a--b  c")], "doc_id long, text string")
    got = [(r["w1"], r["w2"]) for r in doc_bigrams(df, "doc_id").collect()]
    assert sorted(got) == [("a", "b"), ("b", "c")]
