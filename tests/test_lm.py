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


def _ref_kn(docs, d=0.75):
    import re

    bgs = []
    for _, text in docs:
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        bgs += list(zip(toks, toks[1:]))
    cbg, cctx, n1fw, n1bw = {}, {}, {}, {}
    for w1, w2 in bgs:
        cbg[(w1, w2)] = cbg.get((w1, w2), 0) + 1
        cctx[w1] = cctx.get(w1, 0) + 1
    for (w1, w2), _ in cbg.items():
        n1fw[w1] = n1fw.get(w1, 0) + 1
        n1bw[w2] = n1bw.get(w2, 0) + 1
    nbb = len(cbg)
    out = {}
    for (w1, w2), c in cbg.items():
        p = (max(float(c) - d, 0.0)
             + d * float(n1fw[w1]) * (float(n1bw[w2]) / float(nbb))
             ) / float(cctx[w1])
        import math
        out[(w1, w2)] = (c, int(math.floor(p * 1e6 + 0.5 + 1e-8)))
    return out


def test_kn_matches_reference(spark):
    from morituri_spark.text.lm import kn_bigram_probs

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {(r["w1"], r["w2"]): (r["cbg"], r["p_micro"])
           for r in kn_bigram_probs(df).collect()}
    assert got == _ref_kn(DOCS)
    # probability sanity: every p in (0, 1]
    assert all(0 < p <= 1_000_000 for _, p in got.values())


def test_kn_discounts_singletons_below_mle(spark):
    from morituri_spark.text.lm import kn_bigram_probs

    docs = [(1, "a b"), (2, "c b"), (3, "a d")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r["w1"], r["w2"]): r["p_micro"]
           for r in kn_bigram_probs(df).collect()}
    # MLE gives a->b = a->d = 1/2; KN shifts mass toward b, which
    # continues MORE contexts (b follows both a and c, d only a):
    # p(b|a) = (0.25 + 0.75*2*(2/3))/2 = 0.625, p(d|a) = 0.375
    assert got[("a", "b")] == 625_000 and got[("a", "d")] == 375_000
    # and the observed row for a sums to exactly 1 (full support seen)
    assert got[("a", "b")] + got[("a", "d")] == 1_000_000
