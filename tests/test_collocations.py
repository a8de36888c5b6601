"""collocations (text/collocations.py) vs a pure-Python PMI reference."""

import math

from morituri_spark.text.collocations import collocations


def _ref(texts, min_count):
    import re

    bg = {}
    for t in texts:
        toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        for a, b in zip(toks, toks[1:]):
            bg[(a, b)] = bg.get((a, b), 0) + 1
    n1, n2 = {}, {}
    for (a, b), c in bg.items():
        n1[a] = n1.get(a, 0) + c
        n2[b] = n2.get(b, 0) + c
    n = sum(bg.values())
    out = {}
    for (a, b), c in bg.items():
        if c < min_count:
            continue
        pmi = math.log(c * n / (n1[a] * n2[b]))
        out[(a, b)] = (c, n1[a], n2[b], math.floor(pmi * 1e6 + 0.5 + 1e-8))
    return out


def _run(spark, texts, min_count):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {
        (r["w1"], r["w2"]): (r["n_ab"], r["n1"], r["n2"], r["pmi_micro"])
        for r in collocations(df, "doc_id", "text", min_count=min_count).collect()
    }


def test_matches_reference(spark):
    texts = [
        "new york is a big city and new york never sleeps",
        "machine learning and deep learning drive new york startups",
        "the machine learning model runs in new york",
        "a b a b a b a b",
    ]
    assert _run(spark, texts, 2) == _ref(texts, 2)


def test_collocation_outranks_chance_pair(spark):
    # "new york" is a bound phrase; "the of" recurs as often but BOTH
    # words also pair with many other partners (diluted marginals), so
    # PMI must rank the bound phrase strictly above it
    texts = [f"new york a{i} the of b{i} of the c{i}" for i in range(6)]
    got = _run(spark, texts, 2)
    assert got[("new", "york")][0] == 6 and got[("the", "of")][0] == 6
    assert got[("new", "york")][3] > got[("the", "of")][3]


def test_min_count_gates(spark):
    texts = ["rare pair common pair common pair"]
    got = _run(spark, texts, 2)
    assert ("rare", "pair") not in got
    assert ("common", "pair") in got


def test_bigrams_do_not_cross_documents(spark):
    # "x y" only if adjacent WITHIN a doc
    got = _run(spark, ["a x", "y b", "a x", "y b"], 2)
    assert ("x", "y") not in got
    assert got[("a", "x")][0] == 2
