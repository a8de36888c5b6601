"""bpe_train (text/bpe.py) vs a pure-Python greedy reference sharing the
left-to-right non-overlapping replace contract."""

import pytest

from morituri_spark.text.bpe import bpe_train


def _ref_rounds(texts, rounds):
    out = []
    corpus = list(texts)
    for r in range(1, rounds + 1):
        counts = {}
        for t in corpus:
            toks = t.split(" ")
            for a, b in zip(toks, toks[1:]):
                counts[f"{a} {b}"] = counts.get(f"{a} {b}", 0) + 1
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        merged = []
        for t in corpus:
            s = f" {t} ".replace(f" {best} ", f" {best.replace(' ', '')} ")
            merged.append(s.strip())
        corpus = merged
        total = sum(len(t.split(" ")) for t in corpus)
        out.append((r, best, counts[best], total))
    return out


def _run(spark, texts, rounds):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = bpe_train(df, rounds=rounds).orderBy("round").collect()
    return [
        (r["round"], r["pair"], r["cnt"], r["total_tokens_after"]) for r in rows
    ]


def test_matches_reference_trainer(spark):
    texts = [
        "the cat sat on the mat",
        "the cat ate the rat",
        "a cat and a rat sat",
        "the the the cat cat",
    ]
    assert _run(spark, texts, 4) == _ref_rounds(texts, 4)


def test_merged_token_participates_next_round(spark):
    texts = ["a b c", "a b c", "a b d"]
    got = _run(spark, texts, 2)
    assert got[0][1] == "a b"
    # round 2 must see the fused token "ab"
    assert got[1][1] == "ab c"
    assert got[1][3] == 3 + 3 + 3 - 3 - 2  # 4 total tokens left


def test_overlapping_run_merges_left_to_right(spark):
    # "a a a" -> first pair only: ["aa", "a"], the greedy contract
    got = _run(spark, ["a a a"], 1)
    assert got == [(1, "a a", 2, 2)]


def test_tie_breaks_to_lexicographic_pair(spark):
    got = _run(spark, ["z y", "b a"], 1)
    assert got[0][1] == "b a"


def test_single_token_docs_survive(spark):
    got = _run(spark, ["solo", "a b", "a b"], 1)
    assert got == [(1, "a b", 2, 3)]
