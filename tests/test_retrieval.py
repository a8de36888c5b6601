"""bm25_topk (text/retrieval.py) vs an in-process reference."""

import math
import re
from collections import Counter

import pytest

from morituri_spark.text.retrieval import bm25_topk, tokenize


def _tok(s):
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def _bm25_ref(doc_rows, query_rows, k=10, k1=1.2, b=0.75, max_df_pct=50):
    tfs = {d: Counter(_tok(t)) for d, t in doc_rows}
    dls = {d: sum(c.values()) for d, c in tfs.items()}
    n = len(tfs)
    avgdl = sum(dls.values()) / n
    dfs = Counter(t for c in tfs.values() for t in c)
    out = {}
    for q, qt in query_rows:
        scores = {}
        for term in set(_tok(qt)):
            df = dfs.get(term, 0)
            if df == 0 or df * 100 > n * max_df_pct:
                continue
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
            for d, c in tfs.items():
                tf = c.get(term)
                if not tf:
                    continue
                x = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[d] / avgdl))
                scores[d] = scores.get(d, 0) + math.floor(x * 1e6 + 0.5 + 1e-8)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[q] = [(d, i + 1, m / 1e6) for i, (d, m) in enumerate(ranked)]
    return out


DOCS = [
    (0, "spark shuffles the join keys across executors"),
    (1, "broadcast the small side of the join, never the big one"),
    (2, "the catalyst optimizer prunes columns and pushes filters"),
    (3, "join join join — a document that repeats join a lot, join"),
    (4, "completely unrelated text about penguins and glaciers"),
    (5, "executors spill to disk when the shuffle partition is too big"),
]
QUERIES = [(100, "broadcast join"), (101, "shuffle partition executors"), (102, "zebra")]


def _dfs(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id long, text string")
    return docs, qs


def test_bm25_matches_reference(spark):
    docs, qs = _dfs(spark)
    got = {}
    for r in bm25_topk(docs, qs, k=3).collect():
        got.setdefault(r["query_id"], []).append((r["doc_id"], r["rank"], r["score"]))
    for q in got:
        got[q].sort(key=lambda t: t[1])
    ref = _bm25_ref(DOCS, QUERIES, k=3)
    assert got.get(100) == ref[100]
    assert got.get(101) == ref[101]
    assert 102 not in got  # no match → no rows
    # "broadcast join" must hit doc 1 first (has both terms)
    assert got[100][0][0] == 1


def test_bm25_df_cap_drops_stopwords(spark):
    docs, qs = _dfs(spark)
    # "the" appears in 4/6 docs (67%) → dropped at the 50% cap: a
    # the-only query returns nothing
    q_the = spark.createDataFrame([(200, "the")], "query_id long, text string")
    assert bm25_topk(docs, q_the, k=5).count() == 0
    # raising the cap admits it
    assert bm25_topk(docs, q_the, k=5, max_df_pct=100).count() > 0


def test_bm25_query_term_dedup(spark):
    docs, _ = _dfs(spark)
    q1 = spark.createDataFrame([(300, "penguins")], "query_id long, text string")
    q2 = spark.createDataFrame(
        [(300, "penguins penguins penguins")], "query_id long, text string"
    )
    s1 = {(r["doc_id"], r["score"]) for r in bm25_topk(docs, q1).collect()}
    s2 = {(r["doc_id"], r["score"]) for r in bm25_topk(docs, q2).collect()}
    assert s1 == s2 and len(s1) == 1


def test_tokenize_split_contract(spark):
    df = spark.createDataFrame([(0, "Héllo, WORLD-42!  foo_bar")], "id long, text string")
    got = [r["term"] for r in tokenize(df, "id").collect()]
    # é is not [a-z0-9] → splits; underscores split; case folds
    assert got == ["h", "llo", "world", "42", "foo", "bar"]


def test_bm25_guards(spark):
    docs, qs = _dfs(spark)
    with pytest.raises(ValueError):
        bm25_topk(docs, qs, max_df_pct=0)


def test_tfidf_top_terms_matches_reference(spark):
    import math
    import re

    from morituri_spark.text.retrieval import tfidf_top_terms

    docs = [
        (0, "apple banana apple cherry"),
        (1, "banana cherry cherry date"),
        (2, "apple apple apple unique"),
        (3, "date"),
    ]
    # in-process reference with the shared micro quantization
    toks = {i: [t for t in re.split("[^a-z0-9]+", s.lower()) if t] for i, s in docs}
    n = len(docs)
    df_t = {}
    for ts in toks.values():
        for t in set(ts):
            df_t[t] = df_t.get(t, 0) + 1
    ref = {}
    for i, ts in toks.items():
        scores = []
        for t in set(ts):
            x = ts.count(t) * math.log(n / df_t[t])
            scores.append((-math.floor(x * 1e6 + 0.5 + 1e-8), t))
        scores.sort()
        ref[i] = [
            (t, r + 1, -m / 1e6) for r, (m, t) in enumerate(scores[:2])
        ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in tfidf_top_terms(sdf, k=2).collect():
        got.setdefault(r["doc_id"], []).append((r["term"], r["rank"], r["tfidf"]))
    for i in got:
        got[i].sort(key=lambda x: x[1])
    assert got == ref
    # doc 2: 'unique' (df=1) has idf ln(4); apple tf=3 df=2 -> 3*ln(2)
    assert got[2][0][0] == "apple"  # 3*ln2 = 2.079 > ln4 = 1.386
    # doc 3: 'date' appears in 2 docs -> ln(2) > 0, single term
    assert [t for t, _, _ in got[3]] == ["date"]
