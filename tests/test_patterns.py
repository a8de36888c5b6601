"""pattern_hit_counts (text/patterns.py) vs Python str.count semantics."""

from morituri_spark.text.patterns import pattern_hit_counts


def _run(spark, docs, needles):
    d = spark.createDataFrame(docs, "doc_id long, text string")
    n = spark.createDataFrame([(x,) for x in needles], "needle string")
    return {
        (r["doc_id"], r["needle"]): r["hits"]
        for r in pattern_hit_counts(d, n).collect()
    }


def test_counts_match_python_str_count(spark):
    docs = [
        (1, "the cat sat on the mat"),
        (2, "aaaa"),
        (3, "Nothing here"),
    ]
    needles = ["the", "at", "aa", "zz"]
    got = _run(spark, docs, needles)
    exp = {}
    for i, t in docs:
        for nd in needles:
            c = t.lower().count(nd.lower())
            if c:
                exp[(i, nd)] = c
    # str.count is also left-to-right non-overlapping: "aaaa".count("aa") == 2
    assert got == exp
    assert got[(2, "aa")] == 2


def test_case_folding_and_empty_needle(spark):
    docs = [(1, "SPAM Spam spam")]
    got = _run(spark, docs, ["spam", ""])
    assert got == {(1, "spam"): 3}


def test_zero_hits_omitted(spark):
    got = _run(spark, [(1, "abc")], ["xyz"])
    assert got == {}


def test_url_domain_counts(spark):
    import pandas as pd

    from morituri_spark.text.patterns import url_domain_counts

    rows = [
        (0, "see HTTP://Foo.COM/x and https://foo.com/y plus http://bar.org"),
        (1, "nothing here"),
        (2, "https://foo.com twice https://foo.com/z"),
        (3, "edge https://sub.domain-x.co.uk/path?q=1 end"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {r.domain: (r.n_hits, r.n_docs) for r in url_domain_counts(df).collect()}
    assert got == {
        "foo.com": (4, 2),
        "bar.org": (1, 1),
        "sub.domain-x.co.uk": (1, 1),
    }
