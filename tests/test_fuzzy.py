"""edit1_pairs (text/fuzzy.py) vs a brute-force Levenshtein reference."""

import pytest

from morituri_spark.text.fuzzy import edit1_pairs


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _ref(rows):
    out = set()
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1:]:
            d = _lev(sa, sb)
            if d <= 1:
                out.add((min(ia, ib), max(ia, ib), d))
    return out


def _run(spark, rows):
    df = spark.createDataFrame(rows, "id long, s string")
    return {
        (r["id_a"], r["id_b"], r["dist"]) for r in edit1_pairs(df).collect()
    }


def test_edit1_all_edit_kinds(spark):
    rows = [
        (0, "cat"), (1, "cart"),   # insertion
        (2, "bat"),                # substitution vs cat
        (3, "dog"), (4, "cat"),    # exact dup
        (5, "ca"),                 # deletion vs cat
        (6, "xyz"), (7, ""),       # empty string edge
        (8, "a"),                  # '' vs 'a' is distance 1
    ]
    assert _run(spark, rows) == _ref(rows)


def test_edit1_random_matches(spark):
    import random

    rng = random.Random(5)
    alphabet = "ab"
    rows = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 5))))
        for i in range(60)
    ]
    assert _run(spark, rows) == _ref(rows)


def test_edit1_max_len_guard(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = spark.createDataFrame([(0, "x" * 100)], "id long, s string")
    with pytest.raises((Py4JJavaError, SparkRuntimeException)):
        edit1_pairs(df, max_len=64).collect()
