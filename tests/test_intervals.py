"""interval_islands / interval_coverage (operators/intervals.py)."""

import pytest

from morituri_spark.operators.intervals import interval_coverage, interval_islands


def _ref_islands(rows):
    by_key = {}
    for k, s, e in rows:
        by_key.setdefault(k, []).append((s, e))
    out = {}
    for k, iv in by_key.items():
        iv.sort()
        islands = []
        for s, e in iv:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
                islands[-1][2] += 1
            else:
                islands.append([s, e, 1])
        out[k] = [tuple(x) for x in islands]
    return out


ROWS = [
    ("a", 0, 10), ("a", 5, 12), ("a", 12, 15),   # touch at 12 merges
    ("a", 20, 25),
    ("b", 3, 4), ("b", 100, 200), ("b", 150, 160),  # contained interval
    ("c", 7, 8),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "user_id string, start long, end long")


def test_islands_match_reference(spark):
    got = {}
    for r in interval_islands(_df(spark, ROWS)).collect():
        got.setdefault(r["key"], []).append(
            (r["island"], r["island_start"], r["island_end"], r["n_intervals"])
        )
    for k in got:
        got[k].sort()
    ref = _ref_islands(ROWS)
    assert {k: [(i + 1, s, e, n) for i, (s, e, n) in enumerate(v)]
            for k, v in ref.items()} == got
    assert got["a"] == [(1, 0, 15, 3), (2, 20, 25, 1)]


def test_coverage(spark):
    got = {
        r["key"]: (r["covered"], r["n_islands"], r["n_intervals"])
        for r in interval_coverage(_df(spark, ROWS)).collect()
    }
    assert got == {"a": (20, 2, 4), "b": (101, 2, 3), "c": (1, 1, 1)}


def test_bad_interval_raises(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = _df(spark, [("x", 5, 5)])
    with pytest.raises((Py4JJavaError, SparkRuntimeException)):
        interval_coverage(df).collect()
