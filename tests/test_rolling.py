"""rolling_counts (operators/rolling.py)."""

import pytest

from morituri_spark.operators.rolling import rolling_counts


def test_rolling_counts_and_sums(spark):
    rows = [
        ("u", 0, 10), ("u", 50, 20), ("u", 59, 5), ("u", 60, 1), ("u", 200, 7),
        ("v", 0, 2), ("v", 0, 3),   # equal order values are peers
    ]
    df = spark.createDataFrame(rows, "k string, t long, x long")
    got = {
        (r["k"], r["t"], r["x"]): (r["rolling_n"], r["rolling_sum"])
        for r in rolling_counts(df, "k", "t", range_width=60, value_col="x").collect()
    }
    # u@0: {0}; u@50: {0,50}; u@59: {0,50,59}; u@60: {50,59,60} (0 leaves: 60-59=1)
    assert got[("u", 0, 10)] == (1, 10)
    assert got[("u", 50, 20)] == (2, 30)
    assert got[("u", 59, 5)] == (3, 35)
    assert got[("u", 60, 1)] == (3, 26)
    assert got[("u", 200, 7)] == (1, 7)
    # RANGE peers: both v rows at t=0 see each other
    assert got[("v", 0, 2)] == (2, 5)
    assert got[("v", 0, 3)] == (2, 5)


def test_rolling_guard(spark):
    df = spark.createDataFrame([("u", 0)], "k string, t long")
    with pytest.raises(ValueError):
        rolling_counts(df, "k", "t", range_width=0)
