"""frequent_items (text/heavyhitters.py) vs exact pandas counting."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from morituri_spark.text.heavyhitters import frequent_items


def _exact(values, p, q):
    vc = pd.Series(values).value_counts()
    n = len(values)
    return {k: int(c) for k, c in vc.items() if c * q >= p * n}


def _run(spark, values, p, q, partitions=8, **kw):
    df = spark.createDataFrame(
        [(v,) for v in values], "item string"
    ).repartition(partitions)
    return {
        r["item"]: r["cnt"]
        for r in frequent_items(df, "item", p, q, **kw).collect()
    }


def test_skewed_with_boundary_items(spark):
    # n = 1000; threshold 1/10 -> 100. Plant counts 150, 100 (EXACTLY at
    # the threshold, must be kept), 99 (one below, must be dropped), and
    # uniform noise.
    values = (
        ["hot"] * 150 + ["edge"] * 100 + ["near"] * 99
        + [f"noise{i}" for i in range(651)]
    )
    got = _run(spark, values, 1, 10)
    assert got == {"hot": 150, "edge": 100}
    assert got == _exact(values, 1, 10)


def test_adversarial_many_distinct_small_capacity(spark):
    # 10k rows, ~5k distinct, skewed tail; capacity stays at the proof
    # minimum so the purge path runs constantly in every task.
    values = []
    for i in range(10000):
        if i % 7 == 0:
            values.append("alpha")
        elif i % 11 == 0:
            values.append("beta")
        else:
            values.append(f"tail{i % 4800}")
    for p, q in [(1, 8), (1, 12), (1, 50)]:
        got = _run(spark, values, p, q, partitions=16)
        assert got == _exact(values, p, q), (p, q)


def test_capacity_override_and_guards(spark):
    values = ["a"] * 50 + ["b"] * 30 + [f"t{i}" for i in range(20)]
    assert _run(spark, values, 1, 4, capacity=100) == _exact(values, 1, 4)
    df = (
        # guard checks run before any job; a 1-row frame suffices
        spark.createDataFrame([("x",)], "item string")
    )
    with pytest.raises(ValueError):
        frequent_items(df, "item", 0, 10)
    with pytest.raises(ValueError):
        frequent_items(df, "item", 11, 10)
    with pytest.raises(ValueError):
        frequent_items(df, "item", 1, 100, capacity=50)


def test_single_partition_and_all_frequent(spark):
    values = ["x"] * 6 + ["y"] * 4
    got = _run(spark, values, 1, 5, partitions=1)
    assert got == {"x": 6, "y": 4}
