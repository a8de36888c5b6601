"""As-of join: backward semantics, inclusive ties, null before first right."""

from datetime import datetime

from morituri_spark.operators.asof import asof_join


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 10, 0), "a"),
            (1, datetime(2024, 1, 1, 11, 0), "b"),   # ties with right @11:00
            (1, datetime(2024, 1, 1, 12, 30), "c"),
            (2, datetime(2024, 1, 1, 9, 0), "d"),    # before any right row
            (2, datetime(2024, 1, 1, 23, 0), "e"),
        ],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 9, 30), 10.0),
            (1, datetime(2024, 1, 1, 11, 0), 20.0),
            (1, datetime(2024, 1, 1, 12, 0), 30.0),
            (2, datetime(2024, 1, 1, 10, 0), 99.0),
        ],
        "k long, ts timestamp, v double",
    )
    out = {r.tag: r.v for r in asof_join(left, right, on="k").collect()}
    assert out == {"a": 10.0, "b": 20.0, "c": 30.0, "d": None, "e": 99.0}


def test_asof_column_collision_raises(spark):
    import pytest

    df = spark.createDataFrame([(1, datetime(2024, 1, 1), 1.0)], "k long, ts timestamp, v double")
    with pytest.raises(ValueError, match="collision"):
        asof_join(df, df, on="k")


def test_asof_matches_bruteforce(spark):
    import random

    rng = random.Random(5)
    left = spark.createDataFrame(
        [(rng.randrange(8), datetime(2024, 1, 1, rng.randrange(24), rng.randrange(60)), i)
         for i in range(300)],
        "k long, ts timestamp, lid long",
    )
    right_rows = sorted(
        {(rng.randrange(8), datetime(2024, 1, 1, rng.randrange(24), rng.randrange(60)))
         for _ in range(120)}
    )
    right = spark.createDataFrame(
        [(k, t, float(i)) for i, (k, t) in enumerate(right_rows)],
        "k long, ts timestamp, rv double",
    )
    got = {r.lid: r.rv for r in asof_join(left, right, on="k").collect()}
    lp, rp = left.collect(), right.collect()
    for lr in lp:
        cand = [r for r in rp if r.k == lr.k and r.ts <= lr.ts]
        want = max(cand, key=lambda r: r.ts).rv if cand else None
        assert got[lr.lid] == want, (lr, got[lr.lid], want)


def test_asof_null_right_value_travels_whole(spark):
    """A NULL in one right column must NOT be back-filled from an older
    right row — the matched row travels as a unit (r3 ADVICE fix)."""
    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 12, 0), "x")], "k long, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 10, 0), 10.0, "old"),
            (1, datetime(2024, 1, 1, 11, 0), None, "new"),  # matched row, v NULL
        ],
        "k long, ts timestamp, v double, src string",
    )
    row = asof_join(left, right, on="k").collect()[0]
    assert row.src == "new"
    assert row.v is None  # NOT 10.0 spliced from the older row
