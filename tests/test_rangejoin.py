"""Range join: half-open semantics, bin-boundary exactness, brute-force parity."""

from pyspark.sql import functions as F

from morituri_spark.operators.rangejoin import range_join


def _bands(spark):
    return spark.createDataFrame(
        [(0, 0.0, 50.0), (1, 50.0, 75.0), (2, 75.0, 75.5), (3, 80.0, 200.0)],
        "band_id long, lo double, hi double",
    )


def test_half_open_boundaries(spark):
    facts = spark.createDataFrame(
        [(i, v) for i, v in enumerate([0.0, 49.999, 50.0, 74.999, 75.0, 75.49, 75.5, 80.0, 199.999, 200.0, -1.0])],
        "fid long, v double",
    )
    out = {r.fid: r.band_id for r in range_join(facts, _bands(spark), "v").collect()}
    assert out == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2, 5: 2, 7: 3, 8: 3}
    assert 6 not in out and 9 not in out and 10 not in out  # 75.5, 200.0, -1 excluded


def test_matches_bruteforce_any_bin_width(spark):
    import random

    rng = random.Random(9)
    facts = spark.createDataFrame(
        [(i, rng.uniform(-20, 220)) for i in range(500)], "fid long, v double"
    )
    bands = _bands(spark)
    want = sorted(
        (r.fid, r.band_id)
        for r in facts.crossJoin(bands)
        .where((F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi")))
        .collect()
    )
    for w in (0.25, 7.0, 50.0, 500.0):
        got = sorted(
            (r.fid, r.band_id) for r in range_join(facts, bands, "v", bin_width=w).collect()
        )
        assert got == want, w


def test_empty_interval_ignored(spark):
    facts = spark.createDataFrame([(1, 10.0)], "fid long, v double")
    bands = spark.createDataFrame(
        [(0, 10.0, 10.0), (1, 0.0, 20.0)], "band_id long, lo double, hi double"
    )
    out = [r.band_id for r in range_join(facts, bands, "v").collect()]
    assert out == [1]


def test_left_outer_keeps_unmatched(spark):
    facts = spark.createDataFrame(
        [(1, 10.0), (2, 300.0)], "fid long, v double"  # 300 matches nothing
    )
    out = {r.fid: r.band_id for r in range_join(facts, _bands(spark), "v", how="left").collect()}
    assert out == {1: 0, 2: None}


def test_semi_and_anti(spark):
    facts = spark.createDataFrame(
        [(1, 10.0), (2, 300.0), (3, 76.0)], "fid long, v double"
    )
    semi = sorted(r.fid for r in range_join(facts, _bands(spark), "v", how="left_semi").collect())
    anti = sorted(r.fid for r in range_join(facts, _bands(spark), "v", how="left_anti").collect())
    assert semi == [1]
    assert anti == [2, 3]  # 76.0 falls in the [75.5, 80) gap


def test_unsupported_how_raises(spark):
    import pytest

    facts = spark.createDataFrame([(1, 10.0)], "fid long, v double")
    with pytest.raises(ValueError, match="range_join supports"):
        range_join(facts, _bands(spark), "v", how="full")
