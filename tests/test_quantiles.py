"""exact_quantiles (operators/quantiles.py) vs sorted-rank reference."""

import math

import pytest
from pyspark.sql import functions as F

from morituri_spark.operators.quantiles import exact_quantiles, exact_quantiles_df


def _ref(values, qs):
    s = sorted(values)
    return [(q, s[math.ceil(q * len(s)) - 1]) for q in qs]


def _df(spark, values):
    return spark.createDataFrame([(v,) for v in values], "v long")


QS = [0.01, 0.25, 0.5, 0.9, 0.99, 1.0]


def test_skewed_and_duplicated(spark):
    # heavy duplication + a huge-domain outlier tail exercises multi-round
    # refinement (bucket_bits=4 -> 16 buckets/round over a 2^40 domain)
    values = [7] * 500 + [12] * 300 + list(range(100, 250)) + [2**40, -(2**39)]
    got = exact_quantiles(_df(spark, values), "v", QS, bucket_bits=4)
    assert got == _ref(values, QS)


def test_negative_and_small(spark):
    values = [-5, -5, -1, 0, 3, 3, 3, 9]
    got = exact_quantiles(_df(spark, values), "v", QS, bucket_bits=2)
    assert got == _ref(values, QS)


def test_single_value_column(spark):
    values = [42] * 17
    assert exact_quantiles(_df(spark, values), "v", [0.5]) == [(0.5, 42)]


def test_modular_spread_matches(spark):
    values = [(i * 7919) % 100000 - 50000 for i in range(20000)]
    got = exact_quantiles(_df(spark, values), "v", QS)
    assert got == _ref(values, QS)


def test_df_form_and_guards(spark):
    values = list(range(100))
    rows = exact_quantiles_df(_df(spark, values), "v", [0.5]).collect()
    assert [(r["q"], r["value"]) for r in rows] == [(0.5, 49)]
    with pytest.raises(ValueError):
        exact_quantiles(_df(spark, values), "v", [0.0])
    with pytest.raises(ValueError):
        exact_quantiles(_df(spark, values), "v", [1.5])
    with pytest.raises(ValueError):
        exact_quantiles(
            spark.createDataFrame([], "v long"), "v", [0.5]
        )


def test_huge_domain_past_2_53(spark):
    # spans past 2^53 (double-division bucketing would mis-bucket) but
    # inside the int64-span contract
    values = [
        -(2**61), -(2**60) - 7, -1, 0, 1, 2**52 + 1, 2**61, 2**61 + 3,
    ] * 5
    got = exact_quantiles(_df(spark, values), "v", QS)
    assert got == _ref(values, QS)


def test_full_int64_span_guarded(spark):
    values = [-(2**62) - 5, 2**62 + 5]
    with pytest.raises(ValueError, match="span"):
        exact_quantiles(_df(spark, values), "v", [0.5])
