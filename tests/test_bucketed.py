"""Bucketed layout: exchange-free co-bucketed joins, correct results."""

import pytest
from pyspark.sql import functions as F

from morituri_spark.io import bucketed


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    facts = spark.range(0, 50_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    dims = spark.range(0, 50_000, 3).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
    )
    bucketed.write_bucketed(facts, "t_facts_bkt", "k", 8, path=str(base / "facts"))
    bucketed.write_bucketed(dims, "t_dims_bkt", "k", 8, path=str(base / "dims"))
    return facts, dims


def test_cobucketed_join_has_no_exchange(spark, tables):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed.cobucketed_join(spark, "t_facts_bkt", "t_dims_bkt", "k")
        assert bucketed.n_exchanges(joined) == 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_plain_join_control_has_exchanges(spark, tables):
    facts, dims = tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = facts.join(dims.hint("merge"), "k")
        assert bucketed.n_exchanges(joined) >= 2
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_cobucketed_join_results_match_plain(spark, tables):
    facts, dims = tables
    got = (
        bucketed.cobucketed_join(spark, "t_facts_bkt", "t_dims_bkt", "k")
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
    )
    want = (
        facts.join(dims, "k")
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_aggregate_on_bucket_key_has_no_exchange(spark, tables):
    # bucketing also covers groupBy on the bucket key — partial agg output
    # is already co-partitioned
    agg = spark.table("t_facts_bkt").groupBy("k").agg(F.sum("v").alias("sv"))
    assert bucketed.n_exchanges(agg) == 0
