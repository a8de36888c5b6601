"""Greedy packing: budget resets, oversized docs, per-stratum independence."""

from pyspark.sql import functions as F

from morituri_spark.text.packing import pack_greedy


def _packs(spark, rows, budget):
    df = spark.createDataFrame(rows, "g string, i long, tok long")
    out = pack_greedy(df, "tok", budget, part_col="g", order_col="i")
    return {(r.g, r.i): r.pack_id for r in out.collect()}


def test_reset_semantics(spark):
    rows = [("a", 1, 40), ("a", 2, 50), ("a", 3, 20), ("a", 4, 95), ("a", 5, 10)]
    got = _packs(spark, rows, budget=100)
    # 40+50 fits; +20 would be 110 -> new pack; 20+95 over -> new; 95+10 over -> new
    assert got == {("a", 1): 0, ("a", 2): 0, ("a", 3): 1, ("a", 4): 2, ("a", 5): 3}


def test_oversized_first_doc_opens_pack_zero(spark):
    rows = [("a", 1, 500), ("a", 2, 10)]
    got = _packs(spark, rows, budget=100)
    assert got == {("a", 1): 0, ("a", 2): 1}


def test_strata_pack_independently(spark):
    rows = [("a", 1, 60), ("b", 1, 60), ("a", 2, 60), ("b", 2, 30)]
    got = _packs(spark, rows, budget=100)
    assert got[("a", 1)] == 0 and got[("a", 2)] == 1
    assert got[("b", 1)] == 0 and got[("b", 2)] == 0


def test_every_pack_within_budget_unless_single_doc(spark):
    import random

    rng = random.Random(3)
    rows = [("s", i, rng.randrange(1, 120)) for i in range(400)]
    df = spark.createDataFrame(rows, "g string, i long, tok long")
    out = pack_greedy(df, "tok", 256, part_col="g", order_col="i")
    stats = (
        out.groupBy("pack_id")
        .agg(F.sum("tok").alias("tot"), F.count("*").alias("n"))
        .collect()
    )
    for r in stats:
        assert r.tot <= 256 or r.n == 1
