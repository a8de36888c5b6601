"""Deterministic hash sampling: stability, rate accuracy, stratification."""

from pyspark.sql import functions as F

from morituri_spark.text.sampling import hash_sample, sample_threshold, stratified_sample


def test_deterministic_and_partition_invariant(spark):
    df = spark.range(20_000).select(F.col("id").alias("k"))
    a = sorted(r.k for r in hash_sample(df, "k", 0.3).collect())
    b = sorted(r.k for r in hash_sample(df.repartition(13), "k", 0.3).collect())
    assert a == b and len(a) > 0


def test_rate_accuracy_and_nesting(spark):
    df = spark.range(50_000).select(F.col("id").alias("k"))
    n10 = hash_sample(df, "k", 0.10).count()
    n30 = hash_sample(df, "k", 0.30).count()
    assert abs(n10 / 50_000 - 0.10) < 0.01
    assert abs(n30 / 50_000 - 0.30) < 0.01
    # same seed => smaller rate is a SUBSET of the larger (threshold nesting)
    s10 = {r.k for r in hash_sample(df, "k", 0.10).collect()}
    s30 = {r.k for r in hash_sample(df, "k", 0.30).collect()}
    assert s10 <= s30


def test_stratified_rates(spark):
    df = spark.range(30_000).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("grp")
    )
    out = stratified_sample(df, "grp", {"0": 0.5, "1": 0.05}, key_col="k")
    counts = {r.grp: r.n for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["0"] / 10_000 - 0.5) < 0.03
    assert abs(counts["1"] / 10_000 - 0.05) < 0.02
    assert "2" not in counts  # default rate 0


def test_threshold_bounds():
    import pytest

    assert sample_threshold(0.0) == 0
    with pytest.raises(ValueError):
        sample_threshold(1.5)


def test_string_keys_hash_not_null_cast(spark):
    """String doc ids must sample via a real hash — the old cast('long')
    NULLed every key and silently returned an empty sample (r3 ADVICE)."""
    df = spark.createDataFrame(
        [(f"doc-{i}",) for i in range(20_000)], "k string"
    )
    a = sorted(r.k for r in hash_sample(df, "k", 0.3).collect())
    b = sorted(r.k for r in hash_sample(df.repartition(7), "k", 0.3).collect())
    assert a == b
    assert abs(len(a) / 20_000 - 0.3) < 0.02  # not empty, near the rate


def test_unsupported_key_type_raises(spark):
    import pytest

    df = spark.createDataFrame([(1.5,)], "k double")
    with pytest.raises(ValueError, match="integral or string"):
        hash_sample(df, "k", 0.5)


def test_mixture_by_budget_prefix_semantics(spark):
    """Selected set == exact hash-order prefix per domain: compare the
    two-pass bucketed implementation against a straight window cumsum."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from morituri_spark.text.dedup import MERSENNE31, affine_hash_params
    from morituri_spark.text.sampling import mixture_by_budget

    df = spark.range(5_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("dom"),
        (F.col("id") % 97 + 1).alias("tok"),
    )
    budgets = {"0": 10_000, "1": 500, "2": 1, "3": 10_000_000}
    got = sorted(
        (r.k, r.dom, r.n_tokens)
        for r in mixture_by_budget(df, "dom", budgets, "tok", "k", n_buckets=8).collect()
    )
    a, b = affine_hash_params(1, seed=42)[0]
    h = (F.lit(a) * F.pmod(F.col("k"), F.lit(MERSENNE31)) + F.lit(b)) % F.lit(MERSENNE31)
    w = Window.partitionBy("dom").orderBy(h.asc(), "k")
    thr = F.lit(0)
    for d, bud in budgets.items():
        thr = F.when(F.col("dom") == d, F.lit(bud)).otherwise(thr)
    ref = (
        df.withColumn("_cb", F.sum("tok").over(w) - F.col("tok"))
        .where(F.col("_cb") < thr)
        .select("k", "dom", F.col("tok").alias("n_tokens"))
    )
    exp = sorted((r.k, r.dom, r.n_tokens) for r in ref.collect())
    assert got == exp and len(got) > 0
    # budget semantics: every domain's total reaches (and only just crosses)
    # its budget, or the domain ran out of docs
    import collections

    tot = collections.Counter()
    for _, d, t in got:
        tot[d] += t
    assert tot["2"] > 0  # crossing doc included even on a 1-token budget
    assert tot["3"] == sum(r.tok for r in df.where("dom = '3'").collect())


def test_mixture_by_budget_partition_invariant(spark):
    from pyspark.sql import functions as F

    from morituri_spark.text.sampling import mixture_by_budget

    df = spark.range(3_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("string").alias("dom"),
        F.lit(10).alias("tok"),
    )
    budgets = {"0": 4_000, "1": 700}
    a = sorted(r.k for r in mixture_by_budget(df, "dom", budgets, "tok", "k").collect())
    b = sorted(
        r.k
        for r in mixture_by_budget(
            df.repartition(11), "dom", budgets, "tok", "k", n_buckets=64
        ).collect()
    )
    assert a == b and len(a) == 400 + 70


def test_weighted_sample_rates_and_nesting(spark):
    from morituri_spark.text.sampling import weighted_sample
    import pyspark.sql.functions as F

    df = spark.range(200_000).select(
        F.col("id"),
        # three weight bands: 0.1, 0.5, 1.0 (and an over-max 2.0 that clamps)
        F.element_at(
            F.array(F.lit(0.1), F.lit(0.5), F.lit(1.0), F.lit(2.0)),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("w"),
    )
    kept = weighted_sample(df, "id", "w", rate_at_max=0.8, max_weight=1.0)
    rates = {
        r.w: r.n / 50_000
        for r in kept.groupBy("w").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert abs(rates[0.1] - 0.08) < 0.01
    assert abs(rates[0.5] - 0.4) < 0.02
    assert abs(rates[1.0] - 0.8) < 0.02
    assert abs(rates[2.0] - 0.8) < 0.02  # clamped at max_weight
    # nesting: the 0.4-rate sample is a subset of the 0.8-rate sample
    lo = {r.id for r in weighted_sample(df, "id", "w", rate_at_max=0.4).collect()}
    hi = {r.id for r in weighted_sample(df, "id", "w", rate_at_max=0.8).collect()}
    assert lo < hi
    # determinism
    again = {r.id for r in weighted_sample(df, "id", "w", rate_at_max=0.8).collect()}
    assert again == hi


def _es_ref(rows, k, seed=42):
    """Pure-Python Efraimidis-Spirakis reference: rows = [(stratum, key, w)]."""
    import math
    from morituri_spark.text.dedup import MERSENNE31, affine_hash_params

    a, b = affine_hash_params(1, seed=seed)[0]
    ranked = {}
    for s, key, w in rows:
        if w <= 0:
            continue
        h = (a * (key % MERSENNE31) + b) % MERSENNE31
        u = (h + 1) / 2147483648.0
        r = math.floor(u ** (1.0 / w) * 1e6 + 0.5 + 1e-8) / 1e6
        ranked.setdefault(s, []).append((-r, key, w))
    out = {}
    for s, items in ranked.items():
        for rk, (negr, key, w) in enumerate(sorted(items)[:k], start=1):
            out[(s, key)] = (-negr, rk)
    return out


def test_weighted_topk_exact_vs_reference(spark):
    from morituri_spark.text.sampling import weighted_topk_sample

    rows = [
        ("a", i, [0.25, 0.5, 1.0, 2.0][i % 4]) for i in range(40)
    ] + [("b", 100 + i, float(i % 7)) for i in range(30)]  # includes w=0 rows
    df = spark.createDataFrame(rows, "dom string, doc_id long, w double")
    got = {
        (r["dom"], r["doc_id"]): (r["rank_key"], r["rk"])
        for r in weighted_topk_sample(df, "dom", "doc_id", "w", k=5).collect()
    }
    assert got == _es_ref(rows, 5)
    # exactly k per stratum (both strata have ≥ 5 positive-weight rows)
    assert sum(1 for (s, _) in got if s == "a") == 5
    assert sum(1 for (s, _) in got if s == "b") == 5


def test_weighted_topk_salt_identity_and_small_stratum(spark):
    from morituri_spark.text.sampling import weighted_topk_sample

    rows = [("a", i, 1.0 + (i % 3)) for i in range(200)] + [("tiny", 999, 5.0)]
    df = spark.createDataFrame(rows, "dom string, doc_id long, w double")
    plain = {
        (r["dom"], r["doc_id"], r["rk"])
        for r in weighted_topk_sample(df, "dom", "doc_id", "w", k=8).collect()
    }
    salted = {
        (r["dom"], r["doc_id"], r["rk"])
        for r in weighted_topk_sample(df, "dom", "doc_id", "w", k=8, salt=16).collect()
    }
    assert plain == salted            # stage-1 pre-reduce is exact
    assert ("tiny", 999, 1) in plain  # min(k, |stratum|) rows survive
    import pytest as _pt
    with _pt.raises(ValueError, match="k must be"):
        weighted_topk_sample(df, "dom", "doc_id", "w", k=0)
