"""Deterministic hash sampling — reproducible corpus subsets at any scale.

Training-data pipelines need samples that are (a) stable across reruns and
cluster sizes (no RNG-per-partition nondeterminism), (b) consistent — a
document's membership depends only on its key, so joins between sampled
tables stay aligned — and (c) auditable by an external engine. ``rand()``
gives none of these; keyed hashing gives all three:

    keep  ⇔  h(key) < rate · p      with  h(x) = (a·(x mod p) + b) mod p

using the engine's SQL-replayable affine family over the Mersenne prime
p = 2³¹−1 (text/dedup.py) — any ANSI engine can replay the exact subset.
Stratified rates (per language / source) are a broadcast map lookup on top.
Pure Catalyst; the filter pushes into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from .dedup import MERSENNE31, affine_hash_params

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _key_to_long(df: DataFrame, key_col: str) -> Column:
    """Integral keys pass through; string keys hash via xxhash64 (stable
    across reruns and cluster sizes, but engine-specific — the ANSI-oracle
    replay path needs an integral key). A silent ``cast('long')`` on a
    string doc id would NULL out under non-ANSI and drop every row, so any
    other type is a hard error."""
    dt = df.schema[key_col].dataType
    if isinstance(dt, _INTEGRAL):
        return F.col(key_col).cast("long")
    if isinstance(dt, T.StringType):
        return F.abs(F.xxhash64(F.col(key_col)))
    raise ValueError(
        f"hash sampling key {key_col!r} must be integral or string, got {dt.simpleString()}"
    )


def _hash_col(key_long: Column, seed: int) -> Column:
    a, b = affine_hash_params(1, seed=seed)[0]
    return (F.lit(a) * F.pmod(key_long, F.lit(MERSENNE31)) + F.lit(b)) % F.lit(
        MERSENNE31
    )


def sample_threshold(rate: float) -> int:
    """Integer threshold for a [0,1] rate (exactly replayable in SQL)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return int(rate * MERSENNE31)


def hash_sample(df: DataFrame, key_col: str, rate: float, seed: int = 42) -> DataFrame:
    """Keep rows whose keyed hash falls under ``rate`` — deterministic,
    rerun-stable, and join-consistent across tables sharing the key."""
    return df.where(_hash_col(_key_to_long(df, key_col), seed) < F.lit(sample_threshold(rate)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum rates (e.g. per language): a when-chain threshold —
    stays whole-stage-codegen, no join, no UDF."""
    thr = F.lit(sample_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(sample_threshold(rate))).otherwise(thr)
    return df.where(_hash_col(_key_to_long(df, key_col), seed) < thr)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: Column | str,
    rate_at_max: float = 1.0,
    max_weight: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Quality-weighted Bernoulli sampling: each row keeps with
    probability ``rate_at_max * min(weight, max_weight) / max_weight`` —
    the per-row-rate generalization of :func:`hash_sample` (corpus
    downsampling where high-quality documents survive proportionally).

    Deterministic and rerun/cluster-size-stable: the coin is the same
    keyed affine hash as every other sampler here, compared against a
    per-row integer threshold floor(clamped_rate * MERSENNE31) — integer
    arithmetic end to end after one double multiply, so the SQL oracle
    replays inclusion exactly (the double multiply is the identical
    expression text on both engines). Join-consistent with hash_sample
    and stratified_sample at the same seed: a row kept at rate r is kept
    at every rate >= r (nested samples), per-row weights included.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    frac = F.least(w.cast("double"), F.lit(float(max_weight))) / F.lit(
        float(max_weight)
    ) * F.lit(float(rate_at_max))
    thr = F.floor(frac * F.lit(float(MERSENNE31))).cast("long")
    return df.where(_hash_col(_key_to_long(df, key_col), seed) < thr)


def mixture_by_budget(
    df: DataFrame,
    domain_col: str,
    budgets: dict[str, int],
    token_col: str,
    key_col: str,
    seed: int = 42,
    n_buckets: int = 1024,
) -> DataFrame:
    """Curriculum-mixture sampling: per domain, take documents in
    deterministic hash order until the domain's TOKEN budget is met.

    Semantics (replayable as one SQL window): order each domain's docs by
    (h(key), key); a doc is selected iff the running token total of all
    docs strictly before it is < the domain's budget — so the selection is
    an exact order-prefix that includes the budget-crossing doc. Domains
    absent from ``budgets`` are dropped.

    Scale shape: the naive form is a per-domain window cumsum — ONE sorted
    task per domain at 10¹² docs. Instead, two passes (the zip_with_index
    counts+offsets pattern, operators/nodes.py): (1) hash-RANGE-bucket
    each doc (bucket = h // width is monotone in the sort order) and
    aggregate (domain, bucket) token sums — ≤ |domains|·n_buckets rows to
    the driver, the same adjudicated small-collect as dense-id offsets;
    (2) buckets strictly below each domain's boundary bucket pass with a
    broadcast when-filter (no sort at all), and ONLY the boundary bucket's
    ~1/n_buckets slice pays a window cumsum, seeded with the exact offset.
    Returns the selected rows (key, domain, tokens).
    """
    h = _hash_col(_key_to_long(df, key_col), seed)
    width = -(-MERSENNE31 // n_buckets)  # ceil → bucket ids in [0, n_buckets)
    base = df.where(F.col(domain_col).isin(*budgets.keys())).select(
        F.col(key_col),
        F.col(domain_col),
        F.col(token_col).cast("long").alias("_tok"),
        h.alias("_h"),
    ).withColumn("_bucket", F.expr(f"CAST(_h DIV {width} AS INT)"))
    # two deterministic scans, NOT a persist: caching the corpus costs more
    # than the second scan at every measured shape (8M rows: persist 9.5s
    # vs re-scan 2.3s) and is impossible at 10¹² rows anyway — the keyed
    # hash makes both passes see identical values by construction
    stats = (
        base.groupBy(domain_col, "_bucket")
        .agg(F.sum("_tok").alias("_sum"))
        .collect()  # ≤ |domains|·n_buckets aggregated rows — driver-safe
    )
    per_dom: dict[str, list[tuple[int, int]]] = {}
    for r in stats:
        per_dom.setdefault(r[domain_col], []).append((r["_bucket"], r["_sum"]))
    full_max: dict[str, int] = {}  # buckets < this are fully selected
    boundary: dict[str, tuple[int, int]] = {}  # domain -> (bucket, offset)
    for dom, pairs in per_dom.items():
        budget, cum = int(budgets[dom]), 0
        full_max[dom] = 1 << 31  # total under budget → everything passes
        for b, s in sorted(pairs):
            if cum + s >= budget:
                full_max[dom] = b
                boundary[dom] = (b, cum)
                break
            cum += s

    full_thr = F.lit(-1)
    for dom, b in sorted(full_max.items()):
        full_thr = F.when(F.col(domain_col) == dom, F.lit(b)).otherwise(full_thr)
    full = base.where(F.col("_bucket") < full_thr)

    parts = [full]
    if boundary:
        bnd_b = F.lit(-1)
        bnd_off = F.lit(0)
        bnd_budget = F.lit(0)
        for dom, (b, off) in sorted(boundary.items()):
            bnd_b = F.when(F.col(domain_col) == dom, F.lit(b)).otherwise(bnd_b)
            bnd_off = F.when(F.col(domain_col) == dom, F.lit(off)).otherwise(bnd_off)
            bnd_budget = F.when(
                F.col(domain_col) == dom, F.lit(int(budgets[dom]))
            ).otherwise(bnd_budget)
        w = Window.partitionBy(domain_col).orderBy("_h", key_col)
        bnd = (
            base.where(F.col("_bucket") == bnd_b)
            .withColumn("_cum_before", F.sum("_tok").over(w) - F.col("_tok") + bnd_off)
            .where(F.col("_cum_before") < bnd_budget)
            .drop("_cum_before")
        )
        parts.append(bnd)
    out = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    return out.select(
        F.col(key_col),
        F.col(domain_col),
        F.col("_tok").alias("n_tokens"),
    )


def weighted_topk_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    weight_col: Column | str,
    k: int,
    seed: int = 42,
    salt: int | None = None,
) -> DataFrame:
    """Fixed-SIZE per-stratum weighted sample (Efraimidis-Spirakis A-Res):
    exactly min(k, |stratum|) rows per stratum, selection probability
    proportional to weight — the "k best-quality docs per domain" op the
    Bernoulli samplers here can't express (their output size is random).

    Each row draws the deterministic uniform u = (h+1)/2³¹ from the same
    keyed affine hash as every sampler in this module (rerun- and
    cluster-size-stable, nested-consistent at one seed), ranks by
    r = u^(1/w), and the top k ranks per stratum win. r is rule-16
    rounded to 6 dp BEFORE ranking with ``key`` as the total tie-break,
    so the cross-engine pow() ulp cannot reorder the cut; rows with
    weight ≤ 0 are excluded (E-S is undefined there), matching the SQL
    replay's WHERE.

    Adds ``rk`` (1-based rank within the stratum) and ``rank_key`` (the
    rounded r) to the output.

    Scale shape: one hash + pow projection (whole-stage codegen), then a
    per-stratum top-k. With FEW strata each window group is a single
    sorted task at 10¹² rows — pass ``salt`` to pre-reduce within
    (stratum, h mod salt) sub-groups first (top-k of per-group top-ks ≡
    global top-k, the knn_join stage-1 identity); the merge then sorts
    ≤ salt·k rows per stratum. Gate it on measured stratum populations —
    below the straggler regime the extra shuffle is pure cost (rule 20,
    measured on the knn two-stage top-k).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = (F.col(weight_col) if isinstance(weight_col, str) else weight_col).cast(
        "double"
    )
    h = _hash_col(_key_to_long(df, key_col), seed)
    # u ∈ (0, 1]: M+1 = 2³¹ exactly, so the division is exact binary scaling
    u = (h.cast("double") + F.lit(1.0)) / F.lit(2147483648.0)
    r_raw = F.pow(u, F.lit(1.0) / w)
    staged = df.where(w > F.lit(0.0)).withColumn(
        "rank_key",
        F.floor(r_raw * F.lit(1e6) + F.lit(0.5) + F.lit(1e-8)) / F.lit(1e6),
    )
    order = [F.col("rank_key").desc(), F.col(key_col).asc()]
    if salt:
        pre = Window.partitionBy(
            strata_col, F.pmod(_hash_col(_key_to_long(staged, key_col), seed), F.lit(int(salt)))
        ).orderBy(*order)
        staged = (
            staged.withColumn("_prk", F.row_number().over(pre))
            .where(F.col("_prk") <= F.lit(int(k)))
            .drop("_prk")
        )
    win = Window.partitionBy(strata_col).orderBy(*order)
    return (
        staged.withColumn("rk", F.row_number().over(win))
        .where(F.col("rk") <= F.lit(int(k)))
    )


def apportion_budget(
    counts: DataFrame,
    budget: int,
    key_col: str = "stratum",
    count_col: str = "cnt",
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of an integer sample
    budget across strata proportional to their counts — the standard
    exact-integer allocation for class-balanced resampling and
    train/val/test splits (mixture_by_budget's affine-coin sampler then
    draws the per-stratum rows).

    quota = cnt·budget / total; every stratum gets ``floor(quota)`` and
    the ``budget − Σ floor`` leftover units go to the largest
    remainders (``cnt·budget % total``, exact integers — no float
    quota anywhere), ties to the smallest key. Σ alloc == budget
    exactly. → (stratum, cnt, base, extra, alloc).

    Scale shape: one global sum (a single-row broadcast join), one
    rank over the strata relation — strata cardinality (classes,
    sources, languages: ≤ ~10⁵) bounds the single-partition sort, NOT
    the row count, so 10¹² underlying rows cost one pre-aggregated
    count pass upstream of this function.
    """
    b = int(budget)
    if b < 0:
        raise ValueError(f"budget must be >= 0, got {b}")
    from pyspark.sql import Window

    tot = counts.agg(F.sum(count_col).alias("_total"))
    # `div` is Spark's exact integral division (the oracle's `//`) —
    # no float quota, so cnt·budget stays exact up to 2^63
    q = counts.crossJoin(F.broadcast(tot)).selectExpr(
        key_col,
        f"CAST({count_col} AS BIGINT) AS cnt",
        f"CAST({count_col} AS BIGINT) * CAST({b} AS BIGINT) div _total"
        " AS base",
        f"CAST({count_col} AS BIGINT) * CAST({b} AS BIGINT) % _total AS rem",
    )
    # leftover = budget - sum(base): a second single-row broadcast join
    left = q.agg((F.lit(b) - F.sum("base")).alias("_left"))
    w = Window.orderBy(F.col("rem").desc(), F.col(key_col))
    return (
        q.withColumn("_rk", F.row_number().over(w))
        .crossJoin(F.broadcast(left))
        .selectExpr(
            key_col,
            "cnt",
            "base",
            "CAST(CASE WHEN _rk <= _left THEN 1 ELSE 0 END AS BIGINT)"
            " AS extra",
            "base + CAST(CASE WHEN _rk <= _left THEN 1 ELSE 0 END AS BIGINT)"
            " AS alloc",
        )
    )


def kfold_assign(
    df: DataFrame,
    k: int,
    stratum_col: str = "stratum",
    id_col: str = "id",
) -> DataFrame:
    """Stratified K-fold assignment: within each stratum, rows order by
    the Knuth multiplicative shuffle key ``(id · 2654435761) % 2³²``
    (id tiebreak — deterministic, rerun-stable, and expressible in both
    engines; ids need not be dense) and fold = (position − 1) % k, so
    every stratum's rows spread across folds within ±1 of each other —
    the exact-balance guarantee class-stratified cross-validation
    needs. → input columns + fold.

    One rank window per stratum partition; 10¹² rows flow through a
    single range-partitioned sort per stratum. The shuffle key is a
    bijection on [0, 2³²) so equal-id collisions are impossible for
    32-bit ids and broken by the id tiebreak otherwise."""
    kk = int(k)
    if kk < 1:
        raise ValueError(f"k must be >= 1, got {kk}")
    from pyspark.sql import Window

    shuffle_key = f"(CAST({id_col} AS BIGINT) * 2654435761) % 4294967296"
    w = Window.partitionBy(stratum_col).orderBy(
        F.expr(shuffle_key), F.col(id_col)
    )
    return df.withColumn(
        "fold", ((F.row_number().over(w) - 1) % kk).cast("long")
    )
