"""Rank-based evaluation statistics: Spearman correlation and Cohen's
kappa — exact integer sufficient statistics.

Model-version comparisons (did the new quality scorer rank documents
the same way?) and annotation QA (do two labelers agree beyond
chance?) are standing needs of a training-data pipeline. Both reduce
to integer sufficient statistics a SQL oracle replays bit-for-bit; the
final ratio is ONE float division the caller applies.

Scale shape: Spearman is two rank windows over one per-group sort +
one aggregate; kappa is two hash aggregates and a tiny marginal join.
Groups partition both; neither holds global state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "spearman_stats",
    "cohen_kappa_stats",
    "retrieval_ranks",
    "roc_auc_stats",
    "calibration_bins",
    "brier_stats",
    "pr_curve_points",
    "ndcg_stats",
]


def spearman_stats(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group Spearman sufficient statistics: ranks are
    ``row_number`` over (value, id) — DETERMINISTIC total order (ties
    break by id, not averaged; document vs. the average-rank variant) —
    and the output is → (group, n, sum_d2) with
    ``rho = 1 − 6·sum_d2 / (n·(n²−1))``. All integers; n ≥ 2 required
    for rho (n ≤ 1 rows still emit with sum_d2 = 0).

    Two windows over the SAME per-group partition (rank-by-x and
    rank-by-y reuse the exchange; Catalyst plans one sort per
    ordering), then one map-side-combinable aggregate. 10⁹ rows per
    group flow through a single range-partitioned sort."""
    wx = Window.partitionBy(group_col).orderBy(x_col, id_col)
    wy = Window.partitionBy(group_col).orderBy(y_col, id_col)
    # row_number() is IntegerType: d² overflows int32 past ~46k-row
    # groups under ANSI — rank in BIGINT before any arithmetic
    ranked = df.withColumn(
        "_rx", F.row_number().over(wx).cast("long")
    ).withColumn("_ry", F.row_number().over(wy).cast("long"))
    return (
        ranked.withColumn("_d", F.col("_rx") - F.col("_ry"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("_d") * F.col("_d")).cast("long").alias("sum_d2"),
        )
    )


def cohen_kappa_stats(
    labels: DataFrame,
    group_col: str,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Per-group Cohen's kappa sufficient statistics for two annotators:
    → (group, n, agree, pe_num) with
    ``kappa = (agree·n − pe_num) / (n² − pe_num)`` — pe_num is the
    chance-agreement numerator ``Σ_c n_a(c)·n_b(c)``, all exact
    integers (the caller performs the one division).

    Three map-side-combinable aggregates: the (group) totals, the
    per-(group, label) marginals for each annotator, and the marginal
    product join — marginal cardinality is |labels| per group, so the
    join is tiny. 10¹² annotations partition on group."""
    base = labels.select(
        F.col(group_col).alias("_g"),
        F.col(a_col).alias("_a"),
        F.col(b_col).alias("_b"),
    )
    tot = base.groupBy("_g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("_a") == F.col("_b")).cast("long"))
        .cast("long")
        .alias("agree"),
    )
    ma = base.groupBy("_g", F.col("_a").alias("_c")).agg(
        F.count(F.lit(1)).alias("_na")
    )
    mb = base.groupBy("_g", F.col("_b").alias("_c")).agg(
        F.count(F.lit(1)).alias("_nb")
    )
    pe = (
        ma.join(mb, ["_g", "_c"])
        .groupBy("_g")
        .agg(F.sum(F.col("_na") * F.col("_nb")).cast("long").alias("pe_num"))
    )
    return (
        tot.join(pe, "_g", "left")
        .selectExpr(
            f"_g AS {group_col}",
            "n",
            "agree",
            "CAST(coalesce(pe_num, 0) AS BIGINT) AS pe_num",
        )
    )


def retrieval_ranks(
    scored: DataFrame,
    query_col: str = "query_id",
    cand_col: str = "cand_id",
    score_col: str = "score",
    rel_col: str = "is_rel",
) -> DataFrame:
    """Cross-modal retrieval evaluation sufficient statistics (the
    image↔caption recall@k / MRR gate): candidates rank per query by
    (score DESC, cand_id ASC — deterministic), and the output is one
    row per query → (query_id, n_cands, n_rel, first_rel_rank,
    rel_in_top1/5/10) — recall@k = mean(rel_in_topk over queries with
    n_rel > 0) and MRR = mean(1/first_rel_rank) are caller-side folds
    over exact integers (first_rel_rank NULL when no relevant
    candidate).

    One rank window over a per-query sort + one map-side-combinable
    aggregate (min_by-style conditional mins — rule 25, no second
    pass). 10⁹ queries partition freely; candidates per query bound the
    per-partition sort."""
    from pyspark.sql import Window

    w = Window.partitionBy(query_col).orderBy(
        F.col(score_col).desc(), F.col(cand_col)
    )
    ranked = scored.withColumn("_k", F.row_number().over(w))
    rel = F.col(rel_col).cast("boolean")
    return ranked.groupBy(query_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_cands"),
        F.sum(rel.cast("long")).cast("long").alias("n_rel"),
        F.min(F.when(rel, F.col("_k"))).cast("long").alias("first_rel_rank"),
        F.max(F.when(rel & (F.col("_k") <= 1), 1).otherwise(0))
        .cast("long")
        .alias("rel_in_top1"),
        F.max(F.when(rel & (F.col("_k") <= 5), 1).otherwise(0))
        .cast("long")
        .alias("rel_in_top5"),
        F.max(F.when(rel & (F.col("_k") <= 10), 1).otherwise(0))
        .cast("long")
        .alias("rel_in_top10"),
    )


def roc_auc_stats(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Per-group ROC-AUC sufficient statistics, EXACT rational: AUC is
    the Mann–Whitney statistic ``P(score⁺ > score⁻) + ½·P(=)``, so with
    integer (or quantized) scores ``2·AUC·n_pos·n_neg`` is an integer —
    → (group, n_pos, n_neg, auc_num2) with
    ``auc = auc_num2 / (2·n_pos·n_neg)`` (the caller performs the one
    division; groups with n_pos·n_neg = 0 have undefined AUC and emit
    auc_num2 = 0).

    labels must be 0/1. Shape: one hash aggregate collapses 10¹² scored
    rows to the per-(group, score) distinct-value relation (bounded by
    score cardinality — quantized model scores, not row count), one
    cumulative window over that tiny relation's per-group sort
    (negatives strictly below each score value), one final
    map-side-combinable aggregate. No per-pair work anywhere — the
    O(n_pos·n_neg) pair sum is folded through the cumulative counts.
    """
    base = df.select(
        F.col(group_col).alias("_g"),
        F.col(score_col).alias("_s"),
        F.col(label_col).cast("long").alias("_y"),
    )
    per_v = base.groupBy("_g", "_s").agg(
        F.sum("_y").cast("long").alias("_np"),
        F.sum(1 - F.col("_y")).cast("long").alias("_nn"),
    )
    w = (
        Window.partitionBy("_g")
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = per_v.withColumn(
        "_below", F.coalesce(F.sum("_nn").over(w), F.lit(0)).cast("long")
    )
    return (
        cum.groupBy("_g")
        .agg(
            F.sum("_np").cast("long").alias("n_pos"),
            F.sum("_nn").cast("long").alias("n_neg"),
            F.sum(
                F.col("_np") * (2 * F.col("_below") + F.col("_nn"))
            )
            .cast("long")
            .alias("auc_num2"),
        )
        .withColumnRenamed("_g", group_col)
    )


def calibration_bins(
    df: DataFrame,
    group_col: str,
    conf_col: str,
    label_col: str,
    n_bins: int = 10,
    conf_scale: int = 1000,
) -> DataFrame:
    """Per-(group, bin) calibration sufficient statistics, EXACT: confs
    are integers in [0, conf_scale] (per-mille by default), bin =
    ``min(conf·n_bins DIV conf_scale, n_bins−1)`` (the right edge folds
    into the last bin), and each bin row carries
    ``gap_num = |conf_scale·n_pos − sum_conf|`` — so the expected
    calibration error is the exact rational
    ``ECE = Σ_bins gap_num / (conf_scale·N)`` with NO float until the
    caller's one division (|acc − avg_conf| per bin =
    gap_num / (conf_scale·n)).

    → (group, bin, n, n_pos, sum_conf, gap_num). labels must be 0/1,
    confs non-negative (DIV ≡ ``//`` on non-negatives). ONE
    map-side-combinable hash aggregate over 10¹² rows; output
    cardinality is groups × n_bins."""
    nb = int(n_bins)
    cs = int(conf_scale)
    binned = df.selectExpr(
        f"{group_col} AS _g",
        f"least(CAST({conf_col} AS BIGINT) * {nb} div {cs}, "
        f"CAST({nb - 1} AS BIGINT)) AS _bin",
        f"CAST({conf_col} AS BIGINT) AS _c",
        f"CAST({label_col} AS BIGINT) AS _y",
    )
    return (
        binned.groupBy("_g", "_bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("_y").cast("long").alias("n_pos"),
            F.sum("_c").cast("long").alias("sum_conf"),
        )
        .selectExpr(
            f"_g AS {group_col}",
            "_bin AS bin",
            "n",
            "n_pos",
            "sum_conf",
            f"abs({cs} * n_pos - sum_conf) AS gap_num",
        )
    )


def brier_stats(
    df: DataFrame,
    group_col: str,
    conf_col: str,
    label_col: str,
    conf_scale: int = 1000,
) -> DataFrame:
    """Per-group Brier-score sufficient statistics, EXACT: with integer
    confidences in [0, conf_scale] and 0/1 labels,
    ``brier_num = Σ (conf_scale·y − c)²`` is an exact BIGINT and
    ``Brier = brier_num / (n·conf_scale²)`` is the caller's one
    division. Pairs with :func:`calibration_bins` (reliability) and
    :func:`roc_auc_stats` (ranking) to complete the classifier-eval
    triple — a scorer can rank well (high AUC) and still be
    mis-calibrated (high Brier); training-data quality gates need both.

    → (group, n, brier_num). ONE map-side-combinable hash aggregate
    over 10¹² rows; squared residuals peak at conf_scale² = 10⁶, so
    2⁶³ overflows only past 9·10¹² rows per group — repartition groups
    or lower conf_scale before that."""
    cs = int(conf_scale)
    base = df.selectExpr(
        f"{group_col} AS _g",
        f"CAST({cs} AS BIGINT) * CAST({label_col} AS BIGINT)"
        f" - CAST({conf_col} AS BIGINT) AS _r",
    )
    return (
        base.groupBy("_g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("_r") * F.col("_r")).cast("long").alias("brier_num"),
        )
        .withColumnRenamed("_g", group_col)
    )


def pr_curve_points(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Per-group precision-recall curve sufficient statistics, EXACT:
    one row per distinct score level → (group, score, tp, fp) where tp
    and fp count positives/negatives scoring AT OR ABOVE the level
    (the ≥-threshold operating point). precision = tp/(tp+fp),
    recall = tp/n_pos (n_pos = tp at the lowest level), and
    step-interpolated average precision are caller-side folds over
    exact integers — the classifier-score analogue of the detection
    AP's rank-indexed curve.

    Same collapse as :func:`roc_auc_stats`: ONE hash aggregate to the
    (group × score-level) relation, ONE cumulative window ordered by
    score DESC. Quantized scores bound the output; 10¹² rows never
    sort globally."""
    base = df.select(
        F.col(group_col).alias("_g"),
        F.col(score_col).alias("_s"),
        F.col(label_col).cast("long").alias("_y"),
    )
    per_v = base.groupBy("_g", "_s").agg(
        F.sum("_y").cast("long").alias("_np"),
        F.sum(1 - F.col("_y")).cast("long").alias("_nn"),
    )
    w = (
        Window.partitionBy("_g")
        .orderBy(F.col("_s").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return per_v.select(
        F.col("_g").alias(group_col),
        F.col("_s").alias(score_col),
        F.sum("_np").over(w).cast("long").alias("tp"),
        F.sum("_nn").over(w).cast("long").alias("fp"),
    )


def ndcg_stats(
    scored: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    cand_col: str = "cand_id",
    score_col: str = "score",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query NDCG@k sufficient statistics with GRADED relevance —
    the graded companion of :func:`retrieval_ranks`' binary
    recall@k/MRR: → (query_id, n_cands, dcg_micro, idcg_micro) with
    ``ndcg = dcg_micro / idcg_micro`` the caller's one division
    (idcg_micro = 0 ⇢ no relevant candidates, NDCG undefined).

    Determinism: the log discount table ``floor(10⁶ / log2(i+1))`` for
    ranks 1..k is computed ONCE in Python and embedded as LITERALS in
    the plan — the SQL oracle embeds the same literals, so no
    cross-engine libm log2 ulp can flip a floor (the one float surface
    is eliminated rather than epsilon-managed). DCG ranks by
    (score DESC, cand ASC); ideal DCG ranks by (rel DESC, cand ASC) —
    both deterministic total orders.

    Shape: two rank windows over the same per-query partition (one
    sort each) + one map-side-combinable aggregate; candidates per
    query bound the sorts, 10⁹ queries partition freely."""
    kk = int(k)
    disc = _ndcg_discounts(kk)
    dcase = (
        "CASE _rk "
        + " ".join(f"WHEN {i + 1} THEN {w}" for i, w in enumerate(disc))
        + " ELSE 0 END"
    )
    icase = dcase.replace("_rk", "_irk")
    w_score = Window.partitionBy(query_col).orderBy(
        F.col(score_col).desc(), F.col(cand_col)
    )
    w_ideal = Window.partitionBy(query_col).orderBy(
        F.col(rel_col).desc(), F.col(cand_col)
    )
    ranked = scored.select(
        F.col(query_col),
        F.col(rel_col).cast("long").alias("_rel"),
        F.row_number().over(w_score).cast("long").alias("_rk"),
        F.row_number().over(w_ideal).cast("long").alias("_irk"),
        F.col(rel_col).cast("long").alias("_irel"),
    )
    return ranked.groupBy(query_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_cands"),
        F.sum(F.expr(f"_rel * ({dcase})")).cast("long").alias("dcg_micro"),
        F.sum(F.expr(f"_irel * ({icase})")).cast("long").alias("idcg_micro"),
    )


def _ndcg_discounts(k: int) -> list:
    """floor(10⁶ / log2(i+1)) for i = 1..k — Python-computed literals
    shared verbatim by the Spark plan and the SQL oracle."""
    import math

    return [int(math.floor(1_000_000 / math.log2(i + 1))) for i in range(1, int(k) + 1)]
