"""Frequent item-pair mining with lift — the market-basket primitive
(co-occurring tags, query terms, image labels): which pairs of items
appear together in more baskets than chance predicts.

Semantics contract (engine-stable, SQL-replayable):

- a basket's items are DEDUPED first (presence, not multiplicity);
- pair support counts baskets containing BOTH items, pairs ordered
  item_a < item_b; singleton supports and the basket count come from
  the same deduped relation;
- the Apriori prune is applied BEFORE pairing: items with support <
  ``min_support`` cannot belong to a frequent pair (anti-monotonicity),
  so they never enter the self-join — the classic candidate-generation
  cut, and the engine's skew defense (hub items are pruned or kept by
  DATA, not by a sampling heuristic);
- lift = n_baskets·supp_ab / (supp_a·supp_b), emitted in exact
  micro-units via the rule-16 shared rounding (the products are exact
  integers < 2⁵³; the single division is correctly rounded identically
  in both engines).

→ (item_a, item_b, supp_ab, lift_micro), pairs with supp_ab ≥
``min_support`` only.

Scale shape: dedup + supports are map-side-combinable aggregates; the
pair generation is ONE self-equi-join keyed by basket id over the
PRUNED relation, so its fan-out is Σ k_b² over surviving items per
basket — bounded by the prune, and per-basket item caps are the
documented guard for pathological baskets (the minhash cap_stats
discipline). The support joins are aggregate-vs-aggregate.

Reference scope: no counterpart in morituri; LLM-pipeline / analytics
extension family (SURVEY.md §2), sibling of collocations.py (ordered
bigrams in text — this module is unordered co-presence in sets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def frequent_pairs(
    baskets: DataFrame,
    min_support: int = 2,
    basket_col: str = "basket_id",
    item_col: str = "item",
) -> DataFrame:
    """→ (item_a, item_b, supp_ab, lift_micro): basket-presence pair
    supports (item_a < item_b, supp_ab ≥ min_support) with lift in
    exact micro-units."""
    ms = int(min_support)
    if ms < 1:
        raise ValueError(f"min_support must be >= 1, got {ms}")
    # The deduped (basket, item) relation feeds FIVE consumers (both
    # sides of the pair self-join, two support lookups, the basket
    # count) and Catalyst does not reuse the identical subtrees — the
    # before-plan held five copies of the distinct (guide §2.4).
    # Materialize it once (localCheckpoint, knn's _Round machinery); the
    # blocks are reclaimed by the ContextCleaner when the returned plan
    # is dropped.
    from morituri_spark.geo.knn import _Round

    bi = _Round.materialize(
        baskets.select(
            F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
        ).distinct(),
        truncate=True,
    ).df
    n_baskets = bi.agg(F.countDistinct("_b").alias("_n"))
    supp = bi.groupBy("_i").agg(F.count(F.lit(1)).alias("_s"))
    # Apriori prune: infrequent items cannot form frequent pairs
    frequent = supp.where(F.col("_s") >= ms)
    pruned = bi.join(frequent, "_i").select("_b", "_i", "_s")
    left = pruned.select(
        F.col("_b"), F.col("_i").alias("item_a"), F.col("_s").alias("_sa")
    )
    right = pruned.select(
        F.col("_b"), F.col("_i").alias("item_b"), F.col("_s").alias("_sb")
    )
    pairs = (
        left.join(right, "_b")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(
            F.count(F.lit(1)).alias("supp_ab"),
            F.max("_sa").alias("_sa"),
            F.max("_sb").alias("_sb"),
        )
        .where(F.col("supp_ab") >= ms)
        .crossJoin(F.broadcast(n_baskets))
    )
    lift = (
        F.col("_n").cast("double") * F.col("supp_ab").cast("double")
    ) / (F.col("_sa").cast("double") * F.col("_sb").cast("double"))
    staged = pairs.select("item_a", "item_b", "supp_ab", lift.alias("_lift"))
    return staged.select(
        "item_a", "item_b", "supp_ab",
        F.floor(F.col("_lift") * F.lit(1e6) + F.lit(0.5) + F.lit(1e-8))
        .cast("long")
        .alias("lift_micro"),
    )
