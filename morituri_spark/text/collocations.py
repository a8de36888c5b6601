"""PMI collocation mining — statistically-bound phrases ("new york",
"machine learning") for tokenizer/vocab construction and phrase-aware
dedup in LLM data pipelines.

Positional pointwise mutual information over the corpus bigram relation:

    pmi(a, b) = ln( c_ab · N / (c1_a · c2_b) )

where c_ab counts the bigram, c1_a / c2_b the marginals of a as a LEFT
word and b as a RIGHT word, and N the total bigram positions. The
positional marginals (not unigram counts) make every statistic a rollup
of the ONE bigram-count aggregate — the corpus is scanned once, and all
three marginal relations are aggregates OF the aggregate, never a second
pass over tokens.

Cross-engine exactness (the lm.py scheme): the ln argument is one shared
double expression over exact integer counts; ln itself may differ by an
ulp between libm implementations, so the score ships floor-rounded to
integer MICRO-units with the rule-16 epsilon absorbing the dust. The
min-count gate is a pure integer comparison.

Scale shape: bigram counts are map-side-combinable (the one data-sized
exchange moves partial accumulators); the two marginal joins key on
single words against AGGREGATE relations, so stopword skew stays
AQE-splittable on the probe side; no row ever carries more than one
bigram; no driver state. At 10¹² tokens this is exactly the word-count
shape plus two vocabulary-sized joins.

Reference scope: no counterpart in morituri; first-class LLM-pipeline
operator (SURVEY.md §2 extension family), the phrase-mining sibling of
text/lm.py's bigram model (shares doc_bigrams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .lm import doc_bigrams


def collocations(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """→ (w1, w2, n_ab, n1, n2, pmi_micro): bigrams seen ≥ ``min_count``
    times with their exact counts, left/right positional marginals, and
    PMI in integer micro-nats (half-up, rule-16 epsilon). High positive
    pmi_micro = words that co-occur far above chance — the collocations."""
    bg = doc_bigrams(df, id_col, text_col)
    c_ab = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_ab"))
    # marginals + total: rollups of the aggregate, not of the corpus
    c1 = c_ab.groupBy("w1").agg(F.sum("n_ab").alias("n1"))
    c2 = c_ab.groupBy("w2").agg(F.sum("n_ab").alias("n2"))
    n = c_ab.agg(F.sum("n_ab").alias("n_total"))
    scored = (
        c_ab.where(F.col("n_ab") >= F.lit(int(min_count)))
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(n))
    )
    pmi = F.log(
        F.col("n_ab").cast("double")
        * F.col("n_total").cast("double")
        / (F.col("n1").cast("double") * F.col("n2").cast("double"))
    )
    return scored.select(
        "w1",
        "w2",
        "n_ab",
        "n1",
        "n2",
        F.floor(pmi * F.lit(1e6) + F.lit(0.5) + F.lit(1e-8))
        .cast("long")
        .alias("pmi_micro"),
    )
