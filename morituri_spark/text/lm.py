"""Bigram language-model scoring — KenLM-style perplexity quality filter.

Trains add-one-smoothed bigram statistics on the corpus itself and
scores every document by its average per-bigram negative log-likelihood
(self-scoring, the standard cheap stand-in for an external KenLM model
in training-data quality pipelines: boilerplate and gibberish score far
from the corpus average, natural prose scores near it):

    P(w_i | w_{i-1}) = (c(w_{i-1} w_i) + 1) / (c_ctx(w_{i-1}) + V)
    nll(doc)         = -Σ ln P  over the doc's bigram positions

where ``c_ctx(w)`` counts w's occurrences as a bigram context (= the
number of bigrams starting with w) and ``V`` is the corpus vocabulary
size (distinct token types).

Cross-engine exactness: each bigram's ln-probability is ONE shared
double expression, floor-rounded to integer MICRO-units (×1e6 with the
rule-16 epsilon, which also absorbs engine ulp differences in ln) and
summed as exact integers, so the per-doc sum is order-independent and
bit-identical in Spark and the SQL oracle — the same scheme as
retrieval.py's BM25. The high-perplexity gate is a pure integer
comparison (no float division at the boundary).

Scale shape: tokenization is one scan + per-doc window (lead) keyed by
doc id; bigram/context/vocab stats are map-side-combinable aggregates;
scoring is one equi-join of doc bigrams against the bigram-stats
aggregate keyed by (w1, w2) — skewed stopword bigrams stay joinable
because the stats side is an aggregate (AQE skew-join splits the probe
side); no row ever carries more than one bigram. No driver-side state.

Reference scope: no counterpart in morituri; first-class LLM-pipeline
operator (SURVEY.md §2 extension family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .retrieval import TOKEN_SPLIT


def doc_bigrams(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """→ (``id_col``, w1, w2): consecutive non-empty token pairs per
    document, in text order (duplicates kept)."""
    toks = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT)).alias(
            "_pos", "_term"
        ),
    ).where(F.col("_term") != "")
    w = Window.partitionBy(id_col).orderBy("_pos")
    return (
        toks.select(
            F.col(id_col),
            F.col("_term").alias("w1"),
            F.lead("_term").over(w).alias("w2"),
        )
        .where(F.col("w2").isNotNull())
    )


#: the Kneser-Ney probability as ONE shared engine/oracle expression over
#: the staged integer counts (rule 5: explicit DOUBLE casts; rule 9: the
#: counts are separate projected columns). 0.75 and the micro-rounding
#: epsilon are binary-representable, so Spark and DuckDB evaluate the
#: identical IEEE operation sequence.
_KN_P_EXPR = (
    "(greatest(CAST(cbg AS DOUBLE) - {d}, 0.0)"
    " + {d} * CAST(n1fw AS DOUBLE)"
    " * (CAST(n1bw AS DOUBLE) / CAST(nbb AS DOUBLE)))"
    " / CAST(cctx AS DOUBLE)"
)


def kn_bigram_probs(
    docs: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities — the real-LM
    smoothing (add-one over-smooths; KN backs off by CONTINUATION
    counts, the published fix):

        p_KN(w2|w1) = max(c(w1,w2) − D, 0)/c_ctx(w1)
                      + D·N1+(w1,·)/c_ctx(w1) · N1+(·,w2)/N(··)

    where N1+(w1,·) = distinct continuations of w1, N1+(·,w2) = distinct
    contexts preceding w2, N(··) = distinct bigram types, D = discount.

    → (w1, w2, cbg, p_micro): every OBSERVED bigram type with its raw
    count and p_KN floor-rounded to integer micro-units via the shared
    rule-16 expression — bit-identical across engines because every
    operand is an exact integer count and D = 0.75 is binary-exact.

    Scale shape: four map-side-combinable aggregates over the bigram
    relation (counts, per-context stats, per-word continuation counts,
    one global scalar) and two equi-joins keyed by w1 / w2 — stopword
    skew stays joinable because both join sides are aggregates.
    """
    d = float(discount)
    bg = doc_bigrams(docs, doc_id, text_col)
    cbg = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cbg"))
    cctx = bg.groupBy("w1").agg(
        F.count(F.lit(1)).alias("cctx"),
        F.countDistinct("w2").alias("n1fw"),
    )
    n1bw = cbg.groupBy("w2").agg(F.count(F.lit(1)).alias("n1bw"))
    nbb = cbg.agg(F.count(F.lit(1)).alias("nbb"))
    staged = (
        cbg.join(cctx, "w1")
        .join(n1bw, "w2")
        .crossJoin(F.broadcast(nbb))
        .select(
            "w1", "w2", "cbg",
            F.expr(_KN_P_EXPR.format(d=repr(d))).alias("_p"),
        )
    )
    return staged.select(
        "w1", "w2", "cbg",
        F.floor(F.col("_p") * F.lit(1e6) + F.lit(0.5) + F.lit(1e-8))
        .cast("long")
        .alias("p_micro"),
    )


def lm_nll_scores(
    docs: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
    nll_gate_micro: int = 7_000_000,
) -> DataFrame:
    """→ (doc_id, n_bigrams, nll_micro, avg_nll, high_perplexity):
    per-document total negative log-likelihood in exact integer
    micro-units, its per-bigram average (rounded to 6 dp), and the
    quality gate ``nll_micro > nll_gate_micro · n_bigrams`` (an exact
    integer comparison — ``nll_gate_micro`` is the average-NLL
    threshold in micro-nats, default 7.0 nats/bigram). Documents with
    fewer than two tokens have no bigrams and are absent.
    """
    bg = doc_bigrams(docs, doc_id, text_col)
    bg_counts = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_cbg"))
    ctx_counts = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("_cctx"))
    vocab = (
        bg.select(F.col("w1").alias("_t"))
        .unionAll(bg.select(F.col("w2").alias("_t")))
        .agg(F.countDistinct("_t").alias("_v"))
    )
    stats = (
        bg_counts.join(ctx_counts, "w1")
        .crossJoin(F.broadcast(vocab))
        # stage the shared double expression once, then quantize (rule 9/16)
        .select(
            "w1", "w2",
            F.log(
                (F.col("_cbg").cast("double") + F.lit(1.0))
                / (F.col("_cctx").cast("double") + F.col("_v").cast("double"))
            ).alias("_lnp"),
        )
        .select(
            "w1", "w2",
            F.floor(-F.col("_lnp") * F.lit(1e6) + F.lit(0.5) + F.lit(1e-8))
            .cast("long").alias("_nll_micro"),
        )
    )
    scored = (
        bg.join(stats, ["w1", "w2"])
        .groupBy(doc_id)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("_nll_micro").alias("nll_micro"),
        )
    )
    return scored.select(
        doc_id, "n_bigrams", "nll_micro",
        F.round(
            F.col("nll_micro").cast("double")
            / (F.col("n_bigrams").cast("double") * F.lit(1e6)),
            6,
        ).alias("avg_nll"),
        (
            F.col("nll_micro") > F.lit(int(nll_gate_micro)) * F.col("n_bigrams")
        ).alias("high_perplexity"),
    )
