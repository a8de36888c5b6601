"""BM25 lexical retrieval — the sparse counterpart to the ANN stack.

Scores documents against a query set with Okapi BM25 (the Lucene idf
form, which is always positive):

    idf(t)      = ln((N − df_t + 0.5) / (df_t + 0.5) + 1)
    score(q, d) = Σ_{t ∈ q ∩ d} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

Training-data uses: benchmark decontamination by lexical overlap (the
recall-oriented complement of text/decontam.py's exact n-gram match),
query-based corpus audits, and hard-negative mining for retrieval sets.

Cross-engine exactness: each per-term contribution is ONE shared double
expression, floor-rounded to integer MICRO-UNITS (×1e6, rule-16 epsilon)
and summed as exact integers — so the cross-term sum is order-independent
and the final score (micros / 1e6) is bit-identical in Spark and the SQL
oracle. A straight double sum would inherit the engines' differing
accumulation orders.

Scale shape: tokenization is one generator-explode scan; tf / dl / df
are map-side-combinable aggregates. The scoring join BROADCASTS the
query-term list (query sets are small next to a 10¹²-row corpus), so
postings never shuffle for matching — only matched (query, doc) partial
sums cross the wire, pre-combined map-side. High-df terms (stopwords)
are dropped by an EXACT integer gate (df·100 > N·max_df_pct), which is
both standard BM25 practice and the hot-key bound: no posting list
longer than max_df_pct% of the corpus ever enters the join. Top-k per
query uses one rank window over the matched set (bounded by the df cap);
per rule 20 no salting — per-query candidate sorts at these shapes never
straggle.

Reference scope: no counterpart in morituri; first-class LLM-pipeline
operator (SURVEY.md §2 extension family).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: tokens are maximal [a-z0-9]+ runs of the lowercased text — shared
#: verbatim by the SQL oracle (regexp_split_to_array on the same pattern)
TOKEN_SPLIT = "[^a-z0-9]+"


def tokenize(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """→ (``id_col``, term): one row per token occurrence (duplicates
    kept — term frequency is the caller's aggregate)."""
    return df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT)).alias("term"),
    ).where(F.col("term") != "")


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_df_pct: int = 50,
    doc_id: str = "doc_id",
    query_id: str = "query_id",
    text_col: str = "text",
    query_text_col: str = "text",
) -> DataFrame:
    """→ (query_id, doc_id, rank, score): the ``k`` best BM25 matches per
    query, rank 1-based, ties broken by doc_id ascending (deterministic
    total order). Query terms are DISTINCT per query (standard BM25 —
    repeating a word in the query does not double its weight). Terms in
    more than ``max_df_pct``% of documents are excluded from scoring
    (exact integer gate; also the posting-list length bound). ``score``
    is exact integer micro-units / 1e6 — see the module docstring.
    """
    if not 0 < max_df_pct <= 100:
        raise ValueError(f"max_df_pct must be in (0, 100], got {max_df_pct}")
    toks = tokenize(docs, doc_id, text_col)
    tf = toks.groupBy(doc_id, "term").agg(F.count(F.lit(1)).alias("_tf"))
    dl = tf.groupBy(doc_id).agg(F.sum("_tf").alias("_dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_dl").alias("_stok")
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    qterms = tokenize(queries, query_id, query_text_col).distinct()

    n_d = F.col("_n").cast("double")
    avgdl = F.col("_stok").cast("double") / n_d
    idf = F.log(
        (n_d - F.col("_df").cast("double") + F.lit(0.5))
        / (F.col("_df").cast("double") + F.lit(0.5))
        + F.lit(1.0)
    )
    tf_d = F.col("_tf").cast("double")
    tf_norm = (
        tf_d * F.lit(float(k1) + 1.0)
        / (tf_d + F.lit(float(k1))
           * (F.lit(1.0 - float(b)) + F.lit(float(b)) * F.col("_dl").cast("double") / avgdl))
    )
    # per-(query, term) stats: vocabulary ⋈ broadcast query terms → tiny,
    # then THIS broadcasts into the postings scan, so posting lists are
    # filtered scan-side and never shuffle for matching
    qdf = (
        df_t.join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        # exact integer stopword gate — also the hot-key bound
        .where(F.col("_df") * 100 <= F.col("_n") * F.lit(int(max_df_pct)))
    )
    matched = (
        tf.join(F.broadcast(qdf), "term")
        .join(dl, doc_id)  # AQE broadcasts the matched side when small
        # stage the shared double expression once, then quantize (rule 9/16)
        .select(query_id, doc_id, (idf * tf_norm).alias("_x"))
        .select(
            query_id, doc_id,
            F.floor(F.col("_x") * F.lit(1e6) + F.lit(0.5) + F.lit(1e-8))
            .cast("long").alias("_micros"),
        )
    )
    scored = matched.groupBy(query_id, doc_id).agg(
        F.sum("_micros").alias("_sum_micros")
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("_sum_micros").desc(), F.col(doc_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(int(k)))
        .select(
            query_id, doc_id, "rank",
            (F.col("_sum_micros").cast("double") / F.lit(1e6)).alias("score"),
        )
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    doc_id: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, term, rank, tfidf): each document's ``k`` highest
    tf·idf terms (keyword extraction — the per-document complement of
    :func:`bm25_topk`'s per-query retrieval), rank 1-based, ties broken
    by term ascending. Uses the classic weighting tf · ln(N / df); the
    product is ONE shared double expression floor-rounded to integer
    micro-units (rule 16), so scores, tie-breaks and therefore the
    selected rows are engine-exact.

    Scale shape: tf and df are map-side-combinable aggregates; the
    doc-frequency side joins back by term (an aggregate, so AQE splits
    skewed stopword terms); corpus size N broadcasts as a 1-row cross
    join; top-k is one window over per-doc term groups (bounded by doc
    vocabulary — rule 20: no salting at that shape).
    """
    toks = tokenize(docs, doc_id, text_col)
    tf = toks.groupBy(doc_id, "term").agg(F.count(F.lit(1)).alias("_tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    n = docs.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n))
        .select(
            doc_id, "term",
            (
                F.col("_tf").cast("double")
                * F.log(F.col("_n").cast("double") / F.col("_df").cast("double"))
            ).alias("_x"),
        )
        .select(
            doc_id, "term",
            F.floor(F.col("_x") * F.lit(1e6) + F.lit(0.5) + F.lit(1e-8))
            .cast("long").alias("_micros"),
        )
    )
    w = Window.partitionBy(doc_id).orderBy(
        F.col("_micros").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(int(k)))
        .select(
            doc_id, "term", "rank",
            (F.col("_micros").cast("double") / F.lit(1e6)).alias("tfidf"),
        )
    )
