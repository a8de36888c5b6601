"""Multi-pattern substring counting — every document scored against a
broadcast dictionary of literal needles (the blocklist / keyword-audit /
contamination-probe primitive: one pass over the corpus, the dictionary
rides along as a broadcast).

Semantics contract (engine-stable, SQL-replayable):

- matching is LITERAL substring (no regex metacharacters to diverge
  on), case-folded with ``lower()`` on both sides;
- the count per (doc, needle) is the LEFT-TO-RIGHT NON-OVERLAPPING
  occurrence count — exactly what ``replace(text, needle, '')`` removes,
  a convention Spark and DuckDB share, so the count is the length delta
  divided by the needle length (an exact integer: the delta is always a
  multiple of the needle length);
- empty needles are rejected (they would divide by zero and match
  everywhere); zero-count pairs are omitted.

Scale shape: the needle dictionary broadcasts (it is vocabulary-sized,
not corpus-sized), so the "join" is a broadcast nested loop with NO
shuffle of the corpus; each needle costs one linear substring scan of
the text inside whole-stage codegen (JVM-side `replace`, rule 1 — no
Python in the loop). For dictionaries beyond broadcast size the
documented path is Aho-Corasick inside an Arrow kernel (one corpus scan
total); at typical blocklist sizes (10²-10⁴ needles) the codegen
replace-scan wins by staying JIT-hot and shuffle-free.

Reference scope: no counterpart in morituri; LLM-pipeline extension
family (SURVEY.md §2), sibling of decontam.py (n-gram overlap) and
quality.py (regex gates — this module is the literal-dictionary case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pattern_hit_counts(
    docs: DataFrame,
    needles: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
    needle_col: str = "needle",
) -> DataFrame:
    """→ (``doc_id``, needle, hits): left-to-right non-overlapping
    occurrence counts of each lower-cased literal needle in each
    lower-cased document, zero-count pairs omitted."""
    nd = needles.select(F.lower(F.col(needle_col)).alias("needle")).where(
        F.length("needle") > 0
    )
    lowered = docs.select(
        F.col(doc_id), F.lower(F.col(text_col)).alias("_t")
    )
    joined = lowered.join(F.broadcast(nd))
    # delta is a multiple of length(needle), so int/int `/` is exact
    # float division below 2^53 in both engines (rule 28 discipline)
    hits = (
        (F.length("_t") - F.length(F.expr("replace(_t, needle, '')")))
        / F.length("needle")
    ).cast("long")
    return (
        joined.select(F.col(doc_id), "needle", hits.alias("hits"))
        .where(F.col("hits") > 0)
    )


def url_domain_counts(
    docs: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """URL-domain mining over a corpus → (domain, n_hits, n_docs):
    every ``http(s)://host`` occurrence is extracted with the shared
    pattern ``https?://([a-z0-9.-]+)`` over the LOWER-CASED text, then
    one aggregate counts total hits and distinct source documents per
    domain — the provenance-audit / source-mix primitive of a crawl
    pipeline (which hosts dominate the corpus?).

    Engine-parity contract: the pattern is a single greedy character
    class with no alternation-ambiguity or backtracking surface, so
    Java regex (Spark) and RE2-style (DuckDB ``regexp_extract_all``
    with group 1) extract identical spans; case is folded by
    ``lower()`` BEFORE matching in both engines rather than via regex
    flags (whose syntax differs).

    Shape: extraction is a JVM-side projection + explode (no Python);
    the per-domain rollup is a two-level hash aggregate —
    (domain, doc) pre-aggregation collapses per-doc repeats map-side,
    then the domain level sums hits and counts rows, so 10¹² docs
    shuffle only their distinct (domain, doc) pairs. Domains follow a
    Zipf law: a hot CDN domain still reduces through partial
    aggregation, never a single-task sort."""
    hits = (
        docs.select(
            F.col(doc_id).alias("_d"),
            F.explode(
                F.expr(
                    f"regexp_extract_all(lower({text_col}),"
                    " 'https?://([a-z0-9.-]+)', 1)"
                )
            ).alias("domain"),
        )
    )
    per_doc = hits.groupBy("domain", "_d").agg(
        F.count(F.lit(1)).cast("long").alias("_h")
    )
    return per_doc.groupBy("domain").agg(
        F.sum("_h").cast("long").alias("n_hits"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
