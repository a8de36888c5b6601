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
