"""Benchmark decontamination + exact duplicated-substring spans.

Two training-data hygiene operators the LLM-pipeline families were still
missing:

* :func:`decontaminate` — flag corpus documents whose n-gram sets overlap
  a benchmark/eval set (the standard train/test contamination check, e.g.
  GPT-3 appendix C / PaLM 13-gram overlap). The benchmark side is tiny by
  construction (eval suites are ≤10⁶ grams), so its distinct gram set
  BROADCASTS and the corpus side never shuffles for the membership test —
  the only exchange is the per-doc count aggregation, which partial-aggs
  map-side to one row per document.

* :func:`duplicate_span_stats` — per-document exactly-duplicated window
  fraction (the signal behind suffix-array substring dedup, Lee et al.
  2022, "Deduplicating Training Data Makes Language Models Better",
  re-expressed as a distributed rolling-window join instead of a
  single-node suffix array). A window position is "duplicated" when its
  k-byte gram occurs in ≥2 distinct documents. Shuffle shape at 10¹²
  docs: (gram, doc) dedup with map-side combine → gram-keyed count — the
  same two-level aggregation as exact dedup — then one gram-keyed join
  back and a doc-keyed partial-agg count. ``stride`` subsamples window
  positions for a bounded-cost approximation (stride ≤ k/2 still catches
  any duplicated run ≥ 2k bytes at every position).

Both reuse the staged-encode byte-slice shingle pipeline
(text/dedup.py:shingle_df — UTF8String.substr is O(position), rule 17)
and stay pure Catalyst end-to-end: no UDFs, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _staged_grams(
    docs: DataFrame,
    n: int,
    text_col: str,
    id_col: str,
    distinct: bool,
    stride: int = 1,
) -> DataFrame:
    """(id, gram_hash[, pos]) rows: xxhash64 over O(1) byte slices of a
    STAGED encode() column (inlining the encode re-runs it per element —
    rule 9). ``distinct`` dedups per-doc IN-ROW (array_distinct) — ONLY
    appropriate off the hot path: the in-row dedup runs serially inside
    the scan task and measured far slower than deduping through a
    (doc, gram) hash aggregate after the exchange (482s vs ~15s at 50k
    docs); both exported operators therefore use distinct=False."""
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    tbc = F.col("_tb")
    idx = F.sequence(
        F.lit(1), F.greatest(F.length(tbc) - (n - 1), F.lit(1)), F.lit(stride)
    )
    grams = F.transform(idx, lambda i: F.xxhash64(tbc.substr(i, F.lit(n))))
    staged = docs.select(F.col(id_col), F.encode(F.col(text_col), "UTF-8").alias("_tb"))
    if distinct:
        return staged.select(
            F.col(id_col), F.explode(F.array_distinct(grams)).alias("gram_hash")
        )
    return staged.select(
        F.col(id_col),
        F.posexplode(grams).alias("pos", "gram_hash"),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    threshold: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    bench_broadcast: bool = True,
) -> DataFrame:
    """Per-corpus-doc benchmark n-gram overlap:
    (doc_id, n_grams, n_hits, hit_ratio, contaminated).

    ``contaminated`` is true when hit_ratio (share of the doc's DISTINCT
    n-grams that appear anywhere in the benchmark) exceeds ``threshold``;
    threshold=0.0 flags any single overlapping gram (the conservative
    eval-set rule). Docs shorter than n grams still emit one truncated
    gram (same greatest(...,1) convention as shingle_df), so every doc
    gets a row and n_grams >= 1 — no division guard needed.

    Scale: the benchmark gram set is broadcast (eval suites are small by
    definition); pass the corpus at any size — membership is a broadcast
    hash join on the exploded grams and the only shuffle is the final
    doc-keyed count, partial-aggregated map-side. For an oversized
    "benchmark" (e.g. decontaminating against another full corpus slice),
    set ``bench_broadcast=False`` to route the membership test through a
    gram-keyed sort-merge join instead of shipping the gram set to every
    task — same result, one extra corpus exchange.
    """
    bench_col = bench_text_col or text_col
    bench_grams = (
        _staged_grams(benchmark, n, bench_col, id_col, distinct=False)
        .select("gram_hash")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    # per-doc gram dedup through the (doc, gram) hash aggregate, NOT
    # array_distinct in-row: the in-row form serializes the whole dedup
    # into the scan task and measured 30× slower on a low-partition-count
    # corpus (482s vs ~15s at 50k docs / 14M grams); the pair aggregate
    # partial-aggs map-side and parallelizes after the exchange
    sh = (
        _staged_grams(corpus, n, text_col, id_col, distinct=False)
        .select(id_col, "gram_hash")
        .distinct()
    )
    bg = F.broadcast(bench_grams) if bench_broadcast else bench_grams
    per_doc = (
        sh.join(bg, "gram_hash", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hits"),
        )
    )
    ratio = F.round(F.col("n_hits") / F.col("n_grams"), 6)
    return per_doc.select(
        id_col,
        "n_grams",
        "n_hits",
        ratio.alias("hit_ratio"),
        (ratio > F.lit(float(threshold))).alias("contaminated"),
    )


def duplicate_span_stats(
    docs: DataFrame,
    k: int = 20,
    stride: int = 1,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc duplicated-window stats:
    (doc_id, n_windows, n_dup_windows, dup_ratio).

    A window (a k-byte gram at a stride-sampled byte position) counts as
    duplicated when the same gram occurs in >= ``min_docs`` DISTINCT
    documents — repeats inside one doc alone don't count (that is
    repetition_ratios' job; this operator isolates CROSS-document
    boilerplate: headers, license blocks, mirrored articles).

    n_windows is computed in closed form from the byte length (no second
    scan); n_dup_windows counts every duplicated position including
    within-doc repeats of a cross-doc gram, matching the "duplicated
    span bytes" accounting of substring dedup.
    """
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    pos = _staged_grams(docs, k, text_col, id_col, distinct=False, stride=stride)
    # ONE computation of the positional explode: collapse to (doc, gram,
    # positions) first — a map-side-combinable hash agg — then count docs
    # per gram with a gram-partitioned window over the collapsed relation
    # (≤ n_docs rows per gram). The previous two-branch form (distinct →
    # gram agg → semi-join back) recomputed the explode for each branch
    # and sorted BOTH join sides: measured 94.9s → this form 11.9s at 50k
    # docs / 12M positional grams (same session, same corpus).
    pg = pos.groupBy(id_col, "gram_hash").agg(F.count(F.lit(1)).alias("_cnt"))
    wg = Window.partitionBy("gram_hash")
    dup_counts = (
        pg.withColumn("_nd", F.count(F.lit(1)).over(wg))
        .where(F.col("_nd") >= min_docs)
        .groupBy(id_col)
        .agg(F.sum("_cnt").alias("n_dup_windows"))
    )
    blen = F.length(F.encode(F.col(text_col), "UTF-8"))
    n_windows = (
        F.floor((F.greatest(blen - (k - 1), F.lit(1)) - 1) / stride) + 1
    ).cast("long")
    totals = docs.select(F.col(id_col), n_windows.alias("n_windows"))
    out = totals.join(dup_counts, id_col, "left").select(
        id_col,
        "n_windows",
        F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
        F.round(
            F.coalesce("n_dup_windows", F.lit(0)) / F.col("n_windows"), 6
        ).alias("dup_ratio"),
    )
    return out
