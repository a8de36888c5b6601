"""Overlapping token-window chunking — the RAG / context-window splitter.

Splits each document into fixed-size token windows with overlap (the
standard retrieval / pretraining chunker: windows of ``chunk_tokens``
whitespace tokens, stride = chunk_tokens − overlap, the final window
allowed to run short so every token lands in ≥1 chunk).

Pure Catalyst: one split + an in-row sequence/posexplode — no shuffle at
all; chunk rows inherit the scan's partitioning, so a downstream write or
embed stage starts perfectly parallel. The chunk-count closed form and the
1-based token slicing are integer arithmetic any ANSI engine replays
exactly (driver oracle: DuckDB regexp_split_to_array + list slicing).

Semantics pinned:
* tokens = whitespace runs over trim(text) (same rule as
  quality.token_count_ws); a whitespace-only doc has 0 tokens and emits
  NO chunks.
* n_chunks = 1 if n_tokens <= chunk_tokens else
  (n_tokens - chunk_tokens + stride - 1) DIV stride + 1 — i.e. the last
  window starts at the smallest multiple of stride covering the tail.
* chunk_text re-joins with single spaces (original whitespace is
  normalized, the universal chunker behavior).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_text(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, chunk_id, start_token, n_chunk_tokens, chunk_text) rows.

    ``chunk_id`` is 0-based and ``start_token`` = chunk_id · stride
    (0-based token offset into the normalized token sequence).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}, {chunk_tokens}"
        )
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    staged = docs.select(
        F.col(id_col),
        F.when(F.trim(F.col(text_col)) == "", F.array().cast("array<string>"))
        .otherwise(toks)
        .alias("_toks"),
    ).withColumn("_n", F.size("_toks"))
    n = F.col("_n")
    n_chunks = (
        F.when(n <= 0, F.lit(0))
        .when(n <= chunk_tokens, F.lit(1))
        .otherwise(
            # integer ceil((n - chunk)/stride) + 1, via DIV (exact, no
            # double rounding on either engine)
            F.expr(
                f"CAST((_n - {chunk_tokens} + {stride - 1}) DIV {stride} AS INT) + 1"
            )
        )
    )
    staged = staged.withColumn("_nc", n_chunks).where(F.col("_nc") > 0)
    idx = F.sequence(F.lit(0), F.col("_nc") - 1)
    out = staged.select(
        F.col(id_col),
        F.col("_toks"),
        F.col("_n"),
        F.explode(idx).alias("chunk_id"),
    )
    start = F.col("chunk_id") * stride
    piece = F.slice(F.col("_toks"), start + 1, chunk_tokens)
    return out.select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        start.cast("int").alias("start_token"),
        F.least(F.lit(chunk_tokens), F.col("_n") - start)
        .cast("int")
        .alias("n_chunk_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )
