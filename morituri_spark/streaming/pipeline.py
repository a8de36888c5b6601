"""Structured-Streaming ingest for the flagship pipeline.

The reference is a bounded batch job (SURVEY.md §2.8), so streaming is an
engine EXTENSION, not a parity item: a production 10¹²-image table is fed
continuously, and the tile×zone rollup must absorb new image batches
incrementally. This module re-uses the exact batch operators (cell encode,
PIP assignment) inside a streaming plan:

    readStream(parquet dir) → assign_zones_union (stateless, codegen)
      → withWatermark(event_time) → windowed groupBy(tile, zone) counts
      → sink (append/update)

Late data is handled by the watermark; the stateless PIP stage means state
is bounded to the aggregation windows only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..geo import cells as C
from ..geo import pip


def stream_images(
    spark: SparkSession,
    path: str,
    schema,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_tile_rollup(
    images_stream: DataFrame,
    zone_rows: list,
    tile_res: int = 7,
    watermark: str = "10 minutes",
    window: str = "5 minutes",
    ts_col: str = "ingested_at",
) -> DataFrame:
    """images stream (needs lon/lat + an event-time column) → per-window
    (tile, zone) counts. The PIP stage is the stateless single-scan codegen
    form, so it composes with streaming without extra state."""
    assigned = pip.assign_zones_union(images_stream, zone_rows)
    return (
        assigned.withColumn("tile", C.cell_col(F.col("lon"), F.col("lat"), tile_res))
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), "tile", "zone_id")
        .agg(F.count(F.lit(1)).alias("n_images"))
    )


def streaming_sessionize(
    events_stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 minute",
) -> DataFrame:
    """Streaming face of operators/sessions.sessionize — the SAME
    ``session_window`` aggregation composes with a watermark unchanged
    (Spark merges a late event into its session until the watermark
    passes the session's close; state is bounded to open sessions).

    The gap rule is inherited: the merge bound is INCLUSIVE (an
    exactly-gap event merges; tests/test_sessions.py pins it, SQL
    replays must test strict ``>``).
    """
    from ..operators.sessions import sessionize

    return sessionize(
        events_stream.withWatermark(ts_col, watermark),
        user_col=user_col,
        ts_col=ts_col,
        gap=gap,
    )


def run_available_now(
    rollup: DataFrame, query_name: str = "tile_rollup", output_mode: str = "complete"
):
    """Drain everything currently available (batch-like execution of the
    streaming plan) into an in-memory sink; returns the started query.

    Default mode is ``complete``: with ``availableNow`` the watermark never
    passes the final windows, so ``append`` would hold those rows back —
    production sinks that need append pair it with a continuing stream.
    """
    return (
        rollup.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
