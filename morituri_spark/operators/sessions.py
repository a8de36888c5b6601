"""Gap-based sessionization — `F.session_window` in batch (and streaming).

Training-data pipelines cut event streams into user sessions (gap rule: a
new session starts when an event arrives MORE than gap after the previous
one — Spark's session_window merge bound is inclusive, so an exactly-gap
event still merges; SQL replications must test strict `>`. Pinned in
tests/test_sessions.py).

Spark-first shape: `groupBy(user, session_window(ts, gap))` is a single
shuffle on the user key with the window assignment computed inside the
aggregation — no self-join, no global sort. The same call works under
Structured Streaming with a watermark (late data merges sessions until the
watermark closes them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """One row per (user, session): bounds, event count, duration seconds."""
    return (
        events.groupBy(user_col, F.session_window(ts_col, gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select(
            user_col,
            "n_events",
            "session_start",
            "session_end",
            # NTZ-safe, tz-free, and boundary-exact (== SQL date_diff
            # 'second' semantics): truncate both bounds to the second, then
            # whole-second difference
            F.expr(
                "timestampdiff(SECOND, date_trunc('SECOND', session_start),"
                " date_trunc('SECOND', session_end))"
            ).alias("duration_s"),
        )
    )
