"""Custom STATEFUL streaming operator via ``applyInPandasWithState``
(the brief's escape hatch for operators Spark's built-in streaming agg
can't express): exactly-once FIRST-SEEN emission per key.

Use case at scale: streaming ingest dedup — a 10¹²-image feed re-delivers
payloads (at-least-once sources, backfills); downstream stages want each
image_id exactly once, with its first-seen event time. A windowed
aggregation can't express "emit on first occurrence, then never again
regardless of time" — that is per-key state with unbounded lifetime, i.e.
GroupState.

State per key is one boolean + the first timestamp (a few bytes) — but at
10¹² keys even that is unbounded. Both operators therefore take
``state_ttl_ms`` (r5, verdict item #3): when set, state uses
``GroupStateTimeout.ProcessingTimeTimeout`` with a SLIDING window (every
sighting of the key refreshes the clock), so only keys idle longer than
the TTL are evicted. The dedup guarantee weakens from exactly-once to
at-least-once-per-TTL-window: a key re-delivered after its state expired
is re-emitted, and the documented contract is that a downstream BATCH
re-dedup (text/dedup.py ``dedup_exact`` on the sink table, min-id/min-ts
wins) restores exactly-once — the cap-and-surface discipline of
text/dedup.py applied to state stores. ``state_ttl_ms=None`` (default)
keeps the unbounded NoTimeout behavior for bounded key spaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_first_seen(
    stream: DataFrame,
    key_col: str = "image_id",
    ts_col: str = "ts",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """stream → one output row per DISTINCT key: (key, first_ts, n_first) —
    emitted in the first micro-batch that contains the key (n_first = that
    batch's occurrence count); later batches with the same key emit
    nothing. Key/timestamp column names are parameters; the key column's
    type follows the input schema. With ``state_ttl_ms`` set, a key whose
    state has been idle past the TTL is evicted and a later re-delivery
    re-emits (see module docstring for the downstream re-dedup contract)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_field = stream.schema[key_col]
    out_schema = (
        f"{key_col} {key_field.dataType.simpleString()}, "
        "first_ts timestamp, n_first long"
    )
    state_schema = "seen boolean"
    ttl = state_ttl_ms

    def fn(key, pdfs, state: GroupState):
        if ttl is not None and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            for _ in pdfs:  # drain; already emitted
                pass
            if ttl is not None:
                state.setTimeoutDuration(ttl)  # sliding TTL refresh
            return
        first, n = None, 0
        for pdf in pdfs:
            m = pdf[ts_col].min()
            first = m if first is None else min(first, m)
            n += len(pdf)
        state.update((True,))
        if ttl is not None:
            state.setTimeoutDuration(ttl)
        yield pd.DataFrame({key_col: [key[0]], "first_ts": [first], "n_first": [n]})

    timeout = (
        GroupStateTimeout.NoTimeout if ttl is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(fn, out_schema, state_schema, "append", timeout)
    )


def streaming_dedup(
    stream: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming EXACT dedup — the streaming face of text/dedup.py's
    ``dedup_exact``: emit each row whose content hash has not been seen in
    any earlier micro-batch (and keep only the first occurrence within the
    batch that introduces the hash, lowest id wins). Re-deliveries and
    backfilled duplicates are dropped at ingest instead of waiting for the
    next batch dedup pass.

    State per hash is a single boolean; ``state_ttl_ms`` bounds the store
    at unbounded hash spaces (sliding processing-time TTL + downstream
    batch re-dedup — module docstring)."""
    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    hashed = stream.withColumn("_h", F.md5(F.col(content_col)))
    id_field = stream.schema[id_col]
    out_schema = (
        f"content_hash string, {id_col} {id_field.dataType.simpleString()}, "
        "n_dropped long"
    )
    state_schema = "seen boolean"
    ttl = state_ttl_ms

    def fn(key, pdfs, state: GroupState):
        if ttl is not None and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            for _ in pdfs:
                pass
            if ttl is not None:
                state.setTimeoutDuration(ttl)
            return
        best, n = None, 0
        for pdf in pdfs:
            m = pdf[id_col].min()
            best = m if best is None else min(best, m)
            n += len(pdf)
        state.update((True,))
        if ttl is not None:
            state.setTimeoutDuration(ttl)
        yield pd.DataFrame(
            {"content_hash": [key[0]], id_col: [best], "n_dropped": [n - 1]}
        )

    timeout = (
        GroupStateTimeout.NoTimeout if ttl is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return hashed.groupBy("_h").applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )
