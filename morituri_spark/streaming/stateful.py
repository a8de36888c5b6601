"""Custom STATEFUL streaming operator via ``applyInPandasWithState``
(the brief's escape hatch for operators Spark's built-in streaming agg
can't express): exactly-once FIRST-SEEN emission per key.

Use case at scale: streaming ingest dedup — a 10¹²-image feed re-delivers
payloads (at-least-once sources, backfills); downstream stages want each
image_id exactly once, with its first-seen event time. A windowed
aggregation can't express "emit on first occurrence, then never again
regardless of time" — that is per-key state with unbounded lifetime, i.e.
GroupState.

State per key is one boolean + the first timestamp (a few bytes); with
billions of keys, production deployments bound it with a state-store TTL
(``GroupStateTimeout.ProcessingTimeTimeout`` + a re-dedup batch join —
the exact-dedup operator — downstream), mirroring the cap discipline in
text/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_first_seen(
    stream: DataFrame,
    key_col: str = "image_id",
    ts_col: str = "ts",
) -> DataFrame:
    """stream → one output row per DISTINCT key: (key, first_ts, n_first) —
    emitted in the first micro-batch that contains the key (n_first = that
    batch's occurrence count); later batches with the same key emit
    nothing. Key/timestamp column names are parameters; the key column's
    type follows the input schema."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_field = stream.schema[key_col]
    out_schema = (
        f"{key_col} {key_field.dataType.simpleString()}, "
        "first_ts timestamp, n_first long"
    )
    state_schema = "seen boolean"

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            for _ in pdfs:  # drain; already emitted
                pass
            return
        first, n = None, 0
        for pdf in pdfs:
            m = pdf[ts_col].min()
            first = m if first is None else min(first, m)
            n += len(pdf)
        state.update((True,))
        yield pd.DataFrame({key_col: [key[0]], "first_ts": [first], "n_first": [n]})

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )
