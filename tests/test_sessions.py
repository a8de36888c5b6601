"""Gap-sessionization: boundary semantics (exclusive end), counts, durations."""

from datetime import datetime

from morituri_spark.operators.sessions import sessionize


def _df(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def test_exactly_gap_merges_and_over_gap_splits(spark):
    # Spark's session_window merge bound is INCLUSIVE: an event arriving
    # exactly `gap` after the previous one still merges; one second more
    # opens a new session. (The SQL oracle replays this with a strict `>`.)
    rows = [
        (1, datetime(2024, 1, 1, 10, 0, 0)),
        (1, datetime(2024, 1, 1, 10, 30, 0)),  # exactly gap -> merges
        (1, datetime(2024, 1, 1, 11, 0, 1)),  # gap + 1s -> NEW session
    ]
    out = sessionize(_df(spark, rows), gap="30 minutes").orderBy("session_start").collect()
    assert [r.n_events for r in out] == [2, 1]
    assert out[0].duration_s == 1800
    assert out[1].duration_s == 0


def test_sessions_are_per_user(spark):
    rows = [
        (1, datetime(2024, 1, 1, 10, 0, 0)),
        (2, datetime(2024, 1, 1, 10, 0, 5)),
        (1, datetime(2024, 1, 1, 10, 10, 0)),
        (2, datetime(2024, 1, 1, 12, 0, 0)),
    ]
    out = sessionize(_df(spark, rows), gap="30 minutes").collect()
    per_user = sorted((r.user_id, r.n_events) for r in out)
    assert per_user == [(1, 2), (2, 1), (2, 1)]


def test_chain_merging(spark):
    # each event within gap of the PREVIOUS one keeps extending the session
    from datetime import timedelta

    t0 = datetime(2024, 1, 1, 9, 0, 0)
    rows = [(7, t0 + timedelta(seconds=i * 10)) for i in range(100)]
    out = sessionize(_df(spark, rows), gap="15 seconds").collect()
    assert len(out) == 1 and out[0].n_events == 100 and out[0].duration_s == 990
