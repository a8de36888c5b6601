"""funnel_stages (operators/funnel.py)."""

from datetime import datetime

import pytest

from morituri_spark.operators.funnel import funnel_stages


def _ts(m):
    return datetime(2024, 1, 1, 0, m)


def test_funnel_ordering_and_depth(spark):
    rows = [
        # u1 completes all three in order
        ("u1", "view", _ts(0)), ("u1", "cart", _ts(5)), ("u1", "buy", _ts(9)),
        # u2: buy BEFORE cart -> chain breaks at stage 2
        ("u2", "view", _ts(0)), ("u2", "buy", _ts(1)), ("u2", "cart", _ts(2)),
        # u3: only views
        ("u3", "view", _ts(3)),
        # u4: cart/buy but never views -> absent
        ("u4", "cart", _ts(0)), ("u4", "buy", _ts(1)),
        # u5: simultaneous view+cart -> strict '>' rejects the tie
        ("u5", "view", _ts(2)), ("u5", "cart", _ts(2)),
        # u1 extra later events must not move the minima
        ("u1", "view", _ts(7)), ("u1", "cart", _ts(8)),
    ]
    df = spark.createDataFrame(rows, "user_id string, step string, ts timestamp")
    got = {
        r["key"]: (r["t_1"], r["t_2"], r["t_3"], r["stage"])
        for r in funnel_stages(df, ["view", "cart", "buy"]).collect()
    }
    assert set(got) == {"u1", "u2", "u3", "u5"}
    assert got["u1"] == (_ts(0), _ts(5), _ts(9), 3)
    assert got["u2"] == (_ts(0), _ts(2), None, 2)   # buy@1 precedes cart@2
    assert got["u3"] == (_ts(3), None, None, 1)
    assert got["u5"] == (_ts(2), None, None, 1)


def test_funnel_guard(spark):
    df = spark.createDataFrame(
        [("u", "a", _ts(0))], "user_id string, step string, ts timestamp"
    )
    with pytest.raises(ValueError):
        funnel_stages(df, [])
