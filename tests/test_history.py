"""scd2_intervals (operators/history.py) vs a brute-force run collapse."""

import pytest

from morituri_spark.operators.history import scd2_intervals


def _ref(rows, n_vals=1):
    # rows: (key, ts, *vals) → {key: [(vals, valid_from, valid_to, version)]}
    out = {}
    bykey = {}
    for r in sorted(rows):
        bykey.setdefault(r[0], []).append(r)
    for k, evs in bykey.items():
        runs = []
        for ev in evs:
            vals = tuple(ev[2 : 2 + n_vals])
            if not runs or runs[-1][0] != vals:
                runs.append([vals, ev[1], None])
        for i in range(len(runs) - 1):
            runs[i][2] = runs[i + 1][1]
        out[k] = [
            (vals, vf, vt, i + 1) for i, (vals, vf, vt) in enumerate(runs)
        ]
    return out


def test_runs_collapse_and_versions(spark):
    rows = [
        (1, 10, "a"), (1, 20, "a"), (1, 30, "b"), (1, 40, "b"), (1, 50, "a"),
        (2, 5, "x"),
    ]
    df = spark.createDataFrame(rows, "key long, ts long, v string")
    got = scd2_intervals(df).collect()
    want = _ref(rows)
    assert len(got) == 4
    for r in got:
        runs = want[r["key"]]
        run = runs[r["version"] - 1]
        assert ((r["v"],), r["valid_from"], r["valid_to"], r["version"]) == run
        assert r["is_current"] == (r["valid_to"] is None)
    # intervals tile: version k closes where k+1 opens
    k1 = sorted(
        [r for r in got if r["key"] == 1], key=lambda r: r["version"]
    )
    assert [r["valid_from"] for r in k1] == [10, 30, 50]
    assert [r["valid_to"] for r in k1] == [30, 50, None]


def test_null_safe_change_detection(spark):
    rows = [(1, 1, None), (1, 2, None), (1, 3, "a"), (1, 4, None)]
    df = spark.createDataFrame(rows, "key long, ts long, v string")
    got = sorted(scd2_intervals(df).collect(), key=lambda r: r["version"])
    # NULL→NULL merges; NULL→a and a→NULL are changes
    assert [(r["v"], r["valid_from"], r["valid_to"]) for r in got] == [
        (None, 1, 3), ("a", 3, 4), (None, 4, None),
    ]


def test_multi_column_tracking(spark):
    rows = [(1, 1, "a", 10), (1, 2, "a", 10), (1, 3, "a", 11), (1, 4, "b", 11)]
    df = spark.createDataFrame(rows, "key long, ts long, v string, w long")
    got = scd2_intervals(df, val_cols=("v", "w")).collect()
    assert len(got) == 3  # any tracked column changing opens a version
    ref = _ref(rows, n_vals=2)[1]
    bv = {r["version"]: r for r in got}
    for vals, vf, vt, ver in ref:
        assert (bv[ver]["v"], bv[ver]["w"]) == vals
        assert (bv[ver]["valid_from"], bv[ver]["valid_to"]) == (vf, vt)


def test_guard(spark):
    df = spark.createDataFrame([(1, 1, "a")], "key long, ts long, v string")
    with pytest.raises(ValueError):
        scd2_intervals(df, val_cols=())


def test_merge_upsert_semantics(spark):
    from morituri_spark.operators.history import merge_upsert

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "key long, v string"
    )
    # key 1: update then delete (delete wins by seq); key 2: two updates
    # (latest wins); key 4: insert; key 3: untouched
    chg = spark.createDataFrame(
        [
            (1, "U", 10, "a2"), (1, "D", 20, None),
            (2, "U", 5, "b2"), (2, "U", 6, "b3"),
            (4, "U", 1, "d"),
        ],
        "key long, op string, seq long, v string",
    )
    got = {r["key"]: r["v"] for r in merge_upsert(snap, chg).collect()}
    assert got == {2: "b3", 3: "c", 4: "d"}


def test_merge_upsert_guard(spark):
    from morituri_spark.operators.history import merge_upsert

    df = spark.createDataFrame([(1, "a")], "key long, v string")
    chg = spark.createDataFrame(
        [(1, "U", 1, "b")], "key long, op string, seq long, v string"
    )
    with pytest.raises(ValueError):
        merge_upsert(df, chg, val_cols=())
