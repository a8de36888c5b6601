"""diff_tables (io/reconcile.py) vs a brute-force dict compare."""

import pytest
from pyspark.sql import functions as F

from morituri_spark.io.reconcile import diff_tables


def _rows(n, mutate=False):
    out = []
    for i in range(n):
        if mutate and i % 13 == 5:
            continue  # dropped in b
        v = float(i % 97)
        s = f"s{i % 7}"
        if mutate and i % 11 == 3:
            v += 0.5  # changed in b
        out.append((i, v, s))
    if mutate:
        out += [(10_000 + i, float(i), "new") for i in range(0, n, 17)]
    return out


def _ref(a_rows, b_rows):
    a = {r[0]: r for r in a_rows}
    b = {r[0]: r for r in b_rows}
    out = {}
    for k in a.keys() | b.keys():
        if k not in b:
            out[k] = "a_only"
        elif k not in a:
            out[k] = "b_only"
        elif a[k] != b[k]:
            out[k] = "differs"
    return out


@pytest.mark.parametrize("n_buckets", [1, 7, 4096])
def test_diff_matches_bruteforce(spark, n_buckets):
    a_rows, b_rows = _rows(400), _rows(400, mutate=True)
    schema = "event_id long, value double, tag string"
    a = spark.createDataFrame(a_rows, schema).repartition(8)
    b = spark.createDataFrame(b_rows, schema).repartition(8)
    got = {
        r["event_id"]: r["status"]
        for r in diff_tables(a, b, ["event_id"], n_buckets=n_buckets).collect()
    }
    assert got == _ref(a_rows, b_rows)
    assert set(got.values()) == {"a_only", "b_only", "differs"}


def test_identical_tables_empty_diff(spark):
    rows = _rows(300)
    schema = "event_id long, value double, tag string"
    a = spark.createDataFrame(rows, schema).repartition(4)
    b = spark.createDataFrame(rows, schema).repartition(11)  # layout differs
    assert diff_tables(a, b, ["event_id"]).count() == 0


def test_paired_duplicate_mutation_not_cancelled(spark):
    # swap two rows' values: counts match AND xor matches (x^y == y^x) —
    # only the masked sum can't be fooled here... actually xor of the
    # bucket is identical too; the ROW-level anti-join must still catch
    # both keys once the masked sum differs or, if sums also matched,
    # this test documents the sketch's collision surface. Construct the
    # nastier case: b duplicates row 1's values onto row 2, so b loses
    # row 2's signature and gains a second copy of row 1's value columns
    # under key 2 — count equal, xor differs.
    schema = "event_id long, value double, tag string"
    a = spark.createDataFrame([(1, 1.0, "x"), (2, 2.0, "y")], schema)
    b = spark.createDataFrame([(1, 1.0, "x"), (2, 1.0, "x")], schema)
    got = {
        r["event_id"]: r["status"]
        for r in diff_tables(a, b, ["event_id"], n_buckets=1).collect()
    }
    assert got == {2: "differs"}


def test_schema_and_key_guards(spark):
    a = spark.createDataFrame([(1, 1.0)], "k long, v double")
    b = spark.createDataFrame([(1, "x")], "k long, w string")
    with pytest.raises(ValueError):
        diff_tables(a, b, ["k"])
    with pytest.raises(ValueError):
        diff_tables(a, a, ["nope"])
