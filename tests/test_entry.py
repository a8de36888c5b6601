"""Local replica of the driver's correctness gate: run every queries() entry
at sf0.001 and compare against oracle_sql() via DuckDB (row count + column
names + order-insensitive value comparison)."""

import importlib.util
import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _load_entry_module():
    spec = importlib.util.spec_from_file_location("entrymod", "/root/repo/__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.fixture(scope="module")
def entrymod():
    return _load_entry_module()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "item"):
        return _norm(v.item())
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows), key=repr
    )


def test_entry_smoke(spark, entrymod):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"tile", "zone_id", "n_points", "first_id"}


ORACLE_KEYS = sorted(_load_entry_module().oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, entrymod, con, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    got_df = q(spark, SF_DIR)
    got_cols = got_df.columns
    got = _rows_to_set(got_cols, [tuple(r) for r in got_df.collect()])
    want_rel = con.execute(sql)
    want_cols = [d[0] for d in want_rel.description]
    want = _rows_to_set(want_cols, want_rel.fetchall())
    assert sorted(got_cols) == sorted(want_cols), f"{name}: column mismatch"
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    mismatches = [(a, b) for a, b in zip(got, want) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


ROWS_ONLY_KEYS = [
    k for k in _load_entry_module().queries() if k not in set(ORACLE_KEYS)
]


def test_every_query_has_an_oracle():
    """Since r5 ALL queries() entries are oracle-checked (the last three
    rows-only synth demos were re-pointed at closed-form inputs). This
    gate keeps it that way: a new query without an oracle_sql() entry
    fails here instead of silently weakening the driver's check to
    rows-only."""
    assert ROWS_ONLY_KEYS == [], (
        f"queries without an oracle_sql entry: {ROWS_ONLY_KEYS} — add the "
        "SQL oracle (or document a genuinely non-SQL-expressible op)"
    )
