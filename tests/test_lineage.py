"""A7 lineage checkpointing: write → kill-simulation → exact resume."""

import os

import pytest
from pyspark.sql import functions as F

from morituri_spark.io import lineage as L


@pytest.fixture()
def df(spark):
    return spark.range(0, 10_000).select(
        F.col("id").alias("key"), (F.col("id") * 3 % 97).alias("val")
    )


def test_write_then_resume_noop(spark, df, tmp_path):
    path = str(tmp_path / "t1")
    r1 = L.resumable_write(df, path, key_col="key", n_buckets=8)
    assert r1["written"] == 8 and r1["skipped"] == 0 and r1["rows_written"] == 10_000
    # second run: everything already checkpointed → no-op
    r2 = L.resumable_write(df, path, key_col="key", n_buckets=8)
    assert r2["written"] == 0 and r2["skipped"] == 8 and r2["rows_written"] == 0
    assert L.read_with_lineage(spark, path).count() == 10_000
    assert L.verify_lineage(spark, path, key_col="key").count() == 0


def test_resume_after_partial_write(spark, df, tmp_path):
    """Simulate a killed run: only half the buckets' lineage was committed;
    resume writes exactly the missing buckets."""
    path = str(tmp_path / "t2")
    bucketed = L.with_bucket(df, "key", 8)
    first_half = bucketed.where(F.col("bucket") < 4).drop("bucket")
    r1 = L.resumable_write(first_half, path, key_col="key", n_buckets=8)
    assert r1["written"] == 4
    r2 = L.resumable_write(df, path, key_col="key", n_buckets=8)
    assert r2["skipped"] == 4 and r2["written"] == 4
    assert L.read_with_lineage(spark, path).count() == 10_000
    assert L.verify_lineage(spark, path, key_col="key").count() == 0


def test_verify_detects_tamper(spark, df, tmp_path):
    path = str(tmp_path / "t3")
    L.resumable_write(df, path, key_col="key", n_buckets=4)
    # tamper: delete one data file
    data_dir = os.path.join(path, "data")
    victims = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(data_dir)
        for f in fs
        if f.endswith(".parquet")
    ]
    os.remove(victims[0])
    bad = L.verify_lineage(spark, path, key_col="key").count()
    assert bad > 0


def test_catalog_adapter_roundtrip(spark, df, tmp_path):
    """The same flow driven through an explicit catalog instance (r4
    adapter); Iceberg backend refuses cleanly without its runtime."""
    import pytest

    path = str(tmp_path / "via_adapter")
    cat = L.ParquetLineageCatalog()
    out = L.resumable_write(df, path, key_col="key", n_buckets=8, catalog=cat)
    assert out["rows_written"] > 0
    assert L.verify_lineage(spark, path, key_col="key", catalog=cat).count() == 0
    again = L.resumable_write(df, path, key_col="key", n_buckets=8, catalog=cat)
    assert again["written"] == 0 and again["skipped"] == 8
    with pytest.raises(ImportError, match="iceberg-spark-runtime"):
        L.IcebergLineageCatalog()


def test_verify_lineage_on_uncommitted_path_raises(spark, tmp_path):
    """Auditing a path where nothing was ever committed must fail with a
    descriptive error, not an AttributeError on None (r4 advice)."""
    import pytest

    with pytest.raises(ValueError, match="no lineage has been committed"):
        L.verify_lineage(spark, str(tmp_path / "never_written"), key_col="key")
