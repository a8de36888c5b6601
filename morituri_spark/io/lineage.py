"""A7: per-partition lineage checkpointing + exact resume.

North rule: every stage checkpoints per-partition lineage (cell range, row
count, digest) so a killed run resumes exactly. The production target is an
Iceberg table (snapshot commits per stage + a lineage side table keyed by
snapshot id); this container has no Iceberg jars, so the same contract is
implemented over parquet with dynamic-partition-overwrite semantics — the
mechanism (bucket-granular idempotent commits + order-insensitive digests)
is identical, only the catalog differs.

Layout:
    <path>/data/bucket=<b>/...parquet      bucket-partitioned payload
    <path>/_lineage/part-*.parquet         one row per completed bucket:
        (bucket, row_count, digest, key_min, key_max)

Write protocol (idempotent per bucket):
  1. read existing lineage → completed buckets
  2. restrict input to missing buckets
  3. dynamic-partition-overwrite write of those buckets (a bucket directory
     left by a killed run is fully rewritten, never appended)
  4. append the new buckets' lineage rows

Digest: bit_xor over xxhash64 of all cell values per row — commutative, so
it is independent of row order and partition layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def with_bucket(df: DataFrame, key_col: str, n_buckets: int, bucket_col: str = "bucket") -> DataFrame:
    """Deterministic bucket from a key column. For spatial tables, pass the
    parent-cell column instead (geo.cells.parent_col) to get cell-range
    buckets — the 'cell range' of the north rule."""
    return df.withColumn(bucket_col, F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int"))


def _lineage_of(df: DataFrame, bucket_col: str, key_col: str) -> DataFrame:
    data_cols = [c for c in df.columns if c != bucket_col]
    row_hash = F.xxhash64(*[F.col(c) for c in data_cols])
    return (
        df.withColumn("_h", row_hash)
        .groupBy(bucket_col)
        .agg(
            F.count(F.lit(1)).alias("row_count"),
            F.expr("bit_xor(_h)").alias("digest"),
            F.min(key_col).alias("key_min"),
            F.max(key_col).alias("key_max"),
        )
    )


def completed_buckets(spark: SparkSession, path: str) -> DataFrame | None:
    lineage_path = os.path.join(path, "_lineage")
    try:
        return spark.read.parquet(lineage_path)
    except Exception:
        return None


def resumable_write(
    df: DataFrame,
    path: str,
    key_col: str,
    n_buckets: int = 64,
    bucket_col: str = "bucket",
) -> dict:
    """Write ``df`` bucket-by-bucket with lineage; skip buckets already
    recorded. Returns {'written': k, 'skipped': m, 'rows_written': n}.

    Crash-safety: data is written BEFORE its lineage row; a bucket whose
    data landed but whose lineage append was lost is simply rewritten on
    resume (dynamic partition overwrite), so the pair (data, lineage) is
    effectively atomic at bucket granularity.
    """
    spark = df.sparkSession
    bucketed = with_bucket(df, key_col, n_buckets, bucket_col).persist()
    done = completed_buckets(spark, path)
    if done is not None:
        todo = bucketed.join(
            F.broadcast(done.select(bucket_col)), bucket_col, "left_anti"
        )
        n_done = done.count()
    else:
        todo = bucketed
        n_done = 0
    todo = todo.persist()
    rows = todo.count()
    n_new = todo.select(bucket_col).distinct().count()
    if rows > 0:
        (
            todo.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(bucket_col)
            .parquet(os.path.join(path, "data"))
        )
        _lineage_of(todo, bucket_col, key_col).write.mode("append").parquet(
            os.path.join(path, "_lineage")
        )
    bucketed.unpersist()
    todo.unpersist()
    return {"written": n_new, "skipped": n_done, "rows_written": rows}


def read_with_lineage(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, "data"))


def verify_lineage(spark: SparkSession, path: str, key_col: str) -> DataFrame:
    """Audit: recompute (row_count, digest) from the data and diff against
    the lineage table → rows that disagree (empty == intact)."""
    data = read_with_lineage(spark, path)
    recomputed = _lineage_of(data, "bucket", key_col)
    recorded = completed_buckets(spark, path)
    joined = recorded.alias("r").join(recomputed.alias("c"), "bucket", "full")
    return joined.where(
        (F.col("r.row_count") != F.col("c.row_count"))
        | (F.col("r.digest") != F.col("c.digest"))
        | F.col("r.row_count").isNull()
        | F.col("c.row_count").isNull()
    ).select("bucket", "r.row_count", "c.row_count", "r.digest", "c.digest")
