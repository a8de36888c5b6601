import pandas as pd
from pyspark.sql import functions as F

from morituri_spark.operators import nodes as N


def test_zip_with_index_dense_and_ordered(spark):
    df = spark.range(0, 1000).withColumn("k", (999 - F.col("id")).alias("k"))
    out = N.zip_with_index(df, order_cols=["k"], id_col="rid", n_partitions=7).collect()
    assert len(out) == 1000
    by_k = sorted(out, key=lambda r: r["k"])
    assert [r["rid"] for r in by_k] == list(range(1, 1001))
    # id follows the order column: k=0 (original id=999) gets rid 1
    assert next(r["rid"] for r in out if r["k"] == 0) == 1


def test_zip_with_index_start_offset(spark):
    df = spark.range(0, 10)
    out = N.zip_with_index(df, order_cols=["id"], start=100, id_col="rid").collect()
    assert sorted(r["rid"] for r in out) == list(range(100, 110))


def test_quantize_equality_semantics(spark):
    # two doubles that differ below 1e-7 quantize equal; above, not
    pdf = pd.DataFrame({"lon": [10.00000001, 10.00000004, 10.0000002], "lat": [1.0, 1.0, 1.0]})
    q = N.with_quantized(spark.createDataFrame(pdf)).collect()
    assert q[0]["lon_i"] == q[1]["lon_i"]
    assert q[0]["lon_i"] != q[2]["lon_i"]


def test_dedup_locations(spark):
    pdf = pd.DataFrame(
        {"lon_i": [1, 1, 2, 2, 3], "lat_i": [5, 5, 6, 6, 7]}
    )
    out = N.dedup_locations(spark.createDataFrame(pdf), ["lon_i", "lat_i"]).collect()
    assert len(out) == 3
    assert sorted(r["node_id"] for r in out) == [1, 2, 3]
    N.assert_unique_ids(
        N.dedup_locations(spark.createDataFrame(pdf), ["lon_i", "lat_i"]), "node_id"
    )


def test_duplicate_location_audit(spark):
    pdf = pd.DataFrame({"lon_i": [1, 1, 2], "lat_i": [5, 5, 6], "node_id": [1, 2, 3]})
    dupes = N.duplicate_location_audit(spark.createDataFrame(pdf)).collect()
    assert len(dupes) == 1 and dupes[0]["count"] == 2
