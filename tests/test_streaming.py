"""Streaming tile rollup: file-source micro-batches through the batch PIP
operators; results equal the batch answer on the same data."""

import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType, TimestampType,
)

from morituri_spark.sources import synth
from morituri_spark.streaming import pipeline as SP

SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("lon", DoubleType(), False),
        StructField("lat", DoubleType(), False),
        StructField("ingested_at", TimestampType(), False),
    ]
)


def test_streaming_rollup_matches_batch(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    images = (
        synth.images_table(spark, 2000, partitions=2, with_payload=False)
        .select(
            "image_id", "lon", "lat",
            F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ingested_at"),
        )
    )
    # two "arriving" batches
    images.where("image_id < 'img000000001000'").write.parquet(src, mode="append")
    images.where("image_id >= 'img000000001000'").write.parquet(src, mode="append")

    zone_rows = [
        (r["zone_id"], r["rings"])
        for r in synth.zones_table(spark).select("zone_id", "rings").collect()
    ]
    stream = SP.stream_images(spark, src, SCHEMA, max_files_per_trigger=2)
    rollup = SP.streaming_tile_rollup(stream, zone_rows, tile_res=7)
    q = SP.run_available_now(rollup, "t_rollup")
    q.awaitTermination(120)

    got = spark.sql(
        "SELECT tile, zone_id, sum(n_images) AS n FROM t_rollup GROUP BY 1, 2"
    ).collect()
    want = (
        SP.pip.assign_zones_union(images, zone_rows)
        .withColumn("tile", SP.C.cell_col(F.col("lon"), F.col("lat"), 7))
        .groupBy("tile", "zone_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    gset = {(r["tile"], r["zone_id"], r["n"]) for r in got}
    wset = {(r["tile"], r["zone_id"], r["n"]) for r in want}
    assert gset == wset and len(gset) > 0


def test_streaming_first_seen_exactly_once(spark, tmp_path):
    """applyInPandasWithState first-seen dedup: keys re-delivered across
    micro-batches emit exactly once, with the first batch's min timestamp."""
    import pandas as pd

    from morituri_spark.streaming.stateful import streaming_first_seen

    src = str(tmp_path / "fs_src")
    rows1 = pd.DataFrame({
        "image_id": ["a", "b", "a"],
        "ts": pd.to_datetime(["2026-01-01 00:00:02", "2026-01-01 00:00:05",
                               "2026-01-01 00:00:01"]),
    })
    rows2 = pd.DataFrame({
        "image_id": ["b", "c", "a"],   # b and a re-delivered
        "ts": pd.to_datetime(["2026-01-01 00:00:00", "2026-01-01 00:00:09",
                               "2026-01-01 00:00:00"]),
    })
    schema = StructType([
        StructField("image_id", StringType(), False),
        StructField("ts", TimestampType(), False),
    ])
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(src, mode="append")
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(src, mode="append")

    stream = SP.stream_images(spark, src, schema, max_files_per_trigger=1)
    out = streaming_first_seen(stream, key_col="image_id", ts_col="ts")
    q = (out.writeStream.format("memory").queryName("t_first_seen")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {r["image_id"]: (r["first_ts"].isoformat(), r["n_first"])
           for r in spark.table("t_first_seen").collect()}
    # exactly once per key
    assert sorted(got) == ["a", "b", "c"]
    assert spark.table("t_first_seen").count() == 3
    # c appears only in batch 2
    assert got["c"] == ("2026-01-01T00:00:09", 1)
    # a/b first emission came from whichever file's batch ran first; both
    # candidate (ts, count) pairs are per-single-file — never a merge of both
    assert got["a"] in {("2026-01-01T00:00:01", 2), ("2026-01-01T00:00:00", 1)}
    assert got["b"] in {("2026-01-01T00:00:05", 1), ("2026-01-01T00:00:00", 1)}


def test_streaming_dedup_drops_redelivered_content(spark, tmp_path):
    """Streaming exact dedup: a content hash emits once (lowest doc_id of
    its introducing batch); re-deliveries in later batches emit nothing."""
    import pandas as pd

    from morituri_spark.streaming.stateful import streaming_dedup

    src = str(tmp_path / "dedup_src")
    b1 = pd.DataFrame({"doc_id": [3, 1, 5], "text": ["aaa", "aaa", "bbb"]})
    b2 = pd.DataFrame({"doc_id": [9, 2], "text": ["aaa", "ccc"]})  # aaa re-delivered
    schema = StructType([
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), False),
    ])
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(src, mode="append")
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(src, mode="append")

    stream = SP.stream_images(spark, src, schema, max_files_per_trigger=1)
    out = streaming_dedup(stream, content_col="text", id_col="doc_id")
    q = (out.writeStream.format("memory").queryName("t_sdedup")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    rows = spark.table("t_sdedup").collect()
    by_text = {}
    for r in rows:
        by_text.setdefault(r["content_hash"], []).append((r["doc_id"], r["n_dropped"]))
    # exactly one emission per distinct content
    assert sorted(len(v) for v in by_text.values()) == [1, 1, 1]
    emitted = {r["doc_id"] for r in rows}
    # 'aaa' emitted from whichever batch ran first: (1, dropped 1) or (9, 0);
    # 'bbb' always 5; 'ccc' always 2
    assert 5 in emitted and 2 in emitted
    pairs = {p for v in by_text.values() for p in v}
    assert (1, 1) in pairs or (9, 0) in pairs


def test_streaming_first_seen_ttl_expiry_and_batch_rededup(spark, tmp_path):
    """state_ttl_ms (r5): a key idle past the TTL is evicted — its later
    re-delivery RE-EMITS (at-least-once within the TTL contract) — and the
    documented downstream batch re-dedup restores exactly-once. Three
    single-file micro-batches: the middle batch carries no 'a' data, so
    'a''s 1ms state times out there and batch 3's re-delivery re-emits."""
    import pandas as pd

    from morituri_spark.streaming.stateful import streaming_first_seen

    src = str(tmp_path / "ttl_src")
    schema = StructType([
        StructField("image_id", StringType(), False),
        StructField("ts", TimestampType(), False),
    ])
    batches = [
        pd.DataFrame({"image_id": ["a", "b"],
                      "ts": pd.to_datetime(["2026-01-01 00:00:01",
                                            "2026-01-01 00:00:02"])}),
        pd.DataFrame({"image_id": ["c"],
                      "ts": pd.to_datetime(["2026-01-01 00:00:03"])}),
        pd.DataFrame({"image_id": ["a"],   # re-delivered after expiry
                      "ts": pd.to_datetime(["2026-01-01 00:00:09"])}),
    ]
    for b in batches:
        spark.createDataFrame(b, schema).coalesce(1).write.parquet(src, mode="append")
        time.sleep(0.05)  # distinct file mtimes → stable batch order

    stream = SP.stream_images(spark, src, schema, max_files_per_trigger=1)
    out = streaming_first_seen(stream, key_col="image_id", ts_col="ts",
                               state_ttl_ms=1)
    q = (out.writeStream.format("memory").queryName("t_fs_ttl")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    rows = spark.table("t_fs_ttl").collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["image_id"], []).append(r["first_ts"].isoformat())
    # b and c exactly once; a emitted in its first batch AND again after the
    # idle batch expired its state (file order is mtime-deterministic here,
    # but accept >= 2 to stay robust: the point is re-emission happened)
    assert len(by_key["b"]) == 1 and len(by_key["c"]) == 1
    assert len(by_key["a"]) >= 2
    assert "2026-01-01T00:00:01" in by_key["a"]
    assert "2026-01-01T00:00:09" in by_key["a"]

    # downstream batch re-dedup (the documented TTL contract): min first_ts
    # per key over the streamed sink restores exactly-once
    dedup = (
        spark.table("t_fs_ttl")
        .groupBy("image_id")
        .agg(F.min("first_ts").alias("first_ts"))
        .collect()
    )
    got = {r["image_id"]: r["first_ts"].isoformat() for r in dedup}
    assert got == {
        "a": "2026-01-01T00:00:01",
        "b": "2026-01-01T00:00:02",
        "c": "2026-01-01T00:00:03",
    }


def test_streaming_first_seen_no_ttl_unchanged(spark, tmp_path):
    """Default state_ttl_ms=None keeps the unbounded exactly-once behavior
    even across many batches (regression guard for the TTL refactor)."""
    import pandas as pd

    from morituri_spark.streaming.stateful import streaming_first_seen

    src = str(tmp_path / "nottl_src")
    schema = StructType([
        StructField("image_id", StringType(), False),
        StructField("ts", TimestampType(), False),
    ])
    for ids, ts in [(["a", "b"], ["2026-01-01 00:00:01", "2026-01-01 00:00:02"]),
                    (["c"], ["2026-01-01 00:00:03"]),
                    (["a"], ["2026-01-01 00:00:09"])]:
        pdf = pd.DataFrame({"image_id": ids, "ts": pd.to_datetime(ts)})
        spark.createDataFrame(pdf, schema).coalesce(1).write.parquet(src, mode="append")
        time.sleep(0.05)

    stream = SP.stream_images(spark, src, schema, max_files_per_trigger=1)
    out = streaming_first_seen(stream, key_col="image_id", ts_col="ts")
    q = (out.writeStream.format("memory").queryName("t_fs_nottl")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert spark.table("t_fs_nottl").count() == 3  # one per distinct key


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    from morituri_spark.operators.sessions import sessionize

    src = str(tmp_path / "sess_src")
    # 40 users × bursty events: gaps of 10s inside a session, 120s between
    rows = [
        (u, burst, i, 1_700_000_000 + u * 7 + burst * 120 + i * 10)
        for u in range(40)
        for burst in range(3)
        for i in range(4)
    ]
    raw = spark.createDataFrame(
        rows, "user_id long, burst long, i long, epoch long"
    )
    ev = raw.select("user_id", F.col("epoch").cast("timestamp").alias("ts"))
    # split MID-SESSION: the first two events of every burst arrive in
    # micro-batch 1, the rest in micro-batch 2 — the session must merge
    # across batches (generous watermark: nothing is late)
    for part in ("i < 2", "i >= 2"):
        raw.where(part).select(
            "user_id", F.col("epoch").cast("timestamp").alias("ts")
        ).write.parquet(src, mode="append")

    schema = StructType(
        [
            StructField("user_id", LongType(), False),
            StructField("ts", TimestampType(), False),
        ]
    )
    stream = SP.stream_images(spark, src, schema, max_files_per_trigger=1)
    sess = SP.streaming_sessionize(
        stream, gap="60 seconds", watermark="1 hour"
    )
    q = SP.run_available_now(sess, "t_sessions", output_mode="complete")
    q.awaitTermination(120)

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         r["duration_s"])
        for r in spark.table("t_sessions").collect()
    }
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         r["duration_s"])
        for r in sessionize(ev, gap="60 seconds").collect()
    }
    assert got == want and len(got) == 120  # 40 users × 3 bursts
