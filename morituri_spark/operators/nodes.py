"""J7/J8 node dedup + S8 deterministic dense id assignment.

The reference dedups nodes by exact equality of osmium Locations — lon/lat
doubles stored fixed-point int32 at 1e-7° (navteq_types.hpp:74, SURVEY.md
§1.2). We reproduce that with explicit quantization BEFORE any equality
join, which is what makes bit-exact row-count parity achievable.

Dense ids: the reference's ``g_osm_id++`` is consecutive from 1
(navteq.hpp:47, README.md:126). A ``row_number`` over a global window is a
single-partition bottleneck at scale; ``zip_with_index`` below is the
scalable pattern — per-partition counts pass → offsets → Arrow pass. After
``repartitionByRange + sortWithinPartitions`` on a total order, partition i
precedes partition j, so the result equals the global-sort row_number while
every stage stays parallel.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType

FIXED_POINT = 10_000_000  # 1e-7 degrees, osmium::Location semantics


def quantize(col):
    """lon/lat double → fixed-point int64 (round-half-away like osmium's
    double_to_fix which rounds via nearbyint; ties are not hit by our data)."""
    return F.round(col * FIXED_POINT).cast("long")


def with_quantized(df: DataFrame, lon="lon", lat="lat") -> DataFrame:
    return df.withColumn("lon_i", quantize(F.col(lon))).withColumn(
        "lat_i", quantize(F.col(lat))
    )


def zip_with_index(
    df: DataFrame, order_cols: list[str] | None = None, start: int = 1,
    id_col: str = "osm_id", n_partitions: int | None = None,
) -> DataFrame:
    """Dense consecutive ids from ``start``, ordered by ``order_cols``.

    Two passes over a range-partitioned sort: (1) count rows per partition →
    cumulative offsets (tiny collect, one row per partition); (2) a
    mapInPandas that numbers rows using its partition's offset. Fully
    parallel; deterministic when ``order_cols`` is a total order.

    The sorted frame is persisted between the passes — range partitioning
    samples and AQE coalesces, so two independent evaluations can disagree
    on partition ids; pinning the blocks makes both passes see the same
    layout (the same reason Spark's own RDD ``zipWithIndex`` caches).
    """
    if not order_cols:
        raise ValueError("zip_with_index needs order_cols (a total order)")
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    df = df.repartitionByRange(n, *order_cols).sortWithinPartitions(*order_cols).persist()
    # pass 1: per-partition (first key, count). Offsets are keyed by the
    # partition's FIRST SORT KEY, not by partition id — TaskContext
    # partition ids shift when the numbering stage gets pipelined into a
    # downstream union, while the first key of a range partition is stable.
    counts = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min(F.struct(*order_cols)).alias("first_key"),
        )
        .collect()
    )
    offsets: dict[tuple, int] = {}
    acc = start
    for r in sorted(counts, key=lambda r: tuple(r["first_key"])):
        offsets[tuple(r["first_key"])] = acc
        acc += r["cnt"]
    schema = StructType(df.schema.fields + [StructField(id_col, LongType(), False)])
    key_cols = list(order_cols)

    def number(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pos = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pos is None:
                first = tuple(
                    v.item() if hasattr(v, "item") else v
                    for v in (pdf[c].iloc[0] for c in key_cols)
                )
                pos = offsets[first]
            out = pdf.copy()
            out[id_col] = np.arange(pos, pos + len(pdf), dtype=np.int64)
            pos += len(pdf)
            yield out

    return df.mapInPandas(number, schema)


def dedup_locations(
    points: DataFrame, key_cols: list[str], start: int = 1, id_col: str = "node_id"
) -> DataFrame:
    """J7/J8: one node per distinct quantized key ('first writer wins' — with
    dedup, WHICH writer won only affects the id, and ids are reassigned
    densely by key order anyway). Returns (key_cols..., node_id)."""
    distinct = points.select(*key_cols).distinct()
    return zip_with_index(distinct, order_cols=key_cols, start=start, id_col=id_col)


def assert_unique_ids(df: DataFrame, id_col: str) -> None:
    """A5 (navteq.hpp:1177-1192): id uniqueness audit."""
    total = df.count()
    distinct = df.select(id_col).distinct().count()
    assert total == distinct, f"duplicate {id_col}: {total} rows, {distinct} distinct"


def duplicate_location_audit(nodes: DataFrame, key_cols=("lon_i", "lat_i")) -> DataFrame:
    """A6 (navteq.hpp:1194-1219): diagnostic — locations shared by >1 node."""
    return nodes.groupBy(*key_cols).count().where(F.col("count") > 1)
