"""Tile pyramid cascade: every level equals a direct aggregation from raw."""

import numpy as np
from pyspark.sql import functions as F

from morituri_spark.geo import cells
from morituri_spark.pipelines.pyramid import tile_pyramid


def test_cascade_matches_direct_per_level(spark):
    rng = np.random.default_rng(21)
    lon = rng.uniform(-179, 179, 5000)
    lat = rng.uniform(-89, 89, 5000)
    val = rng.uniform(0, 10, 5000)
    df = spark.createDataFrame(
        [(float(a), float(b), float(v)) for a, b, v in zip(lon, lat, val)],
        "lon double, lat double, v double",
    )
    pyr = tile_pyramid(df, res_max=9, res_min=5, value_col="v")
    got = {
        (r.res, r.tile): (r.n_points, round(r.sum_value, 6)) for r in pyr.collect()
    }
    for res in range(5, 10):
        direct = (
            df.select(cells.cell_col(F.col("lon"), F.col("lat"), res).alias("t"), "v")
            .groupBy("t")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
            .collect()
        )
        for r in direct:
            assert got[(res, r.t)] == (r.n, round(r.s, 6)), (res, r.t)
    # total count preserved at every level
    totals = {res: sum(v[0] for (rr, _), v in got.items() if rr == res) for res in range(5, 10)}
    assert all(t == 5000 for t in totals.values())


def test_single_level(spark):
    df = spark.createDataFrame([(0.0, 0.0), (1.0, 1.0)], "lon double, lat double")
    out = tile_pyramid(df, res_max=4, res_min=4).collect()
    assert all(r.res == 4 for r in out) and sum(r.n_points for r in out) == 2
