"""quadkey_col / quadkey_to_cell (geo/cells.py)."""
import random

import pytest
from pyspark.sql import functions as F

from morituri_spark.geo import cells as C


def test_quadkey_matches_cell_and_roundtrip(spark):
    rng = random.Random(3)
    rows = [(rng.uniform(-180, 180), rng.uniform(-90, 90)) for _ in range(300)]
    df = spark.createDataFrame(rows, "lon double, lat double")
    got = df.select(
        C.quadkey_col(F.col("lon"), F.col("lat"), 10).alias("qk"),
        C.cell_col(F.col("lon"), F.col("lat"), 10).alias("cell"),
    ).collect()
    for r in got:
        assert len(r["qk"]) == 10
        assert C.quadkey_to_cell([r["qk"]])[0] == r["cell"]


def test_quadkey_prefix_is_parent(spark):
    rows = [(12.34, 45.67), (-170.0, -80.0), (0.0, 0.0)]
    df = spark.createDataFrame(rows, "lon double, lat double")
    got = df.select(
        C.quadkey_col(F.col("lon"), F.col("lat"), 12).alias("qk12"),
        C.quadkey_col(F.col("lon"), F.col("lat"), 5).alias("qk5"),
    ).collect()
    for r in got:
        assert r["qk12"][:5] == r["qk5"]


def test_quadkey_digits_valid_and_res_guard(spark):
    df = spark.createDataFrame([(179.999, 89.999)], "lon double, lat double")
    qk = df.select(C.quadkey_col(F.col("lon"), F.col("lat"), 8).alias("q")).first()["q"]
    assert set(qk) <= set("0123")
    with pytest.raises(ValueError, match="resolution"):
        C.quadkey_col(F.col("lon"), F.col("lat"), 0)
    with pytest.raises(ValueError, match="invalid quadkey digit"):
        C.quadkey_to_cell(["01x"])
