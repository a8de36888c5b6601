"""S1-S5 input validation: required files, schema assert, domain gates."""

import pytest
from pyspark.sql import functions as F

from morituri_spark.sources import synth, tables as T


def test_check_input(spark, tmp_path):
    base = str(tmp_path)
    assert not T.check_input(base)
    synth.streets_table(spark, 5).write.parquet(f"{base}/streets.parquet")
    synth.zlevels_table(spark, [(10_000, [0, 1])]).write.parquet(f"{base}/zlevels.parquet")
    cd = synth.cdms_table(spark, 5)
    cd.write.parquet(f"{base}/cdms.parquet")
    synth.cnd_mod_table(spark, cd).write.parquet(f"{base}/cnd_mod.parquet")
    assert not T.check_input(base)  # mtd_area still missing
    synth.mtd_area_table(spark).write.parquet(f"{base}/mtd_area.parquet")
    with pytest.warns(UserWarning, match="optional input"):
        assert T.check_input(base)


def test_read_table_schema_assert(spark, tmp_path):
    p = f"{tmp_path}/t.parquet"
    synth.mtd_area_table(spark).write.parquet(p)
    df = T.read_table(spark, p, {"AREA_ID": "bigint", "ADMIN_LVL": "int"})
    assert df.count() == 6
    with pytest.raises(ValueError, match="missing"):
        T.read_table(spark, p, {"NOPE": "bigint"})
    with pytest.raises(ValueError, match="expected string"):
        T.read_table(spark, p, {"AREA_ID": "string"})


def test_validate_streets_domains(spark):
    good = synth.streets_from_geometries(spark, {1: [[0.0, 0.0], [1.0, 0.0]]})
    assert T.validate_streets(good).count() == 1
    bad_speed = good.withColumn("FR_SPD_LIM", F.lit("1000"))
    with pytest.raises(Exception, match="speed limit not valid"):
        T.validate_streets(bad_speed).collect()
    bad_dir = good.withColumn("DIR_TRAVEL", F.lit("X"))
    with pytest.raises(Exception, match="for oneway not valid"):
        T.validate_streets(bad_dir).collect()
    bad_ferry = good.withColumn("FERRY_TYPE", F.lit("Z"))
    with pytest.raises(Exception, match="FERRY_TYPE not valid"):
        T.validate_streets(bad_ferry).collect()
