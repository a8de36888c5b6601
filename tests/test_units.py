"""F6-F9 unit conversions — exact-string goldens from
/root/reference/tests/unit_test_util.cpp:71-134."""

import pandas as pd
import pytest

from morituri_spark.functions import units as U


@pytest.mark.parametrize(
    "kg,want",
    [
        (1234, "1.234"), (1000, "1"), (1, "0.001"), (0, "0"),
        (999999999, "1e+06"), (1500, "1.5"), (72500, "72.5"),
    ],
)
def test_kg_to_t(kg, want):
    assert U.kg_to_t(kg) == want


@pytest.mark.parametrize(
    "cm,want",
    [
        (100, "1"), (123, "1.23"), (1, "0.01"), (123456789, "1.23457e+06"),
        (250, "2.5"), (0, "0"),
    ],
)
def test_cm_to_m(cm, want):
    assert U.cm_to_m(cm) == want


@pytest.mark.parametrize(
    "inch,want",
    [(12, "1'0\""), (13, "1'1\""), (11, "0'11\""), (144, "12'0\""), (0, "0'0\"")],
)
def test_inch_to_feet(inch, want):
    assert U.inch_to_feet(inch) == want


@pytest.mark.parametrize(
    "lbs,want",
    [(2204.6228, "1"), (1, "0.000453592"), (2000, "0.907185"), (4000, "1.81437")],
)
def test_lbs_to_metric_ton(lbs, want):
    assert U.lbs_to_metric_ton(lbs) == want


def test_udfs_match_python(spark):
    vals = [1, 100, 123, 1234, 72500, 123456789, 999999999]
    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    got = df.select(
        U.kg_to_t_udf("v").alias("kg"),
        U.cm_to_m_udf("v").alias("cm"),
        U.lbs_to_metric_ton_udf("v").alias("lbs"),
        U.inch_to_feet_col(df.v).alias("ft"),
    ).collect()
    for row, v in zip(got, vals):
        assert row["kg"] == U.kg_to_t(v)
        assert row["cm"] == U.cm_to_m(v)
        assert row["lbs"] == U.lbs_to_metric_ton(v)
        assert row["ft"] == U.inch_to_feet(v)
