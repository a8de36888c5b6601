"""S1-S5: table readers with fail-fast validation.

Mirrors the reference's input contract: required files are validated before
execution (navteq_plugin.cpp:43-57 — a directory is a valid input iff the
street file plus its four DBFs exist; admin files optional with a warning),
missing columns abort (util.hpp:119-125), and value-domain violations raise
format errors at load (util.hpp:135-144, tag_parser:174-211 speed ≥ 1000,
navteq.hpp:248-252 z-level range).
"""

from __future__ import annotations

import os
import warnings

from pyspark.sql import DataFrame, SparkSession, functions as F

# the reference's per-directory required set (navteq_plugin.cpp:43-57),
# transposed to the engine's table names
REQUIRED_TABLES = ["streets", "zlevels", "cdms", "cnd_mod", "mtd_area"]
OPTIONAL_TABLES = ["adminbndy", "rdms", "mtd_cntry_ref"]


def check_input(base_dir: str) -> bool:
    """S3: directory discovery/validation. True iff every required table
    exists; warns (not fails) on missing optional ones."""
    for t in REQUIRED_TABLES:
        if not os.path.exists(os.path.join(base_dir, f"{t}.parquet")):
            return False
    for t in OPTIONAL_TABLES:
        if not os.path.exists(os.path.join(base_dir, f"{t}.parquet")):
            warnings.warn(f"optional input {t}.parquet missing in {base_dir}")
    return True


def read_table(spark: SparkSession, path: str, required_cols: dict[str, str]) -> DataFrame:
    """S4: read + assert the fixed schema. ``required_cols`` maps column →
    expected simple type name; missing column or type mismatch raises
    immediately (the reference asserts on field access)."""
    df = spark.read.parquet(path)
    have = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for col, typ in required_cols.items():
        if col not in have:
            raise ValueError(f"{path}: required column {col!r} missing (have {sorted(have)})")
        if have[col] != typ:
            raise ValueError(f"{path}: column {col!r} is {have[col]}, expected {typ}")
    return df


def validate_streets(streets: DataFrame) -> DataFrame:
    """S5/P6 value-domain gates, evaluated lazily inside the plan:
      * FR/TO speed limits must be unsigned ints < 1000 (format_error
        otherwise — tag_parser:174-186)
      * DIR_TRAVEL ∈ {F,T,B} (tag_parser:91-100)
      * FERRY_TYPE ∈ {H,B,R} (tag_parser:310-315)
    The checks ride a required column so column pruning cannot drop them.
    """
    speed_ok = (
        F.col("FR_SPD_LIM").rlike("^[0-9]+$")
        & F.col("TO_SPD_LIM").rlike("^[0-9]+$")
        & (F.col("FR_SPD_LIM").cast("int") < 1000)
        & (F.col("TO_SPD_LIM").cast("int") < 1000)
    )
    dir_ok = F.col("DIR_TRAVEL").isin("F", "T", "B")
    ferry_ok = F.col("FERRY_TYPE").isin("H", "B", "R")
    guarded = (
        F.when(~speed_ok, F.raise_error(F.concat(
            F.lit("speed limit not valid (>= 1000 or not a number): FR='"),
            F.col("FR_SPD_LIM"), F.lit("' TO='"), F.col("TO_SPD_LIM"), F.lit("'"))))
        .when(~dir_ok, F.raise_error(F.concat(
            F.lit("value '"), F.col("DIR_TRAVEL"), F.lit("' for oneway not valid"))))
        .when(~ferry_ok, F.raise_error(F.concat(
            F.lit("value '"), F.col("FERRY_TYPE"), F.lit("' for FERRY_TYPE not valid"))))
        .otherwise(F.col("LINK_ID"))
    )
    return streets.withColumn("LINK_ID", guarded)
