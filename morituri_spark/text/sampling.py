"""Deterministic hash sampling — reproducible corpus subsets at any scale.

Training-data pipelines need samples that are (a) stable across reruns and
cluster sizes (no RNG-per-partition nondeterminism), (b) consistent — a
document's membership depends only on its key, so joins between sampled
tables stay aligned — and (c) auditable by an external engine. ``rand()``
gives none of these; keyed hashing gives all three:

    keep  ⇔  h(key) < rate · p      with  h(x) = (a·(x mod p) + b) mod p

using the engine's SQL-replayable affine family over the Mersenne prime
p = 2³¹−1 (text/dedup.py) — any ANSI engine can replay the exact subset.
Stratified rates (per language / source) are a broadcast map lookup on top.
Pure Catalyst; the filter pushes into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from .dedup import MERSENNE31, affine_hash_params

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _key_to_long(df: DataFrame, key_col: str) -> Column:
    """Integral keys pass through; string keys hash via xxhash64 (stable
    across reruns and cluster sizes, but engine-specific — the ANSI-oracle
    replay path needs an integral key). A silent ``cast('long')`` on a
    string doc id would NULL out under non-ANSI and drop every row, so any
    other type is a hard error."""
    dt = df.schema[key_col].dataType
    if isinstance(dt, _INTEGRAL):
        return F.col(key_col).cast("long")
    if isinstance(dt, T.StringType):
        return F.abs(F.xxhash64(F.col(key_col)))
    raise ValueError(
        f"hash sampling key {key_col!r} must be integral or string, got {dt.simpleString()}"
    )


def _hash_col(key_long: Column, seed: int) -> Column:
    a, b = affine_hash_params(1, seed=seed)[0]
    return (F.lit(a) * F.pmod(key_long, F.lit(MERSENNE31)) + F.lit(b)) % F.lit(
        MERSENNE31
    )


def sample_threshold(rate: float) -> int:
    """Integer threshold for a [0,1] rate (exactly replayable in SQL)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return int(rate * MERSENNE31)


def hash_sample(df: DataFrame, key_col: str, rate: float, seed: int = 42) -> DataFrame:
    """Keep rows whose keyed hash falls under ``rate`` — deterministic,
    rerun-stable, and join-consistent across tables sharing the key."""
    return df.where(_hash_col(_key_to_long(df, key_col), seed) < F.lit(sample_threshold(rate)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum rates (e.g. per language): a when-chain threshold —
    stays whole-stage-codegen, no join, no UDF."""
    thr = F.lit(sample_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(sample_threshold(rate))).otherwise(thr)
    return df.where(_hash_col(_key_to_long(df, key_col), seed) < thr)
