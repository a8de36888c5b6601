"""cusum_changepoints / acf_lags / dominant_period (operators/timeseries.py).

NumPy-checked goldens: each Spark result is compared against an
independent brute-force recomputation of the exact-integer contracts.
"""

import pytest

from morituri_spark.operators.timeseries import (
    acf_lags,
    cusum_changepoints,
    dominant_period,
)


def _series(spark, rows):
    return spark.createDataFrame(rows, "key long, t long, v long")


def test_cusum_mean_shift_detected(spark):
    # key 0: flat 5 for t<8, then 11 — CUSUM peaks at the shift edge
    rows = [(0, t, 5 if t < 8 else 11) for t in range(16)]
    # key 1: constant — every prefix deviation is 0, argmax is rank 1
    rows += [(1, t, 7) for t in range(6)]
    out = {r["key"]: r for r in cusum_changepoints(_series(spark, rows)).collect()}
    n, s = 16, 5 * 8 + 11 * 8
    best = max(
        range(1, 17),
        key=lambda r: (abs(n * sum(5 if t < 8 else 11 for t in range(r)) - r * s), -r),
    )
    assert out[0]["cp_rank"] == best == 8
    assert out[0]["n"] == 16
    assert out[0]["cusum_abs_max"] == abs(n * 40 - 8 * s)
    assert out[1]["cp_rank"] == 1 and out[1]["cusum_abs_max"] == 0


def test_cusum_earliest_rank_tiebreak(spark):
    # symmetric series: |C| ties at mirrored ranks — earliest must win
    rows = [(0, t, v) for t, v in enumerate([1, 2, 2, 1])]
    out = cusum_changepoints(_series(spark, rows)).collect()[0]
    # prefix sums 1,3,5,6; n=4 S=6 → C = 4P-rS: -2, 0, 2, 0 → |C| max 2 at
    # ranks 1 and 3 → rank 1
    assert (out["cp_rank"], out["cusum_abs_max"]) == (1, 2)


def test_acf_exact_components(spark):
    vals = [3, 1, 4, 1, 5, 9, 2, 6]
    rows = [(0, t, v) for t, v in enumerate(vals)]
    out = {r["lag"]: r for r in acf_lags(_series(spark, rows), max_lag=2).collect()}
    n, s = len(vals), sum(vals)
    den = n * (n * sum(v * v for v in vals) - s * s)
    for lag in (1, 2):
        num = sum(
            (n * vals[t] - s) * (n * vals[t + lag] - s)
            for t in range(n - lag)
        )
        assert out[lag]["num"] == num
        assert out[lag]["den"] == den
        import math

        assert out[lag]["acf_micro"] == math.floor(num / den * 1e6 + 0.5 + 1e-8)


def test_acf_constant_series_dropped(spark):
    rows = [(0, t, 4) for t in range(5)]
    assert acf_lags(_series(spark, rows), max_lag=1).count() == 0


def test_dominant_period_finds_planted_cycle(spark):
    # period-4 signal over 24 ticks (4 | 24): [9,0,0,0] repeating
    rows = [(0, t, 9 if t % 4 == 0 else 0) for t in range(24)]
    out = dominant_period(_series(spark, rows), periods=(2, 3, 4, 6)).collect()[0]
    # brute-force the integer score p·Σ_phase S_phase²
    def score(p):
        sums = [sum(9 if t % 4 == 0 else 0 for t in range(24) if t % p == ph) for ph in range(p)]
        return p * sum(x * x for x in sums)

    best = max((2, 3, 4, 6), key=lambda p: (score(p), -p))
    assert out["best_p"] == best
    assert out["best_score"] == score(best)
    assert out["n"] == 24  # series length (each row counted once per p)


def test_dominant_period_tiebreak_smallest(spark):
    # constant series: every period scores p·Σ(S_phase²) with equal phase
    # sums S/p → score = p·p·(S/p)² = S² for all p — tie → smallest p
    rows = [(0, t, 2) for t in range(24)]
    out = dominant_period(_series(spark, rows), periods=(2, 3, 4)).collect()[0]
    assert out["best_p"] == 2


def test_dominant_period_strategies_identical(spark):
    # buffers (Σp ≤ 256 default) and explode must agree byte-for-byte,
    # including ragged lengths and keys missing some phases entirely
    rows = [(k, t, (3 * k + t * t) % 11) for k in range(7) for t in range(5 + 3 * k)]
    rows += [(99, 0, 4)]  # single-point series: every phase but 0 empty
    df = _series(spark, rows)
    a = sorted(
        dominant_period(df, periods=(2, 3, 4, 6), strategy="buffers").collect()
    )
    b = sorted(
        dominant_period(df, periods=(2, 3, 4, 6), strategy="explode").collect()
    )
    assert a == b and len(a) == 8


def test_dominant_period_auto_routes_on_sum_of_periods(spark):
    df = _series(spark, [(0, t, t % 3) for t in range(12)])
    # Σ(2,3,4)=9 ≤ 256 → buffers; a huge candidate forces the explode path
    small = dominant_period(df, periods=(2, 3, 4))
    assert "explode" not in small._jdf.queryExecution().logical().toString().lower()
    big = dominant_period(df, periods=(2, 300))
    assert "explode" in big._jdf.queryExecution().logical().toString().lower()
    with pytest.raises(ValueError):
        dominant_period(df, periods=(2, 3), strategy="bogus")


def test_guards(spark):
    df = _series(spark, [(0, 0, 1)])
    with pytest.raises(ValueError):
        acf_lags(df, max_lag=0)
    with pytest.raises(ValueError):
        dominant_period(df, periods=(1, 2))
