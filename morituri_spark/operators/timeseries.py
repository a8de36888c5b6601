"""Per-key time-series statistics: CUSUM changepoints, exact
autocorrelation, and folded dominant-period detection.

Three classic series diagnostics a training-data / telemetry pipeline
runs over billions of independent keys (sensor ids, user ids, tile
ids), each expressed so the per-key math is EXACT INTEGER arithmetic
(SQL-replayable, engine-stable):

- :func:`cusum_changepoints` — the scaled CUSUM statistic
  ``C_r = n·P_r − r·S`` (``P_r`` the prefix sum at rank ``r``, ``S``
  the series total), i.e. ``n·(P_r − r·mean)`` with the 1/n cleared:
  a pure-integer mean-shift detector. The changepoint is the rank
  maximizing ``|C_r|`` (earliest rank on ties).
- :func:`acf_lags` — autocorrelation numerators/denominator with the
  mean cleared the same way: ``N_ℓ = Σ (n·v_t − S)(n·v_{t+ℓ} − S)``
  over the lag-ℓ overlap and ``D = n²·Σv² − n·S²``; both exact
  integers, the single division micro-rounded under the shared rule-16
  contract.
- :func:`dominant_period` — fold ``t mod p`` for each candidate period
  ``p`` and score ``p·Σ_phase S_phase²``: when every candidate divides
  the series length, argmax over ``p`` of that integer score is the
  argmax of the variance of phase means (the common ``S²/n²`` shift
  and ``1/n²`` factor cancel), so period selection is an exact integer
  ``max_by``. With ragged lengths the score is still deterministic and
  engine-stable; the equal-phase-count contract is the caller's.

Scale shape: every function is ONE ordered window or small-fanout
projection per key followed by map-side-combinable aggregates — the
only shuffles are the per-key hash exchanges, there is no self-join,
and key count is the parallelism axis (billions of keys → perfectly
partitioned). The per-key sort inside the window is the unavoidable
cost of ordered statistics and is local to each key's partition.

Reference scope: no counterpart in morituri; analytics extension
family (SURVEY.md §2), sibling of operators/rolling.py (windowed
rates) and geo/clustering.py's Mann-Kendall trend machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def cusum_changepoints(
    df: DataFrame,
    key_col: str = "key",
    t_col: str = "t",
    val_col: str = "v",
) -> DataFrame:
    """→ (key, n, cp_rank, cp_t, cusum_abs_max): per key, the rank
    (1-based, ordered by ``t_col``) maximizing the scaled CUSUM
    ``|n·P_r − r·S|``, earliest rank on ties, plus that maximum.

    The statistic is ``n·(prefix_mean_deviation)`` with denominators
    cleared, so every intermediate is an exact integer (inputs being
    integers) and the argmax is engine-stable.
    """
    w = Window.partitionBy(key_col).orderBy(t_col)
    staged = df.select(
        F.col(key_col).alias("key"),
        F.col(t_col).alias("t"),
        F.col(val_col).cast("long").alias("v"),
    ).select(
        "key",
        "t",
        F.sum("v").over(w).alias("_p"),
        F.row_number().over(w).alias("_r"),
        F.count(F.lit(1)).over(Window.partitionBy("key")).alias("_n"),
        F.sum("v").over(Window.partitionBy("key")).alias("_s"),
    )
    cusum = staged.select(
        "key",
        "t",
        "_r",
        "_n",
        (F.col("_n") * F.col("_p") - F.col("_r") * F.col("_s")).alias("_c"),
    )
    # argmax |C| with earliest-rank tie-break: ONE map-side-combinable
    # max_by over a totally ordered struct (rule 25)
    return cusum.groupBy("key").agg(
        F.max("_n").alias("n"),
        F.max_by(
            F.struct(
                F.col("_r").alias("cp_rank"),
                F.col("t").alias("cp_t"),
                F.abs("_c").alias("cusum_abs_max"),
            ),
            F.struct(F.abs("_c").alias("a"), (-F.col("_r")).alias("r")),
        ).alias("_best"),
    ).select(
        "key",
        "n",
        F.col("_best.cp_rank").alias("cp_rank"),
        F.col("_best.cp_t").alias("cp_t"),
        F.col("_best.cusum_abs_max").alias("cusum_abs_max"),
    )


def acf_lags(
    df: DataFrame,
    max_lag: int = 3,
    key_col: str = "key",
    t_col: str = "t",
    val_col: str = "v",
) -> DataFrame:
    """→ (key, lag, n, num, den, acf_micro) for lag ∈ 1..max_lag:
    exact-integer autocorrelation components with the mean cleared
    (``num = Σ (n·v_t − S)(n·v_{t+ℓ} − S)`` over the overlap,
    ``den = n²·Σv² − n·S²``), and the ratio micro-rounded under the
    shared rule-16 contract. Keys with a constant series (den = 0)
    are dropped — their ACF is undefined.
    """
    ml = int(max_lag)
    if ml < 1:
        raise ValueError(f"max_lag must be >= 1, got {ml}")
    w = Window.partitionBy(key_col).orderBy(t_col)
    wk = Window.partitionBy(key_col)
    staged = df.select(
        F.col(key_col).alias("key"),
        F.col(t_col).alias("t"),
        F.col(val_col).cast("long").alias("v"),
    ).select(
        "key",
        "v",
        *[F.lead("v", lag).over(w).alias(f"_w{lag}") for lag in range(1, ml + 1)],
        F.count(F.lit(1)).over(wk).alias("_n"),
        F.sum("v").over(wk).alias("_s"),
        F.sum(F.col("v") * F.col("v")).over(wk).alias("_q"),
    )
    # centered factors per row: (n·v − S) and (n·lead − S); the per-lag
    # numerators are then plain map-side-combinable sums
    per_lag = staged.select(
        "key",
        "_n",
        "_s",
        "_q",
        F.expr(
            "stack("
            + str(ml)
            + ", "
            + ", ".join(
                f"{lag}, (_n * v - _s) * (_n * _w{lag} - _s)"
                for lag in range(1, ml + 1)
            )
            + ") AS (lag, term)"
        ),
    )
    agg = per_lag.groupBy("key", "lag").agg(
        F.max("_n").alias("n"),
        (F.max("_n") * F.max("_q") - F.max("_s") * F.max("_s")).alias("_d0"),
        F.sum("term").alias("num"),
    )
    out = agg.select(
        "key",
        "lag",
        "n",
        "num",
        (F.col("n") * F.col("_d0")).alias("den"),
    ).where(F.col("den") != 0)
    ratio = F.col("num").cast("double") / F.col("den").cast("double")
    staged2 = out.select("key", "lag", "n", "num", "den", ratio.alias("_r"))
    return staged2.select(
        "key",
        "lag",
        "n",
        "num",
        "den",
        F.floor(F.col("_r") * F.lit(1e6) + F.lit(0.5) + F.lit(1e-8))
        .cast("long")
        .alias("acf_micro"),
    )


def dominant_period(
    df: DataFrame,
    periods: tuple = (2, 3, 4, 6, 8),
    key_col: str = "key",
    t_col: str = "t",
    val_col: str = "v",
    strategy: str = "auto",
) -> DataFrame:
    """→ (key, best_p, best_score, n): per key, the candidate period
    maximizing the integer fold score ``p·Σ_phase S_phase²``
    (smallest ``p`` on ties).

    When every candidate period divides the series length the score
    order equals the variance-of-phase-means order (see module
    docstring); that divisibility is the caller's contract — the
    score itself is deterministic either way.

    Strategy regime (stated with numbers, both paths byte-identical):

    - ``buffers`` (default when ``Σ periods ≤ 256``): ONE
      ``groupBy(key)`` carrying a conditional-sum buffer per (p, phase)
      — fully map-side combinable, so the only exchange ships one row
      per key regardless of series length. The ``×len(periods)``
      explode alternative shuffles every exploded row when keys are
      scattered across input partitions (round-robin scans have ~no
      per-partition (key, p, phase) collapse): same-session warm A/B
      3.0 s vs 5.0 s at 20M rows × 5 candidate periods on local[32]
      (explode read 12–17 s in a noisier window).
    - ``explode``: the fanned groupBy pair — the right shape when
      ``Σ periods`` is large (hundreds of aggregate buffers per row
      stop paying; rule-2 JIT budgets bound the when-tree) or when the
      input is already hash-partitioned by key.
    """
    ps = sorted({int(p) for p in periods})
    if not ps or ps[0] < 2:
        raise ValueError(f"periods must all be >= 2, got {periods}")
    if strategy == "auto":
        strategy = "buffers" if sum(ps) <= 256 else "explode"
    if strategy == "buffers":
        base = df.select(
            F.col(key_col).alias("key"),
            F.col(t_col).cast("long").alias("t"),
            F.col(val_col).cast("long").alias("v"),
        )
        phase_aggs = [
            F.sum(F.when(F.col("t") % p == ph, F.col("v"))).alias(f"_s_{p}_{ph}")
            for p in ps
            for ph in range(p)
        ]
        row = base.groupBy("key").agg(
            F.count(F.lit(1)).alias("n"), *phase_aggs
        )
        # stage one score column per candidate (rule 9: each buffer is
        # referenced exactly once; the argmax below references only the
        # staged scores)
        scored = row.select(
            "key",
            "n",
            *[
                sum(
                    (
                        F.coalesce(F.col(f"_s_{p}_{ph}"), F.lit(0))
                        * F.coalesce(F.col(f"_s_{p}_{ph}"), F.lit(0))
                        for ph in range(p)
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias(f"_ss_{p}")
                for p in ps
            ],
        )
        # argmax over ≤ a handful of candidates: a tiny in-row array_max
        # over staged columns (small array off the hot path, rule 8)
        best = F.array_max(
            F.array(
                *[
                    F.struct(
                        (F.lit(p) * F.col(f"_ss_{p}")).alias("s"),
                        F.lit(-p).alias("np"),
                        F.lit(p).alias("best_p"),
                        (F.lit(p) * F.col(f"_ss_{p}")).alias("best_score"),
                    )
                    for p in ps
                ]
            )
        )
        return scored.select(
            "key",
            best["best_p"].alias("best_p"),
            best["best_score"].alias("best_score"),
            "n",
        )
    if strategy != "explode":
        raise ValueError(f"unknown strategy {strategy!r}")
    fanned = df.select(
        F.col(key_col).alias("key"),
        F.col(t_col).cast("long").alias("t"),
        F.col(val_col).cast("long").alias("v"),
    ).select(
        "key",
        "v",
        F.explode(F.array(*[F.lit(p) for p in ps])).alias("p"),
        "t",
    ).select("key", "p", (F.col("t") % F.col("p")).alias("phase"), "v")
    phase_sums = fanned.groupBy("key", "p", "phase").agg(
        F.sum("v").alias("_sp"), F.count(F.lit(1)).alias("_np")
    )
    scores = phase_sums.groupBy("key", "p").agg(
        F.sum(F.col("_sp") * F.col("_sp")).alias("_ss"),
        F.sum("_np").alias("_n"),
    ).select("key", "p", (F.col("p") * F.col("_ss")).alias("_score"), "_n")
    return scores.groupBy("key").agg(
        F.max_by(
            F.struct(F.col("p").alias("best_p"), F.col("_score").alias("best_score")),
            F.struct(F.col("_score").alias("s"), (-F.col("p")).alias("p")),
        ).alias("_best"),
        F.max("_n").alias("n"),
    ).select(
        "key",
        F.col("_best.best_p").alias("best_p"),
        F.col("_best.best_score").alias("best_score"),
        "n",
    )
