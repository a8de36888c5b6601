"""Exact quantiles WITHOUT a global sort — iterative histogram refinement.

Spark's exact ``percentile`` collects every group's values into one
aggregation buffer, and a sort-based rank needs a full range-partitioned
shuffle — at 10¹² rows both are the single most expensive thing a job
can do. This operator computes EXACT type-1 quantiles (smallest value
whose cumulative count reaches the target rank) with:

* per round, ONE map-side-combinable aggregate (counts per (quantile,
  bucket), ≤ |qs|·B cells — kilobytes to the driver);
* rounds = ⌈log_B(domain width)⌉ — B = 4096 gives ≤ 4 rounds for full
  int64 micro-unit domains;
* no shuffle of data rows, ever: the table is scanned k times (rule 22 —
  repeated pushdown-friendly scans beat materializing), each scan
  filtered to the shrinking active ranges so late rounds touch a sliver.

The driver holds O(|qs|) interval scalars — the same legitimate
driver-side-aggregate budget class as the IVF centroids and the kNN
round state (no .collect() of data rows).

Cross-engine rank contract: the target rank is ``ceil(q · n)`` computed
in IEEE double from the SAME literal q both engines parse — 0.01·n may
land one ulp above an integer, and BOTH engines then ceil to the same
(mathematically off-by-one) rank, which is what makes the compare exact
(CLAUDE.md rule 5 family: share the arithmetic, not the intent).

Reference scope: no counterpart in morituri; extends the §2.6
sorts/limits family with the sort-free selection case.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def exact_quantiles(
    df: DataFrame,
    col: str,
    qs: list[float],
    bucket_bits: int = 12,
    max_rounds: int | None = None,
) -> list[tuple[float, int]]:
    """→ [(q, value)] for an INTEGER column: value is the smallest v with
    count(col ≤ v) ≥ ceil(q·n), computed in ≤ ⌈64/bucket_bits⌉ rounds of
    one small aggregate each. Raises if the column is empty or a q is
    outside (0, 1]."""
    if not qs:
        return []
    if any(not 0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"quantiles must be in (0, 1], got {qs}")
    B = 1 << bucket_bits

    base = df.select(F.col(col).cast("long").alias("v"))
    head = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    ).collect()[0]
    n, glo, ghi = head["n"], head["lo"], head["hi"]
    if n == 0:
        raise ValueError("exact_quantiles: empty input")
    if ghi - glo > (1 << 63) - 2:
        # the bucket expression computes v - lo in int64 (ANSI): a span
        # past 2^63-1 overflows it. No quantized physical metric needs
        # the FULL int64 range; callers that do can split by sign and
        # merge ranks.
        raise ValueError(
            f"exact_quantiles: value span [{glo}, {ghi}] exceeds 2^63-1; "
            "split the domain (e.g. by sign) and merge ranks"
        )

    # state per quantile: [lo, hi] bounds on the answer + ranks already
    # accounted below lo
    state = {
        i: {"q": float(q), "k": math.ceil(float(q) * n), "lo": glo,
            "hi": ghi, "below": 0}
        for i, q in enumerate(qs)
    }

    if max_rounds is None:
        # each round divides the widest active span by B; +2 covers the
        # ceil-width rounding slack at every level
        span0 = max(ghi - glo, 1)
        max_rounds = math.ceil(math.log(span0, B)) + 2

    for _ in range(max_rounds):
        active = {i: s for i, s in state.items() if s["lo"] < s["hi"]}
        if not active:
            break
        ranges = []
        widths = {}
        for i, s in active.items():
            span = s["hi"] - s["lo"] + 1
            w = (span + B - 1) // B
            widths[i] = w
            ranges.append(
                F.struct(
                    F.lit(i).alias("qi"),
                    F.lit(s["lo"]).alias("lo"),
                    F.lit(s["hi"]).alias("hi"),
                    F.lit(w).alias("w"),
                )
            )
        lo_all = min(s["lo"] for s in active.values())
        hi_all = max(s["hi"] for s in active.values())
        counts = (
            base.where((F.col("v") >= lo_all) & (F.col("v") <= hi_all))
            .select("v", F.explode(F.array(*ranges)).alias("r"))
            .where((F.col("v") >= F.col("r.lo")) & (F.col("v") <= F.col("r.hi")))
            .groupBy(
                F.col("r.qi").alias("qi"),
                # integer `div`, NOT `/`: long / long is DOUBLE division
                # in Spark, and truncating its quotient mis-buckets once
                # the span passes 2^53 — the driver's exact-int bucket
                # math would then disagree with the counts
                F.expr("(v - r.lo) div r.w").alias("b"),
            )
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        hist: dict[int, dict[int, int]] = {}
        for r in counts:
            hist.setdefault(r["qi"], {})[r["b"]] = r["c"]
        for i, s in active.items():
            w = widths[i]
            need = s["k"] - s["below"]
            cum = 0
            for b in sorted(hist.get(i, {})):
                c = hist[i][b]
                if cum + c >= need:
                    s["below"] += cum
                    s["lo"] = s["lo"] + b * w
                    s["hi"] = min(s["lo"] + w - 1, s["hi"])
                    break
                cum += c
            else:  # pragma: no cover - rank beyond counted mass
                raise AssertionError("rank not reached; inconsistent input")
    remaining = [i for i, s in state.items() if s["lo"] < s["hi"]]
    if remaining:  # pragma: no cover - max_rounds too small for the domain
        raise AssertionError(
            f"exact_quantiles: {len(remaining)} ranges unresolved after "
            f"max_rounds; raise max_rounds or bucket_bits"
        )
    return [(state[i]["q"], int(state[i]["lo"])) for i in range(len(qs))]


def exact_quantiles_df(
    df: DataFrame,
    col: str,
    qs: list[float],
    bucket_bits: int = 12,
) -> DataFrame:
    """DataFrame form of :func:`exact_quantiles`: (q double, value long).
    Plain Python floats/ints feed createDataFrame (the driver's
    non-Arrow row verifier rejects NumPy scalars)."""
    rows = [(float(q), int(v)) for q, v in exact_quantiles(df, col, qs, bucket_bits)]
    return df.sparkSession.createDataFrame(rows, "q double, value long")
