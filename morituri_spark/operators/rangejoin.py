"""Interval / range join — binned equi-join + refine (no nested loop).

Joining facts to value intervals (`lo <= v < hi`) is a non-equi join;
Catalyst's only native plan for it is a broadcast nested loop — O(n·m)
compares. The scalable shape is the same trick the spatial core uses for
point-in-polygon (geo/pip.py covers join): quantize the value axis into
fixed-width bins, explode each interval into the bins it covers, equi-join
facts on their bin, then refine with the exact predicate. One shuffle on
the bin key; interval replication is bounded by interval_width/bin_width.

Bin width trades replication (wide intervals × narrow bins) against
candidate false-positives (wide bins); a reasonable default is the median
interval width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_join(
    facts: DataFrame,
    intervals: DataFrame,
    val_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_width: float | None = None,
    how: str = "inner",
) -> DataFrame:
    """facts ⋈ intervals on ``lo <= val < hi`` (half-open, like the PIP
    edge rule). ``intervals`` columns ride along in the output."""
    if bin_width is None:
        med = intervals.select(
            F.expr(f"percentile({hi_col} - {lo_col}, 0.5D)").alias("m")
        ).head()["m"]
        bin_width = float(med) if med else 1.0
    w = float(bin_width)
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        # right/full outer would need the refine applied from the interval
        # side too (and dedup across exploded bins); unsupported rather
        # than silently wrong.
        raise ValueError(f"range_join supports inner/left/semi/anti, not {how!r}")
    binned = intervals.where(F.col(lo_col) < F.col(hi_col)).withColumn(
        "_ibin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                # hi is exclusive: the last covered bin is ceil(hi/w) - 1
                # (exact on bin-aligned boundaries, no epsilon games)
                (F.ceil(F.col(hi_col) / w) - 1).cast("long"),
            )
        ),
    )
    tagged = facts.withColumn("_fbin", F.floor(F.col(val_col) / w).cast("long"))
    # The exact refine lives INSIDE the join condition: a post-join .where()
    # would drop left-outer's null-extended rows (degrading to inner) and
    # cannot even resolve interval columns after a semi/anti join. A fact
    # has exactly one bin, so no dedup is needed across the explode.
    cond = (
        (F.col("_fbin") == F.col("_ibin"))
        & (F.col(val_col) >= F.col(lo_col))
        & (F.col(val_col) < F.col(hi_col))
    )
    joined = tagged.join(binned, cond, how)
    if how in ("left_semi", "leftsemi", "left_anti", "leftanti"):
        return joined.drop("_fbin")
    return joined.drop("_fbin", "_ibin")


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    keys: list,
    a_lo: str = "a_lo",
    a_hi: str = "a_hi",
    b_lo: str = "b_lo",
    b_hi: str = "b_hi",
    bin_width: float | None = None,
) -> DataFrame:
    """Interval × interval overlap join: pairs where ``a_lo < b_hi AND
    b_lo < a_hi`` (half-open, proper overlap — touching endpoints do
    NOT join), equi-keyed on ``keys``. Each side explodes into the
    fixed-width bins it covers; candidates equi-join on (keys, bin) and
    the pair is emitted ONLY in the first bin both sides share
    (``bin == greatest(floor(a_lo/w), floor(b_lo/w))``) — the classic
    dedup that keeps the output exactly-once without a distinct. The
    exact overlap predicate rides INSIDE the join condition.

    One shuffle on (keys, bin); replication per row is
    interval_width / bin_width, so pick ``bin_width`` near the median
    interval width (the default measures side ``a``). The rule-24
    shape: both sides explode here because both are interval sets —
    there is no un-fanned side to prefer.
    """
    if bin_width is None:
        med = a.select(
            F.expr(f"percentile({a_hi} - {a_lo}, 0.5D)").alias("m")
        ).head()["m"]
        bin_width = float(med) if med else 1.0
    w = float(bin_width)
    ax = a.where(F.col(a_lo) < F.col(a_hi)).withColumn(
        "_abin",
        F.explode(
            F.sequence(
                F.floor(F.col(a_lo) / w).cast("long"),
                (F.ceil(F.col(a_hi) / w) - 1).cast("long"),
            )
        ),
    )
    bx = b.where(F.col(b_lo) < F.col(b_hi)).withColumn(
        "_bbin",
        F.explode(
            F.sequence(
                F.floor(F.col(b_lo) / w).cast("long"),
                (F.ceil(F.col(b_hi) / w) - 1).cast("long"),
            )
        ),
    )
    cond = (F.col("_abin") == F.col("_bbin"))
    for k in keys:
        cond = cond & (ax[k] == bx[k])
    cond = (
        cond
        & (F.col(a_lo) < F.col(b_hi))
        & (F.col(b_lo) < F.col(a_hi))
        & (
            F.col("_abin")
            == F.greatest(
                F.floor(F.col(a_lo) / w).cast("long"),
                F.floor(F.col(b_lo) / w).cast("long"),
            )
        )
    )
    out = ax.join(bx, cond, "inner")
    for k in keys:
        out = out.drop(bx[k])
    return out.drop("_abin", "_bbin")
