"""Video-sequence structure operators over per-frame features.

Frame DECODING stays honestly stubbed (no ffmpeg in the container —
multimodal/ops.py's sample_video_frames contract); everything
downstream of per-frame features is real and exact. Scene-cut
detection is the canonical example: histogram distance between
adjacent frames spikes at a cut, and scene ids are the running count
of cuts — the gaps-and-islands family on a per-video timeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["scene_cuts"]


def scene_cuts(
    hists: DataFrame,
    cut_thr: int,
    video_col: str = "video_id",
    frame_col: str = "frame",
    bin_col: str = "bin",
    cnt_col: str = "cnt",
) -> DataFrame:
    """Scene-cut segmentation from per-frame histograms: the L1
    distance ``Σ_bin |cnt(f) − cnt(f−1)|`` between ADJACENT frames
    marks a cut when strictly above ``cut_thr``, and each frame's
    scene_id is the number of cuts at-or-before it (scene 0 starts at
    frame 0). → (video_id, frame, dist_prev, is_cut, scene_id) with
    dist_prev NULL for each video's first frame. All integer.

    Input is the DENSE exploded histogram relation (video, frame, bin,
    cnt) — every frame carries the same bin set (the contract of the
    color-histogram extractors upstream).

    Scale shape: ONE self-equi-join on (video, frame−1, bin) — both
    sides hash-partition on the same key family — one aggregate to
    per-boundary distances, and one per-video cumulative window. 10⁹
    videos partition freely; a feature-length 10⁵-frame video is one
    ordered window, not a sequential driver loop."""
    thr = int(cut_thr)
    cur = hists.select(
        F.col(video_col).alias("_v"),
        F.col(frame_col).alias("_f"),
        F.col(bin_col).alias("_b"),
        F.col(cnt_col).alias("_c"),
    )
    prv = hists.select(
        F.col(video_col).alias("_v"),
        (F.col(frame_col) + 1).alias("_f"),
        F.col(bin_col).alias("_b"),
        F.col(cnt_col).alias("_cp"),
    )
    dist = (
        cur.join(prv, ["_v", "_f", "_b"])
        .groupBy("_v", "_f")
        .agg(F.sum(F.abs(F.col("_c") - F.col("_cp"))).alias("dist_prev"))
    )
    frames = hists.select(
        F.col(video_col).alias("_v"), F.col(frame_col).alias("_f")
    ).distinct()
    w = Window.partitionBy("_v").orderBy("_f").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        frames.join(dist, ["_v", "_f"], "left")
        .withColumn(
            "is_cut",
            (F.col("dist_prev") > F.lit(thr)).cast("boolean"),
        )
        .withColumn(
            "scene_id",
            F.sum(
                F.when(F.col("is_cut"), F.lit(1)).otherwise(F.lit(0))
            ).over(w),
        )
        .selectExpr(
            f"_v AS {video_col}",
            f"_f AS {frame_col}",
            "CAST(dist_prev AS BIGINT) AS dist_prev",
            "coalesce(is_cut, false) AS is_cut",
            "CAST(scene_id AS BIGINT) AS scene_id",
        )
    )
