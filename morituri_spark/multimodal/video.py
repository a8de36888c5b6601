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

__all__ = ["scene_cuts", "block_flow", "block_flow_dense"]


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
    # ONE union-tag aggregate chain (r6, rule 21's decontam shape): the
    # former cur⋈prv self-join sorted both 16M-row sides and a separate
    # frames-distinct pass + left join reattached first frames. Tagging
    # the current and frame-shifted streams and aggregating once gets
    # |cnt(f) − cnt(f−1)| per bin, the per-frame distance, AND the frame
    # existence bit (tag-0 presence) out of the same exchange; frames
    # whose bins all lack a previous value keep dist_prev NULL exactly
    # like the old unmatched left join (the +1 shift's phantom past-the-
    # end frame rows carry no tag-0 bin and are dropped by the _has
    # filter).
    tagged = hists.select(
        F.col(video_col).alias("_v"),
        F.col(frame_col).alias("_f"),
        F.col(bin_col).alias("_b"),
        F.col(cnt_col).cast("long").alias("_c"),
        F.lit(None).cast("long").alias("_cp"),
    ).unionAll(
        hists.select(
            F.col(video_col).alias("_v"),
            (F.col(frame_col) + 1).alias("_f"),
            F.col(bin_col).alias("_b"),
            F.lit(None).cast("long").alias("_c"),
            F.col(cnt_col).cast("long").alias("_cp"),
        )
    )
    per_bin = tagged.groupBy("_v", "_f", "_b").agg(
        F.max("_c").alias("_c"), F.max("_cp").alias("_cp")
    )
    dist = (
        per_bin.groupBy("_v", "_f")
        .agg(
            F.sum(
                F.when(
                    F.col("_c").isNotNull() & F.col("_cp").isNotNull(),
                    F.abs(F.col("_c") - F.col("_cp")),
                )
            ).alias("dist_prev"),
            F.max(F.col("_c").isNotNull()).alias("_has"),
        )
        .where(F.col("_has"))
    )
    w = Window.partitionBy("_v").orderBy("_f").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        dist
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


def block_flow(
    cur: DataFrame,
    nxt: DataFrame,
    keys: list | None = None,
    block: int = 8,
    radius: int = 2,
    x_col: str = "ix",
    y_col: str = "iy",
    v_col: str = "v",
) -> DataFrame:
    """Block-matching motion estimation between two keyed rasters (the
    classic video-codec / optical-flow-baseline primitive): each
    ``block``×``block`` tile of ``cur`` searches displacements
    (dx, dy) ∈ [−radius, radius]² in ``nxt`` and reports the argmin of
    the EXACT integer SAD ``Σ |cur(p) − nxt(p+d)|``.
    → (keys…, bx, by, sad, dx, dy).

    Determinism without an argmax window (rule 25 taken one step
    further): every candidate folds into ONE composite ordinal
    ``ord = sad·D² + (dx+r)·D + (dy+r)`` (D = 2r+1) — unique per
    displacement, SAD-major — so the per-block winner is a plain
    map-side-combinable ``min(ord)`` and (sad, dx, dy) decode
    algebraically from the minimum. No struct comparators, no window,
    no tie ambiguity (ties break toward smaller (dx, dy)).

    Support policy: only FULL blocks with FULL overlap count — a
    candidate needs exactly block² matched pixels (border blocks and
    out-of-frame shifts drop; a block with no full-support candidate is
    absent from the output). This keeps SAD magnitudes comparable —
    partial-overlap SADs would win spuriously.

    Scale shape (r6 rewrite): ONE narrow exchange + an Arrow kernel
    instead of a D²× fan join. Both rasters key by the CUR block —
    (keys, ix div b, iy div b) — with the NXT side exploded only into
    the blocks whose ±radius search window can reach it (a halo of ≤4
    copies per pixel for radius < block, vs the D²× = 25× fan the join
    formulation shuffled); the per-block SAD surface for all D²
    displacements is then one masked NumPy subtraction per displacement,
    vectorized across every block of the Arrow batch (pairs never
    materialize as rows — the same move-blocks-not-pairs discipline as
    the ANN cogroup scorer). A block whose pixels span an Arrow batch
    boundary carries over (rule 26). Integer-exact end to end; the old
    join-path output is pinned bit-identical by the loop-reference and
    dense==join tests and the driver oracle."""
    import numpy as np
    import pandas as pd

    ks = list(keys) if keys else []
    r = int(radius)
    d = 2 * r + 1
    b = int(block)
    # offsets are taken relative to bx·b with Spark's truncating `div`,
    # so xo ∈ (−b, b) for cur (negative coordinates land in offset
    # −(b−1)..0) and (−b−r, b+r) for the halo — the kernel scatters into
    # (2b−1) and (2b−1+2r) wide grids, exact for ANY sign
    wc = 2 * b - 1
    wn = wc + 2 * r
    cur_rows = cur.selectExpr(
        *ks,
        f"CAST({x_col} AS BIGINT) AS _x",
        f"CAST({y_col} AS BIGINT) AS _y",
        f"CAST({v_col} AS BIGINT) AS v",
    ).selectExpr(
        *ks,
        f"_x div {b} AS bx",
        f"_y div {b} AS by",
        f"CAST(_x - _x div {b} * {b} AS INT) AS xo",
        f"CAST(_y - _y div {b} * {b} AS INT) AS yo",
        "CAST(0 AS TINYINT) AS _side",
        "v",
    )
    # halo: pixel jx reaches block bx iff some cur x in bx has
    # |jx − x| ≤ r, i.e. bx ∈ [(jx−r) div b, (jx+r) div b] (truncating
    # div is monotone, so the sequence covers exactly the reachable
    # blocks)
    nxt_rows = nxt.selectExpr(
        *ks,
        f"CAST({x_col} AS BIGINT) AS _x",
        f"CAST({y_col} AS BIGINT) AS _y",
        f"CAST({v_col} AS BIGINT) AS v",
    ).selectExpr(
        *ks, "_x", "_y", "v",
        f"explode(sequence((_x - {r}) div {b}, (_x + {r}) div {b})) AS bx",
    ).selectExpr(
        *ks, "_x", "_y", "v", "bx",
        f"explode(sequence((_y - {r}) div {b}, (_y + {r}) div {b})) AS by",
    ).selectExpr(
        *ks,
        "bx",
        "by",
        f"CAST(_x - bx * {b} AS INT) AS xo",
        f"CAST(_y - by * {b} AS INT) AS yo",
        "CAST(1 AS TINYINT) AS _side",
        "v",
    )
    both = cur_rows.unionByName(nxt_rows)
    gcols = [*ks, "bx", "by"]

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in cur.select(*ks).schema.fields
    )
    out_schema = (
        (out_fields + ", " if out_fields else "")
        + "bx bigint, by bigint, sad bigint, dx bigint, dy bigint"
    )
    bb = b * b

    def _emit(pdf: pd.DataFrame) -> pd.DataFrame:
        n_rows = len(pdf)
        gx = np.zeros(n_rows, dtype=bool)
        for c in gcols:
            col = pdf[c].to_numpy()
            gx[1:] |= col[1:] != col[:-1]
        gidx = np.cumsum(gx)
        G = int(gidx[-1]) + 1 if n_rows else 0
        starts = np.flatnonzero(np.concatenate(([True], gx[1:])))
        side = pdf["_side"].to_numpy(np.int8)
        xo = pdf["xo"].to_numpy(np.int64)
        yo = pdf["yo"].to_numpy(np.int64)
        v = pdf["v"].to_numpy(np.int64)
        c_arr = np.zeros((G, wc, wc), dtype=np.int64)
        c_msk = np.zeros((G, wc, wc), dtype=bool)
        n_arr = np.zeros((G, wn, wn), dtype=np.int64)
        n_msk = np.zeros((G, wn, wn), dtype=bool)
        cm = side == 0
        c_arr[gidx[cm], xo[cm] + b - 1, yo[cm] + b - 1] = v[cm]
        c_msk[gidx[cm], xo[cm] + b - 1, yo[cm] + b - 1] = True
        nm = ~cm
        n_arr[gidx[nm], xo[nm] + b - 1 + r, yo[nm] + b - 1 + r] = v[nm]
        n_msk[gidx[nm], xo[nm] + b - 1 + r, yo[nm] + b - 1 + r] = True
        best = np.full(G, np.iinfo(np.int64).max, dtype=np.int64)
        for dx in range(-r, r + 1):
            for dy in range(-r, r + 1):
                win = n_arr[:, dx + r : dx + r + wc, dy + r : dy + r + wc]
                wmk = n_msk[:, dx + r : dx + r + wc, dy + r : dy + r + wc]
                valid = c_msk & wmk
                n = valid.sum(axis=(1, 2))
                sad = np.abs(
                    np.where(valid, c_arr - win, 0)
                ).sum(axis=(1, 2))
                did = (dx + r) * d + (dy + r)
                cand_ord = sad * (d * d) + did
                full = n == bb
                best[full] = np.minimum(best[full], cand_ord[full])
        keep = best != np.iinfo(np.int64).max
        sel = starts[keep]
        out = {}
        for c in ks:
            out[c] = pdf[c].iloc[sel].reset_index(drop=True)
        out["bx"] = pdf["bx"].to_numpy(np.int64)[sel]
        out["by"] = pdf["by"].to_numpy(np.int64)[sel]
        m = best[keep]
        out["sad"] = m // (d * d)
        out["dx"] = (m % (d * d)) // d - r
        out["dy"] = m % d - r
        return pd.DataFrame(out)

    def _run(batches):
        pend = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pend is not None:
                pdf = pd.concat([pend, pdf], ignore_index=True)
            # hold back the trailing group (it may continue next batch)
            tail = np.ones(len(pdf), dtype=bool)
            for c in gcols:
                col = pdf[c].to_numpy()
                tail &= col == col[-1]
            cut = len(pdf) - int(tail.sum())
            head, pend = pdf.iloc[:cut], pdf.iloc[cut:]
            if cut:
                yield _emit(head.reset_index(drop=True))
        if pend is not None and len(pend):
            yield _emit(pend.reset_index(drop=True))

    return (
        both.repartition(*gcols)
        .sortWithinPartitions(*gcols)
        .mapInPandas(_run, out_schema)
    )


def block_flow_dense(
    cur: DataFrame,
    nxt: DataFrame,
    dims: tuple,
    keys: list | None = None,
    block: int = 8,
    radius: int = 2,
    x_col: str = "ix",
    y_col: str = "iy",
    v_col: str = "v",
) -> DataFrame:
    """:func:`block_flow` fast path for DENSE rasters of known
    ``dims = (W, H)`` — every pixel present, row-major order — which is
    what decoded frames always are. Instead of fanning CUR D²× into a
    200M-row shuffle join, align the two frames with ONE 1:1 equi-join,
    then read every displaced pixel with lead/lag at offset dy·W + dx
    over ONE per-frame (iy, ix) sort: all D² offset frames share the
    single sort, per-candidate |v−w| terms become conditional columns
    (masked where ix+dx / iy+dy leave the frame — row-major wrap-around
    is exactly what the mask forbids), and the per-block winner is
    least() over the D² composite ordinals after a 2·D²-column
    aggregate. Identical output to block_flow on dense input
    (pytest-pinned); measured 76.7s → see bench `block_flow_8m_px_dense`
    at the same shape. Density is a CONTRACT: a missing pixel row would
    shift every subsequent lead offset — use block_flow for sparse or
    unknown-shape input."""
    from pyspark.sql import Window

    ks = list(keys) if keys else []
    W, H = int(dims[0]), int(dims[1])
    r = int(radius)
    d = 2 * r + 1
    b = int(block)
    c = cur.selectExpr(
        *ks,
        f"CAST({x_col} AS BIGINT) AS ix",
        f"CAST({y_col} AS BIGINT) AS iy",
        f"CAST({v_col} AS BIGINT) AS v",
    )
    n = nxt.selectExpr(
        *ks,
        f"CAST({x_col} AS BIGINT) AS ix",
        f"CAST({y_col} AS BIGINT) AS iy",
        f"CAST({v_col} AS BIGINT) AS w",
    )
    both = c.join(n, [*ks, "ix", "iy"])
    wrm = Window.partitionBy(*ks).orderBy("iy", "ix")
    ad_cols = []
    for dx in range(-r, r + 1):
        for dy in range(-r, r + 1):
            k = (dx + r) * d + (dy + r)
            off = dy * W + dx
            shifted = (
                F.lead("w", off).over(wrm)
                if off >= 0
                else F.lag("w", -off).over(wrm)
            )
            valid = (
                (F.col("ix") + dx >= 0)
                & (F.col("ix") + dx < W)
                & (F.col("iy") + dy >= 0)
                & (F.col("iy") + dy < H)
            )
            ad_cols.append(
                F.when(valid, F.abs(F.col("v") - shifted)).alias(f"_ad_{k}")
            )
    staged = both.select(*ks, "ix", "iy", "v", *ad_cols)
    aggs = []
    for k in range(d * d):
        aggs.append(F.sum(f"_ad_{k}").alias(f"_s_{k}"))
        aggs.append(F.count(f"_ad_{k}").alias(f"_n_{k}"))
    per_block = (
        staged.selectExpr(
            *ks, f"ix div {b} AS bx", f"iy div {b} AS by",
            *[f"_ad_{k}" for k in range(d * d)],
        )
        .groupBy(*ks, "bx", "by")
        .agg(*aggs)
    )
    ords = [
        F.when(
            F.col(f"_n_{k}") == b * b,
            F.col(f"_s_{k}") * (d * d) + k,
        )
        for k in range(d * d)
    ]
    return (
        per_block.withColumn("_m", F.least(*ords))
        .where(F.col("_m").isNotNull())
        .selectExpr(
            *ks, "bx", "by",
            f"CAST(_m div {d * d} AS BIGINT) AS sad",
            f"CAST((_m % {d * d}) div {d} - {r} AS BIGINT) AS dx",
            f"CAST(_m % {d} - {r} AS BIGINT) AS dy",
        )
    )
