"""Per-entry isolation harness for optimization work (guide §1.4).

NOT part of the frozen driver contract (bench.py is the measured
surface): this file reproduces individual bench.py fixtures so a single
entry can be timed — with per-entry steal%, /proc/loadavg and the calib
sentinel — without paying the full 137-entry run. Usage:

    python bench_extra.py dtw_4k_tracks_24pts table_diff_20m_sketch ...

Each entry prints one line: name, seconds, steal%, loadavg-at-start.
Fixtures and timed lambdas are verbatim copies of bench.py's (same
data, same aggregates) so numbers are comparable entry-for-entry.
"""

from __future__ import annotations

import os
import sys
import time

import bench as B  # cpu_ticks / calib_ms helpers (no side effects)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from morituri_spark.session import get_spark

    spark = get_spark(
        "bench-extra", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(f"calib_ms_start={B.calib_ms():.2f}", flush=True)

    def timed(name, fn, reps=1):
        for i in range(reps):
            load = open("/proc/loadavg").read().split()[0]
            c0, s0 = B.cpu_ticks()
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(name)
            fn()
            dt = time.perf_counter() - t0
            c1, s1 = B.cpu_ticks()
            st = 100.0 * (s1 - s0) / max(c1 - c0, 1)
            print(
                f"ENTRY {name} rep={i} sec={dt:.3f} steal={st:.2f}"
                f" load0={load}",
                flush=True,
            )
        spark.sparkContext.setJobDescription(None)

    want = set(names)

    def on(name):
        return name in want

    # ---- dtw / hausdorff tracks fixture (bench.py verbatim) ----------
    if on("dtw_4k_tracks_24pts"):
        from morituri_spark.geo.similarity import dtw_join

        dtw_tracks = (
            spark.range(96_000)
            .select(
                (F.col("id") % 4000).alias("track_id"),
                F.col("id").alias("seq"),
                (
                    ((F.col("id") % 4000) % 500 % 25).cast("double") * 14.0 - 170.0
                    + ((F.col("id") % 4000) * 131 % 97).cast("double") / 1000.0
                    + (F.col("id") * 61 % 181).cast("double") / 2000.0
                ).alias("lon"),
                (
                    ((F.col("id") % 4000) % 500 / 25).cast("int").cast("double") * 6.0 - 57.0
                    + ((F.col("id") % 4000) * 173 % 89).cast("double") / 1000.0
                    + (F.col("id") * 37 % 151).cast("double") / 2000.0
                ).alias("lat"),
            )
            .repartition(cpus * 2)
            .persist()
        )
        dtw_tracks.count()
        timed(
            "dtw_4k_tracks_24pts",
            lambda: dtw_join(dtw_tracks, 60.0)
            .agg(F.count(F.lit(1)), F.sum("dtw_km")).collect(),
            reps=2,
        )
        dtw_tracks.unpersist()

    # ---- hmm map match fixture ---------------------------------------
    if on("hmm_map_match_10k_tracks"):
        from morituri_spark.geo.matching import hmm_map_match

        hmm_pts = (
            spark.range(120_000)
            .select(
                (F.col("id") % 10000).alias("track_id"),
                F.floor(F.col("id") / 10000).cast("long").alias("seq"),
                F.col("id").alias("point_id"),
                (
                    ((F.col("id") % 10000) % 200).cast("double") * 1.5 - 150.0
                    + F.floor(F.col("id") / 10000).cast("double") * 0.02
                    + ((F.col("id") * 7) % 10).cast("double") / 1000.0
                ).alias("lon"),
                (
                    F.floor((F.col("id") % 10000) / 200).cast("double") * 1.1 - 55.0
                    + F.floor(F.col("id") / 10000).cast("double") * 0.015
                    + ((F.col("id") * 13) % 7).cast("double") / 1000.0
                ).alias("lat"),
            )
            .repartition(cpus * 2)
            .persist()
        )
        hmm_pts.count()
        hmm_segs = (
            spark.range(30_000)
            .select(
                F.col("id").alias("seg_id"),
                (
                    (F.col("id") % 200).cast("double") * 1.5 - 150.0
                    + ((F.col("id") * 31) % 3).cast("double") * 0.04 - 0.04
                ).alias("ax"),
                (F.floor(F.col("id") / 200).cast("double") % 100 * 1.1 - 55.0).alias("ay"),
            )
            .select(
                "seg_id", "ax", "ay",
                (F.col("ax") + 0.05).alias("bx"), (F.col("ay") + 0.4).alias("by"),
            )
            .persist()
        )
        hmm_segs.count()
        timed(
            "hmm_map_match_10k_tracks",
            lambda: hmm_map_match(
                hmm_pts, hmm_segs, radius=0.5, cell_deg=1.0,
                switch_cost_nano=50_000_000,
            ).agg(F.count(F.lit(1)), F.sum("dist"), F.sum("cost")).collect(),
            reps=2,
        )
        hmm_pts.unpersist()
        hmm_segs.unpersist()

    # ---- table diff fixture ------------------------------------------
    if on("table_diff_20m_sketch") or on("table_diff_20m_fulljoin_control"):
        from morituri_spark.io.reconcile import diff_tables

        qn_df = (
            spark.range(20_000_000)
            .select(((F.col("id") * 2654435761) % 1099511627776).alias("v"))
            .repartition(cpus * 2)
            .persist()
        )
        qn_df.count()
        ta = qn_df.select(
            F.col("v").alias("k"),
            (F.col("v") % 1000).alias("x"),
        ).persist()
        ta.count()
        tb = ta.where("k % 1753 <> 5").select(
            "k",
            F.when(F.col("k") % 877 == 3, F.col("x") + 1).otherwise(F.col("x")).alias("x"),
        ).persist()
        tb.count()
        if on("table_diff_20m_sketch"):
            timed(
                "table_diff_20m_sketch",
                lambda: diff_tables(ta, tb, ["k"], n_buckets=1_000_000).count(),
                reps=2,
            )
        if on("table_diff_20m_fulljoin_control"):
            timed(
                "table_diff_20m_fulljoin_control",
                lambda: ta.alias("a").join(tb.alias("b"), "k", "full")
                .where(
                    F.col("a.x").isNull() | F.col("b.x").isNull()
                    | (F.col("a.x") != F.col("b.x"))
                )
                .count(),
                reps=2,
            )
        ta.unpersist(); tb.unpersist(); qn_df.unpersist()

    # ---- mask RLE fixture --------------------------------------------
    if on("mask_rle_100k_masks"):
        from morituri_spark.multimodal.masks import mask_rle_runs

        def _mask_rows(batches):
            import numpy as np
            import pandas as pd

            ys, xs = np.mgrid[0:64, 0:64]
            for pdf in batches:
                rows = {"image_id": [], "mask": [], "w": [], "h": []}
                for i in pdf["id"]:
                    i = int(i)
                    m = ((i + 2 * ys + 3 * xs) % 7) < 3
                    rows["image_id"].append(f"img{i:012d}")
                    rows["mask"].append(
                        bytes(np.packbits(m.astype(np.uint8).ravel()))
                    )
                    rows["w"].append(64)
                    rows["h"].append(64)
                yield pd.DataFrame(rows)

        rle_masks = (
            spark.range(0, 100_000, numPartitions=cpus * 2)
            .mapInPandas(_mask_rows, "image_id string, mask binary, w int, h int")
            .persist()
        )
        rle_masks.count()
        timed(
            "mask_rle_100k_masks",
            lambda: mask_rle_runs(rle_masks)
            .agg(F.sum("start"), F.sum("length"), F.count(F.lit(1)))
            .collect(),
            reps=2,
        )
        rle_masks.unpersist()

    # ---- block flow fixture ------------------------------------------
    if on("block_flow_8m_px_25disp") or on("block_flow_8m_px_dense"):
        from morituri_spark.multimodal.video import block_flow, block_flow_dense

        bf_px = (
            spark.range(8_192_000)
            .selectExpr(
                "id % 500 AS g",
                "(id div 500) % 128 AS ix",
                "id div 64000 AS iy",
            )
            .repartition(cpus * 2)
            .persist()
        )
        bf_px.count()
        bf_cur = bf_px.selectExpr(
            "g", "ix", "iy",
            "(11 * g + 7 * ix + 13 * iy + (ix * iy) % 5) % 251 AS v",
        )
        bf_nxt = bf_px.selectExpr(
            "g", "ix", "iy",
            "(11 * g + 7 * (ix - (g % 5 - 2)) + 13 * (iy - (g % 3 - 1))"
            " + ((ix - (g % 5 - 2)) * (iy - (g % 3 - 1))) % 5) % 251"
            " + (ix + iy + g) % 3 AS v",
        )
        if on("block_flow_8m_px_25disp"):
            timed(
                "block_flow_8m_px_25disp",
                lambda: block_flow(bf_cur, bf_nxt, keys=["g"], block=8, radius=2)
                .agg(
                    F.bit_xor(F.xxhash64("g", "bx", "by", "sad", "dx", "dy")),
                    F.count(F.lit(1)),
                )
                .collect(),
                reps=2,
            )
        if on("block_flow_8m_px_dense"):
            timed(
                "block_flow_8m_px_dense",
                lambda: block_flow_dense(
                    bf_cur, bf_nxt, dims=(128, 128), keys=["g"], block=8, radius=2
                )
                .agg(
                    F.bit_xor(F.xxhash64("g", "bx", "by", "sad", "dx", "dy")),
                    F.count(F.lit(1)),
                )
                .collect(),
                reps=2,
            )
        bf_px.unpersist()

    # ---- connected components fixture --------------------------------
    if on("connected_components_1m_edges"):
        from morituri_spark.text.components import connected_components

        cc_x1 = spark.range(1_000_000).selectExpr(
            "id AS a", "id + 1 AS b"
        ).where("id % 50 != 49")
        cc_x2 = spark.range(1_000_000).selectExpr(
            "CAST(hash(id) % 1250000 AS LONG) AS a",
            "CAST(hash(id + 7) % 1250000 AS LONG) AS b",
        ).where("a >= 0 AND b >= 0")
        cc_edges_xl = cc_x1.union(cc_x2).persist()
        cc_edges_xl.count()
        timed(
            "connected_components_1m_edges",
            lambda: connected_components(cc_edges_xl).count(),
            reps=2,
        )
        cc_edges_xl.unpersist()

    # ---- cardinal viewshed / box filter fixture ----------------------
    if on("cardinal_viewshed_16m_cells") or on("box_filter_16m_cells"):
        from morituri_spark.geo.terrain import box_filter, cardinal_viewshed

        vs_dem = (
            spark.range(16_777_216)
            .selectExpr(
                "id % 4096 AS g",
                "CAST(floor(id / 4096.0) AS BIGINT) % 64 AS ix",
                "CAST(floor(id / 262144.0) AS BIGINT) AS iy",
            )
            .selectExpr(
                "g", "ix", "iy",
                "(7 * g + 3 * iy + 5 * ix + (ix * iy) % 11) % 97 AS z",
            )
            .repartition(cpus * 2)
            .persist()
        )
        vs_dem.count()
        if on("cardinal_viewshed_16m_cells"):
            timed(
                "cardinal_viewshed_16m_cells",
                lambda: cardinal_viewshed(vs_dem, eye_height=2, keys=["g"])
                .agg(F.sum("dir_mask"), F.sum("n_dirs"), F.count(F.lit(1)))
                .collect(),
                reps=2,
            )
        if on("box_filter_16m_cells"):
            timed(
                "box_filter_16m_cells",
                lambda: box_filter(vs_dem, radius=2, keys=["g"])
                .agg(F.sum("box_sum"), F.sum("box_n"))
                .collect(),
                reps=2,
            )
        vs_dem.unpersist()

    # ---- pagerank fixture --------------------------------------------
    if on("pagerank_500k_nodes_6_rounds"):
        from morituri_spark.graph.pagerank import pagerank_exact

        pr_ids = spark.range(500_000).select(F.col("id").alias("i"))
        pr_edges = (
            pr_ids.select(F.col("i").alias("src"), ((F.col("i") * 7 + 1) % 500_000).alias("dst"))
            .unionAll(pr_ids.select(F.col("i").alias("src"), ((F.col("i") * F.col("i") + 3) % 500_000).alias("dst")))
            .unionAll(pr_ids.select(F.col("i").alias("src"), ((F.col("i") + 1) % 500_000).alias("dst")))
            .distinct()
            .repartition(cpus * 2)
            .persist()
        )
        pr_edges.count()
        timed(
            "pagerank_500k_nodes_6_rounds",
            lambda: pagerank_exact(pr_edges, iters=6)
            .agg(F.count(F.lit(1)), F.sum("rank")).collect(),
            reps=2,
        )
        pr_edges.unpersist()

    # ---- dag fixture -------------------------------------------------
    if on("dag_longest_500k_edges"):
        from morituri_spark.graph.dag import longest_paths

        dag_edges = (
            spark.range(500_000)
            .selectExpr(
                "id % 50000 AS src",
                "id % 50000 + 2500 + id % 500 AS dst",
                "id % 5 + 1 AS w",
            )
            .where("dst < 50000")
            .repartition(cpus)
            .persist()
        )
        dag_edges.count()
        timed(
            "dag_longest_500k_edges",
            lambda: longest_paths(dag_edges, max_rounds=40, known_depth=21)
            .agg(F.sum("dist"), F.max("dist"), F.count(F.lit(1)))
            .collect(),
            reps=2,
        )
        dag_edges.unpersist()

    # ---- iou tracklets fixture ---------------------------------------
    if on("iou_tracklets_1m5_dets"):
        from morituri_spark.multimodal.detections import iou_tracklets

        tr_dets = (
            spark.range(1_500_000)
            .selectExpr(
                "CAST(floor(id / 15.0) AS BIGINT) AS v",
                "CAST(floor(id / 3.0) AS BIGINT) % 5 AS f",
                "id % 3 AS b",
            )
            .selectExpr(
                "printf('v%09d', v) AS video", "f AS frame", "b AS box_id",
                "(v * 3 + b * 17) % 30 + 2 * f AS x0",
                "(v * 5 + b * 23) % 30 + f AS y0",
                "(v * 3 + b * 17) % 30 + 2 * f + 8 + (v + b) % 6 AS x1",
                "(v * 5 + b * 23) % 30 + f + 8 + (2 * v + b) % 5 AS y1",
                "(v * 7 + b * 31 + f * 11) % 100 AS score",
            )
            .repartition(cpus * 2)
            .persist()
        )
        tr_dets.count()
        timed(
            "iou_tracklets_1m5_dets",
            lambda: iou_tracklets(tr_dets, iou_thr_milli=300)
            .agg(
                F.bit_xor(F.xxhash64("video", "frame", "box_id", "track_id")),
                F.countDistinct("track_id"),
                F.count(F.lit(1)),
            )
            .collect(),
            reps=2,
        )
        tr_dets.unpersist()

    # ---- dissolve fixture --------------------------------------------
    if on("dissolve_4m_cells"):
        from morituri_spark.geo.dissolve import dissolve_stats

        dx0 = (F.col("id") % 2000).cast("double")
        dy0 = F.floor(F.col("id") / 2000).cast("double")
        dis_cells = (
            spark.range(4_000_000)
            .select(
                (F.expr("id % 2000 div 50") + 40 * F.expr("id div 2000 div 50")).alias("gid"),
                F.col("id").alias("zone_id"),
                F.array(
                    F.array(
                        F.array(dx0, dy0),
                        F.array(dx0 + 1, dy0),
                        F.array(dx0 + 1, dy0 + 1),
                        F.array(dx0, dy0 + 1),
                        F.array(dx0, dy0),
                    )
                ).alias("rings"),
            )
            .repartition(cpus * 2)
            .persist()
        )
        dis_cells.count()
        timed(
            "dissolve_4m_cells",
            lambda: dissolve_stats(dis_cells, group_col="gid")
            .agg(
                F.count(F.lit(1)),
                F.sum("dissolved_area"),
                F.sum("n_boundary_edges"),
                F.sum("n_nonmanifold"),
            )
            .collect(),
            reps=2,
        )
        dis_cells.unpersist()

    # ---- pyramid fixture ---------------------------------------------
    if on("pyramid_50m_pixels_4lv"):
        from morituri_spark.geo.terrain import pyramid_sums

        py_dem = (
            spark.range(50_000_000)
            .selectExpr(
                "id % 800 AS g",
                "(id div 800) % 256 AS ix",
                "id div 204800 AS iy",
                "(7 * (id % 800) + 3 * (id div 204800)"
                " + 5 * ((id div 800) % 256)) % 97 AS z",
            )
            .repartition(cpus * 2)
            .persist()
        )
        py_dem.count()
        timed(
            "pyramid_50m_pixels_4lv",
            lambda: pyramid_sums(py_dem, levels=4, keys=["g"])
            .agg(
                F.bit_xor(F.xxhash64("g", "level", "ix", "iy", "s", "n")),
                F.count(F.lit(1)),
            )
            .collect(),
            reps=2,
        )
        py_dem.unpersist()

    # ---- panoptic fixture --------------------------------------------
    if on("panoptic_200k_images"):
        from morituri_spark.multimodal.masks import panoptic_quality

        def _runs_sql(shift_s, shift_l):
            return (
                spark.range(200_000 * 9)
                .selectExpr(
                    "CAST(floor(id / 9.0) AS BIGINT) AS i",
                    "CAST(floor(id / 3.0) AS BIGINT) % 3 AS s",
                    "id % 3 AS k",
                )
                .selectExpr(
                    "printf('img%012d', i) AS image_id",
                    "s AS seg_id",
                    f"k * 40 + (i * 7 + s * 11 + {shift_s}) % 20 AS start",
                    f"5 + (i + s + k + {shift_l}) % 15 AS length",
                )
                .repartition(cpus * 2)
            )

        pq_pred = _runs_sql(0, 0).persist()
        pq_gt = _runs_sql(3, 1).persist()
        pq_pred.count(); pq_gt.count()
        timed(
            "panoptic_200k_images",
            lambda: panoptic_quality(pq_pred, pq_gt, bin_width=16.0)
            .agg(
                F.sum("n_matched"), F.sum("sum_iou_micro"), F.count(F.lit(1))
            )
            .collect(),
            reps=2,
        )
        pq_pred.unpersist(); pq_gt.unpersist()

    # ---- minhash 50k fixture -----------------------------------------
    if on("minhash_near_dup_50k_docs"):
        from morituri_spark.text.dedup import minhash_near_duplicates

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        alph = "etaoinshr"
        tx = F.col("text")
        for k in range(1, 10):
            tx = F.when(
                F.col("k") == k,
                F.translate("text", alph, alph[k:] + alph[:k]),
            ).otherwise(tx)
        docs_xl = (
            docs.select(
                F.explode(F.sequence(F.lit(0), F.lit(9))).alias("k"),
                "doc_id", "text",
            )
            .select(
                (F.col("doc_id") + F.col("k") * 1_000_000).alias("doc_id"),
                tx.alias("text"),
            )
            .persist()
        )
        docs_xl.count()
        timed(
            "minhash_near_dup_50k_docs",
            lambda: minhash_near_duplicates(
                docs_xl, threshold=0.5, sig_prefilter_margin=0.15
            ).count(),
            reps=2,
        )
        docs_xl.unpersist()

    # ---- knn family fixtures -----------------------------------------
    if any(on(x) for x in (
        "knn_ring_1m_candidates", "radius_join_1m_points_50m",
        "spacetime_join_1m_points",
    )):
        from morituri_spark.sources import synth
        from morituri_spark.geo.knn import (
            knn_join, radius_self_join, spacetime_self_join,
        )

        N_IMAGES = B.N_IMAGES
        images = synth.images_table(
            spark, N_IMAGES, partitions=cpus * 4, with_payload=False
        ).select("image_id", "lon", "lat").persist()
        images.count()
        knn_queries = images.limit(1000).withColumnRenamed(
            "image_id", "query_id"
        ).persist()
        knn_queries.count()
        knn_cands = images.limit(1_000_000).withColumnRenamed(
            "image_id", "cand_id"
        ).persist()
        knn_cands.count()
        if on("knn_ring_1m_candidates"):
            timed(
                "knn_ring_1m_candidates",
                lambda: knn_join(knn_queries, knn_cands, k=5, res=12).count(),
                reps=2,
            )
        if on("radius_join_1m_points_50m"):
            timed(
                "radius_join_1m_points_50m",
                lambda: radius_self_join(
                    knn_cands.withColumnRenamed("cand_id", "id"), 0.05,
                    id_col="id",
                ).agg(F.count(F.lit(1)), F.sum("dist_km")).collect(),
                reps=2,
            )
        if on("spacetime_join_1m_points"):
            st_pts = knn_cands.select(
                F.col("cand_id").alias("id"), "lon", "lat",
                (F.lit("2024-01-01 00:00:00").cast("timestamp")
                 + F.make_interval(
                     secs=F.pmod(F.xxhash64("cand_id"), F.lit(2592000))
                     .cast("double"))).alias("ts"),
            ).persist()
            st_pts.count()
            timed(
                "spacetime_join_1m_points",
                lambda: spacetime_self_join(st_pts, 0.05, 900, id_col="id")
                .agg(F.count(F.lit(1)), F.sum("dist_km")).collect(),
                reps=2,
            )
            st_pts.unpersist()
        knn_queries.unpersist()
        knn_cands.unpersist()
        images.unpersist()

    # ---- ann pq fixture ----------------------------------------------
    if on("ann_pq_encode_scan_500k_32q"):
        from morituri_spark.ml.simsearch import ann_topk_pq, fixed_pq_codebooks

        pq_cand = spark.range(500_000).select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(1, 64), i -> CAST(sin((id + 1) * i) AS FLOAT))"
            ).alias("embedding"),
        ).repartition(cpus).persist()
        pq_cand.count()
        pq_q = spark.range(32).select(
            F.col("id").alias("query_id"),
            F.expr(
                "transform(sequence(1, 64), i -> CAST(cos((id + 17) * i) AS FLOAT))"
            ).alias("embedding"),
        ).persist()
        pq_q.count()
        pq_books = fixed_pq_codebooks(8, 16, 64)
        timed(
            "ann_pq_encode_scan_500k_32q",
            lambda: ann_topk_pq(
                pq_q, pq_cand, k=10, codebooks=pq_books, parity=False
            ).count(),
            reps=2,
        )
        pq_cand.unpersist(); pq_q.unpersist()

    # ---- bleu fixture ------------------------------------------------
    if on("bleu_500k_pairs"):
        from morituri_spark.text.metrics import bleu_clip_counts

        bl_pairs = (
            spark.range(500_000)
            .selectExpr(
                "id AS pair_id",
                "concat_ws(' ', transform(sequence(0, 19),"
                " k -> concat('w', (id * 3 + k * 7) % 50))) AS cand",
                "concat_ws(' ', transform(sequence(0, 19),"
                " k -> concat('w', (id * 5 + k * 11 + 1) % 50))) AS ref",
            )
            .repartition(cpus * 2)
            .persist()
        )
        bl_pairs.count()
        timed(
            "bleu_500k_pairs",
            lambda: bleu_clip_counts(bl_pairs, n_max=4)
            .agg(F.sum("clipped"), F.sum("total"), F.count(F.lit(1)))
            .collect(),
            reps=2,
        )
        bl_pairs.unpersist()

    # ---- heavy hitters fixture (bench.py verbatim) -------------------
    if on("heavy_hitters_20m_rows"):
        from morituri_spark.text.heavyhitters import frequent_items

        hh_df = (
            spark.range(20_000_000)
            .select(
                F.when(
                    F.col("id") % 3 == 0,
                    F.concat(F.lit("hot"), (F.col("id") % 20).cast("string")),
                )
                .otherwise(
                    F.concat(
                        F.lit("t"),
                        F.pmod(F.xxhash64("id"), F.lit(2_000_000)).cast("string"),
                    )
                )
                .alias("item")
            )
            .repartition(cpus * 2)
            .persist()
        )
        hh_df.count()
        timed(
            "heavy_hitters_20m_rows",
            lambda: frequent_items(hh_df, "item", 1, 100)
            .agg(F.count(F.lit(1)), F.sum("cnt")).collect(),
            reps=2,
        )
        hh_df.unpersist()

    # ---- hausdorff fixture (bench.py verbatim) -----------------------
    if on("hausdorff_4k_tracks"):
        from morituri_spark.geo.similarity import hausdorff_join

        tracks_b = spark.range(200_000).select(
            (F.col("id") % 4000).alias("track_id"),
            F.col("id").alias("seq"),
            (
                ((F.col("id") % 4000) % 500 % 25).cast("double") * 14.0 - 170.0
                + ((F.col("id") % 4000) * 131 % 97).cast("double") / 1000.0
                + (F.col("id") * 61 % 181).cast("double") / 2000.0
            ).alias("lon"),
            (
                ((F.col("id") % 4000) % 500 / 25).cast("int").cast("double") * 6.0 - 57.0
                + ((F.col("id") % 4000) * 173 % 89).cast("double") / 1000.0
                + (F.col("id") * 37 % 151).cast("double") / 2000.0
            ).alias("lat"),
        ).repartition(cpus * 2).persist()
        tracks_b.count()
        timed(
            "hausdorff_4k_tracks",
            lambda: hausdorff_join(tracks_b, 10.0)
            .agg(F.count(F.lit(1)), F.sum("hausdorff_km")).collect(),
            reps=2,
        )
        tracks_b.unpersist()

    # ---- frequent pairs fixture (bench.py verbatim) ------------------
    if on("frequent_pairs_2m_rows"):
        from morituri_spark.text.basket import frequent_pairs

        fp_rows = (
            spark.range(2_000_000)
            .selectExpr(
                "id % 200000 AS basket_id",
                "format_string('i%04d', (id * 7 + id % 13) % 2000) AS item",
            )
            .repartition(cpus * 2)
            .persist()
        )
        fp_rows.count()
        timed(
            "frequent_pairs_2m_rows",
            lambda: frequent_pairs(fp_rows, min_support=3)
            .agg(F.sum("supp_ab"), F.sum("lift_micro"), F.count(F.lit(1)))
            .collect(),
            reps=2,
        )
        fp_rows.unpersist()

    # ---- small CC fixture (bench.py verbatim) ------------------------
    if on("connected_components_120k_edges"):
        from morituri_spark.text.components import connected_components

        cc_e1 = spark.range(100_000).selectExpr(
            "id AS a", "id + 1 AS b"
        ).where("id % 50 != 49")
        cc_e2 = spark.range(100_000).selectExpr(
            "CAST(hash(id) % 150000 AS LONG) AS a",
            "CAST(hash(id + 7) % 150000 AS LONG) AS b",
        ).where("a >= 0 AND b >= 0")
        cc_edges = cc_e1.union(cc_e2).persist()
        cc_edges.count()
        timed(
            "connected_components_120k_edges",
            lambda: connected_components(cc_edges).count(),
            reps=2,
        )
        cc_edges.unpersist()

    # ---- nms fixture (bench.py verbatim) -----------------------------
    if on("nms_5m_boxes"):
        from morituri_spark.multimodal.detections import nms_boxes

        nms_dets = (
            spark.range(5_000_000)
            .selectExpr(
                "CAST(floor(id / 10) AS BIGINT) AS i", "id % 10 AS j"
            )
            .selectExpr(
                "printf('img%012d', i) AS image_id",
                "j AS box_id",
                "(i * 3 + j * 17 + 0) % 48 AS x0",
                "(i * 5 + j * 23 + 0) % 48 AS y0",
                "(i * 3 + j * 17 + 0) % 48 + 4 + (i + 3 * j + 0) % 12 AS x1",
                "(i * 5 + j * 23 + 0) % 48 + 4 + (2 * i + j + 0) % 10 AS y1",
                "(i * 7 + j * 31) % 100 AS score",
            )
            .repartition(cpus * 2)
            .persist()
        )
        nms_dets.count()
        timed(
            "nms_5m_boxes",
            lambda: nms_boxes(nms_dets, iou_thr_milli=300)
            .agg(
                F.bit_xor(F.xxhash64("image_id", "keep_rank", "box_id")),
                F.count(F.lit(1)),
            )
            .collect(),
            reps=2,
        )
        nms_dets.unpersist()

    # ---- scene cuts fixture (bench.py verbatim) -----------------------
    if on("scene_cuts_16m_bins"):
        from morituri_spark.multimodal.video import scene_cuts

        sc_hists = (
            spark.range(100_000)
            .selectExpr("id AS v")
            .selectExpr("v", "explode(sequence(0, 19)) AS frame")
            .selectExpr("v", "frame", "explode(sequence(0, 7)) AS bin")
            .selectExpr(
                "printf('vid%09d', v) AS video_id", "frame", "bin",
                "(v + bin * 3 + frame * 5"
                " + CAST(floor(frame / 7.0) AS BIGINT) * 100) % 200 AS cnt",
            )
            .repartition(cpus * 2)
            .persist()
        )
        sc_hists.count()
        timed(
            "scene_cuts_16m_bins",
            lambda: scene_cuts(sc_hists, cut_thr=300)
            .agg(
                F.sum("scene_id"),
                F.sum(F.col("is_cut").cast("long")),
                F.count(F.lit(1)),
            )
            .collect(),
            reps=2,
        )
        sc_hists.unpersist()

    # ---- zsplit fixture (bench.py verbatim) ---------------------------
    if on("zsplit_200k_links"):
        from morituri_spark.sources import synth as _synth
        from morituri_spark.operators import streets as ST

        streets_xl = _synth.streets_table(
            spark, n=200_000, n_vertices=10
        ).persist()
        streets_xl.count()
        zl_xl = _synth.zlevels_table(
            spark,
            [(10_000 + i, [0, 1, 1, 0, 0, 2, 2, 0, 3, 0]) for i in range(200_000)],
        ).persist()
        zl_xl.count()
        timed(
            "zsplit_200k_links",
            lambda: ST.street_ways(streets_xl, zl_xl).count(),
            reps=2,
        )
        streets_xl.unpersist()
        zl_xl.unpersist()

    print(f"calib_ms_end={B.calib_ms():.2f}", flush=True)
    print(f"loadavg_end={open('/proc/loadavg').read().strip()}", flush=True)


if __name__ == "__main__":
    main()
