#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32).

The flagship metric is images/sec through the spatial-join + tile-assignment
pipeline (BASELINE.json): an N_IMAGES-row deterministic image table (seed=42,
geometry-only payload — the join never touches bytes; the codec path is
benched separately at smaller n) → geocell encode → PIP zone assignment
(broadcast + salted variants) → tile×zone rollup.

For N-vs-4N scaling evidence run scripts/scaling_bench.py, which invokes
this file at two parallelism levels and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_IMAGES = int(os.environ.get("BENCH_N_IMAGES", "4000000"))
N_PAYLOAD = int(os.environ.get("BENCH_N_PAYLOAD", "20000"))
N_MID_PIP = int(os.environ.get("BENCH_N_MID_PIP", "1000000"))
N_LAYOUT = int(os.environ.get("BENCH_N_LAYOUT", "20000000"))


def cpu_ticks():
    """(total_ticks, steal_ticks) from /proc/stat — CLAUDE.md rule 6: this
    shared host shows 2-14% steal at different times; numbers without a
    steal record cannot be compared across runs."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = list(map(int, parts[1:]))
    return sum(vals), vals[7] if len(vals) > 7 else 0


def calib_ms() -> float:
    """Single-core contention sentinel: best-of-5 time for a fixed NumPy
    workload. The r4 adjudication showed steal ticks UNDER-REPORT sibling
    contention (Arrow-heavy entries inflated 1.5-2.5× at 0.2% steal); this
    reference workload shifts with the frequency/LLC pressure steal misses.
    Compare across rounds: a calib_ms drift of +20% means wall-clock
    deltas of that order are environmental, not regressions."""
    import numpy as np

    x = np.arange(2_000_000, dtype=np.float64)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(5):
            x = np.sqrt(x * 1.0000001 + 1.0)
        best = min(best, time.perf_counter() - t0)
    return round(best * 1000.0, 2)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from pyspark.sql import functions as F

    from morituri_spark.session import get_spark
    from morituri_spark.geo import cells as C
    from morituri_spark.geo import pip
    from morituri_spark.pipelines import flagship
    from morituri_spark.sources import synth

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    calib_start = calib_ms()
    timings: dict[str, float] = {}
    steal: dict[str, float] = {}

    def timed(name: str, fn):
        c0, s0 = cpu_ticks()
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        c1, s1 = cpu_ticks()
        steal[name] = round(100.0 * (s1 - s0) / max(c1 - c0, 1), 2)
        return out

    # ---- materialize inputs once (excluded from timings) ----
    images = synth.images_table(
        spark, N_IMAGES, partitions=cpus * 4, with_payload=False
    ).select("image_id", "lon", "lat").persist()
    images.count()  # force
    zones = synth.zones_table(spark).persist()
    zones.count()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").persist()
    ev.count()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").persist()
    li.count()

    # warmup: run the EXACT flagship query twice untimed — the generated
    # whole-stage code (~170 split crossing tests) takes O(100s) of C2
    # compiler time before it is JIT-hot; steady-state is what a long job
    # at real scale sees (one-time JIT amortizes to nothing over a 100 TB
    # stage), so that is what we measure.
    def steady_state(name: str, df, max_runs: int = 7, min_runs: int = 4):
        """Repeat df.count() until the time stops improving (C2 JIT of the
        generated stages lands nondeterministically across the first few
        runs); record the min as the steady-state number. At least
        ``min_runs`` — a single non-improving early run is usually still
        interpreted, not converged. Holds ONE DataFrame — fresh plans would
        regenerate codegen source and restart JIT from zero."""
        best, best_steal = None, 0.0
        for i in range(max_runs):
            c0, s0 = cpu_ticks()
            t0 = time.perf_counter()
            df.count()
            dt = time.perf_counter() - t0
            c1, s1 = cpu_ticks()
            if best is None or dt < best:
                best = dt
                best_steal = 100.0 * (s1 - s0) / max(c1 - c0, 1)
            if i + 1 >= min_runs and dt <= 1.1 * best:
                break
        timings[name] = round(best, 3)
        steal[name] = round(best_steal, 2)

    # ---- flagship: images/sec through broadcast PIP + tile rollup ----
    rolled = flagship.run_flagship(images, zones, res=10, tile_res=7)
    steady_state("flagship_broadcast_pip", rolled)
    images_per_sec = round(N_IMAGES / timings["flagship_broadcast_pip"], 1)

    # shuffle PIP, work-based auto-salting WITH the r4 straggler floor: on
    # these light polygons no zone's predicted work reaches salt_floor_work,
    # so the auto plan is literally the unsalted plan (same split factors,
    # same literals apart from the thresholds) — the pair below documents
    # auto ≈ forced-off (r3 measured 25-40% overhead before the floor;
    # round 1's blanket row-count salt was 3.4× slower than its control)
    salted = pip.assign_zones_shuffle(images, zones.select("zone_id", "rings"), res=10)
    steady_state("flagship_salted_pip", salted, max_runs=4, min_runs=2)
    nosalt = pip.assign_zones_shuffle(
        images, zones.select("zone_id", "rings"), res=10, salt_target_work=1e18
    )
    steady_state("shuffle_pip_unsalted_control", nosalt, max_runs=3, min_runs=2)

    # adversarial skew: a 512-edge polygon over the urban mega-cell makes one
    # (zone, salt) group ~0.6G row·edge ops — auto salting splits it; the
    # forced-off control eats the straggler task
    heavy_ring = synth._regular_polygon(*synth.URBAN_CENTER, 0.3, 512)
    heavy_zones = spark.createDataFrame(
        [(0, [heavy_ring])], "zone_id long, rings array<array<array<double>>>"
    )
    hot_auto = pip.assign_zones_shuffle(images, heavy_zones, res=10)
    steady_state("shuffle_pip_hot_salted", hot_auto, max_runs=3, min_runs=2)
    hot_off = pip.assign_zones_shuffle(images, heavy_zones, res=10, salt_target_work=1e18)
    steady_state("shuffle_pip_hot_unsalted", hot_off, max_runs=3, min_runs=2)

    # mid-regime PIP (>4096 total edges, few zones — the production
    # admin-boundary case): Arrow broadcast kernel (the default route since
    # r3) vs the old covers-join + interpreted-HOF pip_expr plan. The HOF
    # pair runs on a points SUBSET (its per-edge-per-row interpreted cost
    # would dominate the whole bench at 4M rows); per-M-rows numbers are
    # what to compare.
    mid_zones = spark.createDataFrame(
        [
            (z, [synth._regular_polygon(
                1.0 + 1.1 * (z % 8), 41.0 + 1.1 * (z // 8), 0.52, 102)])
            for z in range(64)
        ],
        "zone_id long, rings array<array<array<double>>>",
    )
    mid_pts = images.limit(N_MID_PIP).persist()
    mid_pts.count()
    arrow_mid = pip.assign_zones_catalyst(mid_pts, mid_zones, res=8)
    steady_state("pip_mid_arrow_broadcast", arrow_mid, max_runs=3, min_runs=2)
    # the interpreted-HOF loser runs on a 10× smaller subset (measured 72×
    # slower per row — 140s at 1M rows tells us nothing 14s at 100k doesn't);
    # compare per-M-rows: hof_time*10 vs arrow_time
    hof_pts = images.limit(N_MID_PIP // 10).persist()
    hof_pts.count()
    hof_mid = pip.assign_zones_catalyst(hof_pts, mid_zones, res=8, mid_strategy="hof")
    steady_state("pip_mid_hof_covers_tenth", hof_mid, max_runs=2, min_runs=1)
    mid_pts.unpersist()
    hof_pts.unpersist()

    # J11 kNN at scale (r4: first bench evidence for the ring-expansion
    # join): 1k queries × 1M candidates, k=5. res=12 starts with tighter
    # rings (fewer candidates per round) and measured faster than res=10
    # (12.7s vs 18.7s standalone) — the entry pins the res-12 shape.
    knn_queries = images.limit(1000).withColumnRenamed("image_id", "query_id").persist()
    knn_queries.count()
    knn_cands = images.limit(1_000_000).withColumnRenamed("image_id", "cand_id").persist()
    knn_cands.count()
    from morituri_spark.geo.knn import knn_join

    timed(
        "knn_ring_1m_candidates",
        lambda: knn_join(knn_queries, knn_cands, k=5, res=12).count(),
    )
    # fixed-radius pair join (r5): 1M points, 50 m capture radius (the
    # duplicate-capture shape; the synth's urban disk makes this ~4M true
    # pairs — a km-scale radius here means BILLIONS of output pairs, a
    # semantics choice, not an engine limit). One disk-cover explode + one
    # cell equi-join + rounded-haversine refine; the agg consumes dist_km
    # so the refine isn't pruned (rule 18)
    from morituri_spark.geo.knn import radius_self_join

    timed(
        "radius_join_1m_points_50m",
        lambda: radius_self_join(
            knn_cands.withColumnRenamed("cand_id", "id"), 0.05, id_col="id"
        ).agg(F.count(F.lit(1)), F.sum("dist_km")).collect(),
    )
    # space-time co-location (r5): same 1M points + synthetic 30-day
    # timestamps, 50 m AND 15 min. The (cell, bucket) key splinters the
    # urban mega-cell across ~2880 time buckets before any salt probe —
    # compare with radius_join_1m_points_50m to read the time key's
    # candidate-volume cut directly.
    from morituri_spark.geo.knn import spacetime_self_join

    st_pts = knn_cands.select(
        F.col("cand_id").alias("id"), "lon", "lat",
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.pmod(F.xxhash64("cand_id"), F.lit(2592000))
                           .cast("double"))).alias("ts"),
    ).persist()
    st_pts.count()
    timed(
        "spacetime_join_1m_points",
        lambda: spacetime_self_join(st_pts, 0.05, 900, id_col="id")
        .agg(F.count(F.lit(1)), F.sum("dist_km")).collect(),
    )
    st_pts.unpersist()
    knn_queries.unpersist()
    knn_cands.unpersist()

    # discrete-Hausdorff track-similarity join (r5): 4000 tracks x 50 pts
    # in 500 base clusters (8 tracks each) → anchors-to-points radius_join
    # yields ~C(8,2)x500 = 14k candidate pairs, each refined by the tiled
    # haversine-matrix kernel (50x50). The agg consumes hausdorff_km so
    # the kernel isn't pruned (rule 18).
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
    )
    tracks_b.unpersist()

    # per-group convex hulls (r5): 4M points, 1000 groups. Honest local
    # read: the raw control WINS here (~3.3s vs ~5.4s) — both paths cross
    # 4M points through Arrow once and the in-memory local "shuffle" is
    # free, so stage 1's second Arrow pass is pure cost at this scale.
    # two_stage stays the default because the raw path's collect_list
    # puts a whole group in ONE task (a 10^9-point group OOMs it), while
    # stage 1 bounds the final input to tasks x hull-size — a
    # correctness-at-scale bound the local bench cannot price, same
    # family as rule 20's regime gates. The agg consumes the vertex
    # coordinates (rule 18).
    from morituri_spark.geo.hull import convex_hulls

    hull_pts = synth.images_table(
        spark, 4_000_000, partitions=cpus * 4, with_payload=False
    ).select(
        F.pmod(F.xxhash64("image_id"), F.lit(1000)).alias("key"), "lon", "lat"
    ).persist()
    hull_pts.count()
    timed(
        "convex_hulls_4m_two_stage",
        lambda: convex_hulls(hull_pts, "key")
        .agg(F.count(F.lit(1)), F.sum("lon"), F.sum("lat")).collect(),
    )
    timed(
        "convex_hulls_4m_raw_control",
        lambda: convex_hulls(hull_pts, "key", two_stage=False)
        .agg(F.count(F.lit(1)), F.sum("lon"), F.sum("lat")).collect(),
    )
    hull_pts.unpersist()

    # mega-cell skew (r5, verdict #5): HALF of 1M candidates collapse into
    # one ~0.001° patch (a single res-12 cell), so ring 0 floods each
    # in-cell query with 500k candidates — the distribution the two-stage
    # per-round top-k (topk_salt) exists for. 200 queries, 100 of them
    # inside the patch; the pair FORCES the salt on/off so it measures the
    # stage's cost at this shape. r5 adjudication: salt loses 1.7-2.4×
    # here (per-query 500k-row sorts don't straggle), which is why
    # knn_join's default is now "auto" (engages at max cell ≥ 4M — the
    # multi-million-per-query flood regime this shape can't reach at 1M
    # corpus); the auto probe itself routes to the control's plan.
    def skew_pts(n, id_name):
        return spark.range(n).select(
            F.col("id").alias(id_name),
            F.when(F.col("id") % 2 == 0, 10.0 + (F.col("id") % 97).cast("double") * 1e-5)
            .otherwise(-150.0 + (F.col("id") % 300).cast("double")).alias("lon"),
            F.when(F.col("id") % 2 == 0, 45.0 + (F.col("id") % 89).cast("double") * 1e-5)
            .otherwise(-60.0 + (F.col("id") % 120).cast("double")).alias("lat"),
        )

    skew_cands = skew_pts(1_000_000, "cand_id").repartition(64).persist()
    skew_cands.count()
    skew_q = skew_pts(200, "query_id").persist()
    skew_q.count()
    timed(
        "knn_megacell_1m_salted",
        lambda: knn_join(skew_q, skew_cands, k=5, res=12, topk_salt=32).count(),
    )
    timed(
        "knn_megacell_1m_unsalted_control",
        lambda: knn_join(skew_q, skew_cands, k=5, res=12, topk_salt=None).count(),
    )
    skew_cands.unpersist()
    skew_q.unpersist()

    # sparse shape (r5): 50k candidates over 300°×120° at res 12 → ~0.01
    # candidates per cell, so k=5 needs 10+ rings. One ring per round made
    # this driver-barrier-bound; geometric ring batching (knn_join default)
    # is O(log max_rings) rounds — interleaved A/B measured 9.9-10.5s vs
    # 22-23s single-ring at ≤2.5% steal (BENCH/BASELINE.md r5).
    def sparse_pts(n, id_name):
        return spark.range(n).select(
            F.col("id").alias(id_name),
            (-150.0 + (F.col("id") % 677).cast("double") * 0.443).alias("lon"),
            (-60.0 + (F.floor(F.col("id") / 7) % 271).cast("double") * 0.443).alias("lat"),
        )

    sp_cands = sparse_pts(50_000, "cand_id").repartition(64).persist()
    sp_cands.count()
    sp_q = sparse_pts(500, "query_id").persist()
    sp_q.count()
    timed(
        "knn_sparse_50k_batched",
        lambda: knn_join(sp_q, sp_cands, k=5, res=12, max_rings=128).count(),
    )
    timed(
        "knn_sparse_50k_single_ring_control",
        lambda: knn_join(
            sp_q, sp_cands, k=5, res=12, max_rings=128, ring_batch=False
        ).count(),
    )
    sp_cands.unpersist()
    sp_q.unpersist()

    # phash Hamming near-dup (r5): 4M synthetic 63-bit perceptual hashes,
    # 1-in-7 a planted hamming ≤ 2 dup of its neighbor (same closed form
    # as the driver oracle's events synth). Pigeonhole 3-block bucket
    # equi-join + bit_count verify — all Catalyst; candidate volume is
    # ~N²/2^21 per block (~11M rows at 4M hashes), never all-pairs (8e12).
    from morituri_spark.ml.hamming import hamming_near_duplicates

    # prime field moduli — see __spark_entry__._phash_expr: power-of-two
    # moduli alias hash(pid) == hash(pid+65536) and flood exact dups
    pid = "CASE WHEN id % 7 = 3 THEN id - 1 ELSE id END"
    flip = "CASE WHEN id % 7 = 3 THEN (id % 3) + 1 ELSE 0 END"
    ph = (
        f"(({pid}) * 48271) % 32749 * 281474976710656"
        f" + (({pid}) * 40503) % 65521 * 4294967296"
        f" + (({pid}) * 69621) % 65407 * 65536"
        f" + (((({pid}) * 12345) % 65497) ^ ({flip}))"
    )
    ph_df = (
        spark.range(4_000_000)
        .select(F.col("id").alias("image_id"), F.expr(ph).alias("phash"))
        .repartition(64)
        .persist()
    )
    ph_df.count()
    timed(
        "phash_neardup_4m",
        lambda: hamming_near_duplicates(
            ph_df, "phash", id_col="image_id", max_hamming=2
        ).count(),
    )
    ph_df.unpersist()

    # map-matching (r5): 2M points snapped to 50k short street segments,
    # radius 0.05° on a 0.5° candidate grid. Candidates come from the
    # cell-cover equi-join (~segments-per-cell × points, never 1e11
    # all-pairs); refine + argmin are codegen + partial agg.
    from morituri_spark.geo.matching import snap_to_segments

    mm_pts = (
        spark.range(2_000_000)
        .select(
            F.col("id").alias("point_id"),
            ((F.col("id") * 7919 % 360000).cast("double") / 1000.0 - 180.0).alias("lon"),
            ((F.col("id") * 104729 % 180000).cast("double") / 1000.0 - 90.0).alias("lat"),
        )
        .repartition(64)
        .persist()
    )
    mm_pts.count()
    mm_segs = (
        spark.range(50_000)
        .select(
            F.col("id").alias("seg_id"),
            ((F.col("id") * 13007 % 360000).cast("double") / 1000.0 - 180.0).alias("ax"),
            ((F.col("id") * 20011 % 180000).cast("double") / 1000.0 - 90.0).alias("ay"),
        )
        .select(
            "seg_id", "ax", "ay",
            (F.col("ax") + (F.col("seg_id") * 31 % 200).cast("double") / 1000.0 - 0.1).alias("bx"),
            (F.col("ay") + (F.col("seg_id") * 47 % 200).cast("double") / 1000.0 - 0.1).alias("by"),
        )
        .persist()
    )
    mm_segs.count()
    timed(
        "snap_segments_2m_points_50k_segs",
        lambda: snap_to_segments(
            mm_pts, mm_segs, radius=0.05, cell_deg=0.5
        ).count(),
    )
    mm_pts.unpersist()
    mm_segs.unpersist()

    # grid analytics (r5): 4M points collapse to occupied cells at ONE
    # map-side-combinable aggregate; the iterative CC (clusters) and the
    # neighbor-join sums (Moran's I) then run over CELLS (~16k rows) —
    # grid-bounded, not point-bounded, which is the whole 100 TB story
    from morituri_spark.geo.clustering import grid_clusters, morans_i

    # 2M uniform background (~123/cell at 2°, below min_pts) + 2M points in
    # 500 dense patches → core cells form many SMALL components, the real
    # clustering shape (a uniform field makes one world-spanning component
    # whose CC convergence measures nothing but round overhead — probed at
    # 35s vs ~5s for this mixture)
    ga_bg = spark.range(2_000_000).select(
        ((F.col("id") * 7919 % 360000).cast("double") / 1000.0 - 180.0).alias("lon"),
        ((F.col("id") * 104729 % 180000).cast("double") / 1000.0 - 90.0).alias("lat"),
    )
    ga_hot = spark.range(2_000_000).select(
        (((F.col("id") % 500) * 7919 % 360).cast("double") - 180.0
         + (F.col("id") * 13 % 2500).cast("double") / 1000.0).alias("lon"),
        (((F.col("id") % 500) * 104729 % 180).cast("double") - 90.0
         + (F.col("id") * 17 % 2500).cast("double") / 1000.0).alias("lat"),
    )
    ga_pts = ga_bg.union(ga_hot).repartition(cpus * 2).persist()
    ga_pts.count()
    timed(
        "grid_clusters_4m_points",
        lambda: grid_clusters(ga_pts, cell_deg=2.0, min_pts=400).count(),
    )
    timed("morans_i_4m_points", lambda: morans_i(ga_pts, cell_deg=2.0).count())

    # Gi* + Mann-Kendall (r5 seventh session): same mixture, same
    # grid-bounded story — the point aggregate dominates; the 9-key
    # neighbor join (Gi*) and the T(T−1)/2 pair fold (MK, T=8 bins keyed
    # off a deterministic row hash) run over ~16k cells
    from morituri_spark.geo.clustering import gi_star_cells, mann_kendall_cells

    timed(
        "gi_star_4m_points",
        lambda: gi_star_cells(ga_pts, cell_deg=2.0, z_threshold=1.0).count(),
    )
    ga_st = ga_pts.withColumn(
        "t_bin", (F.xxhash64("lon", "lat") % 8 + 8) % 8
    )
    timed(
        "mann_kendall_4m_points_8bins",
        lambda: mann_kendall_cells(
            ga_st, n_bins=8, cell_deg=2.0, z_threshold=1.0
        ).count(),
    )

    # adaptive quadtree over the same skewed mixture: ONE point aggregate
    # then two grid-bounded stages — the iteration-free split-until-≤N
    from morituri_spark.geo.adaptive import adaptive_cells

    timed(
        "adaptive_quadtree_4m_points",
        lambda: adaptive_cells(
            ga_pts, max_points=2000, res_min=3, res_max=12
        ).count(),
    )

    # colocation quotient over the same mixture with 5 hash-derived
    # categories: the point aggregate dominates; the band self-join and
    # ratio algebra run over (cell, cat) rows
    from morituri_spark.geo.colocation import colocation_quotient

    ga_cat = ga_pts.withColumn(
        "cat", ((F.xxhash64("lon", "lat") % 5 + 5) % 5).cast("string")
    )
    timed(
        "colocation_4m_points_5cats",
        lambda: colocation_quotient(ga_cat, "cat", cell_deg=2.0).count(),
    )

    # full emerging-hotspot analysis (per-bin Gi* → MK over z series):
    # the composition's cost is still the one point aggregate; the
    # per-bin neighbor join and MK pair fold run over cells×8 rows
    from morituri_spark.geo.clustering import emerging_gi_star

    timed(
        "emerging_gi_4m_points_8bins",
        lambda: emerging_gi_star(
            ga_st, n_bins=8, cell_deg=2.0, z_threshold=1.0
        ).count(),
    )

    # IDW surface over the same mixture: 9-way contribution explode + one
    # map-side-combinable decimal aggregate — no join, no float-sum
    # nondeterminism (quantized integer weights)
    from morituri_spark.geo.interpolate import idw_surface

    ga_val = ga_pts.withColumn("value", (F.col("lon") + F.lit(180.0)) * F.lit(1.37))
    timed("idw_surface_4m_points", lambda: idw_surface(ga_val, cell_deg=2.0).count())
    ga_pts.unpersist()

    # SemDeDup (r5): 200k vectors × 64 clusters — one assignment matmul
    # pass, then within-cluster pair kernels (~3k rows/cluster at this
    # shape; pair-block splitting bounds any hot cluster)
    from morituri_spark.ml.semdedup import semdedup
    from morituri_spark.ml.simsearch import fixed_centroids

    sd_emb = (
        spark.range(200_000)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(1, 64), i -> CAST(sin((id + 1) * i) AS FLOAT))"
            ).alias("embedding"),
        )
        .repartition(cpus)
        .persist()
    )
    sd_emb.count()
    timed(
        "semdedup_200k_64clusters",
        lambda: semdedup(
            sd_emb, threshold=0.9, dim=64,
            centroids=fixed_centroids(64, 64), salt_target_rows=20_000,
        ).count(),
    )
    sd_emb.unpersist()

    # many-zone regime (r4 budget raise 4096→65536 zones): the per-zone
    # vectorized bbox broadcast kernel vs the salted shuffle on 10k hex
    # zones × 1M points — broadcast won at every count measured (see
    # geo/pip.py _KERNEL_ZONE_BUDGET notes; a grid-indexed kernel measured
    # 3.7× slower and is documented as a negative result)
    import numpy as np

    zrows = []
    zrng = np.random.default_rng(5)
    for z in range(10_000):
        zcx = -20.0 + (z % 100) * 0.4 + zrng.uniform(0, 0.1)
        zcy = 30.0 + (z // 100) * 0.25 + zrng.uniform(0, 0.05)
        ang = np.linspace(0, 2 * np.pi, 7)
        ring = [[float(zcx + 0.35 * np.cos(a)), float(zcy + 0.35 * np.sin(a))] for a in ang]
        zrows.append((z, [ring]))
    many_zones = spark.createDataFrame(
        zrows, "zone_id long, rings array<array<array<double>>>"
    ).persist()
    many_zones.count()
    many_pts = spark.range(1_000_000).select(
        F.col("id").alias("pid"),
        ((F.col("id") * 7919 % 400000).cast("double") / 10000.0 - 20.0).alias("lon"),
        ((F.col("id") * 104729 % 250000).cast("double") / 10000.0 + 30.0).alias("lat"),
    ).repartition(64).persist()
    many_pts.count()
    steady_state(
        "pip_broadcast_10k_zones",
        pip.assign_zones_broadcast(many_pts, many_zones),
        max_runs=3, min_runs=2,
    )
    steady_state(
        "pip_shuffle_10k_zones_control",
        pip.assign_zones_shuffle(many_pts, many_zones, res=8),
        max_runs=3, min_runs=2,
    )
    many_zones.unpersist()
    many_pts.unpersist()

    # spatial layout: Z-order clustered vs row-ordered control, same logical
    # bbox query (io/layout) — the write pays once, every later scan prunes
    from morituri_spark.io import layout as LAY

    lay_pts = spark.range(N_LAYOUT).select(
        F.col("id").alias("pid"),
        ((F.col("id") * 7919 % 360000).cast("double") / 1000.0 - 180.0).alias("lon"),
        ((F.col("id") * 104729 % 180000).cast("double") / 1000.0 - 90.0).alias("lat"),
    )
    LAY.write_spatial(lay_pts, "/tmp/bench_layout_clustered", res_part=3, res_sort=14)
    (
        lay_pts.withColumn("zorder", LAY.zorder_col(F.col("lon"), F.col("lat"), 14))
        .withColumn("cell_p", C.cell_col(F.col("lon"), F.col("lat"), 3))
        .write.mode("overwrite").parquet("/tmp/bench_layout_control")
    )
    bbox = (-30.0, -45.0, 60.0, 30.0)
    clustered_q = LAY.read_bbox(spark, "/tmp/bench_layout_clustered", *bbox)
    control_q = LAY.read_bbox(
        spark, "/tmp/bench_layout_control", *bbox, res_part=3, res_sort=14, lon="lon", lat="lat"
    )
    steady_state("layout_bbox_clustered", clustered_q, max_runs=3, min_runs=2)
    steady_state("layout_bbox_roworder_control", control_q, max_runs=3, min_runs=2)
    # Hilbert twin on the identical points: same read machinery, curve
    # dispatched from the layout meta; the scale delta shows up in the
    # prune ratios below, not warm local wall-clock
    from morituri_spark.io import hilbert as HIL

    LAY.write_spatial(
        lay_pts, "/tmp/bench_layout_hilbert", res_part=3, res_sort=14, curve="hilbert"
    )
    steady_state(
        "layout_bbox_hilbert",
        LAY.read_bbox(spark, "/tmp/bench_layout_hilbert", *bbox),
        max_runs=3, min_runs=2,
    )
    # wall-clock here is page-cache-warm local IO; the scale currency is
    # bytes NOT read — the row-group overlap ratio below (cold object-store
    # scans pay for every non-pruned group)
    prune = LAY.prune_stats("/tmp/bench_layout_clustered", LAY.morton_ranges(*bbox, 14))
    prune_h = LAY.prune_stats("/tmp/bench_layout_hilbert", HIL.hilbert_ranges(*bbox, 14))

    # geocell encode throughput: Catalyst form (codegen) vs Arrow kernel
    timed(
        "geocell_encode_catalyst",
        lambda: images.select(C.cell_col(F.col("lon"), F.col("lat"), 12).alias("c"))
        .agg(F.max("c")).collect(),
    )
    timed(
        "geocell_encode_arrow",
        lambda: images.select(C.cell_udf(12)(F.col("lon"), F.col("lat")).alias("c"))
        .agg(F.max("c")).collect(),
    )

    # image payload codec path (decode-free phash/encode at smaller n)
    timed(
        "image_payload_synthesis",
        lambda: synth.images_table(spark, N_PAYLOAD, partitions=cpus, px=16)
        .agg(F.sum(F.length("bytes")), F.max("phash")).collect(),
    )

    # ViT patch tokenization (r5): real PNG/FJPG decode → 16×16 patch grid
    # rows with integer sums + layout checksum; decode dominates, fan-out
    # is 4 rows/image with no shuffle
    from morituri_spark.multimodal.ops import extract_patches

    patch_imgs = synth.images_table(spark, N_PAYLOAD, partitions=cpus, px=32).persist()
    patch_imgs.count()
    timed(
        "vit_patches_20k_images",
        lambda: extract_patches(patch_imgs, patch=16)
        .agg(F.sum("checksum"), F.count(F.lit(1))).collect(),
    )
    patch_imgs.unpersist()

    # relational headliners at sf
    timed(
        "pricing_summary",
        lambda: li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.avg("l_extendedprice"), F.count(F.lit(1)))
        .collect(),
    )
    from pyspark.sql.window import Window

    timed(
        "window_lead_delta",
        lambda: ev.select(
            F.lead("value", 1)
            .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
            .alias("nxt")
        ).agg(F.sum("nxt")).collect(),
    )

    # event-analytics family at sf (one shuffle each: session_window agg /
    # union+window as-of fill)
    from morituri_spark.operators.asof import asof_join
    from morituri_spark.operators.sessions import sessionize

    timed("sessionize_gap", lambda: sessionize(ev).count())
    asof_left = ev.where(F.col("event_type") != "purchase").select("event_id", "user_id", "ts")
    asof_right = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts").agg(F.max("value").alias("pv"))
    )
    timed("asof_join_events", lambda: asof_join(asof_left, asof_right, on="user_id").count())

    # z-split operator throughput over synthetic z-heavy links
    # (inputs persisted first — generator time is not engine time)
    n_links = 20_000
    streets = synth.streets_table(spark, n=n_links, n_vertices=10).persist()
    streets.count()
    zl = synth.zlevels_table(
        spark, [(10_000 + i, [0, 1, 1, 0, 0, 2, 2, 0, 3, 0]) for i in range(n_links)]
    ).persist()
    zl.count()
    from morituri_spark.operators import streets as ST

    timed("zsplit_20k_links", lambda: ST.street_ways(streets, zl).count())

    # 10× scale stress: shows the Arrow-kernel z-split's headroom under the
    # measured ~4.5M rows/s/node Python ceiling (input is one row per LINK,
    # not per vertex) — expect ~linear in links
    n_stress = 200_000
    streets_xl = synth.streets_table(spark, n=n_stress, n_vertices=10).persist()
    streets_xl.count()
    zl_xl = synth.zlevels_table(
        spark, [(10_000 + i, [0, 1, 1, 0, 0, 2, 2, 0, 3, 0]) for i in range(n_stress)]
    ).persist()
    zl_xl.count()
    timed("zsplit_200k_links", lambda: ST.street_ways(streets_xl, zl_xl).count())
    streets_xl.unpersist()
    zl_xl.unpersist()

    # text dedup at sf documents
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from morituri_spark.text.dedup import minhash_near_duplicates

    timed("minhash_near_dup", lambda: minhash_near_duplicates(docs, threshold=0.5).count())

    # 10× corpus stress at ~50k docs: replica k remaps the 9 most common
    # letters (rotation k of 'etaoinshr'), so WITHIN a replica the corpus's
    # near-dup structure is preserved while ACROSS replicas shingles share
    # almost nothing — output pairs scale ~10×, not quadratically (a
    # suffix-only variant made every replica family a near-dup clique:
    # 45 true pairs per doc — a different, output-bound benchmark)
    alph = "etaoinshr"
    tx = F.col("text")
    for k in range(1, 10):
        tx = F.when(F.col("k") == k, F.translate("text", alph, alph[k:] + alph[:k])).otherwise(tx)
    docs_xl = (
        docs.select(
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias("k"), "doc_id", "text"
        )
        .select((F.col("doc_id") + F.col("k") * 1_000_000).alias("doc_id"), tx.alias("text"))
        .persist()
    )
    docs_xl.count()
    # sig_prefilter: the corpus is dense in just-below-threshold pairs
    # (2.8M candidates → 8k true pairs), so the signature-agreement
    # prefilter cuts the exact-verify join ~50× — measured identical
    # output on this corpus (8072 pairs with and without)
    timed(
        "minhash_near_dup_50k_docs",
        lambda: minhash_near_duplicates(
            docs_xl, threshold=0.5, sig_prefilter_margin=0.15
        ).count(),
    )

    # r5 continuation: cross-doc duplicated-substring spans over the same
    # 50k corpus — positional 20-grams (stride 4), the (doc,gram) pair agg
    # + gram-partitioned window + doc rollup; and benchmark decontamination
    # (gram set of a 1/7 slice broadcast against the rest). The corpus is
    # re-partitioned first: docs_xl is a single-partition parquet explode
    # (a bench artifact — real corpora scan as thousands of splits), and
    # the per-doc gram explosion is map-side work that would otherwise
    # serialize onto one core.
    from morituri_spark.text.decontam import decontaminate, duplicate_span_stats

    docs_xlp = docs_xl.repartition(cpus * 2).persist()
    docs_xlp.count()
    timed(
        "duplicate_spans_50k_docs",
        lambda: duplicate_span_stats(docs_xlp, k=20, stride=4).agg(
            F.sum("n_dup_windows")
        ).collect(),
    )
    timed(
        "decontaminate_50k_docs",
        lambda: decontaminate(
            docs_xlp, docs_xlp.where("doc_id % 7 = 3"), n=13
        ).agg(F.sum("n_hits")).collect(),
    )
    # r5 ninth session: bigram-LM perplexity over the same 50k corpus —
    # tokenize + per-doc lead window + three map-side aggs + one
    # (w1, w2)-keyed stats join; the agg consumes BOTH computed columns
    # (rule 18)
    from morituri_spark.text.lm import lm_nll_scores

    timed(
        "lm_perplexity_50k_docs",
        lambda: lm_nll_scores(docs_xlp).agg(
            F.sum("nll_micro"), F.sum("n_bigrams")
        ).collect(),
    )
    docs_xlp.unpersist()
    docs_xl.unpersist()

    # budget-mixture sampler at 8M rows / 4 domains: the two-pass bucketed
    # prefix (full-parallel agg + window over ONLY the boundary bucket)
    # vs the naive per-domain window cumsum (4 domains -> 4 sort tasks, 28
    # of 32 cores idle). The aggregate CONSUMES the selection (rule 18).
    from morituri_spark.text.dedup import MERSENNE31, affine_hash_params
    from morituri_spark.text.sampling import mixture_by_budget

    mix = spark.range(8_000_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("dom"),
        (F.col("id") % 997 + 3).alias("tok"),
    ).persist()
    mix.count()
    mix_budgets = {str(d): 200_000_000 for d in range(4)}
    timed(
        "mixture_budget_8m_two_pass",
        lambda: mixture_by_budget(mix, "dom", mix_budgets, "tok", "k")
        .agg(F.sum("n_tokens")).collect(),
    )

    def mixture_naive():
        from pyspark.sql.window import Window

        a, b = affine_hash_params(1, seed=42)[0]
        h = (F.lit(a) * F.pmod(F.col("k"), F.lit(MERSENNE31)) + F.lit(b)) % F.lit(MERSENNE31)
        w = Window.partitionBy("dom").orderBy(h.asc(), "k")
        return (
            mix.withColumn("_cb", F.sum("tok").over(w) - F.col("tok"))
            .where(F.col("_cb") < 200_000_000)
            .agg(F.sum("tok")).collect()
        )

    timed("mixture_budget_8m_naive_window_control", mixture_naive)

    # fixed-size weighted sampling (E-S top-k) on the same 8M corpus:
    # 4 strata → the plain window is 4 sort tasks; the salted pre-reduce
    # A/B prices the knn-style two-stage trade at this shape
    from morituri_spark.text.sampling import weighted_topk_sample

    mix_w = mix.withColumn("w", (F.col("tok").cast("double")) / F.lit(1000.0))
    timed(
        "weighted_topk_8m_4strata",
        lambda: weighted_topk_sample(mix_w, "dom", "k", "w", k=1000)
        .agg(F.sum("k")).collect(),
    )
    timed(
        "weighted_topk_8m_4strata_salt32",
        lambda: weighted_topk_sample(mix_w, "dom", "k", "w", k=1000, salt=32)
        .agg(F.sum("k")).collect(),
    )
    mix.unpersist()

    # polygon-polygon overlay at 5k x 5k zones: cover equi-join candidates
    # (~4 true overlaps per zone) + S-H clip kernel refine — the cost is
    # the cover join + one Arrow pass over ~20k pairs, never 25M pairs
    from morituri_spark.geo.overlay import polygon_overlap_join

    ogrid = spark.range(5_000).selectExpr(
        "id AS zone_id",
        "CAST(id % 100 AS DOUBLE) * 0.2 AS x0",
        "CAST(id DIV 100 AS DOUBLE) * 0.2 + 40.0 AS y0",
    ).selectExpr(
        "zone_id",
        "array(array(array(x0, y0), array(x0 + 0.2, y0), array(x0 + 0.2, y0 + 0.2), array(x0, y0 + 0.2), array(x0, y0))) AS rings",
    ).persist()
    ogrid.count()
    ogrid_b = spark.range(5_000).selectExpr(
        "id AS zone_id",
        "CAST(id % 100 AS DOUBLE) * 0.2 + 0.07 AS x0",
        "CAST(id DIV 100 AS DOUBLE) * 0.2 + 40.09 AS y0",
    ).selectExpr(
        "zone_id",
        "array(array(array(x0, y0), array(x0 + 0.2, y0), array(x0 + 0.2, y0 + 0.2), array(x0, y0 + 0.2), array(x0, y0))) AS rings",
    ).persist()
    ogrid_b.count()
    timed(
        "polygon_overlap_5kx5k",
        lambda: polygon_overlap_join(ogrid, ogrid_b, res=11).count(),
    )
    ogrid.unpersist()
    ogrid_b.unpersist()

    # polyline -> zone length attribution over the sf events (one keyed
    # window for segments+midpoints, broadcast PIP, map-side rollup)
    from morituri_spark.geo.measures import segment_zone_lengths

    path_pts = ev.select(
        "user_id", "ts", "event_id",
        (F.col("event_id") * 7919 % 360000 / 1000.0 - 180).alias("lon"),
        (F.col("event_id") * 104729 % 180000 / 1000.0 - 90).alias("lat"),
    )
    timed(
        "segment_zone_lengths_events",
        lambda: segment_zone_lengths(
            path_pts, zones.select("zone_id", "rings"), "user_id", ["ts", "event_id"]
        ).count(),
    )

    # iterative connected components: ~120k mixed chain/random edges →
    # large-star/small-star rounds with per-round localCheckpoint
    from morituri_spark.text.components import connected_components

    cc_e1 = spark.range(100_000).selectExpr("id AS a", "id + 1 AS b").where("id % 50 != 49")
    cc_e2 = spark.range(100_000).selectExpr(
        "CAST(hash(id) % 150000 AS LONG) AS a",
        "CAST(hash(id + 7) % 150000 AS LONG) AS b",
    ).where("a >= 0 AND b >= 0")
    cc_edges = cc_e1.union(cc_e2).persist()
    cc_edges.count()
    timed("connected_components_120k_edges", lambda: connected_components(cc_edges).count())
    cc_edges.unpersist()

    # 8.3× the edges (same chain/random mix) — r3 verdict asked for scale
    # evidence that the 120k time is round-overhead, not per-edge work:
    # sub-linear growth here (measured 15.5s→26.5s, 1.7×) is the log-round
    # convergence signature
    cc_x1 = spark.range(1_000_000).selectExpr("id AS a", "id + 1 AS b").where("id % 50 != 49")
    cc_x2 = spark.range(1_000_000).selectExpr(
        "CAST(hash(id) % 1250000 AS LONG) AS a",
        "CAST(hash(id + 7) % 1250000 AS LONG) AS b",
    ).where("a >= 0 AND b >= 0")
    cc_edges_xl = cc_x1.union(cc_x2).persist()
    cc_edges_xl.count()
    timed("connected_components_1m_edges", lambda: connected_components(cc_edges_xl).count())
    cc_edges_xl.unpersist()

    # integer-exact PageRank (r5): 500k nodes / ~1.5M edges x 6 rounds —
    # each round is one src-join + one dst-sum + one node left join, rank
    # state localCheckpointed (rule 14). The agg consumes rank (rule 18).
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
    )
    pr_edges.unpersist()

    # r5 ninth session: weighted multi-source shortest paths — 200k nodes /
    # ~600k edges, 4 sources. Fixed-DEPTH relaxation (8 rounds, the
    # PageRank-bench convention): full convergence on this instance is 27
    # rounds (offline Dijkstra cross-check) and is round-overhead-bound
    # like CC, so the bench prices per-round cost — one state⋈edges join
    # + struct-min agg + bit_xor signature — not instance diameter. The
    # agg consumes cost AND src (rule 18).
    from morituri_spark.graph.sssp import shortest_paths

    sp_ids = spark.range(200_000).select(F.col("id").alias("i"))
    sp_edges = (
        sp_ids.select(F.col("i").alias("src"), ((F.col("i") * 7 + 1) % 200_000).alias("dst"))
        .unionAll(sp_ids.select(F.col("i").alias("src"), ((F.col("i") * F.col("i") + 3) % 200_000).alias("dst")))
        .unionAll(sp_ids.select(F.col("i").alias("src"), ((F.col("i") + 1) % 200_000).alias("dst")))
        .where("src != dst")
        .select("src", "dst", ((F.col("src") * 3 + F.col("dst") * 5) % 13 + 1).alias("w"))
        .repartition(cpus * 2)
        .persist()
    )
    sp_edges.count()
    sp_sources = sp_ids.where("i % 50000 = 0").select(F.col("i").alias("node"))
    timed(
        "sssp_200k_nodes_8_round_cap",
        lambda: shortest_paths(sp_edges, sp_sources, max_rounds=8)
        .agg(F.sum("cost"), F.sum("src")).collect(),
    )
    sp_edges.unpersist()

    # r5 ninth session: Horn slope/aspect stencil over a 4M-cell DEM —
    # the 3x3 stencil as ONE scatter-aggregate (9x fan-out explode +
    # map-side-combined sums) instead of eight self-joins. spark.range
    # parallelizes the synth (rule 22 does not bite); the agg consumes
    # the integer numerators AND the quantized slope (rule 18).
    from morituri_spark.geo.terrain import slope_aspect

    dem = spark.range(4_000_000).select(
        (F.col("id") % 2000).alias("ix"),
        (F.col("id") / 2000).cast("long").alias("iy"),
        ((F.col("id") * 7 + (F.col("id") % 2000) * 13) % 997).alias("z"),
    ).persist()
    dem.count()
    timed(
        "dem_slope_aspect_4m_cells",
        lambda: slope_aspect(dem, cell_size=30.0)
        .agg(F.sum("gx_num"), F.sum("gy_num"), F.sum("slope_deg")).collect(),
    )
    dem.unpersist()

    # ANN top-k over embeddings
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    from morituri_spark.ml.simsearch import ann_topk_lsh

    timed(
        "ann_lsh_topk",
        lambda: ann_topk_lsh(
            emb.select(F.col("vec_id").alias("query_id"), "embedding").limit(100),
            emb, dim=64, k=5, n_bits=8,
        ).count(),
    )

    # persisted IVF index: build once (timed), then the partition-pruned
    # probe query vs the in-memory path that re-assigns the corpus per call
    from morituri_spark.ml.simsearch import (
        ann_topk_ivf, ann_topk_ivf_indexed, build_ivf_index, fixed_centroids,
    )

    qset = emb.select(F.col("vec_id").alias("query_id"), "embedding").limit(100).persist()
    qset.count()
    cents = fixed_centroids(16, 64)
    timed(
        "ann_ivf_index_build",
        lambda: build_ivf_index(emb, "/tmp/bench_ivf_idx", n_lists=16, centroids=cents),
    )
    timed(
        "ann_ivf_indexed_query",
        lambda: ann_topk_ivf_indexed(spark, "/tmp/bench_ivf_idx", qset, k=5, n_probe=2).count(),
    )
    timed(
        "ann_ivf_inmemory_control",
        lambda: ann_topk_ivf(qset, emb, k=5, n_lists=16, n_probe=2, centroids=cents).count(),
    )
    qset.unpersist()

    # pair-scoring tail at 10M candidate pairs (r3 verdict item #2): the
    # cogrouped matmul kernel (the production tail since r4) vs the
    # interpreted-HOF per-pair fold it replaced. 4k queries × 80k
    # candidates spread over 32 synthetic buckets → exactly 10M scored
    # pairs through each path.
    NB = 32
    ps_cand = spark.range(80_000).select(
        F.col("id").alias("vec_id"), (F.col("id") % NB).alias("bucket"),
        F.expr(
            "transform(sequence(1, 64), i -> CAST(sin((id + 1) * i) AS FLOAT))"
        ).alias("embedding"),
    ).repartition(32).persist()
    ps_cand.count()
    ps_q = spark.range(4_000).select(
        F.col("id").alias("query_id"), (F.col("id") % NB).alias("bucket"),
        F.expr(
            "transform(sequence(1, 64), i -> CAST(cos((id + 17) * i) AS FLOAT))"
        ).alias("embedding"),
    ).persist()
    ps_q.count()

    from morituri_spark.ml.simsearch import _cogroup_score_topk

    def pair_kernel():
        eb = ps_cand.withColumnRenamed("embedding", "_cand_vec")
        return _cogroup_score_topk(
            ps_q, eb, "bucket", 5, "query_id", "vec_id", "embedding"
        ).count()

    def pair_hof():
        from pyspark.sql.window import Window

        paired = ps_q.join(ps_cand.withColumnRenamed("embedding", "_cand_vec"), "bucket")
        dot = F.aggregate(
            F.zip_with(
                F.col("embedding"), F.col("_cand_vec"),
                lambda a, b: a.cast("double") * b.cast("double"),
            ),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        nv = F.sqrt(F.aggregate(
            F.col("embedding"), F.lit(0.0),
            lambda a, x: a + x.cast("double") * x.cast("double")))
        nc = F.sqrt(F.aggregate(
            F.col("_cand_vec"), F.lit(0.0),
            lambda a, x: a + x.cast("double") * x.cast("double")))
        w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
        return (
            paired.withColumn("cosine", F.round(dot / (nv * nc), 6))
            .withColumn("rank", F.row_number().over(w) - 1)
            .where(F.col("rank") < 5)
            .count()
        )

    timed("ann_pair_scoring_kernel_10m", pair_kernel)
    timed("ann_pair_scoring_kernel_10m_warm", pair_kernel)
    timed("ann_pair_scoring_hof_control_10m", pair_hof)
    ps_cand.unpersist()
    ps_q.unpersist()

    # PQ/ADC exhaustive scan (r5): 32 queries × 500k candidates. NOTE the
    # honest shape of this pair: the PQ entry RE-ENCODES the corpus every
    # run (encode is really a one-time index-build cost — see
    # build_ivfpq_index), so at this scale the warm float matmul control
    # can WIN locally (measured clean: pq encode+scan 13.5s warm vs float
    # 6.4s; ADC scan-only over pre-encoded persisted codes is 2.3-2.6s).
    # PQ's structural win is held/moved candidate state of m=8 small ints
    # instead of 64 floats — at 100 TB, 3 TB of codes scanned per query
    # batch instead of 100 TB of vectors.
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

    def pq_scan():
        return ann_topk_pq(
            pq_q, pq_cand, k=10, codebooks=pq_books, parity=False
        ).count()

    def float_scan():
        qb = pq_q.withColumn("bucket", F.lit(0))
        eb = (
            pq_cand.withColumn("bucket", F.lit(0))
            .withColumnRenamed("embedding", "_cand_vec")
        )
        return _cogroup_score_topk(
            qb, eb, "bucket", 10, "query_id", "vec_id", "embedding"
        ).count()

    timed("ann_pq_encode_scan_500k_32q", pq_scan)
    timed("ann_pq_encode_scan_500k_32q_warm", pq_scan)
    timed("ann_float_scan_control_500k_32q", float_scan)
    pq_cand.unpersist()
    pq_q.unpersist()

    # density-tile PNG rendering (r5 tenth session): 4M points → res-10
    # pixel bins → 4096 res-6 tiles rendered through the real PNG codec.
    # Points collapse at the first map-side-combinable aggregate; the
    # render kernel is grid-bounded (≤256 structs per tile row), so this
    # measures the two aggs + 4096 codec round-trips, not point volume.
    from morituri_spark.geo.render import render_density_tiles

    rt_pts = (
        spark.range(4_000_000)
        .select(
            ((F.col("id") * 7919 % 360000).cast("double") / 1000.0 - 180.0).alias("lon"),
            ((F.col("id") * 104729 % 180000).cast("double") / 1000.0 - 90.0).alias("lat"),
        )
        .repartition(cpus * 2)
        .persist()
    )
    rt_pts.count()
    timed(
        "render_tiles_4m_points",
        lambda: render_density_tiles(rt_pts, tile_res=6, px_bits=4)
        .agg(F.count(F.lit(1)), F.sum("decoded_sum"), F.bit_xor("px_checksum"))
        .collect(),
    )
    rt_pts.unpersist()

    # augmentation sweep (r5 tenth session): 6k real 16×16 PNGs × 6 exact
    # pixel permutations, each re-encoded AND re-decoded through the real
    # codec inside one scan-shaped kernel — 72k codec calls; the agg
    # consumes checksum so the kernel isn't pruned (rule 18).
    from morituri_spark.multimodal.ops import augment_images

    def gen_aug(batches):
        ys, xs = np.mgrid[0:16, 0:16]
        from morituri_spark.sources import images as I

        for pdf in batches:
            rows = {"image_id": [], "bytes": [], "fmt": [], "w": [], "h": []}
            for i in pdf["i"]:
                i = int(i)
                arr = np.empty((16, 16, 3), dtype=np.uint8)
                arr[:, :, 0] = (i + 2 * ys + 3 * xs) % 256
                arr[:, :, 1] = (2 * i + ys + 5 * xs) % 256
                arr[:, :, 2] = (3 * i + 4 * ys + xs) % 256
                rows["image_id"].append(f"img{i:08d}")
                rows["bytes"].append(I.encode(arr, "png"))
                rows["fmt"].append("png")
                rows["w"].append(16)
                rows["h"].append(16)
            import pandas as _pd

            yield _pd.DataFrame(rows)

    aug_imgs = (
        spark.range(6000)
        .select(F.col("id").alias("i"))
        .repartition(cpus)
        .mapInPandas(gen_aug, "image_id string, bytes binary, fmt string, w int, h int")
        .persist()
    )
    aug_imgs.count()
    timed(
        "augment_6k_images_6ops",
        lambda: augment_images(aug_imgs)
        .agg(F.count(F.lit(1)), F.sum("checksum")).collect(),
    )
    aug_imgs.unpersist()

    # exact heavy hitters (r5 tenth session): 20M strings, 20 planted hot
    # items over a ~2M-distinct tail; threshold 1/100. Pass A is the
    # per-task Misra-Gries fold (bounded memory, ≤ capacity rows out per
    # task); pass B re-scans and counts only broadcast-matched rows —
    # candidate generation never shuffles the tail's 2M distinct keys.
    from morituri_spark.text.heavyhitters import frequent_items

    hh_df = (
        spark.range(20_000_000)
        .select(
            F.when(
                F.col("id") % 3 == 0, F.concat(F.lit("hot"), (F.col("id") % 20).cast("string"))
            )
            .otherwise(
                F.concat(F.lit("t"), F.pmod(F.xxhash64("id"), F.lit(2_000_000)).cast("string"))
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
    )
    hh_df.unpersist()

    # DTW track-similarity join (r5 tenth session): 4k tracks × 24 points
    # in 500 clusters of 8 → head-to-head radius candidates ≈ 14k pairs,
    # each refined by the O(min(n,m))-memory anti-diagonal DP (47
    # diagonals of vectorized cells per pair). The agg consumes dtw_km
    # (rule 18).
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
    )
    dtw_tracks.unpersist()

    # HMM map-matching (r5 tenth session): 10k tracks × 12 steps over 30k
    # segments — snap candidates through the cell equi-join, then one
    # track-keyed viterbi exchange; the DP is vectorized int64 per track
    # (cost is applyInPandas group overhead × tracks, not points).
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
    )
    hmm_pts.unpersist()
    hmm_segs.unpersist()

    # sort-free exact quantiles (r5 tenth session) vs the buffering
    # percentile() control: 20M longs over a 2^40 domain. The refinement
    # path is ~4 rounds of one tiny (q, bucket) aggregate; the control
    # collects all values into ONE aggregation buffer (fine at 20M on one
    # box — the pair documents the shapes, the 10^12 argument is that the
    # control's buffer and the sort-rank's shuffle do not exist here).
    from morituri_spark.operators.quantiles import exact_quantiles

    qn_df = (
        spark.range(20_000_000)
        .select(((F.col("id") * 2654435761) % 1099511627776).alias("v"))
        .repartition(cpus * 2)
        .persist()
    )
    qn_df.count()
    timed(
        "quantiles_nosort_20m",
        lambda: exact_quantiles(qn_df, "v", [0.01, 0.25, 0.5, 0.9, 0.99]),
    )
    timed(
        "quantiles_percentile_control_20m",
        lambda: qn_df.agg(
            F.expr("percentile(v, array(0.01D, 0.25D, 0.5D, 0.9D, 0.99D))")
        ).collect(),
    )

    # Merkle table diff (r5 tenth session) vs the full-join control: two
    # 20M-row tables differing in ~34k rows. Bucket count must exceed the
    # diff count (every diff dirties a bucket, and dirty buckets rescan):
    # at the 4096 default here EVERY bucket dirties and the sketch
    # degenerates to a worse full join (measured 9.1s vs 3.7s at 2M) —
    # 1M buckets keeps the rescan to ~3% of rows. Summaries stay tiny
    # (1M rows per side).
    from morituri_spark.io.reconcile import diff_tables

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
    timed(
        "table_diff_20m_sketch",
        lambda: diff_tables(ta, tb, ["k"], n_buckets=1_000_000).count(),
    )
    timed(
        "table_diff_20m_fulljoin_control",
        lambda: ta.alias("a").join(tb.alias("b"), "k", "full")
        .where(
            F.col("a.x").isNull() | F.col("b.x").isNull()
            | (F.col("a.x") != F.col("b.x"))
        )
        .count(),
    )
    ta.unpersist()
    tb.unpersist()
    qn_df.unpersist()

    # Hough line voting (r5 eleventh session): 20M points × 8 angles
    # through ONE map-side-combinable accumulator groupBy — each task
    # pre-collapses its 160M votes to ≤ 8·n_bins partial cells, so the
    # exchange is accumulator-sized (~28k cells/task here) no matter the
    # input size; the scan+codegen vote arithmetic is the whole cost.
    from morituri_spark.geo.hough import hough_votes

    hg_pts = (
        spark.range(20_000_000)
        .select(
            ((F.col("id") * 7) % 9973).cast("double").alias("x"),
            ((F.col("id") * 13) % 9941).cast("double").alias("y"),
        )
        .repartition(cpus * 2)
        .persist()
    )
    hg_pts.count()
    timed(
        "hough_votes_20m",
        lambda: hough_votes(hg_pts, n_theta=8, rho_step=4.0)
        .agg(F.count(F.lit(1)), F.sum("votes"), F.sum("rho_bin"))
        .collect(),
    )
    hg_pts.unpersist()

    # Polygon dissolve (r5 eleventh session): 4M unit cells (2000×2000
    # grid, 1600 groups of 50×50) dissolved by shared-edge cancellation —
    # one O(edges)=16M narrow-row exchange with map-side partial
    # aggregation, no geometry library, no pairwise unions. The per-cell
    # shoelace HOF runs on 5-point rings (off the hot path, rule 8).
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
    )
    dis_cells.unpersist()

    # texture/filter/moments kernels (r5 thirteenth session): one shared
    # 50k real-PNG corpus, decode-dominated scan-shaped kernels; every
    # aggregate CONSUMES the kernel outputs (rule 18 — a count would let
    # Catalyst prune the kernel away)
    from morituri_spark.multimodal.filters import (
        median_filter_stats as _mfs,
        template_match_sad as _tms,
    )
    from morituri_spark.multimodal.moments import image_moments as _imom
    from morituri_spark.multimodal.texture import (
        glcm_features as _glcm,
        lbp_histogram as _lbp,
        run_length_hist as _rlh,
    )

    tex_imgs = synth.images_table(
        spark, 50_000, partitions=cpus * 2, px=16
    ).persist()
    tex_imgs.count()
    timed(
        "glcm_50k_images",
        lambda: _glcm(tex_imgs)
        .agg(F.sum("contrast"), F.sum("energy_sq"), F.sum("homog840"))
        .collect(),
    )
    timed(
        "lbp_50k_images",
        lambda: _lbp(tex_imgs)
        .agg(F.bit_xor(F.xxhash64("image_id", "code", "cnt")))
        .collect(),
    )
    timed(
        "run_length_50k_images",
        lambda: _rlh(tex_imgs)
        .agg(F.bit_xor(F.xxhash64("image_id", "run_len", "cnt")))
        .collect(),
    )
    timed(
        "median_filter_50k_images",
        lambda: _mfs(tex_imgs).agg(F.sum("chk_pos"), F.sum("sum_med")).collect(),
    )
    timed(
        "template_sad_50k_images",
        lambda: _tms(tex_imgs).agg(F.sum("sad"), F.sum("y0"), F.sum("x0")).collect(),
    )
    timed(
        "image_moments_50k_images",
        lambda: _imom(tex_imgs).agg(F.sum("mu20n"), F.sum("mu11n")).collect(),
    )
    from morituri_spark.multimodal.thinning import thinning_stats as _thin

    timed(
        "thinning_50k_images_8_steps",
        lambda: _thin(tex_imgs, n_steps=8)
        .agg(F.sum("chk_skel"), F.sum("n_deleted"))
        .collect(),
    )
    from morituri_spark.multimodal.edges import orientation_histogram as _ohist

    timed(
        "orientation_hist_50k_images",
        lambda: _ohist(tex_imgs)
        .agg(F.sum("sum_mag"), F.sum("n_pixels"))
        .collect(),
    )
    tex_imgs.unpersist()

    # separable box filter (r5 thirteenth session): 16.7M cells as 4096
    # keyed 64×64 rasters — TWO range-frame windows whose running state
    # is O(r) per partition; the 25-way self-join this replaces would
    # shuffle 25 candidate rows per cell
    from morituri_spark.geo.terrain import box_filter

    bf_dem = (
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
    bf_dem.count()
    timed(
        "box_filter_16m_cells",
        lambda: box_filter(bf_dem, radius=2, keys=["g"])
        .agg(F.sum("box_sum"), F.sum("box_n"))
        .collect(),
    )
    bf_dem.unpersist()

    # ridge visibility (r5 thirteenth session): same 16.7M-cell grid
    # shape — one running-max window + one partial-agg groupBy replaces
    # the O(width²) per-row self-join
    from morituri_spark.geo.terrain import ridge_visibility

    rv_dem = (
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
    rv_dem.count()
    timed(
        "ridge_visibility_16m_cells",
        lambda: ridge_visibility(rv_dem, eye_height=2, keys=["g"])
        .agg(F.sum("n_visible"), F.sum("chk_x"))
        .collect(),
    )
    rv_dem.unpersist()

    # frequent pairs (r5 thirteenth session): 2M basket-item rows, 200k
    # baskets × 2000 items — Apriori prune before the basket self-join
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
    )
    fp_rows.unpersist()

    # convoy detection (r5 thirteenth session): 20k entities × 100 ticks =
    # 2M points; candidates come from ONE (tick, cell) equi-join (probe
    # side ×9 cell explode), runs from one window + one partial-agg
    # groupBy on pair keys — no pair-level distinct anywhere
    from morituri_spark.geo.convoy import comovement_runs

    cv_pts = (
        spark.range(2_000_000)
        .selectExpr(
            "id % 20000 AS eid",
            "CAST(floor(id / 20000.0) AS BIGINT) AS t",
        )
        .selectExpr(
            "eid",
            "t",
            "eid % 4000 AS g",
            "CAST(floor(eid / 4000.0) AS BIGINT) AS k",
        )
        .selectExpr(
            "eid",
            "t",
            "(13 * g + 4 * t) % 40000 + k % 3"
            " + (CASE WHEN (eid + t) % 9 = 0 THEN 7 ELSE 0 END) AS x",
            "(7 * g + 3 * t) % 40000 + k % 2 AS y",
        )
        .repartition(cpus * 2)
        .persist()
    )
    cv_pts.count()
    timed(
        "convoy_2m_points",
        lambda: comovement_runs(cv_pts, radius=2, min_len=3, id_col="eid", t_col="t")
        .agg(F.count(F.lit(1)), F.sum("run_len"), F.sum("start_t"))
        .collect(),
    )
    cv_pts.unpersist()

    # DAG critical path (r5 thirteenth session): 50k nodes / ~500k edges,
    # min edge span 2500 bounds the depth at 20 relaxation rounds — the
    # known_depth fast path makes each round ONE job (join + max agg,
    # both map-side combinable), verified by a final fixpoint round
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
    )
    dag_edges.unpersist()

    # Kneser-Ney bigram LM (r5 thirteenth session) over the same 10×
    # replica corpus shape as the minhash stress (~50k docs): four
    # map-side-combinable aggregates + two aggregate-vs-aggregate joins
    from morituri_spark.text.lm import kn_bigram_probs

    kn_docs = (
        docs.select(
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias("k"), "doc_id", "text"
        )
        .select((F.col("doc_id") + F.col("k") * 1_000_000).alias("doc_id"), "text")
        .persist()
    )
    kn_docs.count()
    timed(
        "kn_bigram_50k_docs",
        lambda: kn_bigram_probs(kn_docs)
        .agg(F.sum("p_micro"), F.sum("cbg"), F.count(F.lit(1)))
        .collect(),
    )

    # multi-pattern hit counts (r5 thirteenth session) over the same 10×
    # corpus: broadcast dictionary, codegen replace-scan, no corpus
    # shuffle — cost is needles × one linear text pass per doc
    from morituri_spark.text.patterns import pattern_hit_counts

    pat_needles = spark.createDataFrame(
        [(n,) for n in ("the", "and", "ing", "ion", "ent", "for", "ate",
                        "tion", "er", "re", "data", "of")],
        "needle string",
    )
    timed(
        "pattern_hits_50k_docs",
        lambda: pattern_hit_counts(kn_docs, pat_needles)
        .agg(F.sum("hits"), F.count(F.lit(1)))
        .collect(),
    )
    kn_docs.unpersist()

    # time-series diagnostics (r5 fourteenth session): 20M rows as 200k
    # independent keyed series × 100 ticks — key count is the parallelism
    # axis; each entry is one per-key ordered window (or a small explode)
    # plus map-side-combinable aggregates, no self-join anywhere. The
    # planted shift at t>=60 and the mod-5 cycle keep the argmaxes
    # non-degenerate.
    from morituri_spark.operators.timeseries import (
        acf_lags,
        cusum_changepoints,
        dominant_period,
    )

    ts_rows = (
        spark.range(20_000_000)
        .selectExpr(
            "id % 200000 AS key",
            "CAST(floor(id / 200000.0) AS BIGINT) AS t",
        )
        .selectExpr(
            "key",
            "t",
            "key % 7 + (t * 3) % 5 + (CASE WHEN t >= 60 THEN 4 ELSE 0 END)"
            " + (key * t) % 3 AS v",
        )
        .repartition(cpus * 2)
        .persist()
    )
    ts_rows.count()
    timed(
        "cusum_20m_rows",
        lambda: cusum_changepoints(ts_rows)
        .agg(F.sum("cusum_abs_max"), F.sum("cp_rank"), F.count(F.lit(1)))
        .collect(),
    )
    timed(
        "acf_lag3_20m_rows",
        lambda: acf_lags(ts_rows, max_lag=3)
        .agg(F.sum("num"), F.sum("acf_micro"), F.count(F.lit(1)))
        .collect(),
    )
    timed(
        "dominant_period_20m_rows",
        lambda: dominant_period(ts_rows, periods=(2, 4, 5, 10, 20))
        .agg(F.sum("best_score"), F.sum("best_p"), F.count(F.lit(1)))
        .collect(),
    )
    # explode-path control: quantifies the buffer win (same checksums)
    timed(
        "dominant_period_20m_rows_explode_ctl",
        lambda: dominant_period(
            ts_rows, periods=(2, 4, 5, 10, 20), strategy="explode"
        )
        .agg(F.sum("best_score"), F.sum("best_p"), F.count(F.lit(1)))
        .collect(),
    )
    ts_rows.unpersist()

    # pipeline-plumbing trio (r5 fifteenth session): SCD2 history build
    # (20M change events, 500k keys — two ordered windows over one per-key
    # sort), sorted-neighborhood blocking (10M records, 20k blocks,
    # window 4 → ~30M candidate pairs from ONE window + stack, no
    # self-join), and the 4-direction viewshed (16.7M cells as 4096 keyed
    # 64×64 rasters — four running-max windows, two exchanges)
    from morituri_spark.geo.terrain import cardinal_viewshed
    from morituri_spark.operators.history import scd2_intervals
    from morituri_spark.text.blocking import sorted_neighborhood_pairs

    scd_rows = (
        spark.range(20_000_000)
        .selectExpr(
            "id % 500000 AS key",
            "CAST(floor(id / 500000.0) AS BIGINT) AS ts",
        )
        .selectExpr(
            "key", "ts",
            "(3 * CAST(floor(ts / 4.0) AS BIGINT) + key) % 7 AS v",
        )
        .repartition(cpus * 2)
        .persist()
    )
    scd_rows.count()
    timed(
        "scd2_intervals_20m_events",
        lambda: scd2_intervals(scd_rows)
        .agg(F.sum("version"), F.sum("valid_from"), F.count(F.lit(1)))
        .collect(),
    )
    scd_rows.unpersist()

    snm_recs = (
        spark.range(10_000_000)
        .selectExpr(
            "id",
            "id % 20000 AS blk",
            "concat('k', lpad(CAST((id * 13) % 9973 AS STRING), 4, '0'))"
            " AS sk",
        )
        .repartition(cpus * 2)
        .persist()
    )
    snm_recs.count()
    timed(
        "snm_blocking_10m_records",
        lambda: sorted_neighborhood_pairs(
            snm_recs, id_col="id", sort_col="sk", block_col="blk", window=4
        )
        .agg(F.sum("id_a"), F.sum("rank_dist"), F.count(F.lit(1)))
        .collect(),
    )
    snm_recs.unpersist()

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
    timed(
        "cardinal_viewshed_16m_cells",
        lambda: cardinal_viewshed(vs_dem, eye_height=2, keys=["g"])
        .agg(F.sum("dir_mask"), F.sum("n_dirs"), F.count(F.lit(1)))
        .collect(),
    )
    vs_dem.unpersist()

    # sixteenth session: FAST-9 corners (scan kernel, 50k real images),
    # geofence visit mining (2M trace points, convoy's shape — literal-edge
    # membership + gaps-and-islands, one exchange), MERGE upsert (20M
    # changes vs 5M-row snapshot — one max_by reduction + one join)
    from morituri_spark.geo.trajectory import geofence_visits
    from morituri_spark.multimodal.corners import fast_corners
    from morituri_spark.operators.history import merge_upsert

    fc_imgs = synth.images_table(
        spark, 50_000, partitions=cpus * 2, px=16
    ).persist()
    fc_imgs.count()
    timed(
        "fast_corners_50k_images",
        lambda: fast_corners(fc_imgs, t=30, arc=9)
        .agg(F.sum("n_corners"), F.sum("chk_yx"), F.count(F.lit(1)))
        .collect(),
    )
    fc_imgs.unpersist()

    gf_zone_rows = [
        (int(z), [[[x0, y0], [x0 + 5.0, y0], [x0 + 5.0, y0 + 5.0],
                   [x0, y0 + 5.0], [x0, y0]]])
        for z in range(25)
        for x0, y0 in [((z % 5) * 5.0, 40.0 + (z // 5) * 5.0)]
    ]
    gf_pts = (
        spark.range(2_000_000)
        .selectExpr(
            "id % 20000 AS key",
            "CAST(floor(id / 20000.0) AS BIGINT) AS t",
        )
        .selectExpr(
            "key", "t",
            "CAST((key * 7 + t * 3) % 300 AS DOUBLE) / 10.0 AS lon",
            "40.0 + CAST((key * 3 + t * 2) % 250 AS DOUBLE) / 10.0 AS lat",
        )
        .repartition(cpus * 2)
        .persist()
    )
    gf_pts.count()
    timed(
        "geofence_visits_2m_points",
        lambda: geofence_visits(gf_pts, gf_zone_rows)
        .agg(F.sum("n_points"), F.sum("dwell"), F.count(F.lit(1)))
        .collect(),
    )
    gf_pts.unpersist()

    mu_snap = (
        spark.range(5_000_000)
        .selectExpr("id AS key", "CAST(id % 97 AS STRING) AS v")
        .repartition(cpus * 2)
        .persist()
    )
    mu_chg = (
        spark.range(20_000_000)
        .selectExpr(
            "(id * 7) % 6000000 AS key",
            "CASE WHEN id % 9 = 0 THEN 'D' ELSE 'U' END AS op",
            "id AS seq",
            "CAST(id % 89 AS STRING) AS v",
        )
        .repartition(cpus * 2)
        .persist()
    )
    mu_snap.count(); mu_chg.count()
    timed(
        "merge_upsert_20m_changes",
        lambda: merge_upsert(mu_snap, mu_chg)
        .agg(F.bit_xor(F.xxhash64("key", "v")), F.count(F.lit(1)))
        .collect(),
    )
    mu_snap.unpersist(); mu_chg.unpersist()

    # seventeenth session: BRIEF descriptors (Harris response + 56-bit
    # pattern packing, scan kernel over 50k real images), AMDF pitch
    # (49-lag integer sweep over 20k decoded WAV clips), ring
    # self-intersection audit (1M quad rings through the segment
    # cell-cover candidate join + orientation refine)
    from morituri_spark.geo.overlay import ring_self_intersections
    from morituri_spark.multimodal.corners import brief_descriptors
    from morituri_spark.multimodal import audio as _audio

    bd_imgs = synth.images_table(
        spark, 50_000, partitions=cpus * 2, px=16
    ).persist()
    bd_imgs.count()
    timed(
        "brief_descriptors_50k_images",
        lambda: brief_descriptors(bd_imgs, k=5, n_bits=56, patch=4)
        .agg(
            F.bit_xor(F.xxhash64("image_id", "rank", "y", "x", "desc")),
            F.count(F.lit(1)),
        )
        .collect(),
    )
    bd_imgs.unpersist()

    def _amdf_clips(batches):
        import numpy as np
        import pandas as pd

        rate, n = 16_000, 4_000
        t = np.arange(n, dtype=np.float64)
        for pdf in batches:
            rows = {"audio_id": [], "bytes": []}
            for i in pdf["id"]:
                i = int(i)
                freq = 150.0 + (i % 700) * 0.5
                s = np.floor(
                    np.sin(((2 * np.pi) * freq) * t / rate) * 13106.8
                ).astype(np.int16)
                rows["audio_id"].append(f"clip{i:08d}")
                rows["bytes"].append(bytes(_audio.encode_wav(s, rate)))
            yield pd.DataFrame(rows)

    pa_clips = (
        spark.range(0, 20_000, numPartitions=cpus * 2)
        .mapInPandas(_amdf_clips, "audio_id string, bytes binary")
        .persist()
    )
    pa_clips.count()
    timed(
        "pitch_amdf_20k_clips",
        lambda: _audio.pitch_amdf(pa_clips, lag_min=16, lag_max=64)
        .agg(F.sum("amdf_min"), F.sum("best_lag"), F.count(F.lit(1)))
        .collect(),
    )
    pa_clips.unpersist()

    rsi_rings = (
        spark.range(1_000_000)
        .selectExpr(
            "id AS ring_id",
            "CAST((id * 7) % 10000 AS DOUBLE) AS x0",
            "CAST((id * 13) % 10000 AS DOUBLE) AS y0",
            "CAST(id % 2 AS DOUBLE) AS p",
        )
        .selectExpr(
            "ring_id",
            "array(array(x0, y0),"
            " array(x0 + 2.0D, y0 + 2.0D * p),"
            " array(x0 + 2.0D, y0 + 2.0D * (1.0D - p)),"
            " array(x0, y0 + 2.0D),"
            " array(x0, y0)) AS ring",
        )
        .repartition(cpus * 2)
        .persist()
    )
    rsi_rings.count()
    timed(
        "ring_self_intersections_1m_rings",
        lambda: ring_self_intersections(rsi_rings, "ring_id", "ring", 4.0)
        .agg(F.sum("i"), F.sum("j"), F.count(F.lit(1)))
        .collect(),
    )
    rsi_rings.unpersist()

    # eighteenth session: greedy NMS (5M boxes packed per image through
    # one exchange, integer-IoU greedy in the scan kernel), pred↔GT
    # matching (two packs + one co-partitioned join, 2M+2M boxes), and
    # COCO RLE over 100k packed 64×64 masks (no exchange at all)
    from morituri_spark.multimodal.detections import (
        match_detections,
        nms_boxes,
    )
    from morituri_spark.multimodal.masks import mask_rle_runs

    def _det_boxes_sql(n_img, per_img, shift=0):
        return (
            spark.range(n_img * per_img)
            .selectExpr(
                f"CAST(floor(id / {per_img}) AS BIGINT) AS i",
                f"id % {per_img} AS j",
            )
            .selectExpr(
                "printf('img%012d', i) AS image_id",
                "j AS box_id",
                f"(i * 3 + j * 17 + {shift}) % 48 AS x0",
                f"(i * 5 + j * 23 + {shift}) % 48 AS y0",
                f"(i * 3 + j * 17 + {shift}) % 48"
                f" + 4 + (i + 3 * j + {shift}) % 12 AS x1",
                f"(i * 5 + j * 23 + {shift}) % 48"
                f" + 4 + (2 * i + j + {shift}) % 10 AS y1",
                "(i * 7 + j * 31) % 100 AS score",
            )
            .repartition(cpus * 2)
        )

    nms_dets = _det_boxes_sql(500_000, 10).persist()
    nms_dets.count()
    timed(
        "nms_5m_boxes",
        lambda: nms_boxes(nms_dets, iou_thr_milli=300)
        .agg(
            F.bit_xor(F.xxhash64("image_id", "keep_rank", "box_id")),
            F.count(F.lit(1)),
        )
        .collect(),
    )
    nms_dets.unpersist()

    dm_preds = _det_boxes_sql(250_000, 8).persist()
    dm_gts = (
        _det_boxes_sql(250_000, 8, shift=2)
        .selectExpr("image_id", "box_id AS gt_id", "x0", "y0", "x1", "y1")
        .persist()
    )
    dm_preds.count(); dm_gts.count()
    timed(
        "detection_matches_4m_boxes",
        lambda: match_detections(dm_preds, dm_gts, iou_thr_milli=200)
        .agg(
            F.sum("iou_micro"),
            F.count("matched_gt"),
            F.count(F.lit(1)),
        )
        .collect(),
    )
    dm_preds.unpersist(); dm_gts.unpersist()

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
                rows["mask"].append(bytes(np.packbits(m.astype(np.uint8).ravel())))
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
    )
    rle_masks.unpersist()

    # nineteenth session: anchor assignment (pure-codegen grid explode +
    # integer IoU + one max_by exchange, 500k images × 4 GTs × 32
    # anchors), per-class AP (two windows over one per-class sort, 4M
    # predictions), BLEU clip counts (token n-gram hash-aggregate clip,
    # 500k caption pairs)
    from morituri_spark.multimodal.detections import (
        assign_anchors,
        average_precision,
    )
    from morituri_spark.text.metrics import bleu_clip_counts

    aa_gts = (
        _det_boxes_sql(500_000, 4, shift=2)
        .selectExpr("image_id", "box_id AS gt_id", "x0", "y0", "x1", "y1")
        .persist()
    )
    aa_gts.count()
    timed(
        "anchor_assign_500k_images",
        lambda: assign_anchors(
            aa_gts, grid_w=4, grid_h=4, cell=12,
            sizes=((8, 8), (12, 16)), pos_thr_milli=250,
        )
        .agg(
            F.bit_xor(F.xxhash64("image_id", "anchor_id", "matched_gt")),
            F.sum("iou_micro"),
            F.count(F.lit(1)),
        )
        .collect(),
    )
    aa_gts.unpersist()

    ap_matches = (
        spark.range(4_000_000)
        .selectExpr(
            "id % 16 AS cls",
            "(id * 7) % 100000 AS score",
            "id % 3 = 0 AS is_tp",
            "printf('img%09d', CAST(floor(id / 8.0) AS BIGINT)) AS image_id",
            "id % 8 AS box_id",
        )
        .repartition(cpus * 2)
        .persist()
    )
    ap_gt = spark.range(16).selectExpr("id AS cls", "(id + 1) * 90000 AS n_gt")
    ap_matches.count()
    timed(
        "detection_ap_4m_preds",
        lambda: average_precision(ap_matches, ap_gt)
        .agg(F.sum("ap_num_micro"), F.sum("n_tp"), F.count(F.lit(1)))
        .collect(),
    )
    ap_matches.unpersist()

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
    )
    bl_pairs.unpersist()

    # twentieth session: panoptic quality (3.6M RLE runs through the
    # binned interval_overlap_join + integer IoU), mosaic box remap
    # (20M boxes, pure codegen + one broadcast join)
    from morituri_spark.multimodal.detections import mosaic_boxes
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
    )
    pq_pred.unpersist(); pq_gt.unpersist()

    mo_boxes = (
        spark.range(20_000_000)
        .selectExpr(
            "CAST(floor(id / 3.0) AS BIGINT) AS img_idx",
            "id % 3 AS box_id",
        )
        .selectExpr(
            "img_idx", "box_id",
            "(img_idx * 3 + box_id * 17) % 50 AS x0",
            "(img_idx * 5 + box_id * 23) % 50 AS y0",
            "(img_idx * 3 + box_id * 17) % 50 + 4 + (img_idx + 3 * box_id) % 14 AS x1",
            "(img_idx * 5 + box_id * 23) % 50 + 4 + (2 * img_idx + box_id) % 12 AS y1",
            "(img_idx * 7 + box_id * 31) % 100 AS score",
        )
        .repartition(cpus * 2)
        .persist()
    )
    mo_crops = spark.range(1_700_000).selectExpr(
        "id AS mosaic_id", "(id * 13) % 64 AS cx", "(id * 29) % 64 AS cy"
    )
    mo_boxes.count()
    timed(
        "mosaic_20m_boxes",
        lambda: mosaic_boxes(mo_boxes, mo_crops, size=64, min_area=4)
        .agg(
            F.bit_xor(F.xxhash64("mosaic_id", "img_idx", "box_id", "x0", "y1")),
            F.count(F.lit(1)),
        )
        .collect(),
    )
    mo_boxes.unpersist()

    # twenty-first session: ring nesting (2M rings, per-group edge×point
    # ray cast), Hamilton apportionment over a 20M-row count pass (100k
    # strata bound the single-partition rank, not the row count), EXIF
    # box remap (20M boxes, pure codegen CASE)
    from morituri_spark.geo.overlay import ring_nesting_depth
    from morituri_spark.multimodal.detections import exif_orient_boxes
    from morituri_spark.text.sampling import apportion_budget

    rn_rings = (
        spark.range(2_000_000)
        .selectExpr(
            "CAST(floor(id / 4.0) AS BIGINT) AS p", "id % 4 AS r"
        )
        .selectExpr(
            "p AS poly_id", "r AS ring_id",
            "CAST((p * 7) % 50 + r + CASE WHEN r = 3 AND p % 2 = 1"
            " THEN 200 ELSE 0 END AS DOUBLE) AS cx",
            "CAST((p * 13) % 50 + r AS DOUBLE) AS cy",
            "CAST(40 - 10 * r AS DOUBLE) AS hs",
        )
        .selectExpr(
            "poly_id", "ring_id",
            "array(array(cx - hs, cy - hs), array(cx + hs, cy - hs),"
            " array(cx + hs, cy + hs), array(cx - hs, cy + hs),"
            " array(cx - hs, cy - hs)) AS ring",
        )
        .repartition(cpus * 2)
        .persist()
    )
    rn_rings.count()
    timed(
        "ring_nesting_2m_rings",
        lambda: ring_nesting_depth(rn_rings)
        .agg(
            F.sum("depth"),
            F.sum(F.when(F.col("role") == "hole", 1).otherwise(0)),
            F.count(F.lit(1)),
        )
        .collect(),
    )
    rn_rings.unpersist()

    ap_rows = (
        spark.range(20_000_000)
        .selectExpr("(id * 7) % 100000 AS stratum")
        .repartition(cpus * 2)
        .persist()
    )
    ap_rows.count()
    timed(
        "apportion_20m_rows",
        lambda: apportion_budget(
            ap_rows.groupBy("stratum").agg(F.count(F.lit(1)).alias("cnt")),
            1_000_000,
        )
        .agg(F.sum("alloc"), F.sum("extra"), F.count(F.lit(1)))
        .collect(),
    )
    ap_rows.unpersist()

    ex_boxes = (
        _det_boxes_sql(7_000_000, 3)
        .selectExpr(
            "image_id", "box_id", "x0", "y0", "x1", "y1", "score",
            "(CAST(substr(image_id, 4) AS BIGINT) % 8) + 1 AS orient",
            "64 AS w", "64 AS h",
        )
        .persist()
    )
    ex_boxes.count()
    timed(
        "exif_21m_boxes",
        lambda: exif_orient_boxes(ex_boxes)
        .agg(
            F.bit_xor(F.xxhash64("image_id", "box_id", "x0", "y1", "out_w")),
            F.count(F.lit(1)),
        )
        .collect(),
    )
    ex_boxes.unpersist()

    # twenty-second session: tracklet stitching (100k videos × 5 frames
    # × 3 boxes = 1.5M detections through frame-pair matching + CC
    # rounds), letterbox remap (21M boxes, pure codegen)
    from morituri_spark.multimodal.detections import (
        iou_tracklets,
        letterbox_boxes,
    )

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
    )
    tr_dets.unpersist()

    lb_boxes = (
        _det_boxes_sql(7_000_000, 3)
        .selectExpr(
            "image_id", "box_id", "x0", "y0", "x1", "y1", "score",
            "64 + CAST(substr(image_id, 4) AS BIGINT) % 40 AS w",
            "64 + (3 * CAST(substr(image_id, 4) AS BIGINT)) % 50 AS h",
        )
        .persist()
    )
    lb_boxes.count()
    timed(
        "letterbox_21m_boxes",
        lambda: letterbox_boxes(lb_boxes, size=640)
        .agg(
            F.bit_xor(F.xxhash64("image_id", "box_id", "x0", "y1", "pad_x")),
            F.count(F.lit(1)),
        )
        .collect(),
    )
    lb_boxes.unpersist()

    # twenty-third session: Spearman stats (20M score pairs, two rank
    # windows over one per-group sort), scene cuts (100k videos × 20
    # frames × 8 bins = 16M histogram rows through one self-join + one
    # cumulative window)
    from morituri_spark.ml.rankstats import spearman_stats
    from morituri_spark.multimodal.video import scene_cuts

    sp_rows = (
        spark.range(20_000_000)
        .selectExpr(
            "id % 64 AS g", "id",
            "(id * 7) % 1000000 AS x",
            "(id * 13 + id % 11) % 1000000 AS y",
        )
        .repartition(cpus * 2)
        .persist()
    )
    sp_rows.count()
    timed(
        "spearman_20m_pairs",
        lambda: spearman_stats(sp_rows, "g", "x", "y", "id")
        .agg(F.sum("sum_d2"), F.sum("n"), F.count(F.lit(1)))
        .collect(),
    )
    sp_rows.unpersist()

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
    )
    sc_hists.unpersist()

    # twenty-fourth session: retrieval-rank eval (20M scored pairs, one
    # window + one aggregate), K-fold assignment (20M rows, one rank
    # window per stratum)
    from morituri_spark.ml.rankstats import retrieval_ranks
    from morituri_spark.text.sampling import kfold_assign

    rr_scored = (
        spark.range(20_000_000)
        .selectExpr(
            "id % 1000000 AS query_id",
            "CAST(floor(id / 1000000.0) AS BIGINT) AS cand_id",
            "(id * 7) % 100000 AS score",
            "(id % 1000000 + CAST(floor(id / 1000000.0) AS BIGINT)) % 6 = 0"
            " AS is_rel",
        )
        .repartition(cpus * 2)
        .persist()
    )
    rr_scored.count()
    from morituri_spark.ml.rankstats import ndcg_stats

    timed(
        "ndcg_20m_pairs",
        lambda: ndcg_stats(
            rr_scored.selectExpr(
                "query_id", "cand_id", "score",
                "CASE WHEN is_rel THEN 1 + CAST(cand_id % 3 AS BIGINT)"
                " ELSE 0 END AS rel",
            ),
            k=10,
        )
        .agg(F.sum("dcg_micro"), F.sum("idcg_micro"), F.count(F.lit(1)))
        .collect(),
    )
    timed(
        "retrieval_ranks_20m_pairs",
        lambda: retrieval_ranks(rr_scored)
        .agg(
            F.sum("first_rel_rank"), F.sum("rel_in_top5"), F.count(F.lit(1))
        )
        .collect(),
    )
    rr_scored.unpersist()

    kf_rows = (
        spark.range(20_000_000)
        .selectExpr("id % 100000 AS stratum", "id")
        .repartition(cpus * 2)
        .persist()
    )
    kf_rows.count()
    timed(
        "kfold_20m_rows",
        lambda: kfold_assign(kf_rows, 10)
        .agg(F.bit_xor(F.xxhash64("stratum", "id", "fold")), F.count(F.lit(1)))
        .collect(),
    )
    kf_rows.unpersist()

    # twenty-fifth session: exact ROC-AUC (50M scored rows collapse to a
    # 64×59-value distinct relation before the cumulative window — the
    # pair sum never materializes), calibration bins (50M rows, ONE hash
    # aggregate), homography box remap (20M boxes, pure codegen)
    from morituri_spark.ml.rankstats import calibration_bins, roc_auc_stats
    from morituri_spark.multimodal.detections import homography_boxes

    ev_scored = (
        spark.range(50_000_000)
        .selectExpr(
            "id % 64 AS g",
            "CASE WHEN (id * 13) % 97 < 45 THEN 1 ELSE 0 END AS y",
            "(id * 31) % 1001 AS c",
        )
        .selectExpr("g", "(c * 50) div 1001 + y * 9 AS s", "y", "c")
        .repartition(cpus * 2)
        .persist()
    )
    ev_scored.count()
    timed(
        "roc_auc_50m_rows",
        lambda: roc_auc_stats(ev_scored, "g", "s", "y")
        .agg(F.sum("auc_num2"), F.sum("n_pos"), F.count(F.lit(1)))
        .collect(),
    )
    timed(
        "calibration_50m_rows",
        lambda: calibration_bins(ev_scored, "g", "c", "y", n_bins=10)
        .agg(F.sum("gap_num"), F.sum("sum_conf"), F.count(F.lit(1)))
        .collect(),
    )
    # twenty-sixth session: Brier stats share the same persisted input
    from morituri_spark.ml.rankstats import brier_stats

    timed(
        "brier_50m_rows",
        lambda: brier_stats(ev_scored, "g", "c", "y")
        .agg(F.sum("brier_num"), F.sum("n"), F.count(F.lit(1)))
        .collect(),
    )
    # twenty-seventh session: PR-curve points, same persisted input
    from morituri_spark.ml.rankstats import pr_curve_points

    timed(
        "pr_curve_50m_rows",
        lambda: pr_curve_points(ev_scored, "g", "s", "y")
        .agg(F.sum("tp"), F.sum("fp"), F.count(F.lit(1)))
        .collect(),
    )
    ev_scored.unpersist()

    # twenty-seventh session: mipmap pyramid (50M pixels ≈ 800 keyed
    # 256×256 rasters, 4 levels of hierarchical 4-to-1 rollup)
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
    )
    py_dem.unpersist()

    hg_boxes = (
        spark.range(20_000_000)
        .selectExpr(
            "printf('img%09d', id div 3) AS image_id",
            "id % 3 AS box_id",
            "(id * 3) % 400 AS x0",
            "(id * 5) % 400 AS y0",
            "(id * 3) % 400 + 4 + id % 120 AS x1",
            "(id * 5) % 400 + 4 + (2 * id) % 100 AS y1",
            "90 + id % 20 AS h00", "(id % 7) - 3 AS h01",
            "(id * 11) % 50 AS h02",
            "(id % 5) - 2 AS h10", "90 + (3 * id) % 20 AS h11",
            "(id * 13) % 50 AS h12",
            "(id % 3) - 1 AS h20", "(id % 5) - 2 AS h21",
            "30 + (id * 7) % 6000 AS h22",
        )
        .repartition(cpus * 2)
        .persist()
    )
    hg_boxes.count()
    timed(
        "homography_20m_boxes",
        lambda: homography_boxes(hg_boxes, size=640)
        .agg(
            F.bit_xor(F.xxhash64("image_id", "box_id", "x0", "y1", "valid")),
            F.sum(F.col("valid").cast("long")),
            F.count(F.lit(1)),
        )
        .collect(),
    )
    hg_boxes.unpersist()

    # twenty-sixth session: Chaikin smoothing (10M vertices × 2
    # iterations → 40M output points, one per-way sort per iteration),
    # URL-domain mining (5M docs × 2-3 URLs, JVM regex + two-level agg)
    from morituri_spark.geo.simplify import chaikin_smooth
    from morituri_spark.text.patterns import url_domain_counts

    ck_pts = (
        spark.range(10_000_000)
        .selectExpr(
            "id div 8 AS way_id",
            "id % 8 AS seq",
            "((id * 7) % 200000) - 100000 AS x",
            "((id * 13) % 180000) - 90000 AS y",
        )
        .repartition(cpus * 2)
        .persist()
    )
    ck_pts.count()
    timed(
        "chaikin_10m_vertices_2it",
        lambda: chaikin_smooth(ck_pts, iters=2)
        .agg(
            F.bit_xor(F.xxhash64("way_id", "seq", "x", "y")),
            F.count(F.lit(1)),
        )
        .collect(),
    )
    ck_pts.unpersist()

    ud_docs = (
        spark.range(5_000_000)
        .selectExpr(
            "id AS doc_id",
            "concat('Visit HTTP://Site', CAST(id % 5000 AS STRING),"
            " '.example.com/a then https://cdn',"
            " CAST(id % 97 AS STRING), '.net/x',"
            " CASE WHEN id % 3 = 0 THEN ' and plain text'"
            " ELSE concat(' https://site', CAST(id % 5000 AS STRING),"
            "             '.example.com/b') END) AS text",
        )
        .repartition(cpus * 2)
        .persist()
    )
    ud_docs.count()
    timed(
        "domain_counts_5m_docs",
        lambda: url_domain_counts(ud_docs)
        .agg(F.sum("n_hits"), F.sum("n_docs"), F.count(F.lit(1)))
        .collect(),
    )
    ud_docs.unpersist()

    # twenty-eighth session: block-matching motion estimation — 500
    # 128×128 frame pairs (8.2M pixels/side), ±2 search → 25× fan,
    # ~200M joined rows through one hash join + two aggregates
    from morituri_spark.multimodal.video import block_flow

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
    timed(
        "block_flow_8m_px_25disp",
        lambda: block_flow(bf_cur, bf_nxt, keys=["g"], block=8, radius=2)
        .agg(
            F.bit_xor(F.xxhash64("g", "bx", "by", "sad", "dx", "dy")),
            F.count(F.lit(1)),
        )
        .collect(),
    )
    # dense-raster fast path at the SAME shape: 1:1 join + 25 window
    # lags over one sort (no 25x fan) — hash must match the join path
    from morituri_spark.multimodal.video import block_flow_dense

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
    )
    bf_px.unpersist()

    # twenty-ninth session: Catalyst tile clipping — 2M hexagons (12M
    # vertices) through 4 half-plane stages (8 windows, 1 ring sort
    # reused per stage pair)
    from morituri_spark.geo.overlay import clip_rings_to_tile

    cl_rings = (
        spark.range(12_000_000)
        .selectExpr("id div 6 AS ring_id", "id % 6 AS seq")
        .selectExpr(
            "ring_id", "seq",
            "(ring_id * 37) % 120 - 10"
            " + CASE seq WHEN 0 THEN 14 WHEN 1 THEN 7 WHEN 2 THEN -7"
            " WHEN 3 THEN -14 WHEN 4 THEN -7 ELSE 7 END AS x",
            "(ring_id * 53) % 120 - 10"
            " + CASE seq WHEN 0 THEN 0 WHEN 1 THEN 12 WHEN 2 THEN 12"
            " WHEN 3 THEN 0 WHEN 4 THEN -12 ELSE -12 END AS y",
        )
        .repartition(cpus * 2)
        .persist()
    )
    cl_rings.count()
    timed(
        "clip_2m_rings_tile",
        lambda: clip_rings_to_tile(cl_rings, 10, 10, 90, 90)
        .agg(
            F.bit_xor(F.xxhash64("ring_id", "seq", "x", "y")),
            F.count(F.lit(1)),
        )
        .collect(),
    )
    cl_rings.unpersist()

    total = round(sum(timings.values()), 3)
    detail = {
        "metric": "bench_total_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "steal_pct": steal,
        "calib_ms_start": calib_start,
        "calib_ms_end": calib_ms(),
        "sf": sf,
        "cpus": cpus,
        "n_images": N_IMAGES,
        "n_mid_pip": N_MID_PIP,
        "images_per_sec_flagship": images_per_sec,
        "layout_row_groups_pruned": f"{prune['row_groups_overlapping']}/{prune['row_groups_total']} overlap",
        "layout_rows_in_overlap_pct": round(
            100.0 * prune["rows_in_overlapping_groups"] / max(prune["rows_total"], 1), 1
        ),
        "layout_hilbert_row_groups_pruned": (
            f"{prune_h['row_groups_overlapping']}/{prune_h['row_groups_total']} overlap"
        ),
        "layout_hilbert_rows_in_overlap_pct": round(
            100.0 * prune_h["rows_in_overlapping_groups"] / max(prune_h["rows_total"], 1), 1
        ),
    }
    # Full per-query record goes to a sidecar file; stdout's FINAL line is a
    # COMPACT summary. Round 4's single fat line outgrew the driver's
    # output-tail capture and BENCH_r04.json came back "parsed": null — the
    # head (flagship timings, bench_total_seconds) was truncated away. The
    # driver parses the LAST line, so keep it small and print it last.
    sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "last_run.json")
    os.makedirs(os.path.dirname(sidecar), exist_ok=True)
    with open(sidecar, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    top10 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    compact = {
        "metric": "bench_total_seconds",
        "value": total,
        "unit": "sec",
        "queries": top10,
        "sf": sf,
        "cpus": cpus,
        "images_per_sec_flagship": images_per_sec,
        "calib_ms_start": detail["calib_ms_start"],
        "calib_ms_end": detail["calib_ms_end"],
        "max_steal_pct": max(steal.values()) if steal else 0.0,
        "n_queries_timed": len(timings),
        "detail_file": "BENCH/last_run.json",
    }
    sys.stdout.flush()
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
