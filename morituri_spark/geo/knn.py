"""J11: kNN via geocell ring expansion (SURVEY.md §2.3).

No morituri counterpart — required by the north star for nearest-feature
caption enrichment. Algorithm (the classic grid-file expanding-ring search):

  round L: explode each unfinished query into its Chebyshev ring-L cells
  (geo.cells.grid_ring) → equi-join candidates on cell → accumulate → keep
  per-query top-k (window). A query finishes when its current k-th distance
  is ≤ L · cell_min_dim: every unexplored cell lies at Chebyshev distance
  > L, so no unseen candidate can be closer. Rings are explored in
  geometrically widening blocks by default (ring_batch) so the driver
  loop is O(log max_rings) rounds, with termination bounds taken at each
  block's outer radius.

Distance metric: Euclidean in degrees (documented engine rule; suitable for
the small-extent zones this engine targets — swap in haversine via
``metric='haversine'`` for global data).

Scale shape: each round is one shuffle join keyed on cell id; the frontier
shrinks geometrically, so total work ≈ one dense join over the k-NN
neighborhoods. The brute-force oracle lives in ml.simsearch /
tests/test_knn.py.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType
from pyspark.sql.window import Window

from . import cells as C


def _ring_cells_udf(res: int, ring: int):
    """(query cell) → exploded ring-L cell list, via an Arrow kernel.
    Kept as the reference form; the expression below replaced it in
    knn_join (no Python round-trip per expansion round)."""

    @F.pandas_udf("array<long>")
    def expand(cells: pd.Series) -> pd.Series:
        return cells.map(lambda c: C.grid_ring(int(c), ring).tolist())

    return expand


def _ring_cells_expr(res: int, ring: int, qcell):
    """Catalyst form of cells.grid_ring for a LITERAL ring radius: the
    Chebyshev ring's cells as an array expression (x wraps, y clips,
    distinct — same semantics as the NumPy kernel). Arrays are ≤ 8·ring
    elements per query row, so interpreted-HOF evaluation is fine here;
    the win is dropping the per-round Python worker round-trip."""
    n = 1 << res
    mask = (1 << 29) - 1
    x = F.shiftright(qcell, 29).bitwiseAND(F.lit(mask))
    y = qcell.bitwiseAND(F.lit(mask))
    if ring == 0:
        return F.array(qcell)
    # res prefix taken from the query cell itself (layout-proof: whatever
    # sits above the x field is preserved verbatim)
    res_bits = qcell - x * F.lit(1 << 29) - y

    def pack(xp, yp):
        return F.struct(
            (res_bits + F.pmod(xp, F.lit(n)) * F.lit(1 << 29) + yp).alias("cell"),
            yp.alias("yp"),
        )

    top_bottom = F.flatten(
        F.transform(
            F.sequence(F.lit(-ring), F.lit(ring)),
            lambda dx: F.array(pack(x + dx, y - ring), pack(x + dx, y + ring)),
        )
    )
    sides = F.flatten(
        F.transform(
            F.sequence(F.lit(-ring + 1), F.lit(ring - 1)),
            lambda dy: F.array(pack(x - ring, y + dy), pack(x + ring, y + dy)),
        )
    )
    cells = F.concat(top_bottom, sides)
    valid = F.filter(cells, lambda s: (s["yp"] >= 0) & (s["yp"] < n))
    return F.array_distinct(F.transform(valid, lambda s: s["cell"]))


def _annulus_cells_expr(res: int, lo: int, hi: int, qcell):
    """Cells at Chebyshev distance in [lo, hi] (inclusive): the full
    (2·hi+1)² square minus the (2·lo−1)² interior, one nested-HOF
    expression (x wraps via pmod, y clips, distinct — same semantics as
    per-ring). Used by the geometric ring batching: the frontier shrinks
    while blocks widen, so the interpreted-HOF array cost stays bounded,
    and the driver loop drops from O(R) rounds to O(log R)."""
    if lo == hi:
        return _ring_cells_expr(res, lo, qcell)
    n = 1 << res
    mask = (1 << 29) - 1
    x = F.shiftright(qcell, 29).bitwiseAND(F.lit(mask))
    y = qcell.bitwiseAND(F.lit(mask))
    res_bits = qcell - x * F.lit(1 << 29) - y
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(-hi), F.lit(hi)),
            lambda dx: F.transform(
                F.sequence(F.lit(-hi), F.lit(hi)),
                lambda dy: F.struct(
                    (
                        res_bits
                        + F.pmod(x + dx, F.lit(n)) * F.lit(1 << 29)
                        + (y + dy)
                    ).alias("cell"),
                    (y + dy).alias("yp"),
                    F.greatest(F.abs(dx), F.abs(dy)).alias("d"),
                ),
            ),
        )
    )
    valid = F.filter(
        pairs, lambda s: (s["yp"] >= 0) & (s["yp"] < n) & (s["d"] >= lo)
    )
    return F.array_distinct(F.transform(valid, lambda s: s["cell"]))


def _dist_expr(qlon, qlat, clon, clat, metric: str):
    if metric == "euclidean_deg":
        # plain multiplication, NOT **2 (POWER(x, 2.0)) — keeps IEEE results
        # bit-identical to the SQL oracle's (a-b)*(a-b)
        dx, dy = qlon - clon, qlat - clat
        return F.sqrt(dx * dx + dy * dy)
    if metric == "haversine_km":
        r = 6371.0088
        dlat = F.radians(clat - qlat)
        dlon = F.radians(clon - qlon)
        a = (
            F.sin(dlat / 2) ** 2
            + F.cos(F.radians(qlat)) * F.cos(F.radians(clat)) * F.sin(dlon / 2) ** 2
        )
        return F.lit(2 * r) * F.asin(F.sqrt(a))
    raise ValueError(f"unknown metric {metric!r}")


def _rdd_ids(sc) -> set:
    return {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}


class _Round:
    """One materialized iteration round + the bookkeeping to actually free
    it. ``df.unpersist()`` is a NO-OP for rounds materialized via
    localCheckpoint (the checkpoint blocks live on an internal RDD that is
    not registered with the CacheManager), so superseded rounds used to
    accumulate blocks; we snapshot the persistent-RDD id set around the
    checkpoint call and unpersist those ids on release. When a reliable
    checkpoint dir is configured (``sc.setCheckpointDir``) we use
    ``df.checkpoint`` instead — localCheckpoint lineage is unrecoverable on
    executor loss (documented hazard; fine in local mode, not on a lossy
    cluster)."""

    def __init__(self, df, ckpt_rdd_ids=()):
        self.df = df
        self._ids = tuple(ckpt_rdd_ids)

    @staticmethod
    def materialize(df, truncate: bool) -> "_Round":
        sc = df.sparkSession.sparkContext
        if truncate:
            if sc.getCheckpointDir() is not None:
                return _Round(df.checkpoint(eager=True))
            before = _rdd_ids(sc)
            out = df.localCheckpoint(eager=True)
            return _Round(out, _rdd_ids(sc) - before)
        return _Round(df.persist())

    def release(self):
        self.df.unpersist()
        if self._ids:
            jmap = self.df.sparkSession.sparkContext._jsc.getPersistentRDDs()
            for rid in self._ids:
                jrdd = jmap.get(rid)
                if jrdd is not None:
                    jrdd.unpersist(False)


def knn_join(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    res: int = 10,
    max_rings: int = 64,
    metric: str = "euclidean_deg",
    qid_col: str = "query_id",
    cid_col: str = "cand_id",
    topk_salt: int | None | str = "auto",
    salt_cell_threshold: int = 4_000_000,
    ring_batch: bool = True,
) -> DataFrame:
    """→ (query_id, cand_id, dist, rank<k). Both inputs need lon/lat.

    Driver-side loop over expansion rounds (bounded by ``max_rings``);
    per-round state lives in persisted DataFrames, never on the driver.

    ``topk_salt``: sub-group count for the two-stage per-round top-k (None
    disables) — bounds the per-query sort when a mega-cell floods one
    query's ring with candidates. ``"auto"`` (default, r5) engages it only
    when the corpus' max cell population reaches ``salt_cell_threshold``:
    the r5 mega-cell A/B (500k candidates in ONE cell, BENCH/BASELINE.md)
    measured the always-on salt 1.7-2.4× SLOWER than the plain window —
    per-query sorts of ≲1M rows finish in well under a second, so the
    extra per-round shuffle+window never pays; the stage exists for the
    regime where ONE query's candidate list itself reaches several million
    rows and its single-task sort straggles (or OOMs) the round. The
    threshold decision costs one count-per-cell agg over the persisted
    corpus. The candidate side is also re-spread if it arrives
    under-partitioned (a ``limit()`` upstream collapses to ONE partition
    and serialized the whole join — measured 343s vs 20s on the same input
    at bench scale).

    ``ring_batch`` (default True, r5): explore rings in geometrically
    widening blocks (0-1; 2-4; 5-10; 11-22; …) instead of one ring per
    round.
    Each round is a driver barrier plus a window over the accumulated
    pool; at 1000-executor scale those round-trips, not the joins,
    dominate a sparse search — batching drops them from O(max_rings) to
    O(log max_rings). The trade is bounded over-exploration: a query that
    would stop at ring lo explores through hi ≤ 2·lo (≤4× area) in its
    final block. Termination bounds use the block's OUTER radius, so
    results are identical (brute-force-equivalence and oracle tested).
    """
    spark = queries.sparkSession
    # Cell extents: y (lat) spans 180°/2^res, x (lon) 360°/2^res — x is twice
    # y in degrees. For euclidean_deg the termination bound uses the smaller
    # (y) extent. For haversine the x extent SHRINKS by cos(lat), so at
    # |lat| > 60° the x direction becomes the limiting one — the bound must
    # scale per query by min(1, 2·cos(max |lat| reachable in the explored
    # disk)) or a high-latitude query stops early with non-nearest results.
    deg_y = 180.0 / (1 << res)
    km_per_deg = 111.19492664455873  # meridian arc, deg → km

    cand = candidates.select(
        F.col(cid_col),
        F.col("lon").alias("_clon"),
        F.col("lat").alias("_clat"),
        C.cell_col(F.col("lon"), F.col("lat"), res).alias("_ccell"),
    )
    par = spark.sparkContext.defaultParallelism
    if cand.rdd.getNumPartitions() < par:  # rdd-meta-ok
        cand = cand.repartition(par)
    cand = cand.persist()

    if topk_salt == "auto":
        max_cell = (
            cand.groupBy("_ccell").count().agg(F.max("count")).first()[0] or 0
        )
        topk_salt = 32 if max_cell >= salt_cell_threshold else None

    # Exhaustion bound: once a query's explored disk covers the candidate
    # bbox there is nothing left to find (otherwise k > |candidates in
    # range| would spin to max_rings). One tiny agg; corner cells become
    # literal Chebyshev-distance expressions per query.
    bbox = cand.agg(
        F.min("_clon"), F.min("_clat"), F.max("_clon"), F.max("_clat")
    ).first()
    cx0, cy0 = C.cell_xy(C.latlng_to_cell([bbox[0]], [bbox[1]], res))
    cx1, cy1 = C.cell_xy(C.latlng_to_cell([bbox[2]], [bbox[3]], res))
    cx0, cy0, cx1, cy1 = int(cx0[0]), int(cy0[0]), int(cx1[0]), int(cy1[0])

    qx = F.shiftright(F.col("_qcell"), 29).bitwiseAND(F.lit((1 << 29) - 1))
    qy = F.col("_qcell").bitwiseAND(F.lit((1 << 29) - 1))
    max_ring_expr = F.greatest(
        F.abs(qx - F.lit(cx0)), F.abs(qx - F.lit(cx1)),
        F.abs(qy - F.lit(cy0)), F.abs(qy - F.lit(cy1)),
    )
    frontier_round = _Round(queries.select(
        F.col(qid_col),
        F.col("lon").alias("_qlon"),
        F.col("lat").alias("_qlat"),
        C.cell_col(F.col("lon"), F.col("lat"), res).alias("_qcell"),
    ).withColumn("_max_ring", max_ring_expr).persist())

    topk_round = None  # accumulated per-query best-so-far
    topk = None
    w = Window.partitionBy(qid_col).orderBy("dist", cid_col)
    n_left = frontier_round.df.count()  # materializes the persist; reused as
    # the loop-termination check so each round has exactly two driver barriers

    # r6 schedule: the first batched block is (0, 1), not (0, 0) — a
    # hi=0 block has termination bound 0, so NO query can finish round 1
    # and every dense query re-explodes the full [1, 2] annulus in round
    # 2; starting at hi=1 gives round 1 a 9-cell cover with a usable
    # bound (dense queries whose kth hit sits inside ring 1 — the common
    # dense case — finish immediately), and every schedule is one round
    # shorter. Results are identical: done-ness is monotone in hi and
    # always evaluated with the block's OUTER radius.
    if ring_batch:
        blocks = [(0, min(1, max_rings))]
        lo = 2
    else:
        blocks = [(0, 0)]
        lo = 1
    while lo <= max_rings:
        hi = min(2 * lo, max_rings) if ring_batch else lo
        blocks.append((lo, hi))
        lo = hi + 1

    for blk, (lo, hi) in enumerate(blocks):
        if n_left == 0:
            break
        frontier = frontier_round.df
        ring_cells = frontier.withColumn(
            "_cell", F.explode(_annulus_cells_expr(res, lo, hi, F.col("_qcell")))
        )
        hits = ring_cells.join(
            cand, ring_cells["_cell"] == cand["_ccell"], "inner"
        ).select(
            qid_col, "_qlon", "_qlat", "_qcell", cid_col,
            _dist_expr(F.col("_qlon"), F.col("_qlat"), F.col("_clon"), F.col("_clat"), metric).alias("dist"),
        )
        # TWO-STAGE top-k (r4): stage 1 ranks within (query,
        # candidate-hash salt) sub-groups keeping k per sub-group; stage 2
        # merges ≤ salt·k rows per query. Top-k of per-group top-ks ≡
        # global top-k (oracle-pinned, unchanged results). This bounds the
        # per-query sort when a mega-cell floods one query's ring with
        # candidates (30% of a geo corpus in one urban cell is NORMAL
        # data). r5 A/B at 500k-in-one-cell measured the stage 1.7-2.4×
        # SLOWER than the plain window (the extra per-round shuffle never
        # pays below multi-million-row per-query floods), hence the
        # max-cell-population auto gate above.
        # NOTE the 343s pathology this hunt found was NOT the window: an
        # upstream limit() had collapsed the candidate side to ONE
        # partition — see the repartition defense above.
        pool = hits if topk is None else topk.unionByName(hits)
        if topk_salt:
            w_pre = Window.partitionBy(
                qid_col, F.pmod(F.xxhash64(F.col(cid_col)), F.lit(topk_salt))
            ).orderBy("dist", cid_col)
            pool = (
                pool.withColumn("_prk", F.row_number().over(w_pre))
                .where(F.col("_prk") <= k)
                .drop("_prk")
            )
        new_topk = (
            pool.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= k)
            .drop("_rk")
        )
        # Materialize the accumulator, truncating lineage every few rounds:
        # the union-then-window plan otherwise grows O(rings) deep and gets
        # re-analyzed/re-windowed each iteration. Materialize (count/eager
        # checkpoint) BEFORE releasing the parent, or every round recomputes
        # the whole chain.
        nt = _Round.materialize(new_topk, truncate=(blk % 2 == 1))
        nt.df.count()
        if topk_round is not None:
            topk_round.release()  # superseded accumulator's blocks
        topk_round = nt
        topk = nt.df

        # a query is DONE when it has k hits and its k-th distance can't be
        # beaten by anything outside the explored disk, OR when the disk
        # already covers the whole candidate bbox (exhaustion)
        if metric == "euclidean_deg":
            bound = F.lit(hi * deg_y)
        else:  # haversine_km: polar-safe per-query bound (see header note)
            lat_reach = F.least(
                F.lit(90.0), F.abs(F.col("_qlat")) + F.lit((hi + 1) * deg_y)
            )
            factor = F.least(F.lit(1.0), 2.0 * F.cos(F.radians(lat_reach)))
            bound = F.lit(hi * deg_y * km_per_deg) * F.greatest(factor, F.lit(0.0))
        stats = topk.groupBy(qid_col).agg(
            F.count(F.lit(1)).alias("_n"),
            F.max("dist").alias("_kth"),
            F.first("_qlat").alias("_qlat"),
        )
        done = stats.where((F.col("_n") >= k) & (F.col("_kth") <= bound)).select(qid_col)
        exhausted = frontier.where(F.col("_max_ring") <= hi).select(qid_col)
        new_frontier = frontier.join(
            done.unionByName(exhausted).distinct(), qid_col, "left_anti"
        )
        # Same treatment as topk — and CRITICALLY materialize (count /
        # eager checkpoint) BEFORE unpersisting the old frontier: dropping
        # the parent's blocks first forces a from-scratch recompute of the
        # whole anti-join chain every round (O(rings²) work; a 20-ring
        # sparse input went from minutes to seconds with this ordering).
        nf = _Round.materialize(new_frontier, truncate=(blk % 2 == 1))
        n_left = nf.df.count()
        frontier_round.release()
        frontier_round = nf

    frontier_round.release()
    cand.unpersist()
    if topk is None:
        return spark.createDataFrame(
            [], f"{qid_col} long, {cid_col} long, dist double, rank int"
        )
    return (
        topk.withColumn("rank", (F.row_number().over(w) - 1).cast("int"))
        .select(qid_col, cid_col, F.round("dist", 9).alias("dist"), "rank")
    )


def knn_bruteforce(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    metric: str = "euclidean_deg",
    qid_col: str = "query_id",
    cid_col: str = "cand_id",
) -> DataFrame:
    """Oracle: cross join + window top-k (small inputs only)."""
    q = queries.select(qid_col, F.col("lon").alias("_qlon"), F.col("lat").alias("_qlat"))
    c = candidates.select(cid_col, F.col("lon").alias("_clon"), F.col("lat").alias("_clat"))
    scored = q.crossJoin(c).select(
        qid_col, cid_col,
        _dist_expr(F.col("_qlon"), F.col("_qlat"), F.col("_clon"), F.col("_clat"), metric).alias("dist"),
    )
    w = Window.partitionBy(qid_col).orderBy("dist", cid_col)
    return (
        scored.withColumn("rank", (F.row_number().over(w) - 1).cast("int"))
        .where(F.col("rank") < k)
        .select(qid_col, cid_col, F.round("dist", 9).alias("dist"), "rank")
    )


# ---------------------------------------------------------------------------
# Fixed-radius pair join (the DBSCAN-eps / co-location primitive)
# ---------------------------------------------------------------------------

_KM_PER_DEG_LAT = 110.574  # minimum over the WGS84-ish range → max deg span
_R_KM = 6371.0088  # the refine haversine's sphere radius (_dist_expr)


def radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    res: int | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
    antisymmetric: bool = False,
    salt: int | str | None = "auto",
    hot_cell_threshold: int = 4_000_000,
    time_col: str | None = None,
    window_s: int | None = None,
) -> DataFrame:
    """All (a, b) pairs with haversine(a, b) <= ``radius_km``.

    With ``time_col``/``window_s`` set this becomes the SPACE-TIME
    co-location join (the contact / co-occurrence primitive): pairs must
    additionally satisfy |t_a - t_b| <= window_s. Timestamps truncate to
    whole seconds first (rule 12's cross-engine diff contract), then
    bucket by ``window_s``-wide integer windows: |diff| <= w forces the
    buckets adjacent, so the probe side explodes 3 buckets and the join
    key becomes (cell, bucket) — the time key splinters hot cells across
    time BEFORE the salt gate even looks, and candidate volume drops by
    the corpus's time spread over the window. The extra output column
    ``dt_s`` is the signed (b - a) whole-second delta.

    The fixed-radius sibling of :func:`knn_join` — the primitive under
    DBSCAN eps-neighborhoods, co-location mining, and duplicate-capture
    radii. ``left`` needs (``id_a``, lon, lat), ``right`` (``id_b``,
    lon, lat); pass ``antisymmetric=True`` for a self-join to keep each
    unordered pair once (``id_a < id_b``).

    Scale shape: the LEFT side explodes to the EXACT cell cover of its
    radius disk — the floor-range of [lon−span, lon+span] × [lat−r_deg,
    lat+r_deg] around the point's own coordinates (≤ 2×2 cells at the
    auto-chosen res, vs the former worst-case (2·kx+1)×3 fan; span widens
    with latitude via a conservative per-row cos bound) — the right side
    keys by its single home cell, and candidates come from ONE equi-join
    on cell id — never |left| x |right|. Each true pair appears exactly once per direction
    (the right row has one home cell), so no pair-level dedup shuffle is
    needed. Longitude wraps (pmod), so antimeridian pairs are found;
    pole-crossing disks are NOT modeled (exact for |lat| <= 89 deg at the
    auto-chosen res — the polar caps would need an all-lon probe this
    engine's zones never reach).

    Skew: a mega home cell would put its whole candidate block in one
    join task, so ``salt="auto"`` (default) probes the max home-cell
    population with one map-side-combinable aggregate and — only past
    ``hot_cell_threshold`` — splits the HOT cells into sub-buckets
    (right side hashed on id, probe side replicated for hot cells only;
    light cells keep the unsalted single-bucket plan). Below the
    threshold the plan is identical to ``salt=None`` (CLAUDE.md rule 20:
    the defense LOSES below the straggler regime — same gate shape as
    knn_join's auto top-k and the PIP salting floor). Pass an int to
    force a sub-bucket count, or None to skip the probe entirely.

    The refine gate compares the 6-dp-ROUNDED haversine to the radius —
    the same contract as knn_join's haversine oracle (rule 16), so a
    1-ulp libm divergence between engines cannot flip membership except
    exactly on a rounding boundary.
    """
    r_deg_lat = radius_km / _KM_PER_DEG_LAT
    if res is None:
        # largest grid where one cell is >= one radius tall → dy in {-1,0,1}.
        # Cell height ~ radius keeps candidate overhead a small constant
        # (~10x true pairs at uniform density); the cap only guards the
        # probe array width for sub-meter radii.
        res = min(int(np.floor(np.log2(180.0 / r_deg_lat))), 20)
    cell_h = 180.0 / (1 << res)
    cell_w = 360.0 / (1 << res)
    if cell_h < r_deg_lat:
        raise ValueError(
            f"res {res} too fine for radius {radius_km} km "
            f"(cell height {cell_h:.4f} deg < {r_deg_lat:.4f} deg)"
        )
    n = 1 << res

    timed = time_col is not None
    if timed and (window_s is None or int(window_s) < 1):
        raise ValueError("time_col requires window_s >= 1")

    def _sec(c):
        # whole-second epoch (rule 12: truncate, then diff — matches
        # DuckDB's date_diff('second'); tz offsets cancel in the diff)
        return F.unix_timestamp(F.date_trunc("SECOND", F.col(c)))

    a_extra = [_sec(time_col).alias("_asec")] if timed else []
    lft = left.select(
        id_a,
        F.col("lon").alias("_alon"),
        F.col("lat").alias("_alat"),
        *a_extra,
    )
    # re-spread a collapsed input (knn_join's limit() lesson): the probe
    # explode runs BEFORE the join exchange, so a 1-partition left side —
    # e.g. a persisted limit() — serializes the whole cover fan-out into
    # one task (measured 142.9s -> 13.3s at 1M points / 50 m). Guarded by
    # partition count, so real many-split scans never pay the exchange.
    par = left.sparkSession.sparkContext.defaultParallelism
    if lft.rdd.getNumPartitions() < par:  # rdd-meta-ok
        lft = lft.repartition(par)
    # EXACT reachable-cell cover (r6, guide §2.2): any b that the refine
    # gate can accept (ROUNDED haversine <= radius, so true distance <=
    # radius + 5e-7 km =: d_eff with 2x margin) satisfies, on the R =
    # 6371.0088 sphere the refine itself uses,
    #   |dlat|  <= degrees(d_eff / R)                      (dlat term alone)
    #   sin(|dlon|/2) <= sin(d_eff/2R) / cos(pole_lat)     (cos at the
    # poleward-most latitude either endpoint can reach — conservative),
    # and floor is monotone, so b's home (x, y) lies in the floor-range of
    # [lon−span, lon+span] × [lat−y_span, lat+y_span] — explode exactly
    # that range instead of the former symmetric worst-case (2·kx+1)×3
    # cover (which padded +1 cell in x for the unknown in-cell offset and
    # always took dy ∈ {−1,0,1}). Typical fan drops 15 → ≤4 probe rows per
    # point; join and refine volume shrink by the same factor; the pair
    # set is unchanged (the margins above dominate every float-rounding
    # and 6-dp-refine boundary by orders of magnitude; refine decides
    # membership as before). y clamps to [0, n−1] — latlng_to_cell clamps
    # home cells the same way, so an edge-clamped home is still covered;
    # x wraps via pmod below and caps at n cells so a world-spanning span
    # cannot probe a cell twice. Pole caps (|lat| > 89.9) keep the prior
    # contract: exact away from the polar caps.
    d_eff = float(radius_km) + 1e-6
    y_span = max(r_deg_lat, np.degrees(d_eff / _R_KM))
    pole_lat = F.least(F.abs(F.col("_alat")) + F.lit(y_span), F.lit(89.9))
    span_deg = F.degrees(
        2.0 * F.asin(F.least(
            F.lit(1.0),
            F.lit(float(np.sin(d_eff / (2.0 * _R_KM)))) / F.cos(F.radians(pole_lat)),
        ))
    )
    res_bits = F.lit(int(np.int64(res) << 58))
    thread = ["_asec"] if timed else []
    x_lo = F.floor((F.col("_alon") - span_deg + 180.0) / 360.0 * n).cast("long")
    x_hi = F.least(
        F.floor((F.col("_alon") + span_deg + 180.0) / 360.0 * n).cast("long"),
        x_lo + F.lit(n - 1),
    )
    y_lo = F.greatest(
        F.floor((F.col("_alat") - y_span + 90.0) / 180.0 * n).cast("long"),
        F.lit(0),
    )
    y_hi = F.least(
        F.floor((F.col("_alat") + y_span + 90.0) / 180.0 * n).cast("long"),
        F.lit(n - 1),
    )
    probe = (
        lft.select(
            id_a, "_alon", "_alat", *thread,
            F.explode(F.sequence(x_lo, x_hi)).alias("_px"),
            y_lo.alias("_ylo"), y_hi.alias("_yhi"),
        )
        .select(
            id_a, "_alon", "_alat", *thread,
            F.explode(F.sequence(F.col("_ylo"), F.col("_yhi"))).alias("_py"),
            "_px",
        )
        .select(
            id_a, "_alon", "_alat", *thread,
            (
                res_bits
                + F.pmod(F.col("_px"), F.lit(n)) * F.lit(1 << 29)
                + F.col("_py")
            ).alias("_probe_cell"),
        )
    )
    if timed:
        # |diff| <= w on truncated seconds forces adjacent w-wide buckets.
        # The probe keeps its OWN bucket; the right side (not already
        # fanned out by the disk cover) carries the ±1 explode — 3x on
        # |right| instead of 3x on the cover-exploded probe (measured
        # 2.5x less shuffle volume at 1M points / 50 m)
        probe = probe.withColumn(
            "_probe_bkt", F.floor(F.col("_asec") / F.lit(int(window_s)))
        )
    b_extra = [_sec(time_col).alias("_bsec")] if timed else []
    rgt = right.select(
        id_b,
        F.col("lon").alias("_blon"),
        F.col("lat").alias("_blat"),
        C.cell_col(F.col("lon"), F.col("lat"), res).alias("_home_cell"),
        *b_extra,
    )
    if rgt.rdd.getNumPartitions() < par:  # rdd-meta-ok
        rgt = rgt.repartition(par)
    if timed:
        # explode the delta, then add (generators can't nest in expressions)
        rgt = rgt.select(
            id_b, "_blon", "_blat", "_home_cell", "_bsec",
            F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("_dbkt"),
        ).select(
            id_b, "_blon", "_blat", "_home_cell", "_bsec",
            (
                F.floor(F.col("_bsec") / F.lit(int(window_s))) + F.col("_dbkt")
            ).alias("_home_bkt"),
        )

    hot: list[int] = []
    n_buckets = 0
    if salt is not None:
        # the straggler unit is one join-key population: the cell alone,
        # or — when timed — the (cell, time-bucket) pair (a hot cell whose
        # rows spread across many buckets never lands in one task)
        key = ["_home_cell", "_home_bkt"] if timed else ["_home_cell"]
        hot_rows = (
            rgt.groupBy(*key)
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") >= F.lit(int(hot_cell_threshold)))
            .collect()
        )
        hot = sorted({int(r["_home_cell"]) for r in hot_rows})
        if hot:
            if salt == "auto":
                # split aggressively: the straggler's work is candidates
                # (probes x rows), not rows alone — 8 buckets per
                # threshold-multiple keeps the worst bucket well under the
                # unsalted task even when probes concentrate in the cell
                worst = max(int(r["_n"]) for r in hot_rows)
                n_buckets = min(64, 8 * -(-worst // int(hot_cell_threshold)))
            else:
                n_buckets = int(salt)

    d = _dist_expr(
        F.col("_alon"), F.col("_alat"), F.col("_blon"), F.col("_blat"),
        "haversine_km",
    )
    probe_thread = ["_asec", "_probe_bkt"] if timed else []
    if n_buckets > 1:
        # hot cells split into sub-buckets; light cells stay single-bucket
        rgt_s = rgt.withColumn(
            "_salt",
            F.when(
                F.col("_home_cell").isin(hot),
                F.pmod(F.xxhash64(id_b), F.lit(n_buckets)),
            ).otherwise(F.lit(0).cast("long")),
        )
        probe_s = probe.select(
            id_a, "_alon", "_alat", "_probe_cell", *probe_thread,
            F.explode(
                F.when(
                    F.col("_probe_cell").isin(hot),
                    F.sequence(F.lit(0).cast("long"), F.lit(n_buckets - 1).cast("long")),
                ).otherwise(F.array(F.lit(0).cast("long")))
            ).alias("_salt"),
        )
        cond = (probe_s["_probe_cell"] == rgt_s["_home_cell"]) & (
            probe_s["_salt"] == rgt_s["_salt"]
        )
        if timed:
            cond = cond & (probe_s["_probe_bkt"] == rgt_s["_home_bkt"])
        joined = probe_s.join(rgt_s, cond)
    else:
        cond = probe["_probe_cell"] == rgt["_home_cell"]
        if timed:
            cond = cond & (probe["_probe_bkt"] == rgt["_home_bkt"])
        joined = probe.join(rgt, cond)
    out_extra = (
        [(F.col("_bsec") - F.col("_asec")).alias("dt_s")] if timed else []
    )
    pairs = (
        joined.select(id_a, id_b, F.round(d, 6).alias("dist_km"), *out_extra)
        .where(F.col("dist_km") <= F.lit(float(radius_km)))
    )
    if timed:
        pairs = pairs.where(F.abs(F.col("dt_s")) <= F.lit(int(window_s)))
    if antisymmetric:
        pairs = pairs.where(F.col(id_a) < F.col(id_b))
    return pairs


def radius_self_join(
    pts: DataFrame, radius_km: float, res: int | None = None,
    id_col: str = "id",
    salt: int | str | None = "auto",
    hot_cell_threshold: int = 4_000_000,
) -> DataFrame:
    """Unordered within-radius pairs of one point set (id_a < id_b)."""
    a = pts.select(F.col(id_col).alias("id_a"), "lon", "lat")
    b = pts.select(F.col(id_col).alias("id_b"), "lon", "lat")
    return radius_join(
        a, b, radius_km, res=res, antisymmetric=True,
        salt=salt, hot_cell_threshold=hot_cell_threshold,
    )


def spacetime_self_join(
    pts: DataFrame,
    radius_km: float,
    window_s: int,
    res: int | None = None,
    id_col: str = "id",
    ts_col: str = "ts",
    salt: int | str | None = "auto",
    hot_cell_threshold: int = 4_000_000,
) -> DataFrame:
    """Unordered co-location pairs: within ``radius_km`` AND within
    ``window_s`` seconds (id_a < id_b, dist_km, dt_s signed b - a).

    The contact-tracing / co-occurrence primitive over (id, lon, lat, ts)
    rows — one (cell, time-bucket) equi-join, never |pts|²; see
    :func:`radius_join` for the bucket algebra and the salt gate."""
    a = pts.select(F.col(id_col).alias("id_a"), "lon", "lat", F.col(ts_col).alias("_ts"))
    b = pts.select(F.col(id_col).alias("id_b"), "lon", "lat", F.col(ts_col).alias("_ts"))
    return radius_join(
        a, b, radius_km, res=res, antisymmetric=True,
        salt=salt, hot_cell_threshold=hot_cell_threshold,
        time_col="_ts", window_s=window_s,
    )
