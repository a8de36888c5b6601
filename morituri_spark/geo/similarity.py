"""Trajectory similarity — discrete Hausdorff distance join over tracks.

The standard "which traces run the same route" primitive for GPS / image
capture-path corpora (map inference, route dedup, drive-collection
near-dup): two tracks match when EVERY point of each lies within ``d_km``
of the other track — max over points of the min point-to-point haversine,
symmetrized (discrete Hausdorff, the classic computable bound on the
continuous one).

Spark shape (never |tracks|² and never |points|²):

1. one hash exchange compacts each track to sorted coordinate arrays
   (groupBy + array_sort(collect_list(struct))) — the only shuffle that
   touches every point;
2. candidate pairs come from :func:`morituri_spark.geo.knn.radius_join`
   between per-track ANCHORS (first point) and the full point set.
   Hausdorff(A, B) <= d forces anchor(A) within d of some point of B, so
   the directed anchor→points radius join is a strict superset of the
   answer while staying one cell equi-join (disk-cover explode on the
   anchor side, home cell on the point side, hot cells salted by the
   radius join's own measured gate);
3. the exact refine is an Arrow kernel per candidate pair: the full
   haversine matrix of the two tracks via one NumPy broadcast (tiled past
   ``tile`` rows so a monster-track pair cannot blow a worker), reduced
   min-per-row → max, both directions.

Cross-engine contract (CLAUDE.md rule 16): every pairwise distance is
rounded HALF-UP to 6 dp *before* the min/max reductions, in the kernel
and in any SQL oracle alike — min/max then select identical values on
both engines, so libm 1-ulp drift cannot flip a pair except exactly on a
rounding boundary (absorbed by the shared +1e-8 epsilon).

Reference scope note: morituri (plugins/navteq) has no trajectory
operator; this extends the engine's training-data-pipeline family (route
dedup over capture traces) per SURVEY.md §2.8's extension charter.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from .knn import radius_join

_R_KM = 6371.0088


def _round6(x: np.ndarray) -> np.ndarray:
    """Half-up 6-dp rounding shared with the SQL oracles (np.round is
    banker's; DuckDB/Spark round() is half-up — rule 16)."""
    return np.floor(x * 1e6 + 0.5 + 1e-8) / 1e6


def _hav_matrix(alon, alat, blon, blat) -> np.ndarray:
    """(nA, nB) haversine km matrix; inputs are 1-D degree arrays."""
    la, lb = np.radians(alat)[:, None], np.radians(blat)[None, :]
    dlat = lb - la
    dlon = np.radians(blon)[None, :] - np.radians(alon)[:, None]
    a = np.sin(dlat / 2) ** 2 + np.cos(la) * np.cos(lb) * np.sin(dlon / 2) ** 2
    return 2.0 * _R_KM * np.arcsin(np.sqrt(np.minimum(a, 1.0)))


def _directed_minmax(alon, alat, blon, blat, tile: int) -> tuple[float, float]:
    """(h(A→B), h(B→A)) over 6-dp-rounded distances, A tiled by rows."""
    h_ab = 0.0
    min_b = np.full(len(blon), np.inf)
    for i in range(0, len(alon), tile):
        d = _round6(_hav_matrix(alon[i : i + tile], alat[i : i + tile], blon, blat))
        h_ab = max(h_ab, float(d.min(axis=1).max()))
        np.minimum(min_b, d.min(axis=0), out=min_b)
    return h_ab, float(min_b.max())


def track_arrays(
    tracks: DataFrame,
    id_col: str = "track_id",
    seq_col: str = "seq",
) -> DataFrame:
    """(id, lons: array<double>, lats: array<double>) — points in seq order.

    ONE map-side-combinable-free hash exchange on ``id_col`` (collect_list
    cannot partial-combine, but the shuffle carries exactly the point rows
    once); array_sort on the (seq, lon, lat) struct restores trace order
    without a sort exchange.
    """
    return (
        tracks.groupBy(F.col(id_col).alias("_tid"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(seq_col).alias("s"), "lon", "lat"))
            ).alias("_p")
        )
        .select(
            F.col("_tid").alias(id_col),
            F.col("_p.lon").alias("lons"),
            F.col("_p.lat").alias("lats"),
        )
    )


def hausdorff_join(
    tracks: DataFrame,
    d_km: float,
    id_col: str = "track_id",
    seq_col: str = "seq",
    res: int | None = None,
    tile: int = 4096,
) -> DataFrame:
    """Unordered track pairs (id_a < id_b, hausdorff_km) with discrete
    Hausdorff distance <= ``d_km``.

    ``tracks``: (id_col, seq_col, lon, lat) point rows. ``tile`` bounds
    the refine kernel's per-step matrix to tile x |B| doubles.

    The compacted array table is referenced three times (anchors + both
    sides of the pair join) and its derivation contains a SHUFFLE (the
    groupBy), not just a scan — so it is materialized once via
    localCheckpoint (rule 10/22: re-scan beats caching only when the
    re-derived subtree is a pushdown-friendly scan; a 3x-repeated
    exchange at 10^12 points is not that).
    """
    arrs = track_arrays(tracks, id_col=id_col, seq_col=seq_col).localCheckpoint()

    anchors = arrs.select(
        F.col(id_col).alias("id_a"),
        F.element_at("lons", 1).alias("lon"),
        F.element_at("lats", 1).alias("lat"),
    )
    points = tracks.select(F.col(id_col).alias("id_b"), "lon", "lat")
    cand = (
        radius_join(anchors, points, d_km, res=res)
        .where(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
    )

    a = arrs.select(
        F.col(id_col).alias("id_a"),
        F.col("lons").alias("_alons"),
        F.col("lats").alias("_alats"),
    )
    b = arrs.select(
        F.col(id_col).alias("id_b"),
        F.col("lons").alias("_blons"),
        F.col("lats").alias("_blats"),
    )
    paired = cand.join(a, "id_a").join(b, "id_b")

    schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("hausdorff_km", DoubleType()),
        ]
    )
    thr = float(d_km)

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ia, ib, hk = [], [], []
            for ra, rb, al, aa, bl, ba in zip(
                pdf["id_a"], pdf["id_b"], pdf["_alons"], pdf["_alats"],
                pdf["_blons"], pdf["_blats"],
            ):
                alon = np.asarray(al, dtype=np.float64)
                alat = np.asarray(aa, dtype=np.float64)
                blon = np.asarray(bl, dtype=np.float64)
                blat = np.asarray(ba, dtype=np.float64)
                h1, h2 = _directed_minmax(alon, alat, blon, blat, tile)
                h = max(h1, h2)
                if h <= thr:
                    ia.append(int(ra)); ib.append(int(rb)); hk.append(h)
            yield pd.DataFrame({"id_a": ia, "id_b": ib, "hausdorff_km": hk})

    return paired.mapInPandas(_kernel, schema)


# --- DTW (r5 tenth session) --------------------------------------------------


def _dtw_cost(
    alon: np.ndarray, alat: np.ndarray,
    blon: np.ndarray, blat: np.ndarray,
    band: int | None = None,
    frechet: bool = False,
) -> float:
    """Sum-cost dynamic time warping over 6-dp-pre-rounded haversine km
    (steps right/down/diagonal from (0,0) to (n-1,m-1)).

    Processed by ANTI-DIAGONALS with only the last two diagonals kept:
    O(n·m) compute but O(min(n, m)) memory — the distance matrix is never
    materialized (each diagonal's distances are computed elementwise on
    the fly), so a monster-track pair cannot blow a worker. Per cell the
    arithmetic is exactly ``d + min(up, left, upleft)`` — one IEEE add of
    the rounded distance to an exact min — so the value is bit-identical
    to the sequential recurrence an SQL oracle unrolls (min order is
    irrelevant: min never rounds). ``band`` is the Sakoe–Chiba constraint
    |i−j| ≤ band (cells outside cost +inf); with band < |n−m| no path
    exists and +inf is returned.

    ``frechet=True`` swaps the per-cell combine to
    ``max(d, min(up, left, upleft))`` — the discrete Fréchet (coupling)
    distance recurrence of Eiter & Mannila (1994). Same traversal, same
    memory bound; the value is then a MAX over pre-rounded distances, so
    no accumulation happens at all and cross-engine equality holds by
    selection (each engine picks the same rounded double)."""
    n, m = len(alon), len(blon)
    la, lb = np.radians(alat), np.radians(blat)
    oa, ob = np.radians(alon), np.radians(blon)
    prev1 = prev2 = None
    s1 = s2 = 0
    for t in range(n + m - 1):
        i0, i1 = max(0, t - m + 1), min(n - 1, t)
        ii = np.arange(i0, i1 + 1)
        jj = t - ii
        dlat = lb[jj] - la[ii]
        dlon = ob[jj] - oa[ii]
        h = np.sin(dlat / 2) ** 2 + np.cos(la[ii]) * np.cos(lb[jj]) * np.sin(dlon / 2) ** 2
        d = _round6(2.0 * _R_KM * np.arcsin(np.sqrt(np.minimum(h, 1.0))))
        if band is not None:
            d = np.where(np.abs(ii - jj) <= band, d, np.inf)
        if t == 0:
            cur = d
        else:
            best = np.full(len(ii), np.inf)
            for pv, st, need_i, need_j, di in (
                (prev1, s1, True, False, 1),   # up: (i-1, j)
                (prev1, s1, False, True, 0),   # left: (i, j-1)
                (prev2, s2, True, True, 1),    # upleft: (i-1, j-1)
            ):
                if pv is None:
                    continue
                idx = ii - di - st
                ok = (idx >= 0) & (idx < len(pv))
                if need_i:
                    ok &= ii - 1 >= 0
                if need_j:
                    ok &= jj - 1 >= 0
                # NB: best[ok] is a fancy-index COPY — assign, don't out=
                best[ok] = np.minimum(best[ok], pv[idx[ok]])
            cur = np.maximum(d, best) if frechet else d + best
        prev2, s2 = prev1, s1
        prev1, s1 = cur, i0
    return float(prev1[-1])


def _dtw_cost_batch(
    alon: np.ndarray, alat: np.ndarray,
    blon: np.ndarray, blat: np.ndarray,
    band: int | None = None,
    frechet: bool = False,
) -> np.ndarray:
    """:func:`_dtw_cost` vectorized across a PAIR axis: inputs are
    (P, n) / (P, m) stacks of same-length tracks, output is (P,) costs.

    Elementwise the arithmetic is IDENTICAL to the scalar DP (same
    rounding, same ``d + min(up, left, upleft)`` per cell, min never
    rounds), so the values are bit-equal to per-pair `_dtw_cost` calls —
    the batching only amortizes the per-diagonal Python overhead that
    dominated at small track lengths (a 24×24 DP is 47 diagonals of
    ≤24 cells: pure interpreter cost per pair)."""
    P, n = alon.shape
    m = blon.shape[1]
    la, lb = np.radians(alat), np.radians(blat)
    oa, ob = np.radians(alon), np.radians(blon)
    prev1 = prev2 = None
    s1 = s2 = 0
    for t in range(n + m - 1):
        i0, i1 = max(0, t - m + 1), min(n - 1, t)
        ii = np.arange(i0, i1 + 1)
        jj = t - ii
        dlat = lb[:, jj] - la[:, ii]
        dlon = ob[:, jj] - oa[:, ii]
        h = (
            np.sin(dlat / 2) ** 2
            + np.cos(la[:, ii]) * np.cos(lb[:, jj]) * np.sin(dlon / 2) ** 2
        )
        d = _round6(2.0 * _R_KM * np.arcsin(np.sqrt(np.minimum(h, 1.0))))
        if band is not None:
            d = np.where(np.abs(ii - jj)[None, :] <= band, d, np.inf)
        if t == 0:
            cur = d
        else:
            best = np.full((P, len(ii)), np.inf)
            for pv, st, need_i, need_j, di in (
                (prev1, s1, True, False, 1),   # up: (i-1, j)
                (prev1, s1, False, True, 0),   # left: (i, j-1)
                (prev2, s2, True, True, 1),    # upleft: (i-1, j-1)
            ):
                if pv is None:
                    continue
                idx = ii - di - st
                ok = (idx >= 0) & (idx < pv.shape[1])
                if need_i:
                    ok &= ii - 1 >= 0
                if need_j:
                    ok &= jj - 1 >= 0
                sel = np.flatnonzero(ok)
                if len(sel) == 0:
                    continue
                best[:, sel] = np.minimum(best[:, sel], pv[:, idx[sel]])
            cur = np.maximum(d, best) if frechet else d + best
        prev2, s2 = prev1, s1
        prev1, s1 = cur, i0
    return prev1[:, -1]


def dtw_join(
    tracks: DataFrame,
    max_cost_km: float,
    id_col: str = "track_id",
    seq_col: str = "seq",
    res: int | None = None,
    band: int | None = None,
) -> DataFrame:
    """Unordered track pairs (id_a < id_b, dtw_km) whose sum-cost DTW
    distance is ≤ ``max_cost_km`` — the order-sensitive sibling of
    :func:`hausdorff_join` (Hausdorff ignores traversal order; DTW aligns
    the sequences monotonically, so a route driven backwards no longer
    matches).

    Candidate pairs: every warping path includes the (first, first) cell,
    so DTW(A, B) ≤ θ forces d(A₁, B₁) ≤ θ — ONE first-point↔first-point
    :func:`radius_join` at θ km is a provable candidate superset (cheaper
    than hausdorff's anchor→all-points join). The refine kernel is the
    O(min(n,m))-memory anti-diagonal DP of :func:`_dtw_cost`."""
    return _warp_join(
        tracks, max_cost_km, id_col, seq_col, res, band,
        frechet=False, out_col="dtw_km",
    )


def frechet_join(
    tracks: DataFrame,
    max_km: float,
    id_col: str = "track_id",
    seq_col: str = "seq",
    res: int | None = None,
    band: int | None = None,
) -> DataFrame:
    """Unordered track pairs (id_a < id_b, frechet_km) whose DISCRETE
    FRÉCHET distance (Eiter–Mannila coupling distance) is ≤ ``max_km`` —
    the bounded-deviation sibling of :func:`dtw_join`: where DTW sums
    alignment costs (tolerating one large excursion if the rest is
    tight), Fréchet takes the MAX over the optimal coupling, so the gate
    is "the dog and its walker never exceed ``max_km`` of leash".

    Candidates: every coupling includes the (first, first) cell, so
    Fréchet(A, B) ≤ θ forces d(A₁, B₁) ≤ θ — the same head↔head
    :func:`radius_join` superset as DTW. The refine reuses
    :func:`_dtw_cost`'s anti-diagonal traversal with the per-cell
    combine swapped to ``max(d, min(up, left, upleft))``; because the
    result is a max over 6-dp-pre-rounded distances, the value compare
    against the SQL oracle is selection-exact (no accumulated float)."""
    return _warp_join(
        tracks, max_km, id_col, seq_col, res, band,
        frechet=True, out_col="frechet_km",
    )


def _warp_join(
    tracks: DataFrame,
    thr_km: float,
    id_col: str,
    seq_col: str,
    res: int | None,
    band: int | None,
    frechet: bool,
    out_col: str,
) -> DataFrame:
    """Shared head-candidate + anti-diagonal-DP refine for dtw_join /
    frechet_join (identical candidate bound: both DPs pay the
    (first, first) cell, so thr_km bounds the head-to-head distance)."""
    arrs = track_arrays(tracks, id_col=id_col, seq_col=seq_col).localCheckpoint()

    heads = arrs.select(
        F.col(id_col),
        F.element_at("lons", 1).alias("lon"),
        F.element_at("lats", 1).alias("lat"),
    )
    cand = (
        radius_join(
            heads.select(F.col(id_col).alias("id_a"), "lon", "lat"),
            heads.select(F.col(id_col).alias("id_b"), "lon", "lat"),
            thr_km,
            res=res,
        )
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    a = arrs.select(
        F.col(id_col).alias("id_a"),
        F.col("lons").alias("_alons"), F.col("lats").alias("_alats"),
    )
    b = arrs.select(
        F.col(id_col).alias("id_b"),
        F.col("lons").alias("_blons"), F.col("lats").alias("_blats"),
    )
    paired = cand.join(a, "id_a").join(b, "id_b")

    schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField(out_col, DoubleType()),
        ]
    )
    thr = float(thr_km)
    bd, fr = band, frechet

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # pairs are batched BY (n, m) through _dtw_cost_batch — identical
        # per-cell arithmetic, but the diagonal loop runs once per shape
        # group instead of once per pair. _CHUNK bounds the per-diagonal
        # working set (pairs × min(n, m) doubles) so a monster-track
        # group cannot blow a worker.
        _CHUNK = 4_000_000
        for pdf in batches:
            al_list = [np.asarray(v, dtype=np.float64) for v in pdf["_alons"]]
            aa_list = [np.asarray(v, dtype=np.float64) for v in pdf["_alats"]]
            bl_list = [np.asarray(v, dtype=np.float64) for v in pdf["_blons"]]
            ba_list = [np.asarray(v, dtype=np.float64) for v in pdf["_blats"]]
            ids_a = pdf["id_a"].to_numpy(np.int64)
            ids_b = pdf["id_b"].to_numpy(np.int64)
            groups: dict[tuple[int, int], list[int]] = {}
            for i, (a, b) in enumerate(zip(al_list, bl_list)):
                groups.setdefault((a.size, b.size), []).append(i)
            ia, ib, ck = [], [], []
            for (n, m), idxs in groups.items():
                step = max(1, _CHUNK // max(1, min(n, m)))
                for lo in range(0, len(idxs), step):
                    chunk = idxs[lo : lo + step]
                    c = _round6(
                        _dtw_cost_batch(
                            np.stack([al_list[i] for i in chunk]),
                            np.stack([aa_list[i] for i in chunk]),
                            np.stack([bl_list[i] for i in chunk]),
                            np.stack([ba_list[i] for i in chunk]),
                            band=bd,
                            frechet=fr,
                        )
                    )
                    keep = c <= thr
                    if keep.any():
                        sel = np.asarray(chunk, dtype=np.int64)[keep]
                        ia.append(ids_a[sel])
                        ib.append(ids_b[sel])
                        ck.append(c[keep])
            if ia:
                yield pd.DataFrame(
                    {
                        "id_a": np.concatenate(ia),
                        "id_b": np.concatenate(ib),
                        out_col: np.concatenate(ck),
                    }
                )
            else:
                yield pd.DataFrame(
                    {
                        "id_a": np.asarray([], dtype=np.int64),
                        "id_b": np.asarray([], dtype=np.int64),
                        out_col: np.asarray([], dtype=np.float64),
                    }
                )

    return paired.mapInPandas(_kernel, schema)
