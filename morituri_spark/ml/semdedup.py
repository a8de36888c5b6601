"""SemDeDup — semantic deduplication via embedding clustering.

The Abbas et al. 2023 recipe (arXiv:2303.09540) distributed: cluster the
embedding corpus with k centroids, then search for near-duplicate pairs
only WITHIN a cluster (cosine ≥ threshold) and keep one exemplar per
duplicate relation. At 10^12 documents with k ≈ √N clusters this turns
the quadratic all-pairs search into Σ m_c² work over clusters of expected
size √N — the same candidate-bounding idea as LSH banding, but with
EXACT candidate generation (recall 1.0 within the clustering's blocking
assumption, which is the algorithm's published semantics).

Spark shape:
  * assignment — one ``mapInPandas`` pass: the k×dim centroid matrix is a
    broadcast NumPy literal, each Arrow batch scores X @ Cᵀ in one matmul
    and takes argmax of the ROUNDED cosine (first max → lowest centroid
    id, replayable by ``ORDER BY cos DESC, cid`` in SQL). No shuffle.
  * within-cluster search — the pair-block machinery of
    :func:`simsearch._self_pair_blocks` (splitting above
    ``salt_target_rows`` members, ≤256 MB matmul tiles) with a DROPPED-ID
    kernel: each task emits only its unique dropped ids (≤ block rows)
    via axis reductions, never the m² qualifying pairs — a loose
    threshold on a correlated corpus qualifies ~10% of ALL pairs
    (measured 59M rows from 200k vectors), and shipping those through
    Arrow + a distinct exchange dwarfs the matmul that found them. For
    the pair LIST (ids + cosines), use
    :func:`simsearch.embedding_near_duplicates` with
    ``bucket_col="cluster_id"``.
  * keep rule — drop the HIGHER id of every qualifying pair (``vec_b``);
    deterministic, order-free, and SQL-replayable as a distinct anti-set
    (no iterative chaining: SemDeDup drops any member that duplicates a
    surviving-or-dropped lower id, exactly the paper's "keep one random
    exemplar" made deterministic).

Centroids: pass a trained matrix (e.g. ``simsearch.
train_ivf_centroids_distributed``) for production; the default
``seed_centroids`` takes the k lowest-id vectors so the whole pipeline —
assignment included — is replayable by the DuckDB oracle with no
engine-private state.

Reference scope: no counterpart in morituri (the reference stops at
location dedup, plugins/navteq/navteq.hpp:480-500); this is part of the
training-data extension family (SURVEY.md §2 LLM-pipeline operators).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from .simsearch import _round6, _self_pair_blocks


def seed_centroids(
    emb: DataFrame, n_clusters: int, vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """k×dim matrix of the ``n_clusters`` lowest-id vectors — the
    deterministic, oracle-replayable centroid seed (driver-side collect of
    k rows only, the IVF-trainer discipline)."""
    rows = (
        emb.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(int(n_clusters))
        .collect()
    )
    return np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])


def assign_clusters(
    emb: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "cluster_id",
) -> DataFrame:
    """Append ``out_col``: index of the max-cosine centroid (ties → lowest
    index). Cosines are rule-16 rounded BEFORE the argmax so the oracle's
    ``row_number() OVER (ORDER BY cos DESC, cid)`` sees identical values;
    argmax returns the first maximum, which is exactly the lowest centroid
    id among the rounded ties. One Arrow matmul per batch, no shuffle."""
    C = np.asarray(centroids, dtype=np.float64)
    cn = np.linalg.norm(C, axis=1)
    if np.any(cn == 0.0):
        raise ValueError("zero-norm centroid: cosine undefined")
    bc = emb.sparkSession.sparkContext.broadcast((C, cn))
    schema = StructType(emb.schema.fields + [StructField(out_col, IntegerType(), False)])

    def run(batches):
        C, cn = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            xn = np.linalg.norm(X, axis=1)
            xn[xn == 0.0] = 1.0  # zero vector: cosine 0 to every centroid
            sims = _round6((X @ C.T) / (xn[:, None] * cn[None, :]))
            out = pdf.copy()
            out[out_col] = np.argmax(sims, axis=1).astype(np.int32)
            yield out

    return emb.mapInPandas(run, schema)


def semdedup(
    emb: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.95,
    dim: int = 64,
    centroids: np.ndarray | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    salt_target_rows: int = 100_000,
) -> DataFrame:
    """→ (``id_col``, cluster_id, keep): ``keep`` is False iff some
    lower-id member of the same cluster has rounded cosine ≥ ``threshold``
    with this row. Feed ``centroids`` from a trained k-means for
    production; default seeds are the k lowest ids (oracle-replayable)."""
    C = seed_centroids(emb, n_clusters, vec_col, id_col) if centroids is None else centroids
    # the assignment matmul feeds BOTH the pair search and the output join
    # — materialize it once (rule 21: an unshared two-branch plan would run
    # the Arrow kernel over the whole corpus twice). At cluster scale this
    # is the "write assignments once, read twice" stage of the published
    # recipe; localCheckpoint is the in-session equivalent.
    assigned = assign_clusters(emb, C, vec_col, id_col).localCheckpoint()
    dropped = _dropped_ids(
        assigned, float(threshold), vec_col, id_col, salt_target_rows
    )
    return (
        assigned.join(
            dropped.withColumn("_dup", F.lit(True)), id_col, "left"
        )
        .select(
            id_col,
            "cluster_id",
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep"),
        )
    )


def _dropped_ids(
    assigned: DataFrame,
    threshold: float,
    vec_col: str,
    id_col: str,
    salt_target_rows: int,
) -> DataFrame:
    """Within-cluster dropped-id set via the pair-block kernel — but each
    task emits only its UNIQUE dropped ids (≤ block rows), never the m²
    qualifying pairs: a correlated corpus at a loose threshold can have
    ~10% of all pairs qualify (measured 59M pair rows from 200k vectors),
    and shipping those through Arrow + a distinct exchange dwarfs the
    matmul that found them. The drop rule (higher id of any qualifying
    pair) reduces per-hit to max(id_i, id_j), so uniqueness inside the
    task bounds output by membership, not by hit count."""
    ab = assigned.select(id_col, vec_col, F.col("cluster_id").alias("bucket"))
    m = _self_pair_blocks(ab, id_col, salt_target_rows)
    out_schema = StructType([StructField(id_col, assigned.schema[id_col].dataType, True)])
    thr = float(threshold)

    def dropped(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        blk_a, blk_b = int(key[1]), int(key[2])
        if len(pdf) < 2:
            return pd.DataFrame({id_col: []})
        hs = pdf["_h"].to_numpy()
        if blk_a == blk_b:
            left = right = pdf
            same = True
        else:
            left, right = pdf[hs == blk_a], pdf[hs == blk_b]
            same = False
            if len(left) == 0 or len(right) == 0:
                return pd.DataFrame({id_col: []})
        L = np.stack([np.asarray(v, dtype=np.float64) for v in left[vec_col]])
        R = L if same else np.stack(
            [np.asarray(v, dtype=np.float64) for v in right[vec_col]]
        )
        ln = np.linalg.norm(L, axis=1)
        rn = ln if same else np.linalg.norm(R, axis=1)
        ln = np.where(ln == 0.0, 1.0, ln)
        rn = ln if same else np.where(rn == 0.0, 1.0, rn)
        lids, rids = left[id_col].to_numpy(), right[id_col].to_numpy()
        # per-member "any qualifying partner with a lower id" flags via
        # axis reductions — never np.nonzero: a dense hit matrix (loose
        # threshold × correlated corpus) would materialize ~m² index pairs
        # (measured: 300M int64s for one 20k block) when all we need is
        # one boolean per member
        drop_l = np.zeros(len(L), dtype=bool)
        drop_r = np.zeros(len(R), dtype=bool)
        tile = max(1, (32 << 20) // max(len(R), 1))
        for t0 in range(0, len(L), tile):
            t1 = min(t0 + tile, len(L))
            sims = _round6(
                (L[t0:t1] @ R.T) / (ln[t0:t1, None] * rn[None, :])
            )
            hit = sims >= thr
            if same:
                hit &= np.arange(len(R))[None, :] > np.arange(t0, t1)[:, None]
            lt = lids[t0:t1, None] < rids[None, :]
            drop_r |= (hit & lt).any(axis=0)
            drop_l[t0:t1] |= (hit & ~lt).any(axis=1)
        if same:
            dropped_ids = np.unique(rids[drop_r | drop_l])
        else:
            dropped_ids = np.unique(
                np.concatenate([lids[drop_l], rids[drop_r]])
            )
        if len(dropped_ids) == 0:
            return pd.DataFrame({id_col: []})
        return pd.DataFrame({id_col: dropped_ids})

    return (
        m.groupBy("bucket", "_blk.a", "_blk.b")
        .applyInPandas(dropped, out_schema)
        .distinct()
    )
