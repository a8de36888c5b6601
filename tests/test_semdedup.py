"""semdedup (ml/semdedup.py) vs a brute-force in-process reference."""
import math

import numpy as np
import pytest

from morituri_spark.ml.semdedup import assign_clusters, seed_centroids, semdedup


def _round6(x):
    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5 + 1e-8) / 1e6


def _emb_df(spark, n=120, dim=8, seed=3, dupes=12):
    rng = np.random.default_rng(seed)
    V = rng.normal(size=(n, dim))
    # plant near-duplicates: row i+n is row i plus tiny noise
    D = V[:dupes] + rng.normal(scale=1e-3, size=(dupes, dim))
    X = np.vstack([V, D])
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(len(X))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), X


def _ref_semdedup(X, k, thr):
    C = X[:k]
    cn = np.linalg.norm(C, axis=1)
    xn = np.linalg.norm(X, axis=1)
    sims = _round6((X @ C.T) / (xn[:, None] * cn[None, :]))
    cl = np.argmax(sims, axis=1)
    keep = np.ones(len(X), dtype=bool)
    for j in range(len(X)):
        for i in range(j):
            if cl[i] == cl[j]:
                c = _round6(X[i] @ X[j] / (xn[i] * xn[j]))
                if c >= thr:
                    keep[j] = False
                    break
    return cl, keep


def test_assign_matches_reference(spark):
    df, X = _emb_df(spark)
    C = seed_centroids(df, 4)
    assert np.allclose(C, X[:4])
    got = {r["vec_id"]: r["cluster_id"] for r in assign_clusters(df, C).collect()}
    cl, _ = _ref_semdedup(X, 4, 2.0)
    assert got == {i: int(cl[i]) for i in range(len(X))}


def test_semdedup_drops_planted_duplicates(spark):
    df, X = _emb_df(spark, n=60, dupes=10)
    out = {r["vec_id"]: (r["cluster_id"], r["keep"]) for r in
           semdedup(df, n_clusters=4, threshold=0.98, dim=8).collect()}
    cl, keep = _ref_semdedup(X, 4, 0.98)
    assert out == {i: (int(cl[i]), bool(keep[i])) for i in range(len(X))}
    # the planted copies (ids 60..69) must be dropped — same cluster as
    # their source (cosine ≈ 1 to it) and higher id
    dropped = [i for i, (_, kp) in out.items() if not kp]
    assert set(range(60, 70)) <= set(dropped)
    # originals survive (nothing below them duplicates them)
    assert all(out[i][1] for i in range(10))


def test_semdedup_hot_cluster_pair_blocks(spark):
    # force every vector into one cluster and salt_target_rows tiny so the
    # pair-block splitting path runs; results must be identical
    df, X = _emb_df(spark, n=50, dupes=8)
    base = {r["vec_id"]: r["keep"] for r in
            semdedup(df, n_clusters=1, threshold=0.98, dim=8).collect()}
    split = {r["vec_id"]: r["keep"] for r in
             semdedup(df, n_clusters=1, threshold=0.98, dim=8,
                      salt_target_rows=10).collect()}
    assert base == split
    cl, keep = _ref_semdedup(X, 1, 0.98)
    assert base == {i: bool(keep[i]) for i in range(len(X))}


def test_zero_norm_centroid_rejected(spark):
    df, _ = _emb_df(spark, n=10, dupes=0)
    with pytest.raises(ValueError, match="zero-norm"):
        assign_clusters(df, np.zeros((2, 8)))
