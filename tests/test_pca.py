"""embedding moments / whitening (ml/pca.py) vs NumPy references."""

import numpy as np
import pytest

from morituri_spark.ml.pca import (
    covariance_from_moments,
    embedding_moments,
    project_embeddings,
    whitening_gates,
    whitening_matrix,
)


def _emb_df(spark, x):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )


def _synth(n=120, d=6):
    # correlated, non-centered closed-form data
    base = np.array(
        [[((i * 7 + k * 13) % 29) / 7.0 - 2.0 for k in range(d)] for i in range(n)]
    )
    base[:, 1] = 0.5 * base[:, 0] + 0.1 * base[:, 1] + 1.5  # force correlation
    return np.float32(base)


def test_moments_match_numpy_exactly(spark):
    x = _synth()
    q = 2**20
    xi = np.floor(x.astype(np.float64) * q + 0.5 + 1e-8).astype(np.int64)
    got = {
        (r["i"], r["j"]): r["v"]
        for r in embedding_moments(_emb_df(spark, x)).collect()
    }
    d = x.shape[1]
    assert got[(-1, -1)] == len(x)
    for i in range(d):
        assert got[(i, -1)] == xi[:, i].sum()
        for j in range(i, d):
            assert got[(i, j)] == int((xi[:, i] * xi[:, j]).sum())


def test_moments_partition_invariant(spark):
    x = _synth(80, 5)
    df1 = _emb_df(spark, x).repartition(1)
    df7 = _emb_df(spark, x).repartition(7)
    a = sorted(map(tuple, embedding_moments(df1).collect()))
    b = sorted(map(tuple, embedding_moments(df7).collect()))
    assert a == b  # int64 sums are order/partition independent


def test_covariance_assembly_matches_numpy(spark):
    x = _synth()
    rows = embedding_moments(_emb_df(spark, x)).collect()
    n, mean, cov = covariance_from_moments(rows, x.shape[1])
    assert n == len(x)
    ref = x.astype(np.float64)
    # quantization moves values by <= 2^-21 per coordinate
    assert np.allclose(mean, ref.mean(axis=0), atol=1e-5)
    assert np.allclose(cov, np.cov(ref.T, bias=True), atol=1e-4)


def test_projection_and_whitening_identity(spark):
    x = _synth()
    df = _emb_df(spark, x)
    rows = embedding_moments(df).collect()
    n, mean, cov = covariance_from_moments(rows, x.shape[1])
    w = whitening_matrix(cov)
    y = np.stack(
        [
            r["embedding"]
            for r in project_embeddings(df, mean, w).orderBy("vec_id").collect()
        ]
    )
    cov_y = np.cov(y.T, bias=True)
    assert np.allclose(cov_y, np.eye(x.shape[1]), atol=1e-3)


def test_whitening_gates_empty_on_healthy_data(spark):
    assert whitening_gates(_emb_df(spark, _synth())).count() == 0


def test_whitening_gates_catch_unwhitened(spark):
    # identity "whitener" deviation check: gates on raw correlated data
    # must fire if we skip the fit — simulate by projecting with identity
    x = _synth()
    df = _emb_df(spark, x)
    rows = embedding_moments(df).collect()
    _, mean, cov = covariance_from_moments(rows, x.shape[1])
    proj = project_embeddings(df, mean, np.eye(x.shape[1]))
    rows2 = embedding_moments(proj, quantize=None).collect()
    _, _, cov2 = covariance_from_moments(rows2, x.shape[1], quantize=None)
    assert np.abs(cov2 - np.eye(x.shape[1])).max() > 1e-2
