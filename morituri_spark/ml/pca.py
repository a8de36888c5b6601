"""Distributed embedding moments + PCA whitening — one combine pass.

The representation-hygiene member of the ml family (simsearch retrieves,
semdedup prunes; this RESHAPES): second-moment statistics over an
embedding column computed in one distributed pass, an eigendecomposition
of the tiny d×d covariance on the driver, and a whitening projection
whose output is verified to have identity covariance — the standard
pre-processing for embedding dedup/retrieval (whitened cosine ≈
Mahalanobis) and for drift monitoring.

Scale shape (rule 26 end to end): each task folds its WHOLE Arrow batch
iterator into one (n, Σx, ΣxᵀX) partial — a d + d² accumulator, never
per-row rows — and emits it EXPLODED as (i, j, v) triples so the final
combine is ONE map-side-combinable sum keyed by (i, j): shuffle volume
is tasks × d², independent of row count. The d×d eigendecomposition is
driver-side NumPy on collected aggregates (same budget class as the IVF
centroid collect, ml/simsearch.py). The projection is a second
mapInPandas matmul — vectors cross Arrow once, the d×d matrix rides the
closure.

Exactness: with ``quantize`` set, values are first rounded to integer
micro-units with the shared rule-16 formula, so every partial sum is
int64-exact and order-independent — byte-identical to a DuckDB replay.
The int64 budget is n·(q·max|x|)² < 2⁶³; pick q accordingly (q = 2²⁰
covers 8M unit-scale rows; the float64 mode is for the post-whitening
gate pass where tolerance, not identity, is the contract).

Reference scope: no counterpart in morituri; LLM-pipeline extension.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

#: marker indices in the moments output: (i, -1) first moments, (-1, -1) n.
N_ROW = -1


def embedding_moments(
    emb: DataFrame,
    vec_col: str = "embedding",
    quantize: Optional[int] = 2**20,
) -> DataFrame:
    """→ (i, j, v): Σ xᵢ·xⱼ for 0 ≤ i ≤ j < d, plus marker rows
    (i, −1) = Σ xᵢ and (−1, −1) = row count. With ``quantize`` = q the
    x are first mapped through floor(x·q + 0.5 + 1e-8) (int64-exact
    sums); with ``quantize=None`` sums are float64 (tolerance paths).
    """
    q = quantize

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = m = None
        for pdf in batches:
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if q is not None:
                x = np.floor(x * q + 0.5 + 1e-8)
            xi = x.astype(np.int64) if q is not None else x
            if s is None:
                d = xi.shape[1]
                s = np.zeros(d, dtype=xi.dtype)
                m = np.zeros((d, d), dtype=xi.dtype)
            n += xi.shape[0]
            s += xi.sum(axis=0)
            m += xi.T @ xi
        if s is None:
            return
        d = len(s)
        iu, ju = np.triu_indices(d)
        out_i = np.concatenate([iu, np.arange(d), [N_ROW]]).astype(np.int64)
        out_j = np.concatenate(
            [ju, np.full(d, N_ROW), [N_ROW]]
        ).astype(np.int64)
        out_v = np.concatenate([m[iu, ju], s, [n]]).astype(np.float64 if q is None else np.int64)
        yield pd.DataFrame({"i": out_i, "j": out_j, "v": out_v})

    vtype = "double" if q is None else "long"
    partials = emb.select(vec_col).mapInPandas(
        fold, f"i long, j long, v {vtype}"
    )
    return partials.groupBy("i", "j").agg(F.sum("v").alias("v"))


def covariance_from_moments(rows, d: int, quantize: Optional[int] = 2**20):
    """Driver-side assembly: collected (i, j, v) rows → (n, mean, cov)
    float64. ``rows`` is ``embedding_moments(...).collect()``."""
    qs = float(quantize) if quantize is not None else 1.0
    s = np.zeros(d)
    m = np.zeros((d, d))
    n = 0
    for r in rows:
        i, j, v = int(r["i"]), int(r["j"]), float(r["v"])
        if i == N_ROW:
            n = int(v)
        elif j == N_ROW:
            s[i] = v / qs
        else:
            m[i, j] = m[j, i] = v / (qs * qs)
    if n == 0:
        raise ValueError("embedding_moments saw no rows")
    mean = s / n
    cov = m / n - np.outer(mean, mean)
    return n, mean, cov


def whitening_matrix(cov: np.ndarray, eps: float = 1e-9) -> np.ndarray:
    """Symmetric (ZCA) whitening W = V diag(1/√(λ+eps)) Vᵀ."""
    lam, vec = np.linalg.eigh(cov)
    return vec @ np.diag(1.0 / np.sqrt(np.maximum(lam, 0.0) + eps)) @ vec.T


def project_embeddings(
    emb: DataFrame,
    mean: np.ndarray,
    mat: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (id, embedding): (x − mean) @ mat per row, one Arrow matmul per
    batch; mean/mat ride the closure (d and d×d — model parameters)."""
    mu = np.asarray(mean, dtype=np.float64)
    w = np.asarray(mat, dtype=np.float64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            y = (x - mu) @ w
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].to_numpy(), "embedding": list(y)}
            )

    return emb.select(id_col, vec_col).mapInPandas(
        run, f"vec_id long, embedding array<double>"
    )


def whitening_gates(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    tol: float = 1e-4,
) -> DataFrame:
    """→ (i, j, dev_micro) rows where the WHITENED data's covariance
    deviates from identity by more than ``tol`` — expected EMPTY (the
    invariant gate pattern: an empty result is the assertion). Runs the
    moments pass twice: exact-int on the inputs to fit the whitener,
    float64 on the projected vectors to measure the deviation.
    """
    spark = emb.sparkSession
    d = int(emb.select(F.size(F.col(vec_col))).first()[0])
    rows = embedding_moments(emb, vec_col=vec_col).collect()
    n, mean, cov = covariance_from_moments(rows, d)
    w = whitening_matrix(cov)
    proj = project_embeddings(emb, mean, w, id_col=id_col, vec_col=vec_col)
    rows2 = embedding_moments(proj, vec_col="embedding", quantize=None).collect()
    _, _, cov2 = covariance_from_moments(rows2, d, quantize=None)
    dev = np.abs(cov2 - np.eye(d))
    bad = np.argwhere(dev > tol)
    data = [
        (int(i), int(j), int(np.floor(dev[i, j] * 1e6 + 0.5 + 1e-8)))
        for i, j in bad
    ]
    return spark.createDataFrame(data, "i long, j long, dev_micro long")
