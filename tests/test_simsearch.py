"""Similarity search: brute-force exact vs NumPy oracle; LSH recall."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from morituri_spark.ml import simsearch as S

DIM = 16


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((200, DIM)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(200, dtype=np.int64), "embedding": list(map(list, vecs))})
    return spark.createDataFrame(pdf).cache(), vecs


def _oracle_topk(vecs, q, k):
    qn = q / np.linalg.norm(q)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = vn @ qn
    order = np.lexsort((np.arange(len(vecs)), -sims))[:k]
    return [int(i) for i in order]


def test_topk_bruteforce_matches_oracle(spark, emb):
    df, vecs = emb
    q = vecs[0].astype(np.float64)
    got = [r["vec_id"] for r in S.topk_bruteforce(df, list(q), k=10).collect()]
    assert got == _oracle_topk(vecs.astype(np.float64), q, 10)
    assert got[0] == 0  # self is the nearest


def test_knn_join_bruteforce(spark, emb):
    df, vecs = emb
    queries = df.select(F.col("vec_id").alias("query_id"), "embedding").where("query_id < 5")
    out = S.knn_join_bruteforce(queries, df, k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    for qid in range(5):
        got = [v for _, v in sorted(by_q[qid])]
        want = _oracle_topk(vecs.astype(np.float64), vecs[qid].astype(np.float64), 3)
        assert got == want
        assert got[0] == qid


def test_lsh_ann_recall(spark, emb):
    df, vecs = emb
    queries = df.select(F.col("vec_id").alias("query_id"), "embedding").where("query_id < 20")
    ann = S.ann_topk_lsh(queries, df, dim=DIM, k=1, n_bits=6)
    rows = ann.where("rank = 0").collect()
    # rank-0 with single-probe LSH: self always lands in its own bucket →
    # top-1 must be the query itself, for every query
    assert len(rows) == 20
    assert all(r["vec_id"] == r["query_id"] for r in rows)


def test_lsh_bucket_determinism(spark, emb):
    df, _ = emb
    b1 = {r["vec_id"]: r["bucket"] for r in S.with_lsh_bucket(df, DIM).collect()}
    b2 = {r["vec_id"]: r["bucket"] for r in S.with_lsh_bucket(df, DIM).collect()}
    assert b1 == b2


def test_lsh_multiprobe_improves_recall(spark, emb):
    df, vecs = emb
    queries = df.select(F.col("vec_id").alias("query_id"), "embedding").where("query_id < 30")

    def recall(ann_df):
        got = {}
        for r in ann_df.collect():
            got.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
        hits = 0
        for qid in range(30):
            want = _oracle_topk(vecs.astype(np.float64), vecs[qid].astype(np.float64), 3)
            have = [v for _, v in sorted(got.get(qid, []))]
            hits += len(set(want) & set(have))
        return hits / (30 * 3)

    single = recall(S.ann_topk_lsh(queries, df, dim=DIM, k=3, n_bits=8, n_probes=1))
    multi = recall(S.ann_topk_lsh(queries, df, dim=DIM, k=3, n_bits=8, n_probes=9))
    assert multi >= single
    # random gaussian vectors have weak neighbor structure (true NNs differ
    # in several sign bits); measured: single ≈ 0.36, multi ≈ 0.48 here
    assert multi >= 0.45


def test_ivf_ann(spark, emb):
    df, vecs = emb
    queries = df.select(F.col("vec_id").alias("query_id"), "embedding").where("query_id < 20")
    out = S.ann_topk_ivf(queries, df, k=1, n_lists=8, n_probe=2)
    rows = out.where("rank = 0").collect()
    # self is in its own list → top-1 must be the query itself, every query
    assert len(rows) == 20
    assert all(r["vec_id"] == r["query_id"] for r in rows)

    # recall@3 with modest probes beats single-bucket LSH on the same data
    def recall(ann_df, k):
        got = {}
        for r in ann_df.collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        hits = 0
        for qid in range(20):
            want = set(_oracle_topk(vecs.astype(np.float64), vecs[qid].astype(np.float64), k))
            hits += len(want & got.get(qid, set()))
        return hits / (20 * k)

    r_ivf = recall(S.ann_topk_ivf(queries, df, k=3, n_lists=8, n_probe=4), 3)
    assert r_ivf >= 0.6


def test_salted_probe_join_matches_unsalted(spark, emb):
    """Forcing salting (tiny target) must return exactly the unsalted
    result for both ANN variants — the per-query window re-merges salt
    splits, so salting is a pure physical-plan change."""
    df, _ = emb
    queries = df.select(F.col("vec_id").alias("query_id"), "embedding").where("query_id < 15")

    def rows(ann_df):
        return sorted(
            (r["query_id"], r["rank"], r["vec_id"], r["cosine"]) for r in ann_df.collect()
        )

    base_lsh = rows(S.ann_topk_lsh(queries, df, dim=DIM, k=3, n_bits=4))
    salted_lsh = rows(S.ann_topk_lsh(queries, df, dim=DIM, k=3, n_bits=4, salt_target_rows=5))
    assert base_lsh == salted_lsh
    base_ivf = rows(S.ann_topk_ivf(queries, df, k=3, n_lists=4, n_probe=2))
    salted_ivf = rows(S.ann_topk_ivf(queries, df, k=3, n_lists=4, n_probe=2, salt_target_rows=5))
    assert base_ivf == salted_ivf


def test_ivf_centroids_deterministic(spark, emb):
    df, _ = emb
    c1 = S.train_ivf_centroids(df, n_lists=8)
    c2 = S.train_ivf_centroids(df, n_lists=8)
    assert np.allclose(c1, c2)


def test_ivf_indexed_matches_in_memory(spark, emb, tmp_path):
    # persisted list-partitioned index returns byte-identical results to the
    # in-memory IVF path, and the scan is pruned to the probed partitions
    import contextlib
    import io

    df, _ = emb
    queries = df.select(F.col("vec_id").alias("query_id"), "embedding").where("query_id < 15")
    path = str(tmp_path / "ivf_idx")
    cents = S.build_ivf_index(df, path, n_lists=8)
    loaded = S.load_ivf_centroids(spark, path)
    assert np.allclose(cents, loaded)

    want = sorted(
        map(tuple, S.ann_topk_ivf(queries, df, k=3, n_lists=8, n_probe=2, centroids=cents).collect())
    )
    got_df = S.ann_topk_ivf_indexed(spark, path, queries, k=3, n_probe=2)
    got = sorted(map(tuple, got_df.collect()))
    assert got == want

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got_df.explain("formatted")
    assert "PartitionFilters" in buf.getvalue() and "ivf_list" in buf.getvalue()


def test_distributed_kmeans_matches_quality_and_serves_ivf(spark, emb):
    """Distributed Lloyd's over the full corpus: valid unit centroids,
    objective no worse than the sample trainer's, and the resulting IVF
    ANN keeps recall vs brute force."""
    from morituri_spark.ml.simsearch import (
        ann_topk_ivf, knn_join_bruteforce, train_ivf_centroids,
        train_ivf_centroids_distributed,
    )

    df, vecs = emb
    Cd = train_ivf_centroids_distributed(df, n_lists=8, iters=8)
    assert Cd.shape == (8, DIM)
    assert np.allclose(np.linalg.norm(Cd, axis=1), 1.0, atol=1e-9)

    X = vecs.astype(np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)

    def objective(C):
        return float(np.mean(np.max(X @ C.T, axis=1)))  # mean best-cosine

    Cs = train_ivf_centroids(df, n_lists=8)
    assert objective(Cd) >= objective(Cs) - 1e-6

    q = df.limit(20).withColumnRenamed("vec_id", "query_id")
    got = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in ann_topk_ivf(q, df, k=3, n_probe=4, centroids=Cd).collect()
    }
    exact = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in knn_join_bruteforce(q, df, k=3).collect()
    }
    hits = sum(got.get(k) == v for k, v in exact.items())
    assert hits / len(exact) >= 0.8  # recall floor with 4/8 lists probed


def test_round6_is_half_up_not_bankers():
    """Rule 16: kernel rounding must match DuckDB/Spark half-up, not
    np.round's banker's — and be half AWAY FROM ZERO on negatives."""
    assert S._round6(np.float64(0.1234565)) == pytest.approx(0.123457)
    assert S._round6(np.float64(-0.1234565)) == pytest.approx(-0.123457)
    # the exact case banker's rounding gets "wrong" vs SQL engines
    assert float(np.round(0.1234565, 6)) == pytest.approx(0.123456)
    arr = S._round6(np.array([0.9999995, -0.0000005, 0.25]))
    assert arr == pytest.approx([1.0, -0.000001, 0.25])


def test_embedding_near_dup_blocksplit_matches_unsplit(spark, emb):
    """Forcing hot-bucket pair-block splitting (tiny salt target) must
    return exactly the single-task-per-bucket result: blocks partition the
    unordered pair space, so splitting is a physical-plan change only."""
    df, _ = emb

    def rows(nd):
        return sorted((r["vec_a"], r["vec_b"], r["cosine"]) for r in nd.collect())

    base = rows(S.embedding_near_duplicates(df, threshold=0.3, dim=DIM, n_bits=4))
    split = rows(
        S.embedding_near_duplicates(
            df, threshold=0.3, dim=DIM, n_bits=4, salt_target_rows=5
        )
    )
    assert len(base) > 0
    assert split == base
    # and the LSH path agrees with the exact path on the pairs it recalls
    # (same rounding rule on both sides)
    exact = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in S.embedding_near_duplicates(
            df, threshold=0.3, dim=DIM, exact=True
        ).collect()
    }
    for a, b, c in base:
        assert (a, b) in exact
        assert c == pytest.approx(exact[(a, b)], abs=2e-6)


# ---------------------------------------------------------------------------
# PQ / IVF-PQ (r5)
# ---------------------------------------------------------------------------

def _pq_oracle(vecs, qids, codebooks, k):
    """Driver-side NumPy replay of encode + ADC + (rounded, id) ranking."""
    m, n_codes, dsub = codebooks.shape
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    codes = np.empty((len(vn), m), dtype=np.int64)
    for j in range(m):
        sub = vn[:, j * dsub:(j + 1) * dsub]
        d2 = ((sub[:, None, :] - codebooks[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = np.argmin(d2, axis=1)
    out = {}
    for qid in qids:
        score = np.zeros(len(vn))
        for j in range(m):
            lut = vn[qid, j * dsub:(j + 1) * dsub] @ codebooks[j].T
            score = score + lut[codes[:, j]]
        score = S._round6(score)
        order = np.lexsort((np.arange(len(vn)), -score))[:k]
        out[qid] = [(int(i), float(score[i])) for i in order]
    return out


def test_pq_encode_parity_and_fast_paths_agree(spark, emb):
    df, _ = emb
    cb = S.fixed_pq_codebooks(4, 8, DIM)
    a = S.pq_encode(df, cb, parity=True).select("vec_id", "pq_code").toPandas()
    b = S.pq_encode(df, cb, parity=False).select("vec_id", "pq_code").toPandas()
    a = a.set_index("vec_id").sort_index()
    b = b.set_index("vec_id").sort_index()
    assert all(list(x) == list(y) for x, y in zip(a["pq_code"], b["pq_code"]))
    assert all(0 <= c < 8 for row in a["pq_code"] for c in row)


def test_ann_topk_pq_matches_numpy_adc(spark, emb):
    df, vecs = emb
    cb = S.fixed_pq_codebooks(4, 8, DIM)
    queries = df.select(F.col("vec_id").alias("query_id"), "embedding").where("query_id < 6")
    got = S.ann_topk_pq(queries, df, k=3, codebooks=cb).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["adc_score"]))
    want = _pq_oracle(vecs.astype(np.float64), range(6), cb, 3)
    for qid in range(6):
        rows = sorted(by_q[qid])
        assert [(v, s) for _, v, s in rows] == [
            (v, pytest.approx(s, abs=1.5e-6)) for v, s in want[qid]
        ]


def test_ivfpq_full_probe_matches_pq_scan(spark, emb):
    """n_probe = n_lists ⇒ every (query, candidate) pair is scored exactly
    once across the probed lists, so the cogrouped IVF-PQ path must equal
    the broadcast-LUT scan path row-for-row (same codebooks, same ranking
    key) — the PQ analogue of the salted/unsalted parity test."""
    df, _ = emb
    cb = S.fixed_pq_codebooks(4, 8, DIM)
    cents = S.fixed_centroids(4, DIM)
    queries = df.select(F.col("vec_id").alias("query_id"), "embedding").where("query_id < 8")
    scan = S.ann_topk_pq(queries, df, k=3, codebooks=cb).collect()
    ivf = S.ann_topk_ivfpq(
        queries, df, k=3, n_lists=4, n_probe=4, centroids=cents, codebooks=cb
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])
    a = {key(r): (r["vec_id"], round(r["adc_score"], 6)) for r in scan}
    b = {key(r): (r["vec_id"], round(r["adc_score"], 6)) for r in ivf}
    assert a == b


def test_ivfpq_refine_restores_self_hit(spark, emb):
    """Quantization can demote an exact-match query inside its ADC
    shortlist, but exact re-rank must put self back at rank 0 with cosine
    1.0 whenever ADC kept it in the top-(k·refine) — with full probing and
    a generous refine factor that holds for every query on this corpus."""
    df, _ = emb
    cb = S.fixed_pq_codebooks(4, 8, DIM)
    cents = S.fixed_centroids(4, DIM)
    queries = df.select(F.col("vec_id").alias("query_id"), "embedding").where("query_id < 10")
    out = S.ann_topk_ivfpq(
        queries, df, k=3, n_lists=4, n_probe=4, centroids=cents, codebooks=cb,
        refine=30,
    ).where("rank = 0").collect()
    assert len(out) == 10
    assert all(r["vec_id"] == r["query_id"] and r["cosine"] == 1.0 for r in out)


def test_trained_pq_codebooks_beat_fixed_on_distortion(spark, emb):
    """Data-adaptive quality property: per-subspace k-means codebooks give
    strictly lower mean quantization distortion than data-independent
    random codebooks on the same corpus (the reason train_pq_codebooks
    exists), and training is deterministic."""
    df, vecs = emb
    t1 = S.train_pq_codebooks(df, m=4, n_codes=8)
    t2 = S.train_pq_codebooks(df, m=4, n_codes=8)
    assert np.array_equal(t1, t2)
    fx = S.fixed_pq_codebooks(4, 8, DIM)
    vn = vecs.astype(np.float64)
    vn = vn / np.linalg.norm(vn, axis=1, keepdims=True)

    def distortion(cb):
        m, _, dsub = cb.shape
        tot = 0.0
        for j in range(m):
            sub = vn[:, j * dsub:(j + 1) * dsub]
            d2 = ((sub[:, None, :] - cb[j][None, :, :]) ** 2).sum(axis=2)
            tot += float(d2.min(axis=1).mean())
        return tot

    assert distortion(t1) < distortion(fx)


def test_ivfpq_indexed_matches_in_memory(spark, emb, tmp_path):
    """The codes-only persisted index must serve byte-identical results to
    the in-memory IVF-PQ path (shared _ivfpq_adc_tail), with and without
    the exact-refine stage; refine without a source table raises."""
    df, _ = emb
    cb = S.fixed_pq_codebooks(4, 8, DIM)
    cents = S.fixed_centroids(4, DIM)
    idx = str(tmp_path / "ivfpq_idx")
    S.build_ivfpq_index(df, idx, n_lists=4, centroids=cents, codebooks=cb)
    queries = df.select(F.col("vec_id").alias("query_id"), "embedding").where("query_id < 8")

    key = lambda r: (r["query_id"], r["rank"])
    mem = S.ann_topk_ivfpq(
        queries, df, k=3, n_lists=4, n_probe=2, centroids=cents, codebooks=cb
    ).collect()
    ind = S.ann_topk_ivfpq_indexed(spark, idx, queries, k=3, n_probe=2).collect()
    assert {key(r): (r["vec_id"], r["adc_score"]) for r in mem} == \
           {key(r): (r["vec_id"], r["adc_score"]) for r in ind}

    mem_r = S.ann_topk_ivfpq(
        queries, df, k=3, n_lists=4, n_probe=2, centroids=cents, codebooks=cb,
        refine=10,
    ).collect()
    ind_r = S.ann_topk_ivfpq_indexed(
        spark, idx, queries, k=3, n_probe=2, refine=10, emb=df
    ).collect()
    assert {key(r): (r["vec_id"], r["cosine"]) for r in mem_r} == \
           {key(r): (r["vec_id"], r["cosine"]) for r in ind_r}

    with pytest.raises(ValueError, match="refine"):
        S.ann_topk_ivfpq_indexed(spark, idx, queries, k=3, refine=5).collect()

    # the sidecars round-trip exactly (float64 parquet)
    assert np.array_equal(S.load_pq_codebooks(spark, idx), cb)
    assert np.array_equal(S.load_ivf_centroids(spark, idx), cents)
