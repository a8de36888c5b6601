"""kNN ring expansion vs brute-force oracle."""

import pandas as pd
import numpy as np
import pytest
from pyspark.sql import functions as F

from morituri_spark.geo import knn
from morituri_spark.sources.synth import _lonlat_for_ids


@pytest.fixture(scope="module")
def pts(spark):
    ids = np.arange(2000)
    lon, lat = _lonlat_for_ids(ids)
    cand = spark.createDataFrame(
        pd.DataFrame({"cand_id": ids, "lon": lon, "lat": lat})
    ).cache()
    qids = np.arange(40)
    qlon, qlat = _lonlat_for_ids(qids * 31 + 7)
    q = spark.createDataFrame(
        pd.DataFrame({"query_id": qids, "lon": qlon, "lat": qlat})
    ).cache()
    return q, cand


def _as_map(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append((r["rank"], r["cand_id"], r["dist"]))
    return {k: [x[1:] for x in sorted(v)] for k, v in out.items()}


def test_knn_matches_bruteforce(spark, pts):
    q, cand = pts
    got = _as_map(knn.knn_join(q, cand, k=5, res=8).collect())
    want = _as_map(knn.knn_bruteforce(q, cand, k=5).collect())
    assert got.keys() == want.keys()
    for qid in want:
        assert got[qid] == want[qid], f"query {qid}"


def test_knn_matches_bruteforce_haversine(spark, pts):
    q, cand = pts
    got = _as_map(knn.knn_join(q.limit(10), cand, k=3, res=8, metric="haversine_km").collect())
    want = _as_map(knn.knn_bruteforce(q.limit(10), cand, k=3, metric="haversine_km").collect())
    assert got == want


def test_knn_haversine_high_latitude(spark):
    """At |lat| > 60° the lon cell extent in km drops below the lat extent;
    the equator-calibrated bound would stop early and return a non-nearest
    x-separated neighbor (ADVICE r1). Dense lon-scatter at lat 72°."""
    rng = np.random.default_rng(7)
    n = 800
    lon = rng.uniform(-20.0, 20.0, n)
    lat = 72.0 + rng.uniform(-0.5, 0.5, n)
    cand = spark.createDataFrame(
        pd.DataFrame({"cand_id": np.arange(n), "lon": lon, "lat": lat})
    ).cache()
    q = spark.createDataFrame(
        pd.DataFrame({"query_id": np.arange(12), "lon": rng.uniform(-18, 18, 12), "lat": 72.0 + rng.uniform(-0.4, 0.4, 12)})
    ).cache()
    got = _as_map(knn.knn_join(q, cand, k=4, res=8, metric="haversine_km").collect())
    want = _as_map(knn.knn_bruteforce(q, cand, k=4, metric="haversine_km").collect())
    assert got == want


def test_knn_many_rings_stable(spark):
    """Sparse far-apart candidates force many expansion rounds — exercises
    the lineage-truncation/persist-hygiene path (VERDICT r1 #10)."""
    q = spark.createDataFrame(pd.DataFrame({"query_id": [0], "lon": [0.0], "lat": [0.0]}))
    cand = spark.createDataFrame(
        pd.DataFrame({"cand_id": [1, 2, 3], "lon": [15.0, 20.0, 25.0], "lat": [0.0, 0.0, 0.0]})
    )
    out = knn.knn_join(q, cand, k=3, res=8, max_rings=80).collect()
    assert [r["cand_id"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2, 3]


def test_knn_k_larger_than_candidates(spark):
    q = spark.createDataFrame(pd.DataFrame({"query_id": [0], "lon": [5.0], "lat": [45.0]}))
    cand = spark.createDataFrame(
        pd.DataFrame({"cand_id": [1, 2], "lon": [5.1, 5.2], "lat": [45.0, 45.0]})
    )
    out = knn.knn_join(q, cand, k=10, res=8, max_rings=80).collect()
    assert len(out) == 2  # all candidates found, never more
    assert [r["cand_id"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2]


def test_knn_releases_iteration_blocks(spark, pts):
    """Superseded checkpoint/persist rounds are actually freed: after the
    run completes (result collected), only O(1) persistent RDDs may remain
    (the final accumulator backing the returned DataFrame)."""
    q, c = pts

    def ids():
        return {int(i) for i in
                spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()}

    before = ids()
    out = knn.knn_join(q, c, k=3, res=8)
    out.collect()
    leaked = ids() - before
    assert len(leaked) <= 1, f"leaked persistent RDDs: {sorted(leaked)}"


def test_knn_topk_salt_auto_routing(spark, pts):
    """"auto" engages the two-stage top-k only at max cell population ≥
    salt_cell_threshold, and the result is identical either way (top-k of
    per-sub-group top-ks ≡ global top-k)."""
    q, cand = pts
    base = _as_map(knn.knn_join(q, cand, k=5, res=8, topk_salt=None).collect())
    # threshold=1 → every cell qualifies → salt engaged; results unchanged
    salted = _as_map(
        knn.knn_join(
            q, cand, k=5, res=8, topk_salt="auto", salt_cell_threshold=1
        ).collect()
    )
    assert salted == base
    # default threshold (4M) cannot engage on a 2k corpus; same results
    auto = _as_map(knn.knn_join(q, cand, k=5, res=8).collect())
    assert auto == base


def test_knn_ring_batch_equivalence(spark, pts):
    """Geometric ring batching (default) ≡ one-ring-per-round: the block's
    outer-radius termination bound cannot admit a non-nearest result."""
    q, cand = pts
    batched = _as_map(knn.knn_join(q, cand, k=5, res=8).collect())
    single = _as_map(knn.knn_join(q, cand, k=5, res=8, ring_batch=False).collect())
    assert batched == single
