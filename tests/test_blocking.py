"""sorted_neighborhood_pairs (text/blocking.py) vs brute-force windows."""

import pytest

from morituri_spark.text.blocking import sorted_neighborhood_pairs


def _ref_pairs(records, w, block=None):
    # records: (id, sk[, block]) → set of (id_a, id_b, d) per sliding window
    blocks = {}
    for r in records:
        blocks.setdefault(r[2] if block else None, []).append(r)
    out = set()
    for _, rs in blocks.items():
        rs = sorted(rs, key=lambda r: (r[1], r[0]))
        for i in range(len(rs)):
            for d in range(1, w):
                if i + d < len(rs):
                    out.add((rs[i][0], rs[i + d][0], d))
    return out


def test_pairs_match_bruteforce_blocked(spark):
    recs = [
        (i, f"k{(i * 7) % 5}{i % 3}", f"b{i % 2}") for i in range(20)
    ]
    df = spark.createDataFrame(recs, "id long, sk string, blk string")
    got = {
        (r["id_a"], r["id_b"], r["rank_dist"])
        for r in sorted_neighborhood_pairs(
            df, id_col="id", sort_col="sk", block_col="blk", window=4
        ).collect()
    }
    assert got == _ref_pairs(recs, 4, block=True)
    # candidate budget: ≤ n·(w−1) regardless of block sizes
    assert len(got) <= 20 * 3


def test_unblocked_single_partition(spark):
    recs = [(i, f"s{i % 4}") for i in range(9)]
    df = spark.createDataFrame(recs, "id long, sk string")
    got = {
        (r["id_a"], r["id_b"], r["rank_dist"])
        for r in sorted_neighborhood_pairs(df, window=3).collect()
    }
    assert got == _ref_pairs([(i, s, None) for i, s in recs], 3)


def test_duplicate_sort_keys_deterministic(spark):
    # all sort keys equal → order falls back to id; id_a < id_b always
    recs = [(i, "same") for i in range(5)]
    df = spark.createDataFrame(recs, "id long, sk string")
    got = sorted_neighborhood_pairs(df, window=2).collect()
    assert sorted((r["id_a"], r["id_b"]) for r in got) == [
        (0, 1), (1, 2), (2, 3), (3, 4)
    ]
    assert all(r["sk_a"] == "same" and r["sk_b"] == "same" for r in got)


def test_window_guard(spark):
    df = spark.createDataFrame([(1, "a")], "id long, sk string")
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, window=1)
