"""confirm_dups (pipelines/crossmodal.py) vs brute force."""
from itertools import combinations

from morituri_spark.pipelines.crossmodal import confirm_dups


def _table(spark):
    # (id, phash, caption): pairs (1,2) dup in BOTH modalities; (3,4) phash
    # near-dup but different captions; (5,6) same caption, far phashes
    rows = [
        (1, 0b1010100, "a red car"),
        (2, 0b1010101, "a red car"),        # hamming 1, caption equal → confirmed
        (3, 0b1110000, "a blue boat"),
        (4, 0b1110010, "a green boat"),     # hamming 1, captions differ
        (5, 0b0000000, "same text"),
        (6, 0b1111111111, "same text"),     # captions equal, hamming 10
        (7, 0b1010100, "a red car"),        # dup of 1 AND 2 in both
    ]
    return rows, spark.createDataFrame(
        rows, "image_id long, phash long, caption string"
    )


def test_confirmed_pairs_match_bruteforce(spark):
    rows, df = _table(spark)
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in confirm_dups(df, max_hamming=2).collect()
    }
    want = {}
    for (ia, pa, ca), (ib, pb, cb) in combinations(rows, 2):
        h = bin(pa ^ pb).count("1")
        if h <= 2 and ca == cb:
            want[(min(ia, ib), max(ia, ib))] = h
    assert got == want
    assert (1, 2) in got and (1, 7) in got and (2, 7) in got
    assert (3, 4) not in got and (5, 6) not in got
