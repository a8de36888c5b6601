"""Generic Hamming near-dup join (ml/hamming.py) + the phash wrapper.

The load-bearing property is exact recall vs a brute-force all-pairs
reference (the driver oracle for phash_near_dup is brute-force DuckDB,
NOT a replay of the banding algebra — these tests pin the same property
in-process, including hashes with the sign bit set)."""
import random

import pytest
from pyspark.sql import functions as F

from morituri_spark.ml.hamming import block_layout, hamming_near_duplicates


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & (2**64 - 1)).count("1")


def _brute(hashes: dict[int, int], d: int) -> dict[tuple[int, int], int]:
    ids = sorted(hashes)
    return {
        (i, j): _ham(hashes[i], hashes[j])
        for ai, i in enumerate(ids)
        for j in ids[ai + 1:]
        if _ham(hashes[i], hashes[j]) <= d
    }


def test_block_layout_covers_64_bits():
    for n in (2, 3, 4, 7, 64):
        lay = block_layout(n)
        assert sum(w for _, w in lay) == 64
        assert lay[0][0] == 0
        for (o1, w1), (o2, _) in zip(lay, lay[1:]):
            assert o1 + w1 == o2


def test_known_pairs_and_sign_bit(spark):
    base = 0x7A3F_19C4_8812_55E1
    hashes = {
        0: base,
        1: base ^ 0b11,                # hamming 2 → in at d=2
        2: base ^ 0b111,               # hamming 3 → out at d=2
        3: base ^ (1 << 63),           # sign bit flipped → negative, ham 1
        4: (base ^ (1 << 63)) ^ (1 << 62),  # negative, ham 2 from base
        5: 0x0123_4567_89AB_CDEF,      # far from everything
    }
    signed = {k: v - (1 << 64) if v >= (1 << 63) else v for k, v in hashes.items()}
    df = spark.createDataFrame(list(signed.items()), "id long, h long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_near_duplicates(df, "h", id_col="id", max_hamming=2).collect()
    }
    assert got == _brute(hashes, 2)
    assert got[(0, 1)] == 2 and got[(0, 3)] == 1 and (0, 2) not in got


@pytest.mark.parametrize("d,n_blocks", [(1, 2), (2, 3), (3, 4), (2, 8)])
def test_exact_recall_vs_brute_force(spark, d, n_blocks):
    rng = random.Random(42)
    hashes = {}
    i = 0
    for _ in range(60):
        h = rng.getrandbits(64)
        hashes[i] = h
        i += 1
        # plant near-dups at controlled distances around each seed
        for dist in (1, d, d + 1):
            flipped = h
            for bit in rng.sample(range(64), dist):
                flipped ^= 1 << bit
            hashes[i] = flipped
            i += 1
    signed = {k: v - (1 << 64) if v >= (1 << 63) else v for k, v in hashes.items()}
    df = spark.createDataFrame(list(signed.items()), "id long, h long").repartition(4)
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_near_duplicates(
            df, "h", id_col="id", max_hamming=d, n_blocks=n_blocks
        ).collect()
    }
    assert got == _brute(hashes, d)


def test_pigeonhole_guard():
    with pytest.raises(ValueError, match="pigeonhole"):
        hamming_near_duplicates(None, "h", max_hamming=3, n_blocks=3)


def test_degenerate_bucket_cap(spark):
    # 200 identical hashes (blank images) + 2 genuine near-dups elsewhere
    rows = [(i, 0x1111_2222_3333_4444) for i in range(200)]
    rows += [(1000, 0x0F0F_0F0F_0F0F_0F0F), (1001, 0x0F0F_0F0F_0F0F_0F0E)]
    df = spark.createDataFrame(rows, "id long, h long")
    stats = {}
    with pytest.warns(UserWarning, match="Hamming block cap engaged"):
        got = {
            (r["id_a"], r["id_b"])
            for r in hamming_near_duplicates(
                df, "h", id_col="id", max_hamming=2, max_bucket=50,
                cap_stats=stats,
            ).collect()
        }
    assert got == {(1000, 1001)}  # the blank-image quadratic blob is dropped
    assert stats["capped_buckets"] == 3 and stats["dropped_members"] == 600


def test_phash_wrapper(spark):
    from morituri_spark.multimodal.ops import phash_near_duplicates

    df = spark.createDataFrame(
        [("a", 100), ("b", 101), ("c", 1 << 40)],
        "image_id string, phash long",
    )
    got = {(r["id_a"], r["id_b"]) for r in phash_near_duplicates(df).collect()}
    assert got == {("a", "b")}
