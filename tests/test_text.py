"""Dedup + text-analysis operators against controlled fixtures and
brute-force Python oracles."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from morituri_spark.text import dedup as D
from morituri_spark.text import quality as Q


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep dark forest where it finds a quiet place to rest"
    )
    rows = [
        (0, base),
        (1, base),                                  # exact dup of 0
        (2, base.replace("quick", "speedy")),       # near dup
        (3, base.replace("dog", "cat").replace("forest", "meadow")),  # near dup
        (4, "der schnelle braune fuchs springt und die katze ist nicht da "
            "und der hund ist mit den anderen nicht zu sehen"),
        (5, "le renard brun rapide saute et le chien est pour la nuit "
            "dans les bois avec une autre idee de la vie"),
        (6, "completely different text about spark query engines and "
            "columnar execution with vectorized operators for the win"),
        (7, ""),                                    # empty doc edge case
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_duplicates(spark, docs):
    groups = D.exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0]["canonical_id"] == 0 and groups[0]["n_docs"] == 2
    kept = D.dedup_exact(docs)
    assert kept.count() == 7
    assert kept.where("doc_id = 1").count() == 0


def _py_shingles(text, n=5):
    if len(text) < n:
        return {text}
    return {text[i : i + n] for i in range(len(text) - n + 1)}


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = D.minhash_near_duplicates(docs.where("doc_id < 7 and doc_id >= 0"), threshold=0.5)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    # brute-force oracle over all pairs
    texts = {r["doc_id"]: r["text"] for r in docs.where("doc_id < 7").collect()}
    want = set()
    for a in texts:
        for b in texts:
            if a < b:
                sa, sb = _py_shingles(texts[a]), _py_shingles(texts[b])
                j = len(sa & sb) / len(sa | sb)
                if j >= 0.5:
                    want.add((a, b))
    # LSH may miss borderline pairs but must find the strong ones and add no
    # false positives (jaccard is exact after candidate gen)
    assert got <= want
    strong = {(0, 1), (0, 2), (1, 2)}
    assert strong <= got


def test_jaccard_values_exact(spark, docs):
    sh = D.shingle_df(docs.where("doc_id in (0, 2)"))
    pairs = spark.createDataFrame([(0, 2)], "doc_a long, doc_b long")
    j = D.jaccard_pairs(sh, pairs).collect()[0]["jaccard"]
    texts = {r["doc_id"]: r["text"] for r in docs.where("doc_id in (0,2)").collect()}
    sa, sb = _py_shingles(texts[0]), _py_shingles(texts[2])
    assert abs(j - len(sa & sb) / len(sa | sb)) < 1e-9


def test_simhash_near_duplicates(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in D.simhash(docs.where("doc_id < 7")).collect()}
    # identical docs → identical signature
    assert sh[0] == sh[1]
    # near dups within small hamming; unrelated docs far apart
    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    assert ham(sh[0], sh[2]) <= 6
    assert ham(sh[0], sh[6]) > 10
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in D.simhash_near_duplicates(docs.where("doc_id < 7"), max_hamming=6).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 0
    assert (0, 6) not in pairs


def test_bucket_cap_bounds_degenerate_corpus(spark, docs):
    """Adversarial mass-duplicated boilerplate: 300 byte-identical copies
    share EVERY LSH band bucket. The cap drops those buckets (quadratic
    output no salt can fix); genuine near-dup pairs among normal docs are
    still found via their own (small) buckets."""
    boiler = [(1000 + i, "lorem ipsum dolor sit amet the same boilerplate "
               "footer that appears on every single crawled page today")
              for i in range(300)]
    adv = docs.unionByName(
        spark.createDataFrame(boiler, "doc_id long, text string")
    )
    pairs = D.minhash_near_duplicates(adv.where("doc_id != 7"), threshold=0.5, max_bucket=50)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert {(0, 1), (0, 2), (1, 2)} <= got          # real near-dups survive
    assert not any(a >= 1000 and b >= 1000 for a, b in got)  # capped out
    # candidate volume stayed bounded: without the cap the boilerplate alone
    # yields C(300,2)=44850 pairs; with it, none reach the verify stage
    sim = D.simhash_near_duplicates(adv.where("doc_id != 7"), max_hamming=6, max_bucket=50)
    sgot = {(r["doc_a"], r["doc_b"]) for r in sim.collect()}
    assert (0, 1) in sgot
    assert not any(a >= 1000 and b >= 1000 for a, b in sgot)


def test_langid(spark, docs):
    pred = {r["doc_id"]: r["pred_lang"] for r in Q.predict_language(docs).collect()}
    assert pred[0] == "en" and pred[1] == "en"
    assert pred[4] == "de"
    assert pred[5] == "fr"
    assert pred[7] == "und"  # empty doc


def test_token_counts(spark, docs):
    out = docs.select(
        "doc_id",
        Q.token_count_ws().alias("ws"),
        Q.token_count_bpe_ish().alias("bpe"),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for did, t in texts.items():
        assert by_id[did]["ws"] == len(t.split())
        # bpe-ish ≥ ws for non-empty text (every word ≥1 piece)
        if t:
            assert by_id[did]["bpe"] >= by_id[did]["ws"]
    assert by_id[7]["ws"] == 0 and by_id[7]["bpe"] == 0


def test_quality_score(spark, docs):
    out = {r["doc_id"]: r for r in Q.quality_score(docs).collect()}
    assert out[0]["quality"] == 1.0      # clean English prose
    assert out[7]["quality"] <= 0.25     # empty doc fails nearly every gate
    assert out[0]["n_tokens"] == len(
        [t for t in docs.where("doc_id=0").first()["text"].split()]
    )


def test_fingerprint_deterministic_and_discriminative(spark, docs):
    fp1 = {r["doc_id"]: r["fingerprint"] for r in Q.fingerprint(docs).collect()}
    fp2 = {r["doc_id"]: r["fingerprint"] for r in Q.fingerprint(docs).collect()}
    assert fp1 == fp2
    assert fp1[0] == fp1[1]          # identical text → identical fingerprint
    assert fp1[0] != fp1[6]          # different text → different
    assert fp1[7] == 0               # empty doc sentinel


def test_cap_stats_report_drops(spark, docs):
    """No silent caps: cap_stats reports what the bucket cap dropped, and a
    clean corpus reports zero."""
    boiler = [(2000 + i, "identical boilerplate page footer text body") for i in range(40)]
    adv = spark.createDataFrame(boiler, "doc_id long, text string")
    stats = {}
    with pytest.warns(UserWarning, match="LSH cap engaged"):
        D.minhash_near_duplicates(adv, threshold=0.5, max_bucket=10, cap_stats=stats)
    assert stats["capped_buckets"] > 0
    assert stats["dropped_members"] >= 40  # every member of each capped bucket
    clean = {}
    D.minhash_near_duplicates(docs.where("doc_id >= 3 AND doc_id < 6"),
                              threshold=0.5, max_bucket=10_000, cap_stats=clean)
    assert clean == {"capped_buckets": 0, "dropped_members": 0}
    sstats = {}
    with pytest.warns(UserWarning, match="SimHash block cap engaged"):
        D.simhash_near_duplicates(adv, max_hamming=3, max_bucket=10, cap_stats=sstats)
    assert sstats["capped_buckets"] > 0 and sstats["dropped_members"] >= 40


def test_sql_hash_family_matches_reference_python(spark, docs):
    """The SQL-replayable affine minhash family: base-256 shingle ids and
    (a·x+b) mod p signatures recomputed in plain Python must equal the
    Catalyst k-min-aggregate output."""
    params = D.affine_hash_params(8)
    sub = docs.where("doc_id < 3")
    sh = D.shingle_df_sql(sub, n=5)
    sigs = {r["doc_id"]: r["sig"] for r in
            D.minhash_signatures(sh, k=8, hash_exprs=D.affine_hash_expr(params)).collect()}
    texts = {r["doc_id"]: r["text"] for r in sub.collect()}
    p = D.MERSENNE31
    for did, t in texts.items():
        ids = {sum(ord(t[i + j]) * 256 ** (4 - j) for j in range(5))
               for i in range(len(t) - 4)}
        expect = [min((a * (x % p) + b) % p for x in ids) for a, b in params]
        assert sigs[did] == expect, did


def test_fingerprint_mod_variant_matches_python(spark, docs):
    """fingerprint(base=131, mod=2^31-1) — the SQL-replayable field — must
    match an independent Python reimplementation of winnowing."""
    p = D.MERSENNE31
    sub = docs.where("doc_id < 3")
    got = {r["doc_id"]: r["fingerprint"] for r in
           Q.fingerprint(sub, window=16, base=131, mod=p).collect()}
    for r in sub.collect():
        b = r["text"].encode()
        w = 16
        pw = [pow(131, j, p) for j in range(w)]
        hashes = [sum(b[i + j] * pw[j] for j in range(w)) % p
                  for i in range(len(b) - w + 1)]
        fold = 0
        for s in range(0, len(hashes), w):
            fold ^= min(hashes[s:s + w])
        assert got[r["doc_id"]] == fold


def test_sig_prefilter_preserves_results(spark, docs):
    """Signature-agreement prefilter (scale path): same pairs as the exact
    verify on the test corpus (margin 0.15 at k=64)."""
    base = {(r["doc_a"], r["doc_b"]) for r in
            D.minhash_near_duplicates(docs.where("doc_id != 7"), threshold=0.5).collect()}
    pre = {(r["doc_a"], r["doc_b"]) for r in
           D.minhash_near_duplicates(docs.where("doc_id != 7"), threshold=0.5,
                                     sig_prefilter_margin=0.15).collect()}
    assert base == pre and len(base) > 0


def test_pii_ipv4_not_mislabeled_as_phone(spark):
    """Dotted IPv4 ≥9 chars sits inside the phone pattern's character
    class; the scrub must label it <IP> (ipv4 ordered before phone, r3
    ADVICE) and the audit counts must agree with the replacement."""
    from morituri_spark.text.quality import pii_counts, redact_pii

    df = spark.createDataFrame(
        [(1, "server at 192.168.1.1 and call +1 (415) 555-0199 or a@b.co")],
        "doc_id long, text string",
    )
    counts = pii_counts("text")
    row = df.select(
        redact_pii("text").alias("red"),
        *[c.alias(n) for n, c in counts.items()],
    ).collect()[0]
    assert "<IP>" in row.red and "<PHONE>" in row.red and "<EMAIL>" in row.red
    assert "192.168" not in row.red
    assert (row.n_email, row.n_ipv4, row.n_phone) == (1, 1, 1)


def test_repetition_stats_hand_computed(spark):
    from morituri_spark.text.quality import repetition_stats

    df = spark.createDataFrame(
        [(1, "a b a b\nc c c\na b a b"), (2, "x"), (3, "")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_stats(df).collect()}
    r1 = rows[1]
    # lines: 3 total, 2 distinct; 2-grams: top 'a b' 4/10; 3-grams: 7 distinct of 9
    assert abs(r1.dup_line_frac - (1 - 2 / 3)) < 1e-9
    assert abs(r1.top_2gram_frac - 0.4) < 1e-9
    assert abs(r1.dup_3gram_frac - (1 - 7 / 9)) < 1e-9
    # short/empty docs: nothing to repeat
    assert rows[2].dup_3gram_frac == 0.0 and rows[2].top_2gram_frac == 0.0
    assert rows[3].dup_line_frac == 0.0


def test_minhash_verify_kernel_matches_join(spark, docs):
    import morituri_spark.text.dedup as D

    a = {(r.doc_a, r.doc_b, round(r.jaccard, 9)) for r in
         D.minhash_near_duplicates(docs, threshold=0.5).collect()}
    b = {(r.doc_a, r.doc_b, round(r.jaccard, 9)) for r in
         D.minhash_near_duplicates(docs, threshold=0.5, verify_strategy="kernel").collect()}
    assert a == b and len(a) > 0
