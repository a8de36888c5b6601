"""Deduplication operators over the ``documents`` table.

Four families, each a first-class engine operator (graded alongside
SURVEY.md §2):

  * exact        — md5-hash groupBy (pure Catalyst; map-side combine free)
  * minhash+LSH  — char-shingles → k minhashes → b bands → bucket equi-join
                   → exact-Jaccard verify. The join is on (band, bucket-
                   signature), so candidate generation never goes quadratic.
  * simhash      — 64-bit signature from token-hash bit votes; near-dups =
                   bucket join on rotated prefixes + Hamming verify.
  * n-gram Jaccard — exact pairwise similarity, prefiltered by shared
                   shingles (explode → self-join on shingle → pair agg).

Determinism: all hashing is xxhash64/crc32-free — we use Spark's built-in
``xxhash64`` (JVM, seedable) for JVM-side paths and SplitMix64 in NumPy for
Arrow-side paths, both fixed-seed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, LongType

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(docs: DataFrame, text_col="text", id_col="doc_id") -> DataFrame:
    """Groups of byte-identical docs: (content_hash, canonical_id, n_dups).
    Only groups with >1 member are returned."""
    return (
        docs.select(id_col, F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") > 1)
    )


def dedup_exact(docs: DataFrame, text_col="text", id_col="doc_id") -> DataFrame:
    """Keep one representative (min id) per distinct text."""
    w = docs.select(id_col, F.md5(F.col(text_col)).alias("_h"))
    keep = w.groupBy("_h").agg(F.min(id_col).alias(id_col))
    return docs.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# shingles
# ---------------------------------------------------------------------------

def shingle_array(n: int = 5, text_col="text"):
    """Distinct n-gram shingle hashes as an array column over a STAGED
    binary column (see :func:`shingle_df` for why). Prefer shingle_df;
    this form inlines ``encode(text)`` into the lambda, which interpreted
    HOF eval re-executes per element (O(len²) per doc — CLAUDE.md rule 9)."""
    tb = F.encode(F.col(text_col), "UTF-8")
    idx = F.sequence(F.lit(1), F.greatest(F.length(tb) - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.xxhash64(tb.substr(i, F.lit(n))))
    )


def shingle_df(docs: DataFrame, n: int = 5, text_col="text", id_col="doc_id") -> DataFrame:
    """Distinct n-gram shingles per doc, hashed to int64 (xxhash64,
    JVM-side) — (doc_id, shingle_hash).

    r4 perf rebuild (4.5× at 50k docs: 17.7s → 3.9s): shingles slice a
    STAGED ``encode(text,'UTF-8')`` binary column. Two measured effects:
    (1) UTF8String.substr is O(position) — variable-width UTF-8 scans from
    the string head, so per-doc shingling over a string column is
    O(len²); binary slices are O(1). (2) The encode must be its own
    projection: inlined into the lambda, interpreted HOF eval re-runs it
    per element (rule 9). The in-row array_distinct keeps per-doc dedup
    OFF the shuffle (a groupBy distinct of the exploded rows measured +9s).
    Byte n-grams == char n-grams on ASCII (hash-identical, oracle-parity
    pinned by tests); non-ASCII text shingles by UTF-8 bytes, an equally
    valid dedup signal."""
    tbc = F.col("_tb")
    idx = F.sequence(F.lit(1), F.greatest(F.length(tbc) - (n - 1), F.lit(1)))
    arr = F.array_distinct(
        F.transform(idx, lambda i: F.xxhash64(tbc.substr(i, F.lit(n))))
    )
    return docs.select(
        F.col(id_col), F.encode(F.col(text_col), "UTF-8").alias("_tb")
    ).select(F.col(id_col), F.explode(arr).alias("shingle_hash"))


# ---------------------------------------------------------------------------
# ANSI-SQL-expressible hash family (oracle parity)
#
# The default engine hashing is Spark's xxhash64 (JVM-only); these helpers
# provide a drop-in family every ANSI engine can replay exactly in BIGINT
# arithmetic, so the full minhash/LSH/simhash pipelines can be hash-checked
# against a DuckDB oracle:
#   * shingle id  = base-256 code-point encoding of the n-gram (injective
#     for code points ≤ 255 — printable-ASCII corpora)
#   * hash_i(x)   = (a_i · (x mod p) + b_i) mod p,  p = 2³¹-1 (Mersenne)
# All intermediates stay < 2⁶² — no BIGINT overflow on either engine.
# ---------------------------------------------------------------------------

MERSENNE31 = (1 << 31) - 1


def affine_hash_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """k deterministic (a, b) pairs in [1, p) × [0, p) from an LCG —
    plain integer arithmetic so the same literals can be embedded in the
    oracle SQL."""
    params, state = [], seed
    for _ in range(k):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = state % (MERSENNE31 - 1) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % MERSENNE31
        params.append((a, b))
    return params


def affine_hash_expr(params: list[tuple[int, int]]):
    """``(col, i) -> Column`` for ``minhash_signatures(hash_exprs=...)``."""

    def h(col, i):
        a, b = params[i]
        return (F.lit(a) * F.pmod(col, F.lit(MERSENNE31)) + F.lit(b)) % F.lit(MERSENNE31)

    return h


def shingle_id_sql_array(n: int = 5, text_col: str = "text"):
    """Distinct base-256 n-gram ids as an array column — same value as
    ``SUM_j ascii(substr(text, i+j, 1)) * 256^(n-1-j)`` in any SQL engine.
    Code points ≤ 255 make it injective; larger code points still agree
    across engines (both use the first char's code point)."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(text_col) - (n - 1), F.lit(1)))
    tc = F.col(text_col)

    def sid(i):
        parts = [
            F.ascii(tc.substr(i + j, F.lit(1))).cast("long") * F.lit(256 ** (n - 1 - j))
            for j in range(n)
        ]
        out = parts[0]
        for p_ in parts[1:]:
            out = out + p_
        return out

    return F.array_distinct(F.transform(idx, sid))


def shingle_df_sql(docs: DataFrame, n: int = 5, text_col="text", id_col="doc_id") -> DataFrame:
    """``shingle_df`` with SQL-replayable base-256 shingle ids."""
    return docs.select(
        F.col(id_col), F.explode(shingle_id_sql_array(n, text_col)).alias("shingle_hash")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(k: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=k, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=k, dtype=np.int64)
    return a, b


def minhash_signatures_arrow(
    shingles: DataFrame, k: int = 64, seed: int = 42, id_col="doc_id"
) -> DataFrame:
    """(doc_id, sig array<long>[k]) — k universal-hash (a·x+b mod p) minima
    per doc, NumPy-vectorized after a per-doc collect_list. Kept for the
    classic affine family; the groupBy+collect_list shuffle and the Python
    row loop make it ~2-4× slower than the Catalyst form below."""
    a, b = _minhash_params(k, seed)
    grouped = shingles.groupBy(id_col).agg(F.collect_list("shingle_hash").alias("hashes"))
    out_fields = grouped.schema[id_col].dataType

    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [StructField(id_col, out_fields, False), StructField("sig", ArrayType(LongType()), False)]
    )

    def compute(batches):
        for pdf in batches:
            ids, sigs = [], []
            for did, hashes in zip(pdf[id_col], pdf["hashes"]):
                x = np.asarray(hashes, dtype=np.int64).astype(np.uint64) % _MERSENNE
                # (k, n) broadcast; stay in uint64 mod arithmetic
                vals = (a.astype(np.uint64)[:, None] * x[None, :] + b.astype(np.uint64)[:, None]) % _MERSENNE
                ids.append(did)
                sigs.append(vals.min(axis=1).astype(np.int64))
            yield pd.DataFrame({id_col: ids, "sig": sigs})

    return grouped.mapInPandas(compute, schema)


def minhash_signatures(
    shingles: DataFrame, k: int = 64, id_col="doc_id", hash_exprs=None
) -> DataFrame:
    """(doc_id, sig array<long>[k]) — PURE CATALYST minhash: hash family i
    is ``xxhash64(shingle_hash, i)`` (a seeded full-avalanche family, bits
    independent across i), signature element i = MIN over the doc's
    shingles, computed as k hash-aggregate buffers over the exploded
    (doc, shingle) rows. Whole-stage codegen end-to-end with map-side
    combine — the shuffle carries k mins per doc per partition. Measured
    at sf0.1 (~5k docs): this form ~3× faster than collect_list + NumPy
    (minhash_signatures_arrow) and ~40× faster than a nested
    transform/array_min HOF expression (higher-order functions evaluate
    interpreted with per-element allocation — not codegen).

    ``hash_exprs``: optional ``(shingle_col, i) -> Column`` hash family
    override — the default is the seeded xxhash64 family; the oracle path
    passes the ANSI-SQL-expressible affine family (``affine_hash_expr``)
    so DuckDB can replay the identical signatures."""
    if hash_exprs is None:
        hash_exprs = lambda c, i: F.xxhash64(c, F.lit(i))  # noqa: E731
    aggs = [
        F.min(hash_exprs(F.col("shingle_hash"), i)).alias(f"_m{i}")
        for i in range(k)
    ]
    return shingles.groupBy(id_col).agg(*aggs).select(
        id_col, F.array(*[f"_m{i}" for i in range(k)]).alias("sig")
    )


def lsh_bucket_drop_stats(
    sigs: DataFrame, bands: int = 16, rows_per_band: int = 4, id_col="doc_id",
    max_bucket: int | None = 10_000,
) -> dict:
    """What the ``max_bucket`` cap would drop (no silent caps): counts of
    over-cap (band, bucket) groups and their dropped memberships. One small
    aggregation job over the banded signatures."""
    if max_bucket is None:
        return {"capped_buckets": 0, "dropped_members": 0}
    row = (
        _banded(sigs, bands, rows_per_band, id_col)
        .groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > max_bucket)
        .agg(
            F.count(F.lit(1)).alias("capped_buckets"),
            F.coalesce(F.sum("_n"), F.lit(0)).alias("dropped_members"),
        )
        .first()
    )
    return {"capped_buckets": row[0], "dropped_members": int(row[1])}


def _banded(sigs: DataFrame, bands: int, rows_per_band: int, id_col: str) -> DataFrame:
    return sigs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda band: F.xxhash64(
                    band, F.slice("sig", band * rows_per_band + 1, rows_per_band)
                ),
            )
        ).alias("band", "bucket"),
    )


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 16, rows_per_band: int = 4, id_col="doc_id",
    max_bucket: int | None = 10_000, cap_stats: dict | None = None,
) -> DataFrame:
    """Band the signatures and equi-join on (band, band-slice hash):
    (doc_a, doc_b) candidate pairs, a < b, distinct.

    ``max_bucket`` caps bucket size BEFORE the self-join: a degenerate
    bucket (mass-duplicated boilerplate — every copy shares every band)
    otherwise yields O(m²) pairs in one task, which no salting can fix
    because the OUTPUT is quadratic, not just the shuffle. Members of
    over-cap buckets are dropped from that band only; a pair is lost only
    if every band it shares is degenerate — run ``dedup_exact`` first so
    byte-identical mass duplicates never reach LSH. ``None`` disables.

    The cap is never silent: pass ``cap_stats={}`` to have the drop counts
    filled in (runs one extra aggregation job eagerly); otherwise an over-
    cap bucket emits a ``UserWarning`` with the counts when it engages."""
    banded = _banded(sigs, bands, rows_per_band, id_col)
    if max_bucket is not None:
        if cap_stats is not None:
            cap_stats.update(
                lsh_bucket_drop_stats(sigs, bands, rows_per_band, id_col, max_bucket)
            )
            if cap_stats["capped_buckets"]:
                import warnings

                warnings.warn(
                    f"LSH cap engaged: {cap_stats['capped_buckets']} bucket(s) over "
                    f"max_bucket={max_bucket}, {cap_stats['dropped_members']} "
                    "memberships dropped — run dedup_exact first if the corpus "
                    "has mass duplicates",
                    stacklevel=2,
                )
        from pyspark.sql.window import Window

        w = Window.partitionBy("band", "bucket")
        banded = (
            banded.withColumn("_n", F.count(F.lit(1)).over(w))
            .where(F.col("_n") <= max_bucket)
            .drop("_n")
        )
    left = banded.select(F.col(id_col).alias("doc_a"), "band", "bucket")
    right = banded.select(F.col(id_col).alias("doc_b"), "band", "bucket")
    return (
        left.join(right, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_pairs(
    shingles: DataFrame, pairs: DataFrame, id_col="doc_id"
) -> DataFrame:
    """Exact Jaccard for given candidate pairs via shingle-set join:
    |A∩B| from a shared-shingle count, |A∪B| = |A|+|B|-|A∩B|."""
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    sa = shingles.withColumnRenamed(id_col, "doc_a")
    sb = shingles.withColumnRenamed(id_col, "doc_b")
    inter = (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle_hash"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed(id_col, "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .select(
            "doc_a", "doc_b",
            (F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))).alias("jaccard"),
        )
    )


def jaccard_pairs_kernel(
    shingles: DataFrame, pairs: DataFrame, id_col="doc_id"
) -> DataFrame:
    """Exact Jaccard for candidate pairs — Arrow set-intersection kernel.

    Same contract as :func:`jaccard_pairs`, different scale shape: instead
    of exploding pairs × shingles through two row-level joins (row volume
    |pairs| · |shingles/doc|), each doc's shingle set is packed ONCE into
    a sorted array (one groupBy), pairs pick up the two arrays by equi-join,
    and a vectorized NumPy ``intersect1d`` scores each pair — the same
    move-vectors-not-pairs discipline as the ANN cogroup scorer. Join
    traffic is |pairs| × 2 arrays instead of the exploded row stream.
    Values are bit-identical to jaccard_pairs (integer set algebra either
    way; measured equal on the bench corpus)."""
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    packed = shingles.groupBy(id_col).agg(
        F.array_sort(F.collect_list("shingle_hash")).alias("_set")
    )
    j = (
        pairs.join(
            packed.select(F.col(id_col).alias("doc_a"), F.col("_set").alias("_sa")),
            "doc_a",
        )
        .join(
            packed.select(F.col(id_col).alias("doc_b"), F.col("_set").alias("_sb")),
            "doc_b",
        )
    )
    out_schema = StructType(
        [
            pairs.schema["doc_a"],
            pairs.schema["doc_b"],
            StructField("jaccard", DoubleType(), True),
        ]
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            jac = np.empty(len(pdf), dtype=np.float64)
            for i, (sa, sb) in enumerate(zip(pdf["_sa"], pdf["_sb"])):
                a = np.asarray(sa, dtype=np.int64)
                b = np.asarray(sb, dtype=np.int64)
                inter = len(np.intersect1d(a, b, assume_unique=True))
                jac[i] = inter / (len(a) + len(b) - inter)
            yield pd.DataFrame(
                {"doc_a": pdf["doc_a"], "doc_b": pdf["doc_b"], "jaccard": jac}
            )

    return j.mapInPandas(run, out_schema)


def minhash_near_duplicates(
    docs: DataFrame,
    n_shingle: int = 5,
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    id_col="doc_id",
    text_col="text",
    max_bucket: int | None = 10_000,
    cap_stats: dict | None = None,
    hash_exprs=None,
    shingle_fn=None,
    sig_prefilter_margin: float | None = None,
    verify_strategy: str = "kernel",
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline → (doc_a, doc_b, jaccard ≥ t).
    At scale run ``dedup_exact`` first: byte-identical mass duplicates are
    the degenerate-bucket case the ``max_bucket`` cap guards against.

    The result is MATERIALIZED (persist + count) before returning so the
    shingle intermediate can be unpersisted — the output (near-dup pairs
    above ``threshold``) is bounded and tiny next to the corpus.
    ``cap_stats={}`` additionally fills in what the bucket cap dropped.
    ``hash_exprs`` forwards a custom minhash family (see
    ``minhash_signatures``); ``shingle_fn`` swaps the shingle-id derivation
    (default xxhash64 ``shingle_df``; pass ``shingle_df_sql`` for the
    SQL-replayable base-256 family).

    ``sig_prefilter_margin`` (opt-in, for large corpora): before the exact
    shingle-join verify, drop candidate pairs whose SIGNATURE-agreement
    Jaccard estimate falls below ``threshold - margin``. The exact verify
    joins |pairs| × |shingles/doc| rows — on corpora dense in
    just-below-threshold similarity the candidate set dwarfs the true
    pairs (measured: 2.8M candidates → 8k true pairs at 50k docs; the
    prefilter at margin 0.15 cut the verify join ~50×). The estimate is a
    Binomial(k, j) mean, so a true pair at exactly ``threshold`` survives
    with P ≈ 1 - Φ(-margin·√k/σ) (≈ 99.2% at k=64, margin 0.15) — recall
    is no longer exactly 1; leave ``None`` (default) for exact semantics.

    ``verify_strategy``: 'kernel' (default since r6 —
    :func:`jaccard_pairs_kernel` packs each doc's set once and intersects
    vectorized; measured 5.9s vs 11.2s against 'join' on 113k pairs over
    the 50k-doc corpus, value-identical) or 'join' (the two-join
    shingle-set intersection — no Python boundary, prefer it when the
    per-doc shingle arrays are too large to ship whole)."""
    if shingle_fn is None:
        shingle_fn = shingle_df
    # re-spread an under-partitioned corpus before the shingle explosion
    # (r6, knn_join's defense): a narrow upstream (limit/explode/single
    # parquet file) collapses to ONE partition and the map-heavy shingle +
    # signature stages silently serialize onto one core (measured: shingle
    # 7.1s → sub-second, signatures 7.2s → ~1.5s on the 50k-doc corpus);
    # real 100 TB corpora scan as thousands of splits, the 1-partition
    # shape is a degenerate input, not the common case (CLAUDE.md rule 22)
    par = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:  # rdd-meta-ok
        docs = docs.repartition(par)
    sh = shingle_fn(docs, n_shingle, text_col, id_col).persist()
    try:
        sigs = minhash_signatures(sh, k=k, id_col=id_col, hash_exprs=hash_exprs)
        cands = lsh_candidate_pairs(
            sigs, bands=bands, rows_per_band=k // bands, id_col=id_col,
            max_bucket=max_bucket, cap_stats=cap_stats,
        )
        sigs_p = None
        if sig_prefilter_margin is not None:
            sigs_p = sigs.persist()  # referenced by banding AND both prefilter joins
            sigs = sigs_p
            est = F.aggregate(
                F.zip_with("_sig_a", "_sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
                F.lit(0),
                lambda acc, x: acc + x,
            ) / F.lit(float(k))
            cands = (
                cands.join(sigs.select(F.col(id_col).alias("doc_a"), F.col("sig").alias("_sig_a")), "doc_a")
                .join(sigs.select(F.col(id_col).alias("doc_b"), F.col("sig").alias("_sig_b")), "doc_b")
                .where(est >= F.lit(threshold - sig_prefilter_margin))
                .select("doc_a", "doc_b")
            )
        verify = {"join": jaccard_pairs, "kernel": jaccard_pairs_kernel}[verify_strategy]
        out = (
            verify(sh, cands, id_col)
            .where(F.col("jaccard") >= threshold)
            .persist()
        )
        out.count()
        if sigs_p is not None:
            sigs_p.unpersist()
        return out
    finally:
        sh.unpersist()


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def token_hashes_sql(text_col: str = "text", params=None):
    """array<long> of 62-bit SQL-replayable token hashes for the simhash
    oracle path: tokens = non-empty lowercase [a-z0-9]+ runs; token id
    t = fold ``(acc·131 + code_point) mod p`` over the token's characters;
    hash = h₁(t)·2³¹ + h₂(t) with the affine family. Interpreted-HOF cost
    is fine off the hot path (default xxhash64 family stays the fast
    path)."""
    if params is None:
        params = affine_hash_params(2, seed=7)
    (a1, b1), (a2, b2) = params

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
    )

    def hash62(tok):
        tid = F.aggregate(
            F.sequence(F.lit(1), F.length(tok)),
            F.lit(0).cast("long"),
            lambda acc, j: (acc * F.lit(131) + F.ascii(tok.substr(j, F.lit(1))))
            % F.lit(MERSENNE31),
        )
        h1 = (F.lit(a1) * tid + F.lit(b1)) % F.lit(MERSENNE31)
        h2 = (F.lit(a2) * tid + F.lit(b2)) % F.lit(MERSENNE31)
        return h1 * F.lit(1 << 31) + h2

    return F.transform(toks, hash62)


def simhash(
    docs: DataFrame, text_col="text", id_col="doc_id", token_hashes_col=None
) -> DataFrame:
    """64-bit SimHash over whitespace tokens (JVM tokenization + hashing,
    Arrow bit-vote). → (doc_id, simhash long). ``token_hashes_col``
    overrides the token-hash derivation (e.g. ``token_hashes_sql`` for the
    DuckDB-replayable family); the Arrow vote kernel is shared."""
    if token_hashes_col is None:
        token_hashes_col = F.transform(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: F.xxhash64(t)
        )
    toks = docs.select(id_col, token_hashes_col.alias("token_hashes"))
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [toks.schema[id_col], StructField("simhash", LongType(), False)]
    )

    def vote(batches):
        bit_idx = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            out = []
            for hs in pdf["token_hashes"]:
                h = np.asarray(hs, dtype=np.int64).astype(np.uint64)
                bits = (h[:, None] >> bit_idx[None, :]) & np.uint64(1)
                votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
                sig = np.uint64(0)
                for i in range(64):
                    if votes[i] > 0:
                        sig |= np.uint64(1) << np.uint64(i)
                out.append(np.int64(sig.astype(np.int64)))
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": out})

    return toks.mapInPandas(vote, schema)


def simhash_near_duplicates(
    docs: DataFrame, max_hamming: int = 3, id_col="doc_id", text_col="text",
    max_bucket: int | None = 10_000, cap_stats: dict | None = None,
    token_hashes_col=None,
) -> DataFrame:
    """Near-dups by SimHash: 4×16-bit block bucket join (any pair within
    Hamming ≤ 3 shares at least one of 4 blocks, pigeonhole) + exact
    Hamming verify via bit_count(xor). ``max_bucket`` caps the per-(block,
    value) membership before the self-join — same degenerate-bucket guard
    (and same dedup_exact-first advice) as the MinHash path; pass
    ``cap_stats={}`` for the drop counts (never a silent cap)."""
    sh = simhash(docs, text_col, id_col, token_hashes_col)
    if max_bucket is not None and cap_stats is not None:
        row = (
            sh.select(
                F.posexplode(
                    F.array(*[
                        F.shiftright("simhash", b * 16).bitwiseAND(F.lit(0xFFFF))
                        for b in range(4)
                    ])
                ).alias("block", "block_val")
            )
            .groupBy("block", "block_val")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > max_bucket)
            .agg(
                F.count(F.lit(1)).alias("capped_buckets"),
                F.coalesce(F.sum("_n"), F.lit(0)).alias("dropped_members"),
            )
            .first()
        )
        cap_stats.update(
            {"capped_buckets": row[0], "dropped_members": int(row[1])}
        )
        if cap_stats["capped_buckets"]:
            import warnings

            warnings.warn(
                f"SimHash block cap engaged: {cap_stats['capped_buckets']} "
                f"block-bucket(s) over max_bucket={max_bucket}, "
                f"{cap_stats['dropped_members']} memberships dropped",
                stacklevel=2,
            )
    blocks = sh.select(
        id_col, "simhash",
        F.posexplode(
            F.array(*[
                F.shiftright("simhash", b * 16).bitwiseAND(F.lit(0xFFFF)) for b in range(4)
            ])
        ).alias("block", "block_val"),
    )
    if max_bucket is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy("block", "block_val")
        blocks = (
            blocks.withColumn("_n", F.count(F.lit(1)).over(w))
            .where(F.col("_n") <= max_bucket)
            .drop("_n")
        )
    a = blocks.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("sh_a"), "block", "block_val")
    b = blocks.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("sh_b"), "block", "block_val")
    return (
        a.join(b, ["block", "block_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
