"""Integer-exact PageRank — link-graph centrality as a quality signal.

Crawl-corpus pipelines use link centrality as a document-quality feature
(the web-graph prior behind classic crawl filtering). The textbook float
iteration is NOT reproducible on a cluster: Σ w·r over doubles depends on
partition order, so two runs (or two cluster sizes) disagree in the last
ulps and no exact oracle can exist. This implementation follows the
engine's quantized-integer discipline (geo/interpolate's IDW weights):
ranks are BIGINT in units of ``scale``/n, per-edge contributions are
``rank div outdeg`` (exact integer division), and every reduction is an
exact integer sum — bit-identical at ANY parallelism, replayable by a
recursive SQL oracle, hash-exact across engines.

    rank'_i = ((den-num)·(scale div n) + num·(Σ_in contrib + dang div n))
              div den          (num/den = damping, default 85/100)

The integer divisions drop remainders (a deterministic sub-ulp mass
leak, the integer analog of float round-off — identical on both
engines). Dangling mass (nodes with no out-edges) is redistributed
uniformly via one scalar aggregate per round.

Scale shape: each round is one join edges⋈ranks (shuffle on src), one
map-side-combinable sum keyed by dst, and one left join back onto the
node set; the rank state is localCheckpointed every round (CLAUDE.md
rule 14 — the self-referencing iteration would otherwise compound the
logical plan). ``scale`` bounds: n · scale must stay under 2^63 — the
default 10^12 supports ~9M-node partitions of the web graph per
component; shrink scale for larger graphs.

Reference scope note: morituri has no graph operator; this extends the
LLM-pipeline family (document-quality priors) alongside near-dup
clustering's connected components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank_exact(
    edges: DataFrame,
    iters: int = 10,
    scale: int = 10**12,
    damp_num: int = 85,
    damp_den: int = 100,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, rank) after ``iters`` exact-integer PageRank rounds.

    ``edges``: directed (src, dst) pairs — deduplicate upstream if edge
    multiplicity should not weight the walk. Ranks are integers in units
    of 1/``scale`` of the total mass; divide by ``scale`` for the usual
    [0, 1] scores.
    """
    # edge list is re-joined EVERY round: pre-partition it ON THE JOIN
    # KEY and persist (r6; localCheckpoint would truncate lineage but
    # DROPS the partitioning metadata — a checkpointed relation re-pays
    # its exchange in every round's join, persist keeps the Repartition
    # node visible so the per-round joins need no Exchange on this side)
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d")
    ).repartition("_s").persist()
    nodes = (
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        out = nodes.select("node", F.lit(0).cast("long").alias("rank"))
        nodes.unpersist()
        e.unpersist()
        return out
    outdeg = (
        e.groupBy(F.col("_s").alias("node"))
        .agg(F.count(F.lit(1)).alias("_deg"))
        .persist()
    )
    base = int(scale) // n
    rest = int(damp_den) - int(damp_num)
    ranks = nodes.select("node", F.lit(base).cast("long").alias("rank"))

    for _ in range(int(iters)):
        # persist: with_deg is consumed TWICE per round (dangling mass +
        # contributions) — uncached it re-ran the join each time (r6)
        # shuffled-hash hints (r6): every per-round join build side is one
        # row per node (outdeg / with_deg / contrib), so the hash build is
        # bounded by distinct keys per partition and the SMJ sorts of the
        # streamed side are pure per-round cost
        with_deg = ranks.join(outdeg.hint("shuffle_hash"), "node", "left").persist()
        # dangling mass: ONE scalar aggregate per round (also materializes
        # the cached join)
        dang = (
            with_deg.where(F.col("_deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("d"))
            .collect()[0]["d"]
        )
        dang_share = int(dang) // n
        contrib = (
            with_deg.where(F.col("_deg").isNotNull())
            .hint("shuffle_hash")
            .join(e, F.col("node") == F.col("_s"))
            .select(F.col("_d").alias("node"), F.expr("rank div _deg").alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").alias("_sum"))
        )
        numer = (
            F.lit(rest) * F.lit(base)
            + F.lit(int(damp_num))
            * (F.coalesce(F.col("_sum"), F.lit(0)) + F.lit(dang_share))
        )
        ranks = (
            nodes.join(contrib.hint("shuffle_hash"), "node", "left")
            .select(
                "node",
                # LONG `div`, never `/`: double division + cast can round
                # UP across an integer before truncation, breaking the
                # exact-integer contract the oracle replays
                numer.alias("_num"),
            )
            .select(
                "node",
                F.expr(f"_num div {int(damp_den)}").cast("long").alias("rank"),
            )
            .localCheckpoint()
        )
        with_deg.unpersist()
    # final ranks are materialized (eager checkpoint) — the static
    # helpers can release their storage before returning
    e.unpersist()
    nodes.unpersist()
    outdeg.unpersist()
    return ranks
