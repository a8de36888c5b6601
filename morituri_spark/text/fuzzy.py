"""Edit-distance-1 fuzzy self-join — deletion-neighborhood blocking.

Record-linkage over noisy short keys (names, titles, OCR'd labels):
find all id pairs whose strings are within Levenshtein distance 1.
Blocking is the SymSpell deletion-neighborhood scheme (a public
classic): each string emits itself plus every single-character
deletion as candidate keys. Any two strings at distance ≤ 1 — equal,
one substitution, one insert/delete — share at least one key
(substitution: deleting the differing position from both yields the
same string; insert/delete: the deletion of the longer IS the
shorter), so the block join has RECALL 1.0 and the exact
``levenshtein`` verify only ever prunes.

Scale shape: the key explosion is pure Catalyst (posexplode of a
closed-form sequence + two substrings — fine at short-key lengths,
which ``max_len`` enforces; rule 17's O(len²) bite only matters on
document-length strings). Candidates come from one equi-join on the
variant key and dedup through a (pair) hash aggregate AFTER the
exchange (rule 21); the exact verify is a JVM builtin. Hot variant
keys (e.g. the empty-ish stems of very common 1-char strings) bound
the fan-out by the alphabet, not the corpus, because keys carry the
string length within ±1 — noted for the 10¹²-row case where a
frequency cap on keys (drop variants shared by > K rows, exactly the
BM25 df gate) is the documented escape hatch.

Reference scope: no counterpart in morituri; LLM-pipeline dedup
family extension (the string twin of the phash Hamming-1 join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def edit1_pairs(
    df: DataFrame,
    id_col: str = "id",
    str_col: str = "s",
    max_len: int = 64,
) -> DataFrame:
    """→ (id_a, id_b, s_a, s_b, dist): all pairs id_a < id_b whose
    strings are within Levenshtein distance 1 (dist ∈ {0, 1}; equal
    strings count). Strings longer than ``max_len`` raise (the S5
    format_error convention) — the deletion neighborhood is meant for
    short keys.
    """
    checked = df.select(
        F.col(id_col).alias("_id"),
        F.when(F.length(F.col(str_col)) <= int(max_len), F.col(str_col))
        .otherwise(F.raise_error(F.format_string(
            "edit1_pairs: string longer than %d for id=%%s" % int(max_len),
            F.col(id_col).cast("string"),
        )))
        .alias("_s"),
    )
    # p = 0 keeps the string itself; p >= 1 deletes the p-th char
    keys = checked.select(
        "_id", "_s",
        F.explode(F.sequence(F.lit(0), F.length("_s"))).alias("_p"),
    ).select(
        "_id", "_s",
        F.when(F.col("_p") == 0, F.col("_s"))
        .otherwise(
            F.concat(
                F.substring(F.col("_s"), 1, F.col("_p") - F.lit(1)),
                F.substring(
                    F.col("_s"), F.col("_p") + F.lit(1), F.lit(2147483647)
                ),
            )
        )
        .alias("_k"),
    )
    a = keys.select(
        F.col("_k"), F.col("_id").alias("id_a"), F.col("_s").alias("s_a")
    )
    b = keys.select(
        F.col("_k"), F.col("_id").alias("id_b"), F.col("_s").alias("s_b")
    )
    cand = (
        a.join(b, "_k")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "s_a", "s_b")
        .distinct()  # rule 21: dedup via hash aggregate after the exchange
    )
    return cand.select(
        "id_a", "id_b", "s_a", "s_b",
        F.levenshtein("s_a", "s_b").alias("dist"),
    ).where(F.col("dist") <= 1)
