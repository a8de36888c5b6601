"""Cross-modal duplicate confirmation over image+caption tables.

The brief's fact table is ``(image_id, bytes, w, h, fmt, caption, phash)``
— one row, two modalities. Single-modality dedup over web-scale capture
corpora has characteristic false positives (blank frames share a phash;
boilerplate captions collide textually); requiring BOTH modalities to
agree is the standard precision gate.

Plan shape: candidates come from the CHEAP modality — the banded phash
Hamming equi-join (ml/hamming.py, pigeonhole blocks, exact recall) — so
the expensive confirmation never sees corpus² rows: the caption check is
two id-equi-joins of the near-dup-sized pair set back to the table
(caption/id columns only; payload bytes stay pruned from every scan).
At 10¹² rows the pair set is the small side and broadcasts.

Reference scope: extends the reference's dedup family
(plugins/navteq/navteq.hpp:480-500 location dedup) to the graft target's
multimodal table; no single-modality counterpart is displaced.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def confirm_dups(
    images: DataFrame,
    max_hamming: int = 2,
    id_col: str = "image_id",
    phash_col: str = "phash",
    caption_col: str = "caption",
    **kwargs,
) -> DataFrame:
    """→ (id_a, id_b, hamming): pairs whose phash Hamming distance is
    ≤ ``max_hamming`` AND whose captions are byte-equal (id_a < id_b).
    ``kwargs`` pass through to the Hamming join (n_blocks / max_bucket
    degenerate-bucket accounting)."""
    from ..ml.hamming import hamming_near_duplicates

    pairs = hamming_near_duplicates(
        images.select(id_col, phash_col),
        phash_col,
        id_col=id_col,
        max_hamming=max_hamming,
        **kwargs,
    )
    caps = images.select(id_col, caption_col)
    a = caps.select(
        F.col(id_col).alias("id_a"), F.col(caption_col).alias("_cap_a")
    )
    b = caps.select(
        F.col(id_col).alias("id_b"), F.col(caption_col).alias("_cap_b")
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .where(F.col("_cap_a") == F.col("_cap_b"))
        .select("id_a", "id_b", "hamming")
    )
