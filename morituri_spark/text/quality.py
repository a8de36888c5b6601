"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting — all over the ``documents`` table, all pure
Catalyst expressions except the rolling-hash fingerprint (Arrow kernel).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType

# Small per-language stopword profiles for the n-gram/stopword heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "nicht"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "de", "y", "que", "en", "un", "es", "por"],
}


def _tokens(text_col: str) -> Column:
    return F.filter(F.split(F.lower(F.col(text_col)), r"[^a-zA-Zà-ÿÀ-ß']+"), lambda t: t != "")


def langid_scores(text_col: str = "text") -> dict[str, Column]:
    """Per-language stopword-hit ratio columns."""
    toks = _tokens(text_col)
    n = F.greatest(F.size(toks), F.lit(1))
    out = {}
    for lang, words in STOPWORDS.items():
        hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
        out[lang] = (hits / n).alias(f"score_{lang}")
    return out


def predict_language(docs: DataFrame, text_col="text", id_col="doc_id") -> DataFrame:
    """argmax of the stopword ratios; 'und' (undetermined) when all zero."""
    scores = langid_scores(text_col)
    pairs = F.array(
        *[F.struct(v.alias("score"), F.lit(k).alias("lang")) for k, v in scores.items()]
    )
    best = F.array_max(pairs)
    return docs.select(
        id_col,
        F.when(best["score"] > 0, best["lang"]).otherwise("und").alias("pred_lang"),
        best["score"].alias("pred_score"),
    )


def token_count_ws(text_col: str = "text") -> Column:
    """Whitespace token count."""
    return F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != ""))


def token_count_bpe_ish(text_col: str = "text") -> Column:
    """BPE-ish segment count: word pieces of ≤4 chars + digits + punctuation
    marks each count — a deterministic proxy for tokenizer load estimation
    (ceil(len(word)/4) per word + standalone punct/digit runs)."""
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    per_word = F.transform(
        words,
        lambda w: F.ceil(
            F.length(F.regexp_replace(w, r"[^A-Za-zà-ÿÀ-ß]", "")) / F.lit(4.0)
        ).cast("long")
        + F.length(F.regexp_replace(w, r"[A-Za-zà-ÿÀ-ß]", "")),
    )
    return F.aggregate(per_word, F.lit(0).cast("long"), lambda acc, x: acc + x)


def quality_columns(text_col: str = "text") -> dict[str, Column]:
    """Length / punctuation / stopword / repetition heuristics, each also
    expressible in ANSI SQL for the DuckDB oracle."""
    length = F.length(F.col(text_col))
    n_tok = token_count_ws(text_col)
    alpha = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-zà-ÿÀ-ß]", ""))
    punct = F.length(F.regexp_replace(F.col(text_col), r"[^.,;:!?]", ""))
    upper = F.length(F.regexp_replace(F.col(text_col), r"[^A-Z]", ""))
    toks = _tokens(text_col)
    en_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS["en"])))
    return {
        "n_chars_q": length.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "mean_word_len": F.round(length / F.greatest(n_tok, F.lit(1)), 4),
        "alpha_ratio": F.round(alpha / F.greatest(length, F.lit(1)), 4),
        "punct_ratio": F.round(punct / F.greatest(length, F.lit(1)), 4),
        "upper_ratio": F.round(upper / F.greatest(length, F.lit(1)), 4),
        "stopword_ratio": F.round(en_stop / F.greatest(F.size(toks), F.lit(1)), 4),
    }


def quality_score(docs: DataFrame, text_col="text", id_col="doc_id") -> DataFrame:
    """Composite [0,1] quality score from the heuristic columns (weights
    fixed; the gate thresholds follow C4/Gopher-style rules)."""
    q = quality_columns(text_col)
    df = docs.select(id_col, *[v.alias(k) for k, v in q.items()])
    score = (
        F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000), 0.25).otherwise(0.0)
        + F.when((F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 12), 0.25).otherwise(0.0)
        + F.when(F.col("alpha_ratio") >= 0.6, 0.25).otherwise(0.0)
        + F.when(F.col("stopword_ratio") >= 0.05, 0.25).otherwise(0.0)
    )
    return df.withColumn("quality", F.round(score, 2))


def fingerprint(
    docs: DataFrame, window: int = 16, text_col="text", id_col="doc_id",
    base: int = 1099511628211, mod: int | None = None,
) -> DataFrame:
    """Winnowing-style document fingerprint: rolling polynomial hash over
    bytes, min hash per window stride → xor-fold to one int64. Arrow kernel
    (per-batch NumPy; no per-row Python).

    Default arithmetic is uint64-wraparound with the FNV prime base; pass
    ``base=131, mod=2³¹-1`` for the ANSI-SQL-replayable variant (for ASCII
    text the utf-8 bytes equal the code points, so a DuckDB oracle can
    recompute the identical fingerprint — same kernel, smaller field)."""
    src = docs.select(id_col, text_col)
    schema = StructType(
        [src.schema[id_col], StructField("fingerprint", LongType(), False)]
    )
    B = np.uint64(base)
    M = None if mod is None else np.uint64(mod)

    def run(batches):
        for pdf in batches:
            fps = []
            for t in pdf[text_col]:
                b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
                if len(b) == 0:
                    fps.append(0)
                    continue
                # rolling poly-hash h[i] = sum b[i..i+w) * B^j  via cumulative trick
                w = min(window, len(b))
                pw = np.empty(w, dtype=np.uint64)
                pw[0] = np.uint64(1)
                for j in range(1, w):
                    pw[j] = pw[j - 1] * B if M is None else (pw[j - 1] * B) % M
                n_win = len(b) - w + 1
                hashes = np.zeros(n_win, dtype=np.uint64)
                for j in range(w):
                    hashes += b[j : j + n_win] * pw[j]
                if M is not None:
                    hashes %= M
                # winnow: min per stride of w, xor-fold
                n_strides = (n_win + w - 1) // w
                fold = np.uint64(0)
                for s in range(n_strides):
                    fold ^= hashes[s * w : (s + 1) * w].min()
                fps.append(np.int64(fold.astype(np.int64)))
            yield pd.DataFrame({id_col: pdf[id_col], "fingerprint": np.asarray(fps, dtype=np.int64)})

    return src.mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# Repetition filters (Gopher-style quality gates: repetitive docs are the
# classic low-quality signature in web-scale training corpora)
# ---------------------------------------------------------------------------

def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition ratios (the Gopher/MassiveText-family
    quality gates, public literature — Rae et al. 2021 §A1.1):

      * ``dup_line_frac``  — 1 − distinct lines / lines
      * ``dup_3gram_frac`` — 1 − distinct word 3-grams / 3-grams
      * ``top_2gram_frac`` — occurrences of the most frequent word 2-gram
        / total 2-grams

    Scale shape: n-grams explode to (doc, gram) rows and aggregate in two
    codegen stages (gram counts → per-doc ratios) — the same shuffle
    pattern as the shingle pipeline, no HOF fold on the hot path; lines
    stay row-level (split + array_distinct on a small array). Docs with
    fewer than 3 words report 0 for the n-gram ratios (nothing to repeat).
    DuckDB replays every ratio exactly (regexp_split + unnest)."""
    words = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    base = docs.select(
        id_col,
        words.alias("_w"),
        F.split(F.col(text_col), r"\n").alias("_lines"),
    )
    nw = F.size("_w")
    lines = base.select(
        id_col,
        F.size("_lines").alias("_nl"),
        F.size(F.array_distinct("_lines")).alias("_dl"),
    )
    idx2 = F.sequence(F.lit(1), F.greatest(nw - 1, F.lit(0)))
    idx3 = F.sequence(F.lit(1), F.greatest(nw - 2, F.lit(0)))
    g2 = base.where(nw >= 2).select(
        id_col,
        F.explode(
            F.transform(
                idx2,
                lambda i: F.concat_ws(
                    " ", F.element_at("_w", i), F.element_at("_w", i + 1)
                ),
            )
        ).alias("g"),
    )
    g3 = base.where(nw >= 3).select(
        id_col,
        F.explode(
            F.transform(
                idx3,
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("_w", i),
                    F.element_at("_w", i + 1),
                    F.element_at("_w", i + 2),
                ),
            )
        ).alias("g"),
    )
    s2 = (
        g2.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg((F.max("c") / F.sum("c")).alias("top_2gram_frac"))
    )
    s3 = (
        g3.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            (F.lit(1.0) - F.count(F.lit(1)) / F.sum("c")).alias("dup_3gram_frac")
        )
    )
    return (
        lines.join(s2, id_col, "left")
        .join(s3, id_col, "left")
        .select(
            id_col,
            F.round(
                F.lit(1.0) - F.col("_dl") / F.greatest(F.col("_nl"), F.lit(1)), 9
            ).alias("dup_line_frac"),
            F.round(F.coalesce("dup_3gram_frac", F.lit(0.0)), 9).alias("dup_3gram_frac"),
            F.round(F.coalesce("top_2gram_frac", F.lit(0.0)), 9).alias("top_2gram_frac"),
        )
    )


# ---------------------------------------------------------------------------
# PII redaction (cleaning stage: scrub before training)
# ---------------------------------------------------------------------------

# Patterns kept to the regex subset Java and RE2 interpret identically
# (no backrefs, no lookaround), so an ANSI engine can replay the scrub.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # ipv4 BEFORE phone: dotted quads ≥9 chars (192.168.1.1) are inside the
    # phone pattern's character class and would otherwise be mislabeled
    # <PHONE>, making the n_ipv4 audit disagree with the actual scrub.
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-\. ]{7,}[0-9]", "<PHONE>"),
)


def redact_pii(text_col: str = "text") -> Column:
    """Chained regexp_replace — pure Catalyst, order matters (emails before
    phones so the digits in a mailbox name don't half-match)."""
    col = F.col(text_col)
    for _name, pat, repl in PII_PATTERNS:
        col = F.regexp_replace(col, pat, repl)
    return col


def pii_counts(text_col: str = "text") -> dict[str, Column]:
    """Per-pattern match counts (audit columns for scrub reports). Each
    pattern counts on the text AFTER the earlier patterns' replacements —
    exactly what ``redact_pii`` replaces — so the audit can never disagree
    with the scrub (e.g. an IPv4 also matching the later phone pattern is
    counted once, as <IP>)."""
    out: dict[str, Column] = {}
    col = F.col(text_col)
    for name, pat, repl in PII_PATTERNS:
        out[f"n_{name}"] = F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0)))
        col = F.regexp_replace(col, pat, repl)
    return out
