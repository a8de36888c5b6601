"""Audio payload operators — REAL pure-NumPy WAV/PCM16 codec + features.

The task brief allows stubbing audio because "the audio libs aren't in this
container" — but canonical WAV (RIFF little-endian, PCM16) needs no library
at all, so this class is real end-to-end like PNG/FJPG: encode/decode are
exact inverses, and the Spark kernels (Arrow-batched mapInPandas) compute
features and fixed-window frames from decoded samples. Compressed codecs
(mp3/ogg/aac) remain honestly out of scope (no decoder in the container).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StringType, StructField, StructType,
)


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Mono/multi-channel int16 PCM → canonical 44-byte-header WAV.
    ``samples``: (n,) or (n, channels) int16."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()
    byte_rate = sample_rate * ch * 2
    block_align = ch * 2
    hdr = b"".join(
        [
            b"RIFF", struct.pack("<I", 36 + len(data)), b"WAVE",
            b"fmt ", struct.pack("<IHHIIHH", 16, 1, ch, sample_rate, byte_rate, block_align, 16),
            b"data", struct.pack("<I", len(data)),
        ]
    )
    return hdr + data


def decode_wav(buf: bytes):
    """WAV bytes → (samples (n, ch) int16, sample_rate). Walks RIFF chunks,
    so extra chunks (LIST/fact) between fmt and data are tolerated."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid = bytes(buf[pos : pos + 4])
        (ln,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, ch, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (fmt={audio_fmt}, bits={bits})")
    s = np.frombuffer(data, dtype="<i2").reshape(-1, ch)
    return s, rate


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("audio_id", StringType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("n_samples", LongType(), False),
        StructField("duration_s", DoubleType(), False),
        StructField("rms", DoubleType(), False),
        StructField("peak", DoubleType(), False),
        StructField("zero_crossing_rate", DoubleType(), False),
    ]
)


def audio_features(audio: DataFrame, id_col="audio_id", bytes_col="bytes") -> DataFrame:
    """(audio_id, bytes WAV) → per-clip features; mono mix for the stats.
    Arrow-batched; per-clip work is vectorized NumPy."""
    src = audio.select(id_col, bytes_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {f.name: [] for f in AUDIO_FEATURES_SCHEMA.fields}
            for aid, buf in zip(pdf[id_col], pdf[bytes_col]):
                s, rate = decode_wav(bytes(buf))
                mono = s.astype(np.float64).mean(axis=1) / 32768.0
                n = len(mono)
                rows["audio_id"].append(aid)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(n)
                rows["duration_s"].append(round(n / rate, 6))
                rows["rms"].append(round(float(np.sqrt(np.mean(mono**2))) if n else 0.0, 9))
                rows["peak"].append(round(float(np.abs(mono).max()) if n else 0.0, 9))
                zc = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
                rows["zero_crossing_rate"].append(round(zc, 9))
            yield pd.DataFrame(rows)

    return src.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("audio_id", StringType(), False),
        StructField("frame_seq", IntegerType(), False),
        StructField("start_ms", LongType(), False),
        StructField("rms", DoubleType(), False),
    ]
)


def sample_audio_frames(
    audio: DataFrame, frame_ms: int = 250, id_col="audio_id", bytes_col="bytes"
) -> DataFrame:
    """Fixed-window frame sampling (the audio analog of video frame
    sampling): one row per ``frame_ms`` window with its RMS energy."""
    src = audio.select(id_col, bytes_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {f.name: [] for f in FRAME_SCHEMA.fields}
            for aid, buf in zip(pdf[id_col], pdf[bytes_col]):
                s, rate = decode_wav(bytes(buf))
                mono = s.astype(np.float64).mean(axis=1) / 32768.0
                win = max(int(rate * frame_ms / 1000), 1)
                n_frames = (len(mono) + win - 1) // win
                for k in range(n_frames):
                    seg = mono[k * win : (k + 1) * win]
                    rows["audio_id"].append(aid)
                    rows["frame_seq"].append(k)
                    rows["start_ms"].append(k * frame_ms)
                    rows["rms"].append(round(float(np.sqrt(np.mean(seg**2))), 9))
            yield pd.DataFrame(rows)

    return src.mapInPandas(run, FRAME_SCHEMA)


def silence_segments(
    audio: DataFrame,
    frame_ms: int = 50,
    rms_threshold: float = 0.0,
    id_col: str = "audio_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """→ (audio_id, island, silence_start_ms, silence_end_ms, n_frames):
    maximal runs of silent ``frame_ms`` windows per clip (rms ≤
    ``rms_threshold``; the default keeps only exact digital silence).
    Composes the real WAV decode (:func:`sample_audio_frames`, an
    Arrow-batched kernel) with the gaps-and-islands interval union
    (operators/intervals.py) — frames become half-open [start_ms,
    start_ms + frame_ms) intervals, and touching silent frames merge.
    Scale shape: one decode pass + one window shuffle keyed by clip id.
    """
    from ..operators.intervals import interval_islands

    frames = sample_audio_frames(
        audio, frame_ms=frame_ms, id_col=id_col, bytes_col=bytes_col
    )
    silent = frames.where(frames["rms"] <= float(rms_threshold)).select(
        frames[id_col].alias("audio_id"),
        frames["start_ms"].alias("start"),
        (frames["start_ms"] + int(frame_ms)).alias("end"),
    )
    isl = interval_islands(silent, key_col="audio_id", start_col="start", end_col="end")
    return isl.select(
        isl["key"].alias("audio_id"),
        "island",
        isl["island_start"].alias("silence_start_ms"),
        isl["island_end"].alias("silence_end_ms"),
        "n_intervals",
    ).withColumnRenamed("n_intervals", "n_frames")


def pitch_amdf(
    audio: DataFrame,
    lag_min: int = 16,
    lag_max: int = 64,
    frame_ms: int = 50,
    id_col: str = "audio_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Integer AMDF pitch tracking (average magnitude difference
    function): per ``frame_ms`` frame, the lag ℓ ∈ [lag_min, lag_max]
    minimizing ``D(ℓ) = Σ_{n<span} |x[n] − x[n+ℓ]|`` over the
    channel-SUMMED PCM16 samples — span = win − lag_max is FIXED across
    lags so every D compares the same sample count, ties break to the
    smallest lag, and every intermediate is an exact integer (the SQL
    oracle replays D literally; no float anywhere).

    → (audio_id, frame_seq, best_lag, amdf_min, span); frames shorter
    than ``lag_max + 1`` samples are skipped.

    Scale shape: one decode pass, ≤ clip_ms/frame_ms rows per clip;
    the lag sweep is O(lags · span) vectorized NumPy inside the task.
    """
    lmin, lmax = int(lag_min), int(lag_max)
    if not 1 <= lmin <= lmax:
        raise ValueError(f"need 1 <= lag_min <= lag_max, got {lmin}..{lmax}")
    src = audio.select(id_col, bytes_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in
                   ("audio_id", "frame_seq", "best_lag", "amdf_min", "span")}
            for aid, buf in zip(pdf[id_col], pdf[bytes_col]):
                s, rate = decode_wav(bytes(buf))
                x = s.astype(np.int64).sum(axis=1)
                win = max(int(rate * frame_ms / 1000), 1)
                span = win - lmax
                if span <= 0:
                    continue
                for k in range(len(x) // win):
                    fr = x[k * win : (k + 1) * win]
                    best_lag, best_d = -1, None
                    for lag in range(lmin, lmax + 1):
                        d = int(np.abs(fr[:span] - fr[lag : lag + span]).sum())
                        if best_d is None or d < best_d:
                            best_lag, best_d = lag, d
                    out["audio_id"].append(aid)
                    out["frame_seq"].append(k)
                    out["best_lag"].append(best_lag)
                    out["amdf_min"].append(best_d)
                    out["span"].append(span)
            yield pd.DataFrame(
                {
                    "audio_id": pd.array(out["audio_id"], dtype="string"),
                    **{
                        c: np.asarray(out[c], dtype=np.int64)
                        for c in ("frame_seq", "best_lag", "amdf_min", "span")
                    },
                }
            )

    return src.mapInPandas(
        run,
        "audio_id string, frame_seq long, best_lag long, amdf_min long,"
        " span long",
    )
