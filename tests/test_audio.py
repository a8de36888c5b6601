"""Real WAV/PCM16 audio codec + feature/frame kernels."""

import numpy as np
import pandas as pd
import pytest

from morituri_spark.multimodal import audio as A


def _sine(freq=440.0, rate=16_000, secs=0.5, amp=0.5):
    t = np.arange(int(rate * secs)) / rate
    return (np.sin(2 * np.pi * freq * t) * amp * 32767).astype(np.int16)


def test_wav_roundtrip_mono_and_stereo():
    mono = _sine()
    buf = A.encode_wav(mono, 16_000)
    s, rate = A.decode_wav(buf)
    assert rate == 16_000 and s.shape == (len(mono), 1)
    assert np.array_equal(s[:, 0], mono)
    stereo = np.stack([mono, -mono], axis=1)
    s2, rate2 = A.decode_wav(A.encode_wav(stereo, 44_100))
    assert rate2 == 44_100 and np.array_equal(s2, stereo)


def test_wav_header_exact():
    buf = A.encode_wav(np.zeros(4, dtype=np.int16), 8000)
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WAVE"
    assert len(buf) == 44 + 8  # canonical header + 4 samples * 2B


def test_wav_tolerates_extra_chunks_and_rejects_junk():
    import struct

    mono = _sine(secs=0.01)
    buf = A.encode_wav(mono)
    # splice a LIST chunk between fmt and data
    head, data_chunk = buf[:36], buf[36:]
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = head + extra + data_chunk
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    s, rate = A.decode_wav(spliced)
    assert np.array_equal(s[:, 0], mono)
    with pytest.raises(ValueError):
        A.decode_wav(b"not a wav at all...")


def test_audio_features_vs_numpy(spark):
    clips = {
        "sine": _sine(amp=0.5),
        "silence": np.zeros(8000, dtype=np.int16),
        "noise": (np.random.default_rng(1).uniform(-0.3, 0.3, 4000) * 32767).astype(np.int16),
    }
    pdf = pd.DataFrame(
        {"audio_id": list(clips), "bytes": [bytes(A.encode_wav(v)) for v in clips.values()]}
    )
    df = spark.createDataFrame(pdf)
    got = {r["audio_id"]: r for r in A.audio_features(df).collect()}
    for name, samples in clips.items():
        mono = samples.astype(np.float64) / 32768.0
        assert got[name]["n_samples"] == len(samples)
        assert got[name]["sample_rate"] == 16_000
        assert abs(got[name]["rms"] - float(np.sqrt(np.mean(mono**2)))) < 1e-6
        assert abs(got[name]["duration_s"] - len(samples) / 16_000) < 1e-6
    # a 440 Hz sine crosses zero ~2*440 times/sec → zcr ≈ 880/16000
    assert abs(got["sine"]["zero_crossing_rate"] - 880 / 16_000) < 0.01
    assert got["silence"]["rms"] == 0.0 and got["silence"]["peak"] == 0.0


def test_audio_frame_sampling(spark):
    # 1s clip: loud first half, silent second half → frame RMS shows it
    rate = 16_000
    loud = _sine(secs=0.5, amp=0.8)
    silent = np.zeros(rate // 2, dtype=np.int16)
    clip = np.concatenate([loud, silent])
    df = spark.createDataFrame(
        pd.DataFrame({"audio_id": ["c"], "bytes": [bytes(A.encode_wav(clip, rate))]})
    )
    frames = sorted(A.sample_audio_frames(df, frame_ms=250).collect(), key=lambda r: r["frame_seq"])
    assert len(frames) == 4
    assert [f["start_ms"] for f in frames] == [0, 250, 500, 750]
    assert frames[0]["rms"] > 0.4 and frames[1]["rms"] > 0.4
    assert frames[2]["rms"] == 0.0 and frames[3]["rms"] == 0.0


def test_silence_segments(spark):
    import numpy as np
    import pandas as pd

    from morituri_spark.multimodal import audio as A

    rate = 16_000
    win = 800  # 50ms
    t = np.arange(win, dtype=np.float64)
    tone = np.floor(np.sin(2 * np.pi * 440.0 * t / rate) * 13106.8)
    rows = []
    # clip A: windows [loud, silent, silent, loud, silent] ->
    #   islands [50,150) and [200,250)
    pat_a = [1, 0, 0, 1, 0]
    sa = np.concatenate([tone * p for p in pat_a]).astype(np.int16)
    rows.append(("a", bytes(A.encode_wav(sa, rate))))
    # clip B: all loud -> no islands
    sb = np.concatenate([tone] * 3).astype(np.int16)
    rows.append(("b", bytes(A.encode_wav(sb, rate))))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["audio_id", "bytes"]))
    got = {}
    for r in A.silence_segments(df, frame_ms=50).collect():
        got.setdefault(r["audio_id"], []).append(
            (r["island"], r["silence_start_ms"], r["silence_end_ms"], r["n_frames"])
        )
    for k in got:
        got[k].sort()
    assert got == {"a": [(1, 50, 150, 2), (2, 200, 250, 1)]}


def test_pitch_amdf_square_wave(spark):
    import numpy as np

    from morituri_spark.multimodal import audio as A

    rate, win = 16_000, 800
    rows = []
    periods = {f"sq{p}": p for p in (20, 32, 50)}
    for aid, p in periods.items():
        n = np.arange(win * 2)
        x = np.where(n % p < p // 2, 9000, -9000).astype(np.int16)
        rows.append((aid, bytes(A.encode_wav(x, rate))))
    df = spark.createDataFrame(rows, "audio_id string, bytes binary")
    got = {(r["audio_id"], r["frame_seq"]): (r["best_lag"], r["amdf_min"])
           for r in A.pitch_amdf(df, lag_min=16, lag_max=64).collect()}
    for aid, p in periods.items():
        for k in (0, 1):
            lag, dmin = got[(aid, k)]
            assert (lag, dmin) == (p, 0), f"{aid} frame {k}"


def test_pitch_amdf_matches_loop_and_guards(spark):
    import numpy as np
    import pytest

    from morituri_spark.multimodal import audio as A

    rate, win, lmin, lmax = 16_000, 800, 16, 64
    rng = np.random.RandomState(9)
    x = rng.randint(-20000, 20000, size=win * 3).astype(np.int16)
    df = spark.createDataFrame(
        [("r", bytes(A.encode_wav(x, rate)))], "audio_id string, bytes binary"
    )
    got = {r["frame_seq"]: (r["best_lag"], r["amdf_min"], r["span"])
           for r in A.pitch_amdf(df, lag_min=lmin, lag_max=lmax).collect()}
    xs = x.astype(np.int64)
    span = win - lmax
    for k in range(3):
        fr = xs[k * win : (k + 1) * win]
        ds = [(int(np.abs(fr[:span] - fr[l : l + span]).sum()), l)
              for l in range(lmin, lmax + 1)]
        dmin, lag = min(ds)
        assert got[k] == (lag, dmin, span)
    with pytest.raises(ValueError):
        A.pitch_amdf(df, lag_min=0)
