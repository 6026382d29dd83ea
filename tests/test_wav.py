"""WAV (RIFF PCM) codec tests (operators/multimodal.py decode_wav /
encode_wav / audio_features) — the audio analog of test_jpeg_decode.py:
round-trips through the module's own writer at all supported depths, the
ValueError truncation contract, unsupported-format guards, and the
Spark-side feature extraction with per-row error capture.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.multimodal import (
    audio_features,
    decode_wav,
    encode_wav,
)


def _sine_pcm(n, sr, amp, dtype):
    t = np.arange(n, dtype=np.float64) / sr
    x = np.round(amp * np.sin(2 * np.pi * 440.0 * t))
    return x.astype(dtype).tobytes()


def test_round_trip_16bit_mono():
    pcm = _sine_pcm(1600, 16000, 16000.0, "<i2")
    d = decode_wav(encode_wav(1, 16000, 16, pcm))
    assert (d["n_channels"], d["sample_rate"], d["bit_depth"]) == (1, 16000, 16)
    assert d["n_frames"] == 1600 and d["duration_s"] == pytest.approx(0.1)
    # quantized sine: rms ~ A/sqrt(2), peak within sampling bounds of A
    amp = 16000.0 / 32768.0
    assert d["rms"] == pytest.approx(amp / np.sqrt(2), rel=0.02)
    assert 0.95 * amp <= d["peak"] <= amp + 1e-9


@pytest.mark.parametrize(
    "depth,dtype,amp,scale",
    [(8, np.uint8, 100.0, 128.0), (32, "<i4", 2**29, 2147483648.0)],
)
def test_round_trip_other_depths(depth, dtype, amp, scale):
    if depth == 8:  # 8-bit WAV is unsigned: bias the sine around 128
        t = np.arange(800, dtype=np.float64) / 8000
        x = np.round(128.0 + amp * np.sin(2 * np.pi * 440.0 * t))
        pcm = x.astype(np.uint8).tobytes()
    else:
        pcm = _sine_pcm(800, 8000, amp, dtype)
    d = decode_wav(encode_wav(1, 8000, depth, pcm))
    assert d["bit_depth"] == depth and d["n_frames"] == 800
    assert d["rms"] == pytest.approx(amp / scale / np.sqrt(2), rel=0.05)


def test_stereo_frame_count():
    pcm = _sine_pcm(2000, 8000, 1000.0, "<i2")  # 2000 samples = 1000 frames
    d = decode_wav(encode_wav(2, 8000, 16, pcm))
    assert d["n_channels"] == 2 and d["n_frames"] == 1000
    assert d["duration_s"] == pytest.approx(1000 / 8000)


def test_extra_chunks_tolerated():
    pcm = _sine_pcm(80, 8000, 1000.0, "<i2")
    wav = bytearray(encode_wav(1, 8000, 16, pcm))
    # splice a LIST chunk between fmt and data
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    fmt_end = 12 + 8 + 16
    spliced = bytes(wav[:fmt_end]) + extra + bytes(wav[fmt_end:])
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert decode_wav(spliced)["n_frames"] == 80


def test_truncation_raises_value_error_only():
    full = encode_wav(1, 8000, 16, _sine_pcm(80, 8000, 1000.0, "<i2"))
    for cut in range(0, len(full), 3):
        try:
            decode_wav(full[:cut])
        except (ValueError, NotImplementedError):
            pass  # the contract — never struct.error/IndexError


def test_unsupported_formats_named():
    pcm = _sine_pcm(80, 8000, 1000.0, "<i2")
    wav = bytearray(encode_wav(1, 8000, 16, pcm))
    wav[20:22] = struct.pack("<H", 3)  # fmt code 3 = IEEE float
    with pytest.raises(NotImplementedError, match="PCM"):
        decode_wav(bytes(wav))
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"\x89PNG not audio")
    with pytest.raises(ValueError):
        encode_wav(1, 8000, 24, pcm)


def test_audio_features_captures_errors_per_row(spark):
    good = encode_wav(1, 8000, 16, _sine_pcm(160, 8000, 8000.0, "<i2"))
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"not a wav")), (3, None)],
        "id bigint, content binary",
    )
    rows = {r.id: r for r in audio_features(df, id_col="id").collect()}
    assert rows[1].err is None and rows[1].sample_rate == 8000
    assert rows[1].n_frames == 160
    assert rows[2].err and "RIFF" in rows[2].err
    assert rows[2].sample_rate is None
    assert rows[3].err == "null content"
