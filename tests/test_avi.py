"""AVI/MJPEG container codec tests (operators/multimodal.py):
round-trip, frame sampling, truncation contract, Spark extraction stage."""

from __future__ import annotations

import numpy as np
import pytest

from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
)
from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.multimodal import (
    decode_avi_mjpeg,
    encode_avi_mjpeg,
    extract_frames_mjpeg,
)


def _clip(w=16, h=16, fps=10, grays=(40, 128, 210)):
    frames = [
        encode_jpeg(w, h, 3, np.full((h, w, 3), g, dtype=np.uint8).tobytes())
        for g in grays
    ]
    return encode_avi_mjpeg(w, h, fps, frames), frames


def test_roundtrip_meta_and_frames():
    avi, frames = _clip()
    v = decode_avi_mjpeg(avi)
    assert (v["width"], v["height"], v["fps"], v["n_frames"]) == (16, 16, 10, 3)
    assert v["frames"] == frames  # byte-exact container round-trip


def test_frames_decode_to_encoded_gray():
    avi, _ = _clip(grays=(50, 200))
    for g, fr in zip((50, 200), decode_avi_mjpeg(avi)["frames"]):
        d = decode_jpeg(fr)
        arr = np.frombuffer(d["pixels"], dtype=np.uint8)
        assert abs(float(arr.mean()) - g) <= 1.0


def test_odd_length_frames_word_aligned():
    # JPEG lengths vary; force odd-length payloads via different content
    w = h = 8
    frames = [
        encode_jpeg(w, h, 1, bytes((i * 31 + j) % 256 for i in range(h) for j in range(w)))
        for j in range(3)
    ]
    avi = encode_avi_mjpeg(w, h, 5, frames)
    assert decode_avi_mjpeg(avi)["frames"] == frames


def test_truncation_raises_valueerror_never_struct_error():
    avi, _ = _clip()
    for cut in (3, 11, 20, 60, len(avi) // 3, len(avi) // 2, len(avi) - 7):
        with pytest.raises(ValueError):
            decode_avi_mjpeg(avi[:cut])
    with pytest.raises(ValueError):
        decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")


def test_extract_frames_mjpeg_stage(spark):
    avi1, f1 = _clip(grays=(10, 20, 30, 40))
    avi2, f2 = _clip(h=8, grays=(99,))
    df = spark.createDataFrame(
        [(1, bytearray(avi1)), (2, bytearray(avi2)), (3, bytearray(b"junk"))],
        "vid long, content binary",
    )
    out = extract_frames_mjpeg(
        df, id_col="vid", every_k=2, max_frames=8
    ).collect()
    got = {(r["vid"], r["frame_no"]): r for r in out}
    # every_k=2 over 4 frames -> frames 0 and 2; junk row dropped
    assert set(got) == {(1, 0), (1, 2), (2, 0)}
    assert bytes(got[(1, 2)]["frame"]) == f1[2]
    assert got[(1, 0)]["n_frames"] == 4 and got[(1, 0)]["fps"] == 10
    assert got[(2, 0)]["height"] == 8
