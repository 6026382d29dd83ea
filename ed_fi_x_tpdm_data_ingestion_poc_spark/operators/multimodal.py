"""Multimodal column conventions: image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched `mapInPandas`.

The container ships no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features or NotImplementedError) — but everything
Spark-side is real and tested: schema convention, binary handling through
Arrow, batch shapes, and the executor-side feature extraction plumbing.

Convention: a multimodal table carries
    content   binary      -- raw bytes (or NULL when only a URI is known)
    meta      struct<mime string, n_bytes bigint, uri string>
Feature extraction appends typed feature columns per modality.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_FIELDS = "mime string, n_bytes bigint, uri string"


def attach_binary(
    df: DataFrame, *, source_col: str, mime: str, uri_col: str | None = None
) -> DataFrame:
    """Wrap a string/bytes column into the (content, meta) convention.
    (For the test corpus we treat utf-8 text bytes as the opaque payload.)
    """
    content = (
        F.col(source_col)
        if dict(df.dtypes).get(source_col) == "binary"
        else F.encode(F.col(source_col), "UTF-8")
    )
    uri = F.col(uri_col) if uri_col else F.lit(None).cast("string")
    return df.withColumn("content", content).withColumn(
        "meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(content).cast("bigint").alias("n_bytes"),
            uri.alias("uri"),
        ),
    )


def decode_image(content: bytes) -> object:
    """STUB: real deployments plug Pillow/libvips here. The container has no
    image codecs, so decoding raises — callers use extract_features'
    deterministic byte-level features instead."""
    raise NotImplementedError(
        "image decode requires an image codec library not present in this "
        "environment; byte-level features are produced by extract_features"
    )


def resize_images(
    df: DataFrame,
    *,
    id_col: str,
    content_col: str = "content",
    width: int = 224,
    height: int = 224,
) -> DataFrame:
    """Image resize stage: (id, content, meta) -> (id, content, meta) with
    target dimensions recorded in meta. The Spark-side plumbing (Arrow
    binary transfer, batch shape, output schema) is real; the pixel
    transform is a deterministic byte-level stand-in (truncate/pad to a
    size-derived length) because no image codec ships in this container —
    production swaps the inner function for Pillow/libvips decode+resize.
    """
    idc, cc = id_col, content_col
    target_len = width * height // 64  # deterministic fake "decoded" size

    def resize_batches(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out_bytes = []
            for b in pdf[cc]:
                if b is None:
                    out_bytes.append(None)
                    continue
                raw = bytes(b)
                # STUB transform: real impl decodes, resizes, re-encodes
                out_bytes.append((raw * (target_len // max(len(raw), 1) + 1))[:target_len])
            yield pd.DataFrame({"id": pdf[idc], "content": out_bytes})

    out_schema = "id long, content binary"
    resized = df.select(F.col(idc), F.col(cc)).mapInPandas(resize_batches, out_schema)
    return resized.withColumnRenamed("id", idc).withColumn(
        "meta",
        F.struct(
            F.lit("image/raw").alias("mime"),
            F.length("content").cast("bigint").alias("n_bytes"),
            F.lit(None).cast("string").alias("uri"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
        ),
    )


def sample_frames(
    df: DataFrame,
    *,
    id_col: str,
    content_col: str = "content",
    every_n_bytes: int = 1024,
    max_frames: int = 8,
) -> DataFrame:
    """Video frame-sampling stage: one input row -> up to max_frames rows
    (id, frame_no, frame binary). Fan-out via mapInPandas so one oversized
    video never pins a single task's memory beyond its own frames. The
    frame *extraction* is a deterministic byte-window stand-in (codecs are
    stubbed, as decode_image); schema/fan-out/partitioning are real."""
    idc, cc = id_col, content_col

    def frame_batches(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, nos, frames = [], [], []
            for rid, b in zip(pdf[idc], pdf[cc]):
                if b is None:
                    continue
                raw = bytes(b)
                for fno in range(min(max_frames, max(1, len(raw) // every_n_bytes))):
                    ids.append(rid)
                    nos.append(fno)
                    frames.append(raw[fno * every_n_bytes : (fno + 1) * every_n_bytes])
            yield pd.DataFrame({"id": ids, "frame_no": nos, "frame": frames})

    out_schema = "id long, frame_no int, frame binary"
    out = df.select(F.col(idc), F.col(cc)).mapInPandas(frame_batches, out_schema)
    return out.withColumnRenamed("id", idc)


def extract_features(
    df: DataFrame, *, id_col: str, content_col: str = "content"
) -> DataFrame:
    """Executor-side feature extraction over binary content via mapInPandas
    (Arrow-batched). Features are deterministic byte-level stand-ins for the
    stubbed decoder: size, head bytes (hex), md5 digest.

    The closure is self-contained (stdlib only) — see sinks/rest_sink.py for
    why executor closures must not reference module globals.
    """
    idc, cc = id_col, content_col

    def feature_batches(batches) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            contents = pdf[cc]
            yield pd.DataFrame(
                {
                    "id": pdf[idc],
                    "n_bytes": [len(b) if b is not None else 0 for b in contents],
                    "head_hex": [
                        (bytes(b)[:4].hex().upper() if b is not None else "")
                        for b in contents
                    ],
                    "digest": [
                        (hashlib.md5(bytes(b)).hexdigest() if b is not None else None)
                        for b in contents
                    ],
                }
            )

    out_schema = "id long, n_bytes bigint, head_hex string, digest string"
    feats = df.select(F.col(idc), F.col(cc)).mapInPandas(feature_batches, out_schema)
    return feats.withColumnRenamed("id", id_col)
