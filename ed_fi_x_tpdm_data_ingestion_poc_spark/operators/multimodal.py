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
