"""Category K (multimodal) — opaque-binary media columns with typed
metadata (task mandate: multimodal columns for training-data pipelines).

Design: media travels as a `binary` payload column + typed metadata struct
flattened to columns. Decode / feature-extract run as Arrow-batched
`mapInPandas` transforms so each batch is a contiguous block of payloads —
the exact shape a real image/audio decoder wants.

The actual codec step is STUBBED: this container has no image/audio
libraries, so `decode_image_batch` raises NotImplementedError and the
registered queries use `_fake_decode` — a deterministic md5-based feature
extractor with the same schema, partitioning, and batch shape as the real
thing. Swapping in a real decoder changes ONE function body, nothing else.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from big_data_management_and_analytics_spark.plans.registry import register
from big_data_management_and_analytics_spark.sources.io import load


def decode_image_batch(payloads: pd.Series) -> pd.DataFrame:
    """REAL decode step — requires an image library not in this container.

    Contract: payloads is a Series of bytes; returns a DataFrame with
    columns (width:int32, height:int32, mean_luma:float64) aligned to the
    input index.
    """
    raise NotImplementedError(
        "image decoding requires PIL/opencv — not available in this "
        "environment; use _fake_decode (deterministic stub) instead"
    )


def _fake_decode(payloads: pd.Series) -> pd.DataFrame:
    """Deterministic stand-in with the real decoder's schema and batch shape."""

    def feats(b: bytes):
        h = hashlib.md5(b).digest()
        return (
            16 + h[0] % 64,  # width
            16 + h[1] % 64,  # height
            round(int.from_bytes(h[2:4], "big") / 65535.0, 6),  # mean_luma
        )

    w, ht, luma = zip(*(feats(b) for b in payloads)) if len(payloads) else ((), (), ())
    return pd.DataFrame(
        {"width": w, "height": ht, "mean_luma": luma}, index=payloads.index
    )


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def _media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents re-cast as a multimodal table: text bytes as the opaque
    payload (stands in for image bytes), plus typed metadata columns."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
        F.octet_length("text").alias("byte_len"),
    )


@register(
    "mm_decode_features",
    "K",
    doc=(
        "Multimodal decode pipeline: binary payload → mapInPandas batch "
        "decode (stubbed deterministically) → typed feature columns. "
        "Rows-tier: features depend on the stub, not SQL-expressible."
    ),
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media_table(spark, sf_dir)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _fake_decode(pdf["payload"])
            out = pdf[["doc_id", "media_type", "byte_len"]].copy()
            out[["width", "height", "mean_luma"]] = feats
            yield out

    return media.mapInPandas(decode, MEDIA_SCHEMA)


@register(
    "mm_binary_meta",
    "K",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INT) AS byte_len,
               md5(text) AS payload_md5,
               (octet_length(encode(text)) > 256) AS is_large
        FROM documents
    """,
    doc=(
        "Opaque-binary metadata path: byte length + content hash + size "
        "flag computed on the payload column — all JVM-side."
    ),
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media_table(spark, sf_dir)
    return media.select(
        "doc_id",
        "byte_len",
        F.md5("payload").alias("payload_md5"),
        (F.col("byte_len") > 256).alias("is_large"),
    )


@register(
    "mm_frame_sample",
    "K",
    doc=(
        "Frame-sampling plumbing for video-like payloads: each payload "
        "yields ceil(byte_len/128) pseudo-frames via posexplode — the "
        "fan-out schema (media_id, frame_idx, frame_bytes) a real "
        "frame sampler produces. Rows-tier."
    ),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Empty payloads yield zero frames (sequence(0,-1) would count down).
    media = _media_table(spark, sf_dir).filter(F.col("byte_len") > 0)
    n_frames = F.ceil(F.col("byte_len") / 128).cast("int")
    frames = media.select(
        "doc_id",
        "byte_len",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_f"),
        F.col("payload"),
    )
    return frames.select(
        "doc_id",
        "frame_idx",
        F.substring(F.col("payload"), F.col("frame_idx") * 128 + 1, 128).alias(
            "frame_bytes"
        ),
    )


@register(
    "llm_multimodal_wide",
    "K",
    oracle="""
        SELECT d.doc_id, d.lang, d.n_chars,
               CAST(len(string_split_regex(lower(d.text), '\\s+')) AS INT) AS n_tokens,
               e.label,
               ROUND(sqrt(list_aggregate(
                   list_transform(e.embedding::DOUBLE[], x -> x * x), 'sum')), 6) AS emb_l2
        FROM documents d
        JOIN embeddings e ON d.doc_id = e.vec_id
    """,
    doc="Multimodal wide row: text stats + vector stats in one relation.",
)
def llm_multimodal_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding").cast("array<double>")
    l2 = F.sqrt(
        F.aggregate(F.transform(emb, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    from big_data_management_and_analytics_spark.functions.strings import tokens

    return (
        d.join(e, d.doc_id == e.vec_id)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.size(tokens(F.col("text"))).alias("n_tokens"),
            "label",
            F.round(l2, 6).alias("emb_l2"),
        )
    )
