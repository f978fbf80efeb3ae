"""Multimodal-column plumbing (SURVEY §2.10, north star BASELINE.json:6).

Media payloads are opaque ``binary`` columns + typed metadata; decode /
feature-extract runs as an Arrow-batched ``mapInPandas`` operator so
bytes stream through Python in columnar batches, never row-at-a-time.

The container has no image/audio codecs (TESTDATA has no media either),
so the actual codec call is STUBBED: ``decode_media_metadata`` uses a
deterministic fake decoder (documented formulas over the raw bytes)
unless a real ``decoder`` callable is injected. Everything around the
stub — binary column handling, metadata schema, partition-preserving
batch iteration, UDF signature — is real and tested, and the fake's
determinism keeps even this path oracle-checkable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, width int, height int, "
    "n_frames int, checksum string"
)


def attach_binary_media(docs: DataFrame) -> DataFrame:
    """Turn the documents fixture into a media table: payload = utf-8
    bytes of the text (stand-in for real image/audio/video bytes),
    media_type assigned deterministically.

    The scan is spread across the cluster first: media decode is the
    canonical CPU-heavy per-row stage, and a small or few-file input
    would otherwise pin the whole mapInPandas decode to as many cores
    as there are input splits."""
    from rpa_etl_investing_spark.operators.dedup import spread

    docs = spread(docs, "doc_id")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("media_type"),
    )


def _fake_decode(payload: bytes, media_type: str) -> tuple[int, int, int]:
    """Deterministic stand-in for a codec: dimensions derived from the
    byte length, frame count from the first checksum byte. A real
    deployment injects e.g. a PIL/ffmpeg-backed callable instead."""
    n = len(payload)
    width = 32 + n % 64
    height = 32 + (n * 7) % 64
    if media_type == "video":
        n_frames = 1 + hashlib.md5(payload).digest()[0] % 30
    else:
        n_frames = 1
    return width, height, n_frames


def decode_media_metadata(
    media: DataFrame,
    decoder: Callable[[bytes, str], tuple[int, int, int]] | None = None,
) -> DataFrame:
    """Decode stage as mapInPandas: batches of (doc_id, payload,
    media_type) in, typed metadata out. ``decoder=None`` → deterministic
    fake (see module docstring); pass a real codec callable to decode
    actual media."""
    decode = decoder or _fake_decode

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [
                decode(bytes(p), m)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "width": pd.Series([d[0] for d in dims], dtype="int32"),
                    "height": pd.Series([d[1] for d in dims], dtype="int32"),
                    "n_frames": pd.Series([d[2] for d in dims], dtype="int32"),
                    "checksum": [hashlib.md5(bytes(p)).hexdigest() for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(fn, MEDIA_META_SCHEMA)


def resize_media(meta: DataFrame, max_dim: int = 48) -> DataFrame:
    """Resize stage: cap the longer edge at ``max_dim``, preserving
    aspect ratio. Pure integer arithmetic (``new = old·max_dim // longer``)
    so the plan stays JVM-side and the oracle reproduces it exactly; a
    real deployment swaps in a codec-backed mapInPandas like
    :func:`decode_media_metadata` (same operator shape, the metadata
    computation IS the plumbing being exercised)."""
    longer = F.greatest("width", "height")
    needs = longer > max_dim
    # floor, not cast: CAST(double AS INT) truncates in Spark but rounds
    # in DuckDB — floor() is identical in both
    new_w = F.when(needs, F.floor(F.col("width") * max_dim / longer).cast("int")).otherwise(
        F.col("width")
    )
    new_h = F.when(needs, F.floor(F.col("height") * max_dim / longer).cast("int")).otherwise(
        F.col("height")
    )
    return meta.select(
        "doc_id",
        "media_type",
        "width",
        "height",
        new_w.alias("new_width"),
        new_h.alias("new_height"),
        needs.alias("resized"),
    )


def sample_video_frames(meta: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame sampling: explode every_n-th frame index per video — pure
    JVM-side generator (sequence + explode), no Python in the loop."""
    frames = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return (
        meta.filter(F.col("media_type") == "video")
        .select("doc_id", "n_frames", F.explode(frames).alias("frame_no"))
    )
