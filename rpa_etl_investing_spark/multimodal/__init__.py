"""Multimodal columns (SURVEY §2.10): image/audio/video as opaque binary
columns with typed metadata."""

from rpa_etl_investing_spark.multimodal.binary_ops import (
    AUDIO_META_SCHEMA,
    MEDIA_META_SCHEMA,
    attach_binary_audio,
    attach_binary_media,
    decode_audio_metadata,
    decode_media_metadata,
    resize_media,
    sample_video_frames,
)

__all__ = [
    "AUDIO_META_SCHEMA",
    "MEDIA_META_SCHEMA",
    "attach_binary_audio",
    "attach_binary_media",
    "decode_audio_metadata",
    "decode_media_metadata",
    "resize_media",
    "sample_video_frames",
]
