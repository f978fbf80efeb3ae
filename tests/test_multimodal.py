"""Real-codec multimodal plumbing: the parser must read genuine
container bytes (not trust any column), validate structure, and the
Spark decode stage must round-trip the encoded fixtures exactly."""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest

from rpa_etl_investing_spark.multimodal.binary_ops import (
    encode_avi,
    encode_jpeg,
    encode_png,
    media_payload_for,
    parse_media_payload,
)


def test_png_roundtrip():
    p = encode_png(b"hello world", 640, 480)
    assert parse_media_payload(p) == ("png", 640, 480, 1, b"hello world")


def test_png_with_real_idat_from_independent_builder():
    """A fully valid 1x1 RGBA PNG built chunk-by-chunk HERE (zlib IDAT,
    correct CRCs) — a stream our encoder never produces. The parser must
    skip IDAT and still read IHDR dimensions."""

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 6, 0, 0, 0)  # 1x1, 8-bit RGBA
    idat = zlib.compress(b"\x00\xff\x00\x00\xff")  # filter 0 + red pixel
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )
    media_type, width, height, n_frames, content = parse_media_payload(png)
    assert (media_type, width, height, n_frames) == ("png", 1, 1, 1)
    assert content == b""  # no tEXt chunk in this stream


def test_png_crc_corruption_raises():
    p = bytearray(encode_png(b"payload", 100, 50))
    p[16] ^= 0xFF  # flip a byte inside IHDR data → stored CRC no longer matches
    with pytest.raises(ValueError, match="CRC"):
        parse_media_payload(bytes(p))


def test_jpeg_roundtrip_and_progressive_sof2():
    p = encode_jpeg(b"jpeg content", 320, 256)
    assert parse_media_payload(p) == ("jpeg", 320, 256, 1, b"jpeg content")
    # hand-built marker stream with a progressive SOF2 and no comment:
    sof2 = (
        b"\xff\xc2"
        + struct.pack(">H", 17)
        + struct.pack(">BHHB", 8, 600, 800, 3)
        + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    )
    stream = b"\xff\xd8" + sof2 + b"\xff\xd9"
    assert parse_media_payload(stream) == ("jpeg", 800, 600, 1, b"")


def test_jpeg_bad_marker_raises():
    p = bytearray(encode_jpeg(b"x", 10, 10))
    p[2] = 0x00  # APP0 marker's 0xFF prefix destroyed
    with pytest.raises(ValueError, match="marker"):
        parse_media_payload(bytes(p))


@pytest.mark.parametrize("content", [b"even", b"odd bytes"])  # pad / no pad
def test_avi_roundtrip_with_riff_padding(content):
    p = encode_avi(content, 1920, 1080, 24)
    assert parse_media_payload(p) == ("avi", 1920, 1080, 24, content)
    # RIFF size field must cover the whole body (spec: file = 8 + size)
    assert struct.unpack("<I", p[4:8])[0] + 8 == len(p)


@pytest.mark.parametrize("content", [b"pcm samples!", b"odd"])
def test_wav_roundtrip(content):
    from rpa_etl_investing_spark.multimodal.binary_ops import (
        encode_wav,
        parse_wav_payload,
    )

    p = encode_wav(content, 44100, 2)
    rate, chans, bits, n_samples, got = parse_wav_payload(p)
    assert (rate, chans, bits) == (44100, 2, 16)
    assert n_samples == len(content) // 4  # 2 ch x 16 bit = 4-byte frames
    assert got == content
    assert struct.unpack("<I", p[4:8])[0] + 8 == len(p)  # RIFF size field
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        parse_wav_payload(b"RIFF\x00\x00\x00\x00AVI ")


def test_unknown_signature_routes_not_raises():
    assert parse_media_payload(b"\x00\x01\x02 garbage") == ("unknown", 0, 0, 0, b"")


def test_fixture_payloads_are_real_containers():
    """media_payload_for must produce parseable containers whose decoded
    metadata equals the documented formulas the oracle uses."""
    for doc_id, text in [(0, "alpha beta"), (1, "gamma"), (2, "delta epsilon zeta")]:
        payload = media_payload_for(doc_id, text)
        media_type, width, height, n_frames, content = parse_media_payload(payload)
        n = len(text.encode())
        assert media_type == ["png", "jpeg", "avi"][doc_id % 3]
        assert width == 32 + n % 64
        assert height == 32 + (n * 7) % 64
        assert content == text.encode()
        if media_type == "avi":
            assert n_frames == 1 + hashlib.md5(text.encode()).digest()[0] % 30
        else:
            assert n_frames == 1


def test_spark_decode_roundtrips_fixture(spark, sf_dir):
    """End-to-end through the mapInPandas stages: encode → parse-from-
    bytes must agree with driver-side parsing of the same payloads."""
    from rpa_etl_investing_spark.catalog import tbl
    from rpa_etl_investing_spark.multimodal import (
        attach_binary_media,
        decode_media_metadata,
    )

    docs = tbl(spark, sf_dir, "documents").filter("doc_id < 12")
    got = {
        r.doc_id: (r.media_type, r.width, r.height, r.n_frames, r.checksum)
        for r in decode_media_metadata(attach_binary_media(docs)).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        mt, w, h, fr, content = parse_media_payload(
            media_payload_for(r.doc_id, r.text)
        )
        assert got[r.doc_id] == (mt, w, h, fr, hashlib.md5(content).hexdigest())


def test_spark_decode_rejects_corrupt_payload(spark):
    """A corrupted chunk fails the job loudly (CRC validation runs on
    executors), not silently — the decode-with-validation contract."""
    corrupt = bytearray(encode_png(b"abc", 5, 5))
    corrupt[16] ^= 0xFF
    df = spark.createDataFrame([(1, bytes(corrupt))], "doc_id long, payload binary")
    from rpa_etl_investing_spark.multimodal import decode_media_metadata

    with pytest.raises(Exception, match="CRC"):
        decode_media_metadata(df).collect()
