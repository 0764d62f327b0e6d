"""The MJPEG/AVI video tier is REAL: the container layer is lossless
with respect to the embedded JPEG frames, the parser reads a FOREIGN
hand-assembled AVI (with JUNK/idx1 chunks in the way), frame sampling
keeps exactly the strided frames, and corrupt or non-MJPG streams fail
loudly (the documented inter-frame-codec seam).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ds_mapreduce_spark.operators.jpeg import encode_jpeg_bytes, parse_jpeg
from ds_mapreduce_spark.operators.mjpeg_avi import (
    encode_mjpeg_avi_bytes,
    parse_mjpeg_avi,
)


def _frames(n, seed=9):
    rng = np.random.RandomState(seed)
    return [
        encode_jpeg_bytes(
            rng.randint(0, 256, 32 * 16).astype(np.uint8).tobytes(), 32, 16
        )
        for _ in range(n)
    ]


def test_container_is_lossless_wrt_embedded_jpegs():
    jpegs = _frames(4)
    w, h, dec = parse_mjpeg_avi(encode_mjpeg_avi_bytes(jpegs, 32, 16))
    assert (w, h) == (32, 16)
    assert dec == [parse_jpeg(j)[2] for j in jpegs]


def _chunk(fourcc, data):
    out = fourcc + struct.pack("<I", len(data)) + data
    return out + (b"\x00" if len(data) % 2 else b"")


def _hand_built_avi(jpeg: bytes, handler: bytes = b"MJPG") -> bytes:
    """A 1-frame AVI written chunk-by-chunk from the spec, deliberately
    NOT via our encoder: different fps/quality fields, a JUNK chunk and
    an idx1 index the parser must skip, an extra '00db' (uncompressed)
    chunk it must ignore."""
    avih = struct.pack("<IIIIIIIIII4I", 66667, 0, 0, 0, 1, 0, 1,
                       len(jpeg), 32, 16, 0, 0, 0, 0)
    strh = (
        b"vids" + handler
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 15, 0, 1, len(jpeg), 9500, 0)
        + struct.pack("<4h", 0, 0, 32, 16)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, 32, 16, 1, 24, b"MJPG",
                       32 * 16 * 3, 0, 0, 0, 0)
    hdrl = _chunk(
        b"LIST",
        b"hdrl"
        + _chunk(b"avih", avih)
        + _chunk(b"LIST", b"strl" + _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _chunk(
        b"LIST", b"movi" + _chunk(b"00db", b"\x00\x01\x02") + _chunk(b"00dc", jpeg)
    )
    body = (
        b"AVI "
        + hdrl
        + _chunk(b"JUNK", b"padding bytes here")
        + movi
        + _chunk(b"idx1", struct.pack("<4sIII", b"00dc", 16, 4, len(jpeg)))
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_parser_reads_foreign_containers():
    jpeg = _frames(1, seed=21)[0]
    w, h, dec = parse_mjpeg_avi(_hand_built_avi(jpeg))
    assert (w, h) == (32, 16)
    assert dec == [parse_jpeg(jpeg)[2]]


def test_frame_sampling_keeps_strided_frames(spark):
    from ds_mapreduce_spark.operators.mjpeg_avi import decode_mjpeg_features

    jpegs = _frames(4, seed=5)
    payload = encode_mjpeg_avi_bytes(jpegs, 32, 16)
    df = spark.createDataFrame(
        [(31, bytearray(payload))], "doc_id bigint, payload binary"
    )
    row = decode_mjpeg_features(df, stride=2).first()
    sampled = [parse_jpeg(jpegs[f])[2] for f in (0, 2)]
    a = np.concatenate([np.frombuffer(s, np.uint8) for s in sampled]).astype(int)
    assert (row["n_frames"], row["n_sampled"]) == (4, 2)
    assert row["sum_v"] == int(a.sum())
    assert row["sum_sq"] == int((a * a).sum())


def test_corrupt_and_unsupported_fail_loudly():
    jpeg = _frames(1, seed=3)[0]
    good = _hand_built_avi(jpeg)
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        parse_mjpeg_avi(b"RIFF\x04\x00\x00\x00WAVE")
    # inter-frame codec in the stream header: the documented seam
    with pytest.raises(ValueError, match="codec"):
        parse_mjpeg_avi(_hand_built_avi(jpeg, handler=b"H264"))
    # header/movi frame-count mismatch: avih claims 2 frames
    two = good.replace(
        struct.pack("<IIIIIII", 66667, 0, 0, 0, 1, 0, 1),
        struct.pack("<IIIIIII", 66667, 0, 0, 0, 2, 0, 1),
    )
    with pytest.raises(ValueError, match="frames"):
        parse_mjpeg_avi(two)
    with pytest.raises(ValueError, match="truncated"):
        parse_mjpeg_avi(good[: len(good) // 2])
    # frame dimensions disagree with avih
    small = encode_jpeg_bytes(bytes(64), 8, 8)
    with pytest.raises(ValueError, match="header says"):
        parse_mjpeg_avi(_hand_built_avi(small))
