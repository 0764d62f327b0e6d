"""The r8 codec-free decode tier is REAL: these tests feed the
decoders containers built BY HAND (raw RIFF bytes / raw P6 bytes, not
our own encoders), so passing proves the parser reads the container
format, not a private convention — and corrupt payloads fail loudly
instead of producing silent garbage. The oracle-parity gate separately
proves the encode->decode roundtrip preserves every sample.
"""

from __future__ import annotations

import struct

import pytest

from ds_mapreduce_spark.operators.multimodal import (
    decode_ppm_features,
    decode_wav_features,
)


def _hand_built_wav(samples: list[int], rate: int) -> bytes:
    """A RIFF/WAVE container written byte-by-byte from the spec —
    deliberately NOT via the `wave` module the operator uses."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_decoder_reads_foreign_containers(spark):
    samples = [0, 100, -32768, 32767, -1]
    payload = _hand_built_wav(samples, rate=44100)
    df = spark.createDataFrame(
        [(7, bytearray(payload))], "doc_id bigint, payload binary"
    )
    row = decode_wav_features(df).first()
    assert row["sample_rate"] == 44100  # parsed from the header
    assert row["n_samples"] == 5
    assert row["peak_abs"] == 32768
    assert row["sum_abs"] == sum(abs(s) for s in samples)
    assert row["sum_sq"] == sum(s * s for s in samples)


def test_ppm_decoder_reads_foreign_containers(spark):
    # 2x2 image, hand-written header with the optional comment-free form
    px = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    payload = b"P6\n2 2\n255\n" + px
    df = spark.createDataFrame(
        [(3, bytearray(payload))], "doc_id bigint, payload binary"
    )
    row = decode_ppm_features(df).first()
    assert (row["width"], row["height"]) == (2, 2)
    assert row["sum_r"] == 10 + 40 + 70 + 100
    assert row["sum_g"] == 20 + 50 + 80 + 110
    assert row["sum_b"] == 30 + 60 + 90 + 120


@pytest.mark.parametrize(
    "decoder,payload",
    [
        (decode_wav_features, b"RIFF garbage that is not a wav"),
        (decode_ppm_features, b"P5\n2 2\n255\n" + bytes(12)),  # wrong magic
        (decode_ppm_features, b"P6\n2 2\n255\n" + bytes(5)),  # truncated
    ],
)
def test_corrupt_payloads_fail_loudly(spark, decoder, payload):
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id bigint, payload binary"
    )
    with pytest.raises(Exception):
        decoder(df).collect()


def test_wav_decoder_zero_frame_container(spark):
    """A zero-frame WAV is a legal container: features come back 0
    instead of a bare ValueError from max() on empty (ADVICE r8)."""
    payload = _hand_built_wav([], rate=8000)
    df = spark.createDataFrame(
        [(11, bytearray(payload))], "doc_id bigint, payload binary"
    )
    row = decode_wav_features(df).first()
    assert row["sample_rate"] == 8000
    assert row["n_samples"] == 0
    assert (row["peak_abs"], row["sum_abs"], row["sum_sq"]) == (0, 0, 0)


def test_ppm_decoder_skips_header_comments(spark):
    """'#'-to-newline comments between P6 header fields are spec-legal
    and must parse (ADVICE r8) — including one directly after the
    magic and one between width and height."""
    px = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    payload = (
        b"P6\n# made by hand\n2 # width\n# then height\n2\n255\n" + px
    )
    df = spark.createDataFrame(
        [(5, bytearray(payload))], "doc_id bigint, payload binary"
    )
    row = decode_ppm_features(df).first()
    assert (row["width"], row["height"]) == (2, 2)
    assert row["sum_r"] == 10 + 40 + 70 + 100


def test_ppm_resize_reads_and_writes_real_containers(spark):
    """Real nearest-neighbor resize: a hand-built 4x2 P6 downsampled by
    2 keeps exactly pixels (0,0) and (2,0), and the output is itself a
    parseable P6 at the new dimensions (r9)."""
    from ds_mapreduce_spark.operators.multimodal import (
        _parse_ppm,
        resize_ppm_nearest,
    )

    # 4x2 image; pixel (x, y) has RGB (10x+y, 100+10x+y, 200+10x+y)
    px = bytes(
        b
        for y in range(2)
        for x in range(4)
        for b in (10 * x + y, 100 + 10 * x + y, 200 + 10 * x + y)
    )
    payload = b"P6\n4 2\n255\n" + px
    df = spark.createDataFrame(
        [(9, bytearray(payload))], "doc_id bigint, payload binary"
    )
    out = resize_ppm_nearest(df, factor=2).first()
    w, h, opx = _parse_ppm(bytes(out["payload"]))
    assert (w, h) == (2, 1)
    # nearest-neighbor top-left: out(0,0)=in(0,0), out(1,0)=in(2,0)
    assert list(opx) == [0, 100, 200, 20, 120, 220]


def test_wav_decimate_reads_and_writes_real_containers(spark):
    """Real decimation: a hand-built WAV strided by 2 keeps every other
    sample and the re-encoded header carries the halved rate (r9)."""
    import io
    import struct
    import wave

    from ds_mapreduce_spark.operators.multimodal import decimate_wav

    samples = [0, 1000, -2000, 3000, -32768, 32767, 7]
    payload = _hand_built_wav(samples, rate=8000)
    df = spark.createDataFrame(
        [(13, bytearray(payload))], "doc_id bigint, payload binary"
    )
    out = decimate_wav(df, stride=2).first()
    with wave.open(io.BytesIO(bytes(out["payload"])), "rb") as r:
        assert r.getframerate() == 4000
        n = r.getnframes()
        got = struct.unpack(f"<{n}h", r.readframes(n))
    assert list(got) == samples[::2]


def _png_chunk_bytes(typ: bytes, data: bytes) -> bytes:
    """Chunk writer duplicated INLINE from the spec so the test shares
    no code with the operator under test."""
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _hand_built_png() -> tuple[bytes, tuple[int, int, int]]:
    """A 2x5 8-bit RGB PNG written byte-by-byte from the spec with one
    row per filter type (0..4); every filtered byte below was computed
    BY HAND from the spec's prediction formulas, not by our encoder.
    Returns (payload, (sum_r, sum_g, sum_b)) for the pixel rows
    [10,20,30,40,50,60] / [5,5,5,7,8,9] / [15,25,35,45,55,65] /
    [100,110,120,130,140,150] / [200,210,220,10,20,30]."""
    import struct
    import zlib

    raw = (
        b"\x00" + bytes([10, 20, 30, 40, 50, 60])          # None
        + b"\x01" + bytes([5, 5, 5, 2, 3, 4])              # Sub
        + b"\x02" + bytes([10, 20, 30, 38, 47, 56])        # Up
        + b"\x03" + bytes([93, 98, 103, 58, 58, 58])       # Average
        + b"\x04" + bytes([100, 100, 100, 66, 66, 66])     # Paeth
    )
    ihdr = struct.pack(">IIBBBBB", 2, 5, 8, 2, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk_bytes(b"IHDR", ihdr)
        # spec-legal ancillary chunk the decoder must CRC-check and skip
        + _png_chunk_bytes(b"tEXt", b"Comment\x00hand built")
        + _png_chunk_bytes(b"IDAT", zlib.compress(raw))
        + _png_chunk_bytes(b"IEND", b"")
    )
    return payload, (562, 643, 724)


def test_png_decoder_reads_foreign_containers(spark):
    """The PNG decoder must reconstruct all five filter types from a
    container it did not produce (r9): hand-written chunk stream,
    hand-computed filtered bytes, an ancillary tEXt chunk in the way."""
    from ds_mapreduce_spark.operators.multimodal import decode_png_features

    payload, (sr, sg, sb) = _hand_built_png()
    df = spark.createDataFrame(
        [(21, bytearray(payload))], "doc_id bigint, payload binary"
    )
    row = decode_png_features(df).first()
    assert (row["width"], row["height"]) == (2, 5)
    assert (row["sum_r"], row["sum_g"], row["sum_b"]) == (sr, sg, sb)


def test_png_encoder_output_parses_as_standard_png():
    """encode_png's bytes round-trip through the spec-side parser and
    carry the PNG signature + IEND trailer of a standard file."""
    from ds_mapreduce_spark.operators.multimodal import (
        _encode_png_bytes,
        _parse_png,
    )

    px = bytes((7 * i + 3) % 256 for i in range(24 * 16 * 3))
    payload = _encode_png_bytes(px, 24, 16)
    assert payload.startswith(b"\x89PNG\r\n\x1a\n")
    assert payload.endswith(_png_chunk_bytes(b"IEND", b""))
    w, h, out = _parse_png(payload)
    assert (w, h) == (24, 16)
    assert out == px


def test_png_corrupt_and_unsupported_fail_loudly(spark):
    import struct
    import zlib

    from ds_mapreduce_spark.operators.multimodal import _parse_png

    payload, _ = _hand_built_png()
    # flip one byte inside the IDAT data region -> CRC mismatch
    idat_pos = payload.index(b"IDAT") + 4
    corrupt = (
        payload[:idat_pos]
        + bytes([payload[idat_pos] ^ 0xFF])
        + payload[idat_pos + 1 :]
    )
    with pytest.raises(ValueError, match="CRC"):
        _parse_png(corrupt)
    with pytest.raises(ValueError):
        _parse_png(payload[:-10])  # truncated: IEND gone
    # unsupported subsets: 16-bit depth, Adam7 interlace
    for depth, interlace in ((16, 0), (8, 1)):
        ihdr = struct.pack(">IIBBBBB", 2, 5, depth, 2, 0, 0, interlace)
        bad = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk_bytes(b"IHDR", ihdr)
            + _png_chunk_bytes(b"IDAT", zlib.compress(b"\x00" * 35))
            + _png_chunk_bytes(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="unsupported|interlace"):
            _parse_png(bad)


def test_resize_rejects_corrupt_containers(spark):
    from ds_mapreduce_spark.operators.multimodal import resize_ppm_nearest

    df = spark.createDataFrame(
        [(1, bytearray(b"P6\n4 2\n255\n" + bytes(5)))],
        "doc_id bigint, payload binary",
    )
    with pytest.raises(Exception):
        resize_ppm_nearest(df, factor=2).collect()


def test_numpy_synths_match_closed_forms_and_handle_empty(spark):
    """The numpy-rendered synthesizers (multimodal.synth_map_arrays —
    the late-r11 replacement for interpreted transform(sequence())
    expressions) must (a) reproduce the documented closed forms
    element-for-element on a concrete doc_id and (b) return an empty,
    correctly-typed frame on an empty input (the empty-partition path
    inside mapInPandas)."""
    from ds_mapreduce_spark.operators.gif import GIF_H, GIF_W, synth_gif_indices
    from ds_mapreduce_spark.operators.mcv import (
        MCV_FRAMES,
        MCV_H,
        MCV_W,
        synth_scroll_frames,
    )
    from ds_mapreduce_spark.operators.multimodal import (
        PCM_A,
        PCM_B,
        WAV_N_SAMPLES,
        synth_pcm_samples,
    )

    docs = spark.createDataFrame([(7,)], "doc_id bigint")

    pcm = synth_pcm_samples(docs).collect()[0]["samples"]
    assert len(pcm) == WAV_N_SAMPLES
    assert list(pcm[:4]) == [
        ((7 % 65536) * PCM_A + i * PCM_B) % 65536 - 32768 for i in range(4)
    ]

    gif = synth_gif_indices(docs).collect()[0]["px"]
    assert len(gif) == GIF_W * GIF_H
    assert gif[5] == ((7 % 256) * PCM_A + 5 * PCM_B) % 256

    frames = synth_scroll_frames(docs).collect()[0]["frames"]
    assert len(frames) == MCV_FRAMES
    # frame 2, pixel (x=1, y=3): source index ((3+2*2)%16)*24 + (1+3*2)%24
    src = ((3 + 4) % MCV_H) * MCV_W + (1 + 6) % MCV_W
    assert frames[2][3 * MCV_W + 1] == ((7 % 256) * PCM_A + src * PCM_B) % 256

    empty = spark.createDataFrame([], "doc_id bigint")
    out = synth_pcm_samples(empty)
    assert out.count() == 0
    assert out.columns == ["doc_id", "samples"]
