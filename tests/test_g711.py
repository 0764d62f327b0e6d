"""The G.711 mu-law tier is REAL: the codec's encode->decode equals
the oracle's closed form over the ENTIRE 16-bit input range, the
decoder reads a FOREIGN hand-built container (with an extra chunk in
the way), and corrupt/unsupported payloads fail loudly. Interchange
with javax.sound's independent mu-law implementation is locked in
tests/test_codec_interchange.py.
"""

from __future__ import annotations

import struct

import pytest

from ds_mapreduce_spark.operators.g711 import (
    ULAW_BIAS,
    ULAW_CLIP,
    encode_ulaw_wav_bytes,
    parse_ulaw_wav,
    ulaw_decode_sample,
    ulaw_encode_sample,
)


def _closed_form(v: int) -> int:
    """The oracle's 8-branch CASE, in Python (mirrors
    plans/multimodal_queries.py:_ulaw_oracle)."""
    mm = min(abs(v), ULAW_CLIP) + ULAW_BIAS
    for seg in range(8):
        if mm < (256 << seg) or seg == 7:
            mag = (((mm >> (seg + 3)) & 15) << 3) + ULAW_BIAS
            mag = mag * (1 << seg) - ULAW_BIAS
            break
    return -mag if v < 0 else mag


def test_closed_form_equals_codec_over_entire_input_range():
    for v in range(-32768, 32768):
        assert ulaw_decode_sample(ulaw_encode_sample(v)) == _closed_form(v), v


def test_companding_is_monotone_and_bounded():
    """Sanity on the codec itself: reconstruction error is bounded by
    the segment's step size and decode is monotone in the magnitude."""
    prev = None
    for v in range(0, 32636, 7):
        r = ulaw_decode_sample(ulaw_encode_sample(v))
        seg = max((min(v, ULAW_CLIP) + ULAW_BIAS).bit_length() - 8, 0)
        assert abs(r - v) <= (4 << seg)  # half the quantization step
        if prev is not None:
            assert r >= prev
        prev = r


def _hand_built_ulaw_wav(samples, rate):
    """RIFF writer duplicated inline from the spec (with a LIST chunk
    the parser must skip) so the test shares no code with the
    operator."""
    data = bytes(ulaw_encode_sample(s) for s in samples)
    fmt = struct.pack("<HHIIHH", 7, 1, rate, rate, 1, 8)
    body = (
        b"WAVE"
        + b"LIST" + struct.pack("<I", 4) + b"INFO"  # skipped chunk
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    if len(data) % 2:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decoder_reads_foreign_containers(spark):
    from ds_mapreduce_spark.operators.g711 import decode_ulaw_features

    samples = [0, 1000, -2000, 32767, -32768]
    payload = _hand_built_ulaw_wav(samples, rate=44100)
    df = spark.createDataFrame(
        [(29, bytearray(payload))], "doc_id bigint, payload binary"
    )
    row = decode_ulaw_features(df).first()
    recon = [ulaw_decode_sample(ulaw_encode_sample(s)) for s in samples]
    assert row["sample_rate"] == 44100  # parsed from the header
    assert row["n_samples"] == 5
    assert row["peak_abs"] == max(abs(r) for r in recon)
    assert row["sum_abs"] == sum(abs(r) for r in recon)
    assert row["sum_sq"] == sum(r * r for r in recon)


def test_container_roundtrip_and_word_alignment():
    # odd-length data exercises the RIFF padding byte
    samples = [10, -10, 12345]
    payload = encode_ulaw_wav_bytes(samples, rate=8000)
    rate, data = parse_ulaw_wav(payload)
    assert rate == 8000
    assert len(data) == 3
    assert [ulaw_decode_sample(b) for b in data] == [
        ulaw_decode_sample(ulaw_encode_sample(s)) for s in samples
    ]


def test_corrupt_and_unsupported_fail_loudly():
    payload = encode_ulaw_wav_bytes([1, 2, 3], rate=8000)
    with pytest.raises(ValueError, match="not a RIFF"):
        parse_ulaw_wav(b"FORM" + payload[4:])
    with pytest.raises(ValueError, match="truncated|missing"):
        parse_ulaw_wav(payload[:-4])
    # PCM format tag instead of mu-law
    pcm = payload.replace(
        struct.pack("<HH", 7, 1), struct.pack("<HH", 1, 1), 1
    )
    with pytest.raises(ValueError, match="format"):
        parse_ulaw_wav(pcm)
    # stereo
    stereo = payload.replace(
        struct.pack("<HH", 7, 1), struct.pack("<HH", 7, 2), 1
    )
    with pytest.raises(ValueError, match="mono"):
        parse_ulaw_wav(stereo)
