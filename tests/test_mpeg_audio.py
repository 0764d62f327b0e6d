"""MPEG-audio framing unit tests: the ISO 11172-3 header/frame-length
arithmetic, the VBR first-fit rule, the ID3v2 syncsafe tag, and the
loud-failure contract on every header field."""

from __future__ import annotations

import pytest

from ds_mapreduce_spark.operators.mdct import (
    decode_mdct_samples,
    encode_mdct_bytes,
)
from ds_mapreduce_spark.operators.mpeg_audio import (
    MP3_BITRATES,
    MP3_SAMPLE_RATE,
    decode_mp3_samples,
    encode_mp3_bytes,
    frame_len,
    id3_tag_bytes,
    parse_mp3,
    pick_frame_size,
)
from ds_mapreduce_spark.operators.multimodal import PCM_A, PCM_B


def _synth(doc: int, n: int = 1024) -> list[int]:
    return [
        (((doc % 65536) * PCM_A + i * PCM_B) % 65536) - 32768
        for i in range(n)
    ]


def test_reconstruction_identical_to_mlt1():
    for doc in (0, 1, 7, 65535):
        x = _synth(doc)
        _, via_mp3 = decode_mp3_samples(encode_mp3_bytes(x))
        _, via_mlt1 = decode_mdct_samples(encode_mdct_bytes(x))
        assert via_mp3 == via_mlt1


def test_frame_length_rule_truncates_at_44100():
    # 144000*32 / 44100 = 104.49…: truncation is what the padding bit
    # exists to compensate — both facts locked here.
    assert frame_len(1, 0) == 104
    assert frame_len(1, 1) == 105
    assert frame_len(14, 0) == 1044


def test_pick_frame_size_is_first_fit():
    for body in range(1, 1041 - 4):
        i, pad = pick_frame_size(body)
        assert frame_len(i, pad) >= body + 4
        # no earlier (index, padding) candidate fits
        for j in range(1, i + 1):
            for p in (0, 1):
                if (j, p) == (i, pad):
                    break
                assert frame_len(j, p) < body + 4
            else:
                continue
            break


def test_pick_frame_size_uses_padding():
    used = {pick_frame_size(b) for b in range(1, 1037)}
    assert any(pad == 1 for _, pad in used), "padding bit never chosen"


def test_oversized_granule_rejected():
    with pytest.raises(ValueError, match="320 kbps"):
        pick_frame_size(frame_len(14, 1))


def test_vbr_census_varies_with_content():
    p = encode_mp3_bytes(_synth(7))
    headers, _ = decode_mp3_samples(p)
    assert len({i for i, _ in headers}) > 1, "VBR degenerated to CBR"


def test_id3_tag_size_closed_form():
    for doc in (0, 3):
        p = encode_mp3_bytes(_synth(doc))
        n_samples, _, _ = parse_mp3(p)
        assert p[: 3] == b"ID3"
        size = 0
        for b in p[6:10]:
            assert not b & 0x80
            size = (size << 7) | b
        assert 10 + size == id3_tag_bytes(n_samples)


def _corrupt(payload: bytes, pos: int, value: int) -> bytes:
    b = bytearray(payload)
    b[pos] = value
    return bytes(b)


def test_header_field_mutations_raise():
    p = encode_mp3_bytes(_synth(7))
    first = id3_tag_bytes(1024)
    cases = {
        "syncsafe": _corrupt(p, 6, 0x80),
        "sync": _corrupt(p, first, 0xFE),
        "version": _corrupt(p, first + 1, 0xF3),  # MPEG-2 bits
        "layer": _corrupt(p, first + 1, 0xFD),    # Layer II bits
        "protection": _corrupt(p, first + 1, 0xFA),
        "bitrate_free": _corrupt(p, first + 2, p[first + 2] & 0x0F),
        "bitrate_forbidden": _corrupt(p, first + 2, p[first + 2] | 0xF0),
        "sr_index": _corrupt(p, first + 2, (p[first + 2] & 0xF3) | 0x04),
        "private": _corrupt(p, first + 2, p[first + 2] | 0x01),
        "mode": _corrupt(p, first + 3, 0x00),
        "truncated": p[:-10],
        "trailing": p + b"\x00",
        "slack": _corrupt(p, len(p) - 1, 0x55)
        if p[-1] == 0 else p,  # last frame slack byte
    }
    for name, bad in cases.items():
        if bad == p:
            continue
        with pytest.raises(ValueError):
            parse_mp3(bad)


def test_bitrate_table_is_the_published_one():
    assert MP3_BITRATES == (
        0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
    )
    assert MP3_SAMPLE_RATE == 44100
