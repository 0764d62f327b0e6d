"""H.264 Annex-B unit tests: emulation prevention in both directions,
the SPS cropping arithmetic, NAL sequence validation, the closed-form
escape-count formula the oracle replays, and the no-escape proof for
frame NALs."""

from __future__ import annotations

import struct

import pytest

from ds_mapreduce_spark.operators import annexb as ab
from ds_mapreduce_spark.operators.mcv import (
    MCV_FRAMES,
    MCV_H,
    MCV_VX,
    MCV_VY,
    MCV_W,
    encode_mcv_bytes,
    parse_mcv,
)
from ds_mapreduce_spark.operators.multimodal import PCM_A, PCM_B


def _synth(doc_id: int):
    n = MCV_W * MCV_H
    return [
        [
            (
                (doc_id % 256) * PCM_A
                + (
                    (((i // MCV_W) + MCV_VY * t) % MCV_H) * MCV_W
                    + (((i % MCV_W) + MCV_VX * t) % MCV_W)
                )
                * PCM_B
            )
            % 256
            for i in range(n)
        ]
        for t in range(MCV_FRAMES)
    ]


def _stream(doc_id: int) -> tuple[bytes, bytes]:
    mcv = encode_mcv_bytes(_synth(doc_id))
    return mcv, ab.wrap_annexb(doc_id, mcv)


def test_roundtrip_rebuilds_identical_container():
    for doc_id in (0, 1, 255, 65536, 2**40 + 3, 2**62 + 1):
        mcv, stream = _stream(doc_id)
        sei_doc, w, h, rbsps = ab.parse_annexb(stream)
        assert (sei_doc, w, h) == (doc_id, MCV_W, MCV_H)
        assert ab.rebuild_mcv(w, h, rbsps) == mcv


@pytest.mark.parametrize(
    "rbsp",
    [
        b"\x00\x00\x00", b"\x00\x00\x01", b"\x00\x00\x02", b"\x00\x00\x03",
        b"\x00\x00\x04", b"\x00" * 9, b"\x01\x00\x00", b"\x00",
        b"\x00\x00\x03\x00\x00\x03", b"\x05\x00\x00\x00\x00\x00\x01",
    ],
)
def test_escape_roundtrip(rbsp):
    ebsp = ab.ebsp_escape(rbsp)
    assert ab.ebsp_unescape(ebsp) == rbsp
    # escaped streams never contain the forbidden pattern
    for i in range(len(ebsp) - 2):
        assert not (ebsp[i] == 0 and ebsp[i + 1] == 0 and ebsp[i + 2] <= 2)


@pytest.mark.parametrize(
    "bad", [b"\x00\x00\x00", b"\x00\x00\x01", b"\x00\x00\x02",
            b"\x00\x00\x03\x04",
            # §7.4.1.1: an emulation byte must PRECEDE 00/01/02/03 —
            # a 0x03 escape as the NAL's final byte is malformed
            b"\x00\x00\x03"]
)
def test_unescape_rejects_violations(bad):
    with pytest.raises(ValueError):
        ab.ebsp_unescape(bad)


def test_escape_count_formula_matches_scanner():
    """The oracle's gaps-and-islands formula — (k-1)//2 per maximal
    zero run, +1 when the run length is even (>=2) and the terminator
    is <= 0x03 — equals the scanner's insertion count on the SEI
    record for adversarial doc_ids (internal zero bytes, zero-byte
    tails, the all-zero id)."""
    ids = [0, 1, 2, 3, 255, 256, 0x10000, 0x1000000, 2**40 + 3,
           2**56, 2**62 + 1, 0x0100000000000300, 0x0003000000000000]
    ids += [(0x9E3779B97F4A7C15 * i) % 2**63 for i in range(64)]
    for doc_id in ids:
        record = struct.pack(">QIII", doc_id, MCV_FRAMES, MCV_W, MCV_H)
        scanned = len(ab.ebsp_escape(record)) - len(record)
        # replay the formula over maximal zero runs
        total, k = 0, 0
        for b in record + b"\x80":  # 0x80 stands in for rbsp trailing
            if b == 0:
                k += 1
                continue
            if k:
                total += (k - 1) // 2
                if k >= 2 and k % 2 == 0 and b <= 3:
                    total += 1
                k = 0
        assert total == scanned, (doc_id, total, scanned)


def test_frame_nals_never_need_escaping():
    """The in-NAL zero-run bound: exp-Golomb codes cap zero runs below
    16 bits, so escape is a no-op on every slice RBSP — the invariant
    that lets the oracle price frame NALs without byte content."""
    for doc_id in range(48):
        mcv, _ = _stream(doc_id)
        _, spans = parse_mcv(mcv)
        for s, e in spans:
            rbsp = mcv[s:e] + b"\x80"
            assert ab.ebsp_escape(rbsp) == rbsp


def test_sei_emulation_fires_on_the_corpus():
    for doc_id in (0, 1, 7):
        rbsp = ab.write_sei(doc_id, MCV_FRAMES, MCV_W, MCV_H)
        assert len(ab.ebsp_escape(rbsp)) > len(rbsp)


def test_sps_cropping_arithmetic():
    assert ab.parse_sps(ab.write_sps(24, 16)) == (24, 16)
    assert ab.parse_sps(ab.write_sps(32, 32)) == (32, 32)
    assert ab.parse_sps(ab.write_sps(30, 18)) == (30, 18)
    with pytest.raises(ValueError, match="even"):
        ab.write_sps(23, 16)


def test_sps_field_mutations_raise():
    sps = bytearray(ab.write_sps(24, 16))
    for pos in range(len(sps)):
        for bit in range(8):
            bad = bytearray(sps)
            bad[pos] ^= 1 << bit
            try:
                w, h = ab.parse_sps(bytes(bad))
            except ValueError:
                continue
            # a surviving parse must have decoded DIFFERENT geometry
            # via legal field values — never silently the same
            assert (w, h) != (24, 16)


def test_nal_sequence_violations_raise():
    _, stream = _stream(7)
    cases = {
        "no 4-byte opening": stream[1:],
        "forbidden bit": stream[:4] + bytes([stream[4] | 0x80]) + stream[5:],
        "garbage": b"\x00\x00\x00\x01",
        "short": b"\x00\x00",
    }
    for name, bad in cases.items():
        with pytest.raises(ValueError):
            ab.parse_annexb(bad)


def test_sei_frame_count_mismatch_raises():
    mcv, stream = _stream(7)
    # strip the final (3-byte start) slice NAL: SEI then disagrees
    last = stream.rfind(b"\x00\x00\x01")
    with pytest.raises(ValueError, match="declares"):
        ab.parse_annexb(stream[:last])


def test_rbsp_trailing_enforced():
    with pytest.raises(ValueError, match="trailing"):
        ab._strip_rbsp_trailing(b"\x01\x02\x03")
    assert ab._strip_rbsp_trailing(b"\x01\x80") == b"\x01"
