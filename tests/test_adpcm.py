"""The IMA ADPCM tier is REAL and its sequential-state oracle is
exact: the recursive-CTE SQL replays the fused encoder+decoder state
machine and matches the Python codec chain sample-for-sample; the
quantizer/reconstruction step is brute-forced over every step index;
the container parser reads a FOREIGN hand-built file and fails loudly
on corruption; partial final blocks and pad nibbles are governed by
the fact chunk, not the block geometry.
"""

from __future__ import annotations

import struct

import duckdb
import pytest

from ds_mapreduce_spark.operators.adpcm import (
    ADPCM_BLOCK_ALIGN,
    ADPCM_INDEX_ADJ,
    ADPCM_SAMPLES_PER_BLOCK,
    ADPCM_STEP_TABLE,
    adpcm_decode_nibble,
    adpcm_step,
    decode_adpcm_wav_samples,
    encode_adpcm_wav_bytes,
    parse_adpcm_wav,
)
from ds_mapreduce_spark.operators.multimodal import (
    PCM_A,
    PCM_B,
    WAV_N_SAMPLES,
    WAV_SAMPLE_RATE,
)


def _synth(doc_id: int, i: int) -> int:
    return (((doc_id % 65536) * PCM_A + i * PCM_B) % 65536) - 32768


def _synth_samples(doc_id: int) -> list[int]:
    return [_synth(doc_id, i) for i in range(WAV_N_SAMPLES)]


def test_step_tables_are_the_ima_spec():
    """The published IMA tables: 89 steps growing ~1.1x (the spec's
    Chebyshev approximation of an exponential), bounded by int16;
    index adjustment -1 for small codes, +2/+4/+6/+8 for large."""
    assert len(ADPCM_STEP_TABLE) == 89
    assert ADPCM_STEP_TABLE[0] == 7 and ADPCM_STEP_TABLE[88] == 32767
    for a, b in zip(ADPCM_STEP_TABLE, ADPCM_STEP_TABLE[1:]):
        assert a < b <= a * 1.12 + 1
    assert ADPCM_INDEX_ADJ == (-1, -1, -1, -1, 2, 4, 6, 8)
    assert ADPCM_SAMPLES_PER_BLOCK == (ADPCM_BLOCK_ALIGN - 4) * 2 + 1


def test_quantizer_bruteforce_every_step_index():
    """For EVERY step index and a delta sweep crossing every quantizer
    threshold: the encoder's nibble is the spec's successive
    approximation (independently recomputed here via the decision
    thresholds), encode and decode agree on the reconstruction, and
    the reconstruction error is within the quantizer's half-step
    bound whenever no clamp was hit."""
    for idx in range(89):
        step = ADPCM_STEP_TABLE[idx]
        thresholds = [0, step >> 2, step >> 1, step,
                      step + (step >> 2), step + (step >> 1),
                      step + (step >> 1) + (step >> 2), 2 * step, 4 * step]
        for base in thresholds:
            for d in (base - 1, base, base + 1):
                for sign in (1, -1):
                    x = sign * d
                    nib, pred, idx2 = adpcm_step(0, idx, x)
                    # independent nibble derivation: code bits are the
                    # greedy base-(step, step/2, step/4) expansion
                    ad = abs(x)
                    c4 = 1 if ad >= step else 0
                    r1 = ad - c4 * step
                    c2 = 1 if r1 >= step >> 1 else 0
                    r2 = r1 - c2 * (step >> 1)
                    c1 = 1 if r2 >= step >> 2 else 0
                    expect_code = c4 * 4 + c2 * 2 + c1
                    assert nib & 7 == expect_code, (idx, x)
                    assert (nib & 8 == 8) == (x < 0), (idx, x)
                    # decoder mirrors the encoder's state update
                    dpred, didx = adpcm_decode_nibble(0, idx, nib)
                    assert (dpred, didx) == (pred, idx2), (idx, x)
                    # error bound: |x - pred| <= step/8 + rounding,
                    # unless the nibble saturated (code 7), the input
                    # exceeds int16, or the reconstruction clamped
                    if expect_code < 7 and abs(x) <= 32767 and abs(pred) < 32767:
                        assert abs(x - pred) <= (step >> 3) + 4, (idx, x)


def _py_decode_chain(samples: list[int]) -> list[int]:
    """Reference fused encode+decode (block-reset index, as the
    container encoder does) — what the recursive oracle replays."""
    out: list[int] = []
    for s0 in range(0, len(samples), ADPCM_SAMPLES_PER_BLOCK):
        block = samples[s0 : s0 + ADPCM_SAMPLES_PER_BLOCK]
        pred, idx = block[0], 0
        out.append(pred)
        for x in block[1:]:
            _nib, pred, idx = adpcm_step(pred, idx, x)
            out.append(pred)
    return out


def test_container_roundtrip_equals_reference_chain():
    for doc_id in (0, 1, 7, 65535, 65536, 123456789, 2**40 + 3):
        samples = _synth_samples(doc_id)
        rate, decoded = decode_adpcm_wav_samples(
            encode_adpcm_wav_bytes(samples)
        )
        assert rate == WAV_SAMPLE_RATE
        assert decoded == _py_decode_chain(samples), doc_id


def test_recursive_oracle_matches_python_chain():
    """The lock the registration's parity relies on: the DuckDB
    recursive CTE == the Python codec chain, feature-for-feature, on
    a doc_id set that exercises the mod-2^16 wrap."""
    from ds_mapreduce_spark.plans.multimodal_queries import _adpcm_oracle

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT doc_id FROM (VALUES (0), (3), "
        "(511), (65535), (65536), (123456789)) v(doc_id)"
    )
    rows = con.execute(
        _adpcm_oracle() + " ORDER BY doc_id"
    ).fetchall()
    assert len(rows) == 6
    for doc_id, rate, n, peak, sabs, ssq in rows:
        dec = _py_decode_chain(_synth_samples(doc_id))
        assert (rate, n) == (WAV_SAMPLE_RATE, WAV_N_SAMPLES)
        assert peak == max(abs(v) for v in dec), doc_id
        assert sabs == sum(abs(v) for v in dec), doc_id
        assert ssq == sum(v * v for v in dec), doc_id


def test_partial_blocks_and_pad_nibbles():
    """Sample counts that land on every block-boundary case: the fact
    chunk governs, pad nibbles are never emitted."""
    for n in (1, 2, 3, ADPCM_SAMPLES_PER_BLOCK - 1, ADPCM_SAMPLES_PER_BLOCK,
              ADPCM_SAMPLES_PER_BLOCK + 1, 2 * ADPCM_SAMPLES_PER_BLOCK):
        samples = [_synth(42, i) for i in range(n)]
        payload = encode_adpcm_wav_bytes(samples)
        rate, spb, n_out, align, data = parse_adpcm_wav(payload)
        assert (spb, align) == (ADPCM_SAMPLES_PER_BLOCK, ADPCM_BLOCK_ALIGN)
        assert n_out == n
        assert len(data) % ADPCM_BLOCK_ALIGN == 0
        _, decoded = decode_adpcm_wav_samples(payload)
        assert len(decoded) == n
        assert decoded == _py_decode_chain(samples)


def _foreign_container(samples, rate):
    """Hand-built writer sharing no code with the operator — includes
    a LIST chunk the parser must skip and an odd-size chunk whose pad
    byte must be honored."""
    from ds_mapreduce_spark.operators.adpcm import encode_adpcm_block

    blocks = b"".join(
        encode_adpcm_block(samples[s0 : s0 + ADPCM_SAMPLES_PER_BLOCK])
        for s0 in range(0, len(samples), ADPCM_SAMPLES_PER_BLOCK)
    )
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, rate, 4055, ADPCM_BLOCK_ALIGN, 4, 2,
        ADPCM_SAMPLES_PER_BLOCK,
    )
    body = (
        b"WAVE"
        + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd, padded
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", 4) + struct.pack("<I", len(samples))
        + b"data" + struct.pack("<I", len(blocks)) + blocks
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_reads_foreign_container():
    samples = _synth_samples(99)
    _, decoded = decode_adpcm_wav_samples(
        _foreign_container(samples, WAV_SAMPLE_RATE)
    )
    assert decoded == _py_decode_chain(samples)


def test_corrupt_containers_fail_loudly():
    payload = encode_adpcm_wav_bytes(_synth_samples(5))
    with pytest.raises(ValueError, match="RIFF"):
        decode_adpcm_wav_samples(b"JUNK" + payload[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_adpcm_wav_samples(payload[:-10])
    # PCM format tag in an otherwise intact container
    bad = payload.replace(b"fmt \x14\x00\x00\x00\x11\x00",
                          b"fmt \x14\x00\x00\x00\x01\x00", 1)
    with pytest.raises(ValueError, match="0x11"):
        decode_adpcm_wav_samples(bad)
    # data chunk whose size is internally consistent but disagrees
    # with the fact chunk's block count
    samples = _synth_samples(5)
    short = _foreign_container(samples[:ADPCM_SAMPLES_PER_BLOCK], WAV_SAMPLE_RATE)
    # patch the fact count to claim 2 blocks' worth of samples
    short = short.replace(
        b"fact" + struct.pack("<I", 4)
        + struct.pack("<I", ADPCM_SAMPLES_PER_BLOCK),
        b"fact" + struct.pack("<I", 4)
        + struct.pack("<I", ADPCM_SAMPLES_PER_BLOCK + 1),
        1,
    )
    with pytest.raises(ValueError, match="blocks"):
        parse_adpcm_wav(short)
    # header step index out of range
    from ds_mapreduce_spark.operators.adpcm import decode_adpcm_block

    with pytest.raises(ValueError, match="> 88"):
        decode_adpcm_block(struct.pack("<hBB", 0, 91, 0) + b"\x00" * 252, 5)
