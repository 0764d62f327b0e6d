"""Differential locks for the r16 vectorized bit-I/O internals.

The r16 optimization round replaced the per-bit/per-code Python loops
in the shared codec bit layer (`operators/flac.BitReader`/`BitWriter`)
with accumulator/batch forms, and added spans-only container walks.
These tests pin the contract every codec row relies on: each batch
call is bit-identical to the sequential loop it replaced — same
values, same reader state left behind (so container bookkeeping like
`byte_pos`/`align` stays exact), and the same ValueError on
truncation.  The reference implementations here are the literal
pre-r16 loops.
"""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest

from ds_mapreduce_spark.operators.flac import (
    BitReader,
    BitWriter,
    _pack_pcm16le,
)
from ds_mapreduce_spark.operators.mcv import (
    MCV_FRAMES,
    MCV_H,
    MCV_W,
    encode_mcv_bytes,
    mcv_frame_spans,
    parse_mcv,
)
from ds_mapreduce_spark.operators.mdct import _read_ue, _write_ue


class RefBitReader:
    """The pre-r16 per-bit reader: one bit at a time, loudly truncating."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self._data = data
        self._bitpos = pos * 8

    def bit(self) -> int:
        byte = self._bitpos >> 3
        if byte >= len(self._data):
            raise ValueError("FLAC bitstream truncated")
        b = (self._data[byte] >> (7 - (self._bitpos & 7))) & 1
        self._bitpos += 1
        return b

    def read(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.bit()
        return v

    def read_unary(self) -> int:
        q = 0
        while self.bit() == 0:
            q += 1
        return q

    def read_ue(self) -> int:
        lz = self.read_unary()
        rest = self.read(lz)
        return ((1 << lz) | rest) - 1

    @property
    def bit_position(self) -> int:
        return self._bitpos


def _reader_bitpos(r: BitReader) -> int:
    return r._fb * 8 - r._navail


def _random_stream(rng: random.Random, nbytes: int) -> bytes:
    return bytes(rng.randrange(256) for _ in range(nbytes))


def test_read_and_unary_match_reference() -> None:
    rng = random.Random(0xB17B17)
    for _ in range(200):
        data = _random_stream(rng, rng.randrange(1, 64))
        fast, ref = BitReader(data), RefBitReader(data)
        while True:
            op = rng.randrange(3)
            try:
                if op == 0:
                    n = rng.randrange(0, 20)
                    want = ref.read(n)
                    got = fast.read(n)
                elif op == 1:
                    want = ref.read_unary()
                    got = fast.read_unary()
                else:
                    want = ref.read_ue()
                    got = _read_ue(fast)
            except ValueError:
                with pytest.raises(ValueError):
                    if op == 0:
                        fast.read(n)
                    elif op == 1:
                        fast.read_unary()
                    else:
                        _read_ue(fast)
                break
            assert got == want
            assert _reader_bitpos(fast) == ref.bit_position


def test_read_ue_many_matches_sequential() -> None:
    rng = random.Random(0xEE)
    for trial in range(200):
        # half the trials: real exp-Golomb trains (always decodable);
        # half: random bytes (exercises the truncation paths)
        if trial % 2 == 0:
            vals = [rng.randrange(0, 1 << rng.randrange(1, 16)) for _ in range(rng.randrange(1, 80))]
            w = BitWriter()
            for v in vals:
                _write_ue(w, v)
            w.align()
            data = w.getvalue()
        else:
            data = _random_stream(rng, rng.randrange(0, 40))
        count = rng.randrange(1, 90)
        seq, bat = BitReader(data), BitReader(data)
        want, err = [], False
        try:
            for _ in range(count):
                want.append(_read_ue(seq))
        except ValueError:
            err = True
        if err:
            with pytest.raises(ValueError):
                bat.read_ue_many(count)
        else:
            assert bat.read_ue_many(count) == want
            assert _reader_bitpos(bat) == _reader_bitpos(seq)
            # the held-bits invariant the container bookkeeping needs
            assert bat._navail < 8


def test_read_rice_many_matches_sequential() -> None:
    rng = random.Random(0x91CE)
    for trial in range(200):
        param = rng.randrange(0, 15)
        if trial % 2 == 0:
            us = [rng.randrange(0, 1 << rng.randrange(1, 14)) for _ in range(rng.randrange(1, 60))]
            w = BitWriter()
            for u in us:
                w.write((1 << param) | (u & ((1 << param) - 1)), (u >> param) + 1 + param)
            w.align()
            data = w.getvalue()
        else:
            data = _random_stream(rng, rng.randrange(0, 40))
        count = rng.randrange(1, 70)
        seq, bat = BitReader(data), BitReader(data)
        want, err = [], False
        try:
            for _ in range(count):
                q = seq.read_unary()
                want.append((q << param) | seq.read(param))
        except ValueError:
            err = True
        if err:
            with pytest.raises(ValueError):
                bat.read_rice_many(param, count)
        else:
            assert bat.read_rice_many(param, count) == want
            assert _reader_bitpos(bat) == _reader_bitpos(seq)
            assert bat._navail < 8


def test_read_many_matches_sequential() -> None:
    rng = random.Random(0xF1D0)
    for _ in range(200):
        data = _random_stream(rng, rng.randrange(0, 48))
        # stagger the start so the batch read begins mid-byte
        pre = rng.randrange(0, 12)
        nbits = rng.randrange(1, 33)
        count = rng.randrange(1, 60)
        seq, bat = BitReader(data), BitReader(data)
        try:
            seq.read(pre)
        except ValueError:
            continue
        bat.read(pre)
        want, err = [], False
        try:
            for _ in range(count):
                want.append(seq.read(nbits))
        except ValueError:
            err = True
        if err:
            with pytest.raises(ValueError):
                bat.read_many(nbits, count)
        else:
            got = bat.read_many(nbits, count)
            assert got.tolist() == want
            assert _reader_bitpos(bat) == _reader_bitpos(seq)
            assert bat._navail < 8
            # a follow-up read sees the identical remaining stream
            try:
                tail_want = seq.read(5)
            except ValueError:
                with pytest.raises(ValueError):
                    bat.read(5)
            else:
                assert bat.read(5) == tail_want


def test_bitwriter_fused_writes_match_per_bit_reference() -> None:
    rng = random.Random(0x3117E)
    for _ in range(200):
        ops = [
            (rng.randrange(0, 1 << 40), rng.randrange(0, 48))
            for _ in range(rng.randrange(1, 40))
        ]
        w = BitWriter()
        bits = []
        for v, n in ops:
            w.write(v, n)
            bits.extend((v >> k) & 1 for k in range(n - 1, -1, -1))
        w.align()
        pad = (-len(bits)) % 8
        bits.extend([0] * pad)
        want = bytes(
            int("".join(map(str, bits[i : i + 8])), 2)
            for i in range(0, len(bits), 8)
        )
        assert w.getvalue() == want


def test_pack_pcm16le_matches_struct_loop() -> None:
    rng = random.Random(0x9C39)
    for _ in range(50):
        samples = [rng.randrange(-0x8000, 0x8000) for _ in range(rng.randrange(0, 300))]
        want = b"".join(struct.pack("<h", s) for s in samples)
        assert _pack_pcm16le(samples) == want
    assert _pack_pcm16le([]) == b""
    for bad in (0x8000, -0x8001, 1 << 40):
        with pytest.raises(struct.error):
            _pack_pcm16le([0, bad, 1])


def test_mdct_encode_vectorized_matches_scalar_reference() -> None:
    """The vectorized scalefactor search + exp-Golomb pack in
    encode_granule_blobs is bit-identical to the per-value reference
    path (_scalefactor/_quantize/_write_ue), including EMAX saturation
    and the ±QMAX clamp."""
    import numpy as np

    from ds_mapreduce_spark.operators import mdct as M

    def ref_blobs(samples):
        x = np.asarray(samples, dtype=np.int64)
        acc = M._forward_accumulators(x)
        blobs = []
        for g0 in range(0, acc.shape[0], M.MDCT_GRANULE):
            frames = acc[g0 : g0 + M.MDCT_GRANULE]
            w = M.BitWriter()
            es = []
            for k in range(M.MDCT_N):
                e = M._scalefactor(int(np.abs(frames[:, k]).max()), k)
                es.append(e)
                w.write(e, 4)
            for row in frames:
                for k, a in enumerate(row.tolist()):
                    q = M._quantize(int(a), k, es[k])
                    M._write_ue(w, (q << 1) if q >= 0 else ((-q) << 1) - 1)
            w.align()
            coded = w.getvalue()
            blobs.append(coded + bytes([M.crc8(coded)]))
        return blobs

    rng = np.random.default_rng(0x3DC7)
    cases = [
        np.zeros(64, dtype=np.int64),
        rng.integers(-32768, 32768, size=256),
        rng.integers(-3, 4, size=128),  # tiny signal: low scalefactors
        (rng.integers(0, 2, size=512) * 2 - 1) * 32767,  # max energy
    ]
    for samples in cases:
        assert M.encode_granule_blobs(samples.tolist()) == ref_blobs(samples)


def test_lzw_compress_code_keys_match_string_keys() -> None:
    """The (prefix_code, byte)-keyed LZW table emits the identical code
    stream as the pre-r16 byte-string-keyed table, including CLEAR
    resets on dictionary overflow and the trailing-EOI layout."""
    from ds_mapreduce_spark.operators.gif import (
        _LZW_MAX_BITS,
        _LZW_MAX_ENTRIES,
        _lzw_compress,
        _lzw_decompress,
    )

    def ref_compress(data: bytes, min_code_size: int) -> bytes:
        clear = 1 << min_code_size
        eoi = clear + 1
        out = bytearray()
        acc = nbits = 0
        bits = min_code_size + 1
        k = 0

        def emit(code: int) -> None:
            nonlocal acc, nbits
            acc |= code << nbits
            nbits += bits
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8

        def emit_data(code: int) -> None:
            nonlocal bits, k
            emit(code)
            k += 1
            if eoi + k >= (1 << bits) and bits < _LZW_MAX_BITS:
                bits += 1

        emit(clear)
        table = {bytes([i]): i for i in range(clear)}
        next_code = eoi + 1
        w = data[:1]
        for byte in data[1:]:
            wk = w + bytes([byte])
            if wk in table:
                w = wk
                continue
            emit_data(table[w])
            if next_code >= _LZW_MAX_ENTRIES:
                emit(clear)
                table = {bytes([i]): i for i in range(clear)}
                next_code = eoi + 1
                bits = min_code_size + 1
                k = 0
            else:
                table[wk] = next_code
                next_code += 1
            w = bytes([byte])
        if w:
            emit_data(table[w])
        emit(eoi)
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)

    rng = random.Random(0x17B)
    cases = [
        b"",
        b"\x00",
        b"aaaaaaaaaabbbbbbbbbb" * 30,
        bytes(rng.randrange(256) for _ in range(20000)),  # forces overflow
        bytes(rng.randrange(4) for _ in range(5000)),
    ]
    for data in cases:
        for mcs in (2, 8):
            if mcs == 2 and any(b > 3 for b in data):
                continue
            got = _lzw_compress(data, mcs)
            assert got == ref_compress(data, mcs)
            assert _lzw_decompress(got, mcs) == data


def test_crc_slice_by_16_matches_byte_loop() -> None:
    from ds_mapreduce_spark.operators.flac import (
        _CRC8_TABLE,
        _CRC16_TABLE,
        crc8,
        crc16,
    )

    def ref_crc8(data: bytes) -> int:
        r = 0
        for byte in data:
            r = _CRC8_TABLE[r ^ byte]
        return r

    def ref_crc16(data: bytes) -> int:
        r = 0
        for byte in data:
            r = ((r << 8) & 0xFFFF) ^ _CRC16_TABLE[(r >> 8) ^ byte]
        return r

    rng = random.Random(0xC2C)
    # every length 0..64 (group-boundary edges) plus larger random sizes
    for n in list(range(65)) + [100, 255, 256, 517, 4096]:
        data = bytes(rng.randrange(256) for _ in range(n))
        assert crc8(data) == ref_crc8(data)
        assert crc16(data) == ref_crc16(data)
    # published check value lock is in tests/test_flac.py; re-pin here
    assert crc16(b"123456789") == 0xFEE8  # CRC-16/UMTS (0x8005, init 0)


def test_mcv_frame_spans_matches_parse() -> None:
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, size=(MCV_FRAMES, MCV_H, MCV_W))
    payload = encode_mcv_bytes(frames)
    assert mcv_frame_spans(payload) == parse_mcv(payload)[1]
    # same corruption contract: flip a byte inside a frame body
    corrupt = bytearray(payload)
    corrupt[len(corrupt) // 2] ^= 0x5A
    corrupt = bytes(corrupt)

    def outcome(fn):
        try:
            fn(corrupt)
        except ValueError:
            return "valueerror"
        return "ok"

    assert outcome(mcv_frame_spans) == outcome(lambda p: parse_mcv(p))
