"""REAL lossy codec (r9): baseline sequential JPEG, implemented from
the public ITU T.81 spec with stdlib + numpy — no external library.

This closes the LAST declared ``NotImplementedError`` seam class in the
multimodal family ("lossy JPEG/MP3/H.264"): lossy image compression is
now real. The encoder writes genuine JFIF files (SOI, APP0, DQT, SOF0,
DHT, SOS, entropy-coded scan with 0xFF byte stuffing, EOI — any viewer
opens them) and the decoder is a full baseline-grayscale parser: marker
walk, DQT in zigzag order, canonical Huffman tables rebuilt FROM the
container's DHT segment (not assumed), bit-unstuffing entropy decode
with the spec's EXTEND procedure, dequantize, inverse zigzag, IDCT,
level shift + clamp; restart intervals (DRI/RSTn — the spec's
intra-image parallelism seam, with byte realignment and DC-predictor
reset) are supported on both sides. Unsupported spec subsets
(progressive SOF2, multi-component color, 16-bit quant tables) raise —
the same fail-loudly contract as the WAV/PPM/PNG parsers.

Oracle strategy — the hard part of grading a LOSSY codec bit-exactly:
T.81 does NOT mandate a DCT implementation (it only bounds accuracy),
so this codec defines its DCT/IDCT as FIXED-POINT integer arithmetic
(13-bit basis table, half-away-from-zero descale — the same family of
scaled-integer transforms production decoders use). Every arithmetic
step is then an exact integer function expressible in portable SQL
(integer DIV truncates toward zero on Spark AND DuckDB — the CLAUDE.md
verified-portable list). The synthesized images are constant+step 8x8
blocks: for those, the basis table's EXACT zero row-sums (proven by
construction — odd-u rows are antisymmetric so rounded entries cancel
pairwise; even-u rows cancel in quads) mean the transform produces
exactly 5 nonzero coefficients (DC + 4 odd-u ACs, zigzag indices
1/6/15/28 — genuinely exercising run-length coding), and the decoded
pixels equal a closed-form integer formula the DuckDB oracle computes
analytically without ever seeing a JPEG byte. Parity therefore proves
the full DCT -> quantize -> Huffman -> container -> parse -> decode
chain reproduced every reconstructed pixel bit-for-bit. The brute-force
equivalence of the analytic formula vs the general pipeline over the
ENTIRE synth parameter space (192 base values x 32 step values) is
locked by tests/test_jpeg.py.

Scale notes (100 TB): both legs are Arrow-batched ``mapInPandas``,
map-only, zero shuffles beyond the narrow-key spread; the DCT/IDCT are vectorized numpy int64
matmuls over all blocks of a payload at once, only the entropy coder
is per-symbol Python. Payload width (not row count) sizes tasks via
``spark.sql.files.maxPartitionBytes``; features are written columnar
so the payload column prunes away downstream.

Reference parity note: the reference engine (C++/Rust control plane,
/root/reference/src) has no media path at all — this family implements
the mandated multimodal surface of the build brief, not a reference
operator.
"""

from __future__ import annotations

import math
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ds_mapreduce_spark.operators.multimodal import PCM_A, PCM_B

#: synthesized image geometry — multiples of 8 (one JPEG block = 8x8)
JPEG_W = 32
JPEG_H = 16
JPEG_BLOCKS = (JPEG_W // 8) * (JPEG_H // 8)

#: fixed-point DCT: T[u][i] = round_half_away((1/2)*C(u)*cos((2i+1)u*pi/16) * 2^13)
#: with C(0)=1/sqrt(2), C(u>0)=1. DESCALE(x) = round_half_away(x / 2^13).
DCT_BITS = 13


def _round_half_away(x: float) -> int:
    return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)


DCT_T: tuple[tuple[int, ...], ...] = tuple(
    tuple(
        _round_half_away(
            0.5
            * ((1 / math.sqrt(2)) if u == 0 else 1.0)
            * math.cos((2 * i + 1) * u * math.pi / 16)
            * (1 << DCT_BITS)
        )
        for i in range(8)
    )
    for u in range(8)
)

#: step-pattern row sums (sum of first 4 entries minus sum of last 4)
#: — the only nonzero 1D responses of the s[x] = c + (x<4 ? d : -d)
#: synth blocks besides DC; exactly zero for even u by table symmetry.
DCT_STEP: dict[int, int] = {
    u: sum(DCT_T[u][:4]) - sum(DCT_T[u][4:]) for u in (1, 3, 5, 7)
}

#: standard luminance quantization table (ITU T.81 Annex K, Table K.1)
JPEG_QT: tuple[tuple[int, ...], ...] = (
    (16, 11, 10, 16, 24, 40, 51, 61),
    (12, 12, 14, 19, 26, 58, 60, 55),
    (14, 13, 16, 24, 40, 57, 69, 56),
    (14, 17, 22, 29, 51, 87, 80, 62),
    (18, 22, 37, 56, 68, 109, 103, 77),
    (24, 35, 55, 64, 81, 104, 113, 92),
    (49, 64, 78, 87, 103, 121, 120, 101),
    (72, 92, 95, 98, 112, 100, 103, 99),
)


def _zigzag_order() -> tuple[tuple[int, int], ...]:
    """The spec's zigzag scan, generated rather than transcribed:
    diagonals in order of v+u; even diagonals ascend u, odd descend."""
    return tuple(
        sorted(
            ((v, u) for v in range(8) for u in range(8)),
            key=lambda vu: (
                vu[0] + vu[1],
                vu[1] if (vu[0] + vu[1]) % 2 == 0 else -vu[1],
            ),
        )
    )


ZIGZAG: tuple[tuple[int, int], ...] = _zigzag_order()

# ---------------------------------------------------------------------------
# Huffman tables: canonical, carried IN the container (DHT), so any
# spec-conforming decoder — including viewers — rebuilds them from the
# file. Using flat-length canonical tables (12 DC symbols at 4 bits,
# 162 AC symbols at 8 bits) instead of transcribing Annex K's optional
# example tables keeps the table provably self-consistent; DHT makes
# either choice equally standard. The all-ones codeword stays unused
# at both lengths (codes 0..11 of 0..15; 0..161 of 0..255).
# ---------------------------------------------------------------------------

_DC_SYMBOLS: tuple[int, ...] = tuple(range(12))  # DC size categories 0..11
_AC_SYMBOLS: tuple[int, ...] = (0x00, 0xF0) + tuple(
    (run << 4) | size for run in range(16) for size in range(1, 11)
)
_DC_BITS = tuple(12 if n == 4 else 0 for n in range(1, 17))
_AC_BITS = tuple(162 if n == 8 else 0 for n in range(1, 17))
#: encoder-side lookup: symbol -> (code, nbits); canonical flat-length
#: assignment is simply the symbol's index at that length
_DC_CODES = {s: (i, 4) for i, s in enumerate(_DC_SYMBOLS)}
_AC_CODES = {s: (i, 8) for i, s in enumerate(_AC_SYMBOLS)}

_QT_NP = np.array(JPEG_QT, dtype=np.int64)
_T_NP = np.array(DCT_T, dtype=np.int64)


def _descale(a: np.ndarray) -> np.ndarray:
    """Half-away-from-zero round of a / 2^13 — in exact int64."""
    a = np.asarray(a, dtype=np.int64)
    return np.sign(a) * ((2 * np.abs(a) + (1 << DCT_BITS)) >> (DCT_BITS + 1))


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) level-shifted samples -> (n, 8, 8) coefficients H[v][u]:
    row pass G[y][u] = DESCALE(sum_x s[y][x]*T[u][x]), then column pass
    H[v][u] = DESCALE(sum_y G[y][u]*T[v][y]). All int64-exact."""
    g = _descale(blocks @ _T_NP.T)
    return _descale(_T_NP @ g)


def _idct_blocks(coeffs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients -> (n, 8, 8) level-shifted
    samples: G[y][u] = DESCALE(sum_v R[v][u]*T[v][y]), then
    f[y][x] = DESCALE(sum_u G[y][u]*T[u][x]) — the transpose transform
    (the table carries the (1/2)C(u) normalization, so forward and
    inverse share it)."""
    g = _descale(_T_NP.T @ coeffs)
    return _descale(g @ _T_NP)


def _quantize(coeffs: np.ndarray) -> np.ndarray:
    """Half-away-from-zero divide by the quant table, int64-exact."""
    return np.sign(coeffs) * ((2 * np.abs(coeffs) + _QT_NP) // (2 * _QT_NP))


class _BitWriter:
    """MSB-first bit packer with the spec's 0xFF00 byte stuffing."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        for k in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> k) & 1)
            self._n += 1
            if self._n == 8:
                self.buf.append(self._acc)
                if self._acc == 0xFF:
                    self.buf.append(0x00)
                self._acc = 0
                self._n = 0

    def flush(self) -> None:
        while self._n:
            self.write(1, 1)  # pad with 1-bits per the spec


def _category(v: int) -> int:
    return abs(v).bit_length()


def _magnitude_bits(v: int, size: int) -> int:
    """The spec's magnitude representation: negatives as v + 2^size - 1."""
    return v if v >= 0 else v + (1 << size) - 1


def encode_jpeg_bytes(px: bytes, w: int, h: int, restart_interval: int = 0) -> bytes:
    """A complete baseline-sequential grayscale JFIF file for 8-bit
    samples ``px`` (row-major, len w*h; w and h multiples of 8).

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (byte-aligned, DC predictor reset — T.81 §B.2.4.4).
    Restart markers are the spec's intra-image parallelism seam: each
    restart segment decodes independently, which is what makes a
    single huge JPEG splittable across decode tasks at scale."""
    if w % 8 or h % 8 or len(px) != w * h:
        raise ValueError(f"need w,h multiples of 8 and w*h samples; got {w}x{h}/{len(px)}")
    bw, bh = w // 8, h // 8
    arr = np.frombuffer(bytes(px), dtype=np.uint8).astype(np.int64).reshape(h, w)
    # split into (n, 8, 8) blocks in raster order, level shift
    blocks = (
        arr.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(bh * bw, 8, 8)
        - 128
    )
    q = _quantize(_fdct_blocks(blocks))

    out = _BitWriter()
    prev_dc = 0
    zz = ZIGZAG
    rst = 0
    for bi, blk in enumerate(q):
        if restart_interval and bi and bi % restart_interval == 0:
            out.flush()  # pad to byte boundary before the marker
            out.buf += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            prev_dc = 0
        dc = int(blk[0, 0])
        diff = dc - prev_dc
        prev_dc = dc
        s = _category(diff)
        code, n = _DC_CODES[s]
        out.write(code, n)
        if s:
            out.write(_magnitude_bits(diff, s), s)
        run = 0
        last_nz = 0
        flat = [int(blk[v, u]) for v, u in zz]
        for k in range(63, 0, -1):
            if flat[k]:
                last_nz = k
                break
        for k in range(1, last_nz + 1):
            v = flat[k]
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, n = _AC_CODES[0xF0]  # ZRL
                out.write(code, n)
                run -= 16
            s = _category(v)
            code, n = _AC_CODES[(run << 4) | s]
            out.write(code, n)
            out.write(_magnitude_bits(v, s), s)
            run = 0
        if last_nz != 63:
            code, n = _AC_CODES[0x00]  # EOB
            out.write(code, n)
    out.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    qt_zz = bytes(JPEG_QT[v][u] for v, u in ZIGZAG)  # DQT stores zigzag order
    dht = (
        b"\x00" + bytes(_DC_BITS) + bytes(_DC_SYMBOLS)
        + b"\x10" + bytes(_AC_BITS) + bytes(_AC_SYMBOLS)
    )
    dri = (
        seg(0xFFDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8"  # SOI
        + seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xFFDB, b"\x00" + qt_zz)
        + seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
        + seg(0xFFC4, dht)
        + dri
        + seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
        + bytes(out.buf)
        + b"\xff\xd9"  # EOI
    )


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; raises on an unexpected marker inside the scan."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy-coded scan")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated after 0xFF in scan")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte: literal 0xFF
                else:
                    raise ValueError(
                        f"unexpected marker 0xFF{nxt:02X} inside scan"
                    )
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def restart(self, ordinal: int) -> None:
        """Byte-align (discard the pre-marker pad bits) and consume the
        expected RSTn marker (T.81 §B.2.4.4); a missing or out-of-cycle
        marker raises."""
        self._n = 0
        if self.pos + 2 > len(self.data):
            raise ValueError("truncated at restart marker")
        got = self.data[self.pos : self.pos + 2]
        if got[0] != 0xFF or got[1] != 0xD0 + ordinal:
            raise ValueError(
                f"expected RST{ordinal}, got 0x{got.hex()} in scan"
            )
        self.pos += 2


def _build_huffman(bits: tuple[int, ...], huffval: bytes):
    """Canonical decode tables (mincode/maxcode/valptr) from a DHT
    segment's BITS/HUFFVAL — the spec's Generate_size/code procedure."""
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code = 0
    k = 0
    for length in range(1, 17):
        valptr[length] = k
        mincode[length] = code
        code += bits[length - 1]
        k += bits[length - 1]
        maxcode[length] = code - 1 if bits[length - 1] else -1
        code <<= 1
    return mincode, maxcode, valptr, huffval


def _huff_decode(reader: _BitReader, table) -> int:
    mincode, maxcode, valptr, huffval = table
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        if maxcode[length] >= code >= mincode[length]:
            return huffval[valptr[length] + code - mincode[length]]
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, size: int) -> int:
    """The spec's EXTEND: map magnitude bits back to a signed value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def parse_jpeg(payload: bytes):
    """Full baseline-grayscale JPEG parse -> (width, height, pixels).

    Every table comes from the CONTAINER: quant tables from DQT
    (zigzag-ordered per the spec, 8-bit precision), Huffman tables
    rebuilt from DHT via the canonical-code procedure, geometry and
    component layout from SOF0, the restart interval from DRI (RSTn
    markers validated in cycle order, DC predictor reset per segment).
    Raises on: missing SOI, progressive or multi-component streams,
    16-bit quant tables, truncated segments or scan data, invalid
    Huffman codes, a missing or out-of-cycle restart marker,
    coefficient index overflow — a corrupt payload fails loudly."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], tuple] = {}
    sof = None
    scan_comp = None
    restart_interval = 0
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated marker stream")
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError(f"truncated segment 0xFF{marker:02X}")
        if marker == 0xDB:  # DQT — one or more tables, zigzag order
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                vals = body[b + 1 : b + 65]
                if len(vals) != 64:
                    raise ValueError("truncated DQT")
                table = [0] * 64
                for k, (v, u) in enumerate(ZIGZAG):
                    table[v * 8 + u] = vals[k]
                qtables[tq] = table
                b += 65
        elif marker == 0xC4:  # DHT — one or more tables
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = tuple(body[b + 1 : b + 17])
                n = sum(bits)
                huffval = body[b + 17 : b + 17 + n]
                if len(bits) != 16 or len(huffval) != n:
                    raise ValueError("truncated DHT")
                htables[(tc, th)] = _build_huffman(bits, huffval)
                b += 17 + n
        elif marker == 0xC0:  # SOF0 baseline sequential
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"unsupported sample precision {prec}")
            if ncomp != 1:
                raise ValueError("only single-component (grayscale) JPEG supported")
            cid, hv, tq = body[6], body[7], body[8]
            if hv != 0x11:
                raise ValueError("subsampling unsupported for grayscale")
            sof = (w, h, cid, tq)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(f"non-baseline SOF 0xFF{marker:02X} unsupported")
        elif marker == 0xDD:  # DRI: restart interval in MCUs
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if body[0] != 1:
                raise ValueError("scan must cover exactly 1 component")
            scan_comp = (body[1], body[2] >> 4, body[2] & 0x0F)
            pos += 2 + seglen
            break
        # APPn / COM / anything else: skip
        pos += 2 + seglen
    if sof is None or scan_comp is None:
        raise ValueError("missing SOF0 or SOS")
    w, h, cid, tq = sof
    sid, td, ta = scan_comp
    if sid != cid:
        raise ValueError("scan component id does not match frame")
    if tq not in qtables or (0, td) not in htables or (1, ta) not in htables:
        raise ValueError("scan references undefined quant/Huffman table")
    qt = np.array(qtables[tq], dtype=np.int64).reshape(8, 8)
    dc_tab, ac_tab = htables[(0, td)], htables[(1, ta)]

    bw, bh = (w + 7) // 8, (h + 7) // 8
    reader = _BitReader(payload, pos)
    coeffs = np.zeros((bw * bh, 8, 8), dtype=np.int64)
    prev_dc = 0
    rst = 0
    zz = ZIGZAG
    for bi in range(bw * bh):
        if restart_interval and bi and bi % restart_interval == 0:
            reader.restart(rst)
            rst = (rst + 1) % 8
            prev_dc = 0
        s = _huff_decode(reader, dc_tab)
        diff = 0
        if s:
            v = 0
            for _ in range(s):
                v = (v << 1) | reader.bit()
            diff = _extend(v, s)
        prev_dc += diff
        coeffs[bi, 0, 0] = prev_dc
        k = 1
        while k < 64:
            rs = _huff_decode(reader, ac_tab)
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            run, size = rs >> 4, rs & 0x0F
            k += run
            if k > 63:
                raise ValueError("AC coefficient index overflow")
            v = 0
            for _ in range(size):
                v = (v << 1) | reader.bit()
            vv, uu = zz[k]
            coeffs[bi, vv, uu] = _extend(v, size)
            k += 1
    spatial = np.clip(_idct_blocks(coeffs * qt) + 128, 0, 255)
    img = (
        spatial.reshape(bh, bw, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(bh * 8, bw * 8)[:h, :w]
    )
    return w, h, img.astype(np.uint8).tobytes()


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


def synth_jpeg_pixels(docs: DataFrame) -> DataFrame:
    """(doc_id, px): deterministic grayscale samples forming
    constant+step 8x8 blocks — block b's base value
    v0 = 32 + ((doc_id%256)*PCM_A + b*PCM_B) % 192 and step
    d = ((doc_id%256)*PCM_B + b*PCM_A) % 32 - 16; pixel (x,y) in the
    block is v0 + (x%8 < 4 ? d : -d), always inside [16, 239]. Pure
    JVM expression, exactly reproducible in ANSI SQL; doc_id is
    pre-reduced mod 256 before the multiply (BIGINT-budget rule)."""
    n = JPEG_W * JPEG_H
    bw = JPEG_W // 8
    return docs.select(
        "doc_id",
        F.expr(
            f"transform(sequence(0, {n - 1}), i -> CAST("
            f"32 + ((doc_id % 256) * {PCM_A}L"
            f" + ((i DIV {JPEG_W * 8}) * {bw} + (i % {JPEG_W}) DIV 8) * {PCM_B}L) % 192"
            f" + IF((i % 8) < 4, 1, -1) *"
            f" (((doc_id % 256) * {PCM_B}L"
            f" + ((i DIV {JPEG_W * 8}) * {bw} + (i % {JPEG_W}) DIV 8) * {PCM_A}L) % 32 - 16)"
            " AS INT))"
        ).alias("px"),
    )


def encode_jpeg(df: DataFrame) -> DataFrame:
    """REAL JPEG encoder: (doc_id, px flat grayscale ints) ->
    (doc_id, payload) where payload is a standard baseline JFIF file.
    Arrow-batched, map-only; DCT + quantization vectorized over all
    blocks of an image, only the entropy coder is per-symbol Python."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            payloads = [
                encode_jpeg_bytes(bytes(list(px)), JPEG_W, JPEG_H)
                for px in batch["px"]
            ]
            yield pd.DataFrame(
                {"doc_id": batch["doc_id"].values, "payload": payloads}
            )

    return df.mapInPandas(run, schema="doc_id bigint, payload binary")


JPEG_FEATURE_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, n_blocks bigint, "
    "sum_v bigint, sum_sq bigint"
)


def decode_jpeg_features(media: DataFrame) -> DataFrame:
    """REAL JPEG decoder: full container parse (``parse_jpeg`` — every
    table read from the file, Huffman rebuilt from DHT, fixed-point
    IDCT) then exact integer features over the RECONSTRUCTED pixels.
    Parity against the analytic oracle proves the whole lossy chain is
    bit-reproducible, not just that bytes survived."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = {k: [] for k in (
                "doc_id", "width", "height", "n_blocks", "sum_v", "sum_sq",
            )}
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                w, h, px = parse_jpeg(bytes(payload))
                a = np.frombuffer(px, dtype=np.uint8).astype(np.int64)
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_blocks"].append((w // 8) * (h // 8))
                rows["sum_v"].append(int(a.sum()))
                rows["sum_sq"].append(int((a * a).sum()))
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=JPEG_FEATURE_SCHEMA)
