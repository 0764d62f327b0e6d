"""REAL hybrid motion-compensated transform VIDEO codec (r9): the
H.261 -> MPEG -> H.264 codec class — the last third of the
JPEG/MP3/H.264 seam. Every mechanism that defines the hybrid-video
class is here, implemented from the published structure:

1. **Motion estimation**: exhaustive-search block matching — each 8x8
   block of a P-frame scans a +/-3 full-pel window in the previous
   frame, picks the minimum-SAD displacement (ties broken (sad, dy,
   dx) lexicographically — part of the format, replayed by the
   oracle), candidates restricted to fully-in-picture references.
2. **Closed-loop motion-compensated prediction**: the encoder predicts
   from its own RECONSTRUCTED previous frame (not the original), so
   encoder and decoder predictors never drift — the same closed-loop
   property ADPCM's predictor has (`operators/adpcm.py`), here in 2-D.
3. **Transform-coded residuals**: prediction residuals go through the
   SAME 8x8 fixed-point DCT + half-away quantization the JPEG codec
   uses (`operators/jpeg.py:DCT_T/_fdct_blocks/_idct_blocks` — the
   one-place rule for the transform constants); frame 0 is an intra
   frame, level-shifted and coded like a JPEG plane with a flat step.
4. **H.264-style syntax coding**: motion vectors are se(v) and
   coefficients ue(v) Exp-Golomb codes — H.264's actual syntax-element
   coding — plus a 1-bit all-zero-residual flag per block (the
   skip/CBP economics: a perfectly predicted block costs its motion
   vector plus ONE bit, which is why P-frames shrink toward the seam).

All arithmetic is integer fixed-point, so the lossy chain is exactly
reproducible, and the oracle REPLAYS the fused encoder+decoder as a
DuckDB RECURSIVE CTE over frames (`plans/multimodal_queries.py:
_mcv_oracle`) — the recursion carries the reconstructed frame, each
step runs block matching (windowed SAD + RANK argmin), the residual
DCT chain, and the reconstruction, and prices every frame's coded
bytes closed-form from the Exp-Golomb lengths. Parity therefore proves
motion search, prediction, transform, quantization, entropy coding,
container framing, parsing, and reconstruction — bit-for-bit and
byte-for-byte.

Synthetic scene: a toroidally scrolling raster — frame t shows the
base pattern shifted by (3t, 2t) with wraparound. Interior blocks are
pure translations (search provably can find (3, 2)); blocks at the
right/bottom edges cannot reach the true displacement inside the
picture (the in-bounds rule), so they exercise the full residual path
with real content. Both paths are graded every frame.

Container ("MCV1"): 12-byte header (magic, u16 width, u16 height,
u8 n_frames, u8 intra step, u8 inter step, u8 search range), then per
frame: per block in raster order — P-frames lead with se(dx), se(dy)
— a 1-bit zero-residual flag, and unless flagged, 64 ue(v) row-major
quantized coefficients; zero-pad to a byte boundary; CRC-8 (the FLAC
polynomial) over the frame's coded bytes. The decoder validates every
field, rejects out-of-picture motion vectors, verifies each frame CRC,
and fails on trailing bytes.

Scale notes (100 TB): two chained Arrow-batched ``mapInPandas``,
map-only, zero data-bearing shuffles beyond the narrow-key spread.
Prediction chains frames WITHIN a payload — the defining cost of
inter coding (same seam as `operators/animgif.py`) — while payloads
stay independent rows; I-frames are the random-access points a real
corpus would space to bound that chain. P-frame bytes scale with
unpredictable content (the wrap seam), not with frame count.

Reference parity note: the reference engine has no media path at all
(SURVEY.md §2.3); this operator belongs to the mandated multimodal
extension family (SURVEY.md §2.4), closing the H.264-class third of
the codec seam the r8 VERDICT named.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ds_mapreduce_spark.operators.flac import (
    BitReader,
    BitWriter,
    corruption_to_value_error,
    crc8,
    unzigzag,
    zigzag,
)
from ds_mapreduce_spark.operators.jpeg import (
    _fdct_blocks,
    _idct_blocks,
    _da_int,
)
from ds_mapreduce_spark.operators.mdct import _write_ue
from ds_mapreduce_spark.operators.multimodal import PCM_A, PCM_B

MCV_MAGIC = b"MCV1"
MCV_W = 24
MCV_H = 16
MCV_FRAMES = 6
#: full-pel exhaustive search range (+/- pixels, both axes)
MCV_SEARCH = 3
#: flat quantizer steps: intra (frame 0) and inter (residuals)
MCV_QI = 16
MCV_QP = 24
#: the scene's true per-frame scroll (within the search range, so
#: interior blocks can be predicted exactly)
MCV_VX = 3
MCV_VY = 2

MCV_FEATURE_SCHEMA = (
    "doc_id bigint, frame_id bigint, width bigint, height bigint, "
    "sum_v bigint, sum_sq_v bigint, sum_abs_mv bigint, frame_bytes bigint"
)


def synth_scroll_frames(docs: DataFrame) -> DataFrame:
    """(doc_id, frames): MCV_FRAMES full rasters (row-major index
    lists), frame t = the base linear-congruential pattern scrolled by
    (3t, 2t) with toroidal wrap — numpy-rendered
    (``multimodal.synth_map_arrays``) from the same closed form the
    DuckDB oracle replays:

      base(i)      = ((doc_id%256)*PCM_A + i*PCM_B) mod 256
      cur(x, y, t) = base(((y+2t)%16)*24 + ((x+3t)%24))
    """
    from ds_mapreduce_spark.operators.multimodal import synth_map_arrays

    n = MCV_W * MCV_H
    i = np.arange(n, dtype=np.int64)
    t = np.arange(MCV_FRAMES, dtype=np.int64)
    # (frames, n): source index of each pixel after the (3t, 2t) scroll
    src = (
        (((i // MCV_W)[None, :] + MCV_VY * t[:, None]) % MCV_H) * MCV_W
        + ((i % MCV_W)[None, :] + MCV_VX * t[:, None]) % MCV_W
    )

    def build(d):
        arr = ((d[:, None, None] % 256) * PCM_A + src[None, :, :] * PCM_B) % 256
        return {"frames": [list(mat) for mat in arr.astype(np.int32)]}

    return synth_map_arrays(
        docs, "doc_id bigint, frames array<array<int>>", build
    )


def _quant_flat(coeffs: np.ndarray, step: int) -> np.ndarray:
    return _da_int(coeffs, step)


def _code_block(w: BitWriter, q: np.ndarray) -> None:
    """Zero-residual flag, then (unless flagged) 64 row-major ue codes.

    The codes are folded into one integer and emitted with a single
    write (r16): each coefficient contributes (zigzag+1) in
    2*bitlength-1 bits — bit-identical to the per-coefficient
    ``_write_ue`` loop, minus 64 writer calls per block. The leading
    0 flag bit rides the same write (the fold is always below its
    total width, so the top bit is 0)."""
    flat = q.reshape(64).tolist()
    if not any(flat):
        w.write(1, 1)
        return
    acc = 0
    total = 1  # the zero flag bit
    for v in flat:
        u = (v << 1 if v >= 0 else ((-v) << 1) - 1) + 1
        nb = 2 * u.bit_length() - 1
        acc = (acc << nb) | u
        total += nb
    w.write(acc, total)


def _read_block(r: BitReader, materialize: bool = True):
    """Zero flag + (unless flagged) 64 ue codes, batch-read (r16) via
    BitReader.read_ue_many — one call per block instead of 64×3, with
    the unzigzag fold vectorized. ``materialize=False`` consumes the
    identical bits and performs the identical validation but skips
    building the value array (the spans-only walk wrap_annexb needs)."""
    if r.read(1):
        return np.zeros((8, 8), dtype=np.int64) if materialize else None
    vals = r.read_ue_many(64)
    if not materialize:
        return None
    u = np.array(vals, dtype=np.int64)
    return np.where(u & 1, -((u + 1) >> 1), u >> 1).reshape(8, 8)


def _to_blocks(frame: np.ndarray) -> np.ndarray:
    """(H, W) -> (n_blocks, 8, 8) in raster block order (the order the
    bitstream, the oracle's ``bl`` table, and ``_from_blocks`` share)."""
    return (
        frame.reshape(MCV_H // 8, 8, MCV_W // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _from_blocks(blocks: np.ndarray) -> np.ndarray:
    return (
        blocks.reshape(MCV_H // 8, MCV_W // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(MCV_H, MCV_W)
    )


def _block_origins():
    for by0 in range(0, MCV_H, 8):
        for bx0 in range(0, MCV_W, 8):
            yield by0, bx0


def _motion_search(prev: np.ndarray, curbs: np.ndarray):
    """Vectorized exhaustive search: one SAD tensor per block over all
    in-picture displacements. np.argmin's first-minimum rule over the
    (dy, dx) raster IS the format's (sad, dy, dx) lexicographic
    tie-break. -> (mvs, preds)."""
    wins = np.lib.stride_tricks.sliding_window_view(prev, (8, 8))
    mvs = []
    preds = np.empty_like(curbs)
    for bi, (by0, bx0) in enumerate(_block_origins()):
        ylo = max(0, by0 - MCV_SEARCH)
        yhi = min(MCV_H - 8, by0 + MCV_SEARCH)
        xlo = max(0, bx0 - MCV_SEARCH)
        xhi = min(MCV_W - 8, bx0 + MCV_SEARCH)
        region = wins[ylo : yhi + 1, xlo : xhi + 1]
        sad = np.abs(region - curbs[bi]).sum(axis=(-1, -2))
        flat = int(np.argmin(sad))
        ry, rx = divmod(flat, sad.shape[1])
        dy, dx = ylo + ry - by0, xlo + rx - bx0
        mvs.append((dy, dx))
        preds[bi] = region[ry, rx]
    return mvs, preds


def encode_mcv_bytes(frames) -> bytes:
    """Full encode: MCV_FRAMES rasters (row-major, values 0..255) ->
    MCV1 container. Closed-loop: every P-frame searches and predicts
    in the encoder's own reconstruction of the previous frame. All
    transforms run batched (one (n_blocks, 8, 8) matmul per frame)."""
    fr = [
        np.asarray(f, dtype=np.int64).reshape(MCV_H, MCV_W) for f in frames
    ]
    if len(fr) != MCV_FRAMES:
        raise ValueError(f"expected {MCV_FRAMES} frames, got {len(fr)}")
    out = bytearray(
        MCV_MAGIC
        + struct.pack(
            "<HHBBBB", MCV_W, MCV_H, MCV_FRAMES, MCV_QI, MCV_QP, MCV_SEARCH
        )
    )
    prev: np.ndarray | None = None
    for t, cur in enumerate(fr):
        w = BitWriter()
        curbs = _to_blocks(cur)
        if t == 0:
            q = _quant_flat(_fdct_blocks(curbs - 128), MCV_QI)
            recon_b = _idct_blocks(q * MCV_QI) + 128
            for bi in range(len(curbs)):
                _code_block(w, q[bi])
        else:
            mvs, preds = _motion_search(prev, curbs)
            q = _quant_flat(_fdct_blocks(curbs - preds), MCV_QP)
            recon_b = preds + _idct_blocks(q * MCV_QP)
            for bi, (dy, dx) in enumerate(mvs):
                _write_ue(w, zigzag(dx))
                _write_ue(w, zigzag(dy))
                _code_block(w, q[bi])
        w.align()
        coded = w.getvalue()
        out += coded + bytes([crc8(coded)])
        prev = _from_blocks(np.clip(recon_b, 0, 255))
    return bytes(out)


@corruption_to_value_error
def parse_mcv(payload: bytes):
    """Header + per-frame syntax walk -> (frames, spans) where each
    frame is a list of (dy, dx, q-block) per block ((0,0,intra-q) for
    frame 0) and spans are each frame's (start, end) byte range
    including its CRC — so frame_bytes in the features is a span
    length and len(payload) == 12 + sum(frame_bytes) by construction.
    Validates magic, geometry, motion-vector bounds, frame CRCs, and
    exact stream consumption."""
    return _walk_mcv(payload, materialize=True)


@corruption_to_value_error
def mcv_frame_spans(payload: bytes) -> list[tuple[int, int]]:
    """Spans-only walk (r16): consumes the identical bits and performs
    the identical validation as parse_mcv — same magic/geometry/MV/CRC
    checks, same failure points — but never materializes the q-block
    arrays. wrap_annexb only needs the frame byte ranges, so this
    halves its per-document parse cost."""
    return _walk_mcv(payload, materialize=False)[1]


def _walk_mcv(payload: bytes, materialize: bool):
    if payload[:4] != MCV_MAGIC:
        raise ValueError("not an MCV1 payload")
    if len(payload) < 12:
        raise ValueError("MCV1 payload truncated inside the header")
    w, h, n_frames, qi, qp, search = struct.unpack("<HHBBBB", payload[4:12])
    if (w, h, qi, qp, search) != (MCV_W, MCV_H, MCV_QI, MCV_QP, MCV_SEARCH):
        raise ValueError(
            f"unsupported MCV1 geometry: {w}x{h} qi={qi} qp={qp} R={search}"
        )
    r = BitReader(payload, 12)
    frames = []
    spans = []
    for t in range(n_frames):
        start = r.byte_pos
        blocks = []
        for by0 in range(0, MCV_H, 8):
            for bx0 in range(0, MCV_W, 8):
                if t == 0:
                    dy = dx = 0
                else:
                    dxu, dyu = r.read_ue_many(2)
                    dx = unzigzag(dxu)
                    dy = unzigzag(dyu)
                    if not (
                        0 <= by0 + dy <= MCV_H - 8
                        and 0 <= bx0 + dx <= MCV_W - 8
                    ):
                        raise ValueError(
                            f"MCV1 motion vector ({dx},{dy}) leaves the "
                            f"picture at block ({bx0},{by0})"
                        )
                    if abs(dx) > search or abs(dy) > search:
                        raise ValueError(
                            f"MCV1 motion vector ({dx},{dy}) exceeds the "
                            f"declared search range {search}"
                        )
                blocks.append((dy, dx, _read_block(r, materialize)))
        r.align()
        end = r.byte_pos
        crc = r.read(8)
        if crc != crc8(payload[start:end]):
            raise ValueError("MCV1 frame CRC mismatch")
        frames.append(blocks)
        spans.append((start, r.byte_pos))
    if r.byte_pos != len(payload):
        raise ValueError(
            f"{len(payload) - r.byte_pos} trailing bytes after last frame"
        )
    return frames, spans


def decode_mcv_frames(payload: bytes) -> list[np.ndarray]:
    """Full reconstruction: intra-decode frame 0, then motion-
    compensate + add decoded residuals frame by frame."""
    frames, _spans = parse_mcv(payload)
    return _decode_frames_from_parsed(frames)


def _decode_frames_from_parsed(frames) -> list[np.ndarray]:
    """Reconstruction from an already-parsed frame list — split out
    (r16) so `mcv_payload_features` walks the container syntax ONCE
    instead of parsing it a second time inside the decode."""
    out: list[np.ndarray] = []
    prev: np.ndarray | None = None
    for t, blocks in enumerate(frames):
        qs = np.stack([q for _dy, _dx, q in blocks])
        if t == 0:
            recon_b = _idct_blocks(qs * MCV_QI) + 128
        else:
            preds = np.stack(
                [
                    prev[by0 + dy : by0 + dy + 8, bx0 + dx : bx0 + dx + 8]
                    for (dy, dx, _q), (by0, bx0) in zip(
                        blocks, _block_origins()
                    )
                ]
            )
            recon_b = preds + _idct_blocks(qs * MCV_QP)
        recon = _from_blocks(np.clip(recon_b, 0, 255))
        out.append(recon)
        prev = recon
    return out


def encode_mcv(df: DataFrame) -> DataFrame:
    """(doc_id, frames) -> (doc_id, payload): Arrow-batched, map-only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            payloads = [encode_mcv_bytes(frames) for frames in batch["frames"]]
            yield pd.DataFrame(
                {"doc_id": batch["doc_id"].values, "payload": payloads}
            )

    return df.mapInPandas(run, schema="doc_id bigint, payload binary")


def decode_mcv_features(media: DataFrame) -> DataFrame:
    """(doc_id, payload) -> one row per RECONSTRUCTED frame: pixel
    sums (grading the whole prediction+transform chain), the motion
    budget |dx|+|dy| summed over blocks (grading the search), and the
    frame's coded bytes (grading the syntax coder and the skip-flag
    economics — P-frame bytes track the wrap seam, not frame count)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = {k: [] for k in (
                "doc_id", "frame_id", "width", "height",
                "sum_v", "sum_sq_v", "sum_abs_mv", "frame_bytes",
            )}
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                for f in mcv_payload_features(bytes(payload)):
                    rows["doc_id"].append(doc_id)
                    rows["frame_id"].append(f["frame_id"])
                    rows["width"].append(MCV_W)
                    rows["height"].append(MCV_H)
                    rows["sum_v"].append(f["sum_v"])
                    rows["sum_sq_v"].append(f["sum_sq_v"])
                    rows["sum_abs_mv"].append(f["sum_abs_mv"])
                    rows["frame_bytes"].append(f["frame_bytes"])
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=MCV_FEATURE_SCHEMA)


def mcv_payload_features(payload: bytes) -> list[dict]:
    """Per-frame features of one MCV1 payload — the per-payload core of
    `decode_mcv_features`, shared with the Annex-B wrapper
    (`operators/annexb.py`) which decodes a REASSEMBLED container."""
    frames, spans = parse_mcv(payload)
    recons = _decode_frames_from_parsed(frames)
    return [
        {
            "frame_id": t,
            "sum_v": int(recon.sum()),
            "sum_sq_v": int((recon * recon).sum()),
            "sum_abs_mv": sum(abs(dy) + abs(dx) for dy, dx, _ in blocks),
            "frame_bytes": span[1] - span[0],
        }
        for t, (blocks, recon, span) in enumerate(zip(frames, recons, spans))
    ]
