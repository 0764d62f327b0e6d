"""REAL lossy AUDIO codec (r9): ITU-T G.711 mu-law companding — the
telephony standard, implemented from the spec (the classic segment +
mantissa formulation, bias 0x84, clip 32635). This closes the lossy
seam for AUDIO the way baseline JPEG closed it for images: mu-law is a
deterministic integer map, so the lossy reconstruction is exactly
closed-form and the DuckDB oracle computes it without seeing a
container byte — parity proves the encode -> container -> parse ->
expand chain reproduced every reconstructed sample bit-for-bit.

The encoder writes a genuine RIFF/WAVE container with wFormatTag=7
(WAVE_FORMAT_MULAW, 8 bits/sample) — written by hand because stdlib
``wave`` only speaks PCM; any audio stack opens it. The decoder walks
the RIFF chunk stream by hand (fmt/data discovery, odd-size chunk
padding per the spec, unknown chunks skipped), validates the format
tag / channel count / sample width from the CONTAINER, and expands
each mu-law byte through the spec formula. Interchange is proven
against an independent implementation: javax.sound.sampled decodes
our files to IDENTICAL PCM (tests/test_codec_interchange.py), and
tests/test_g711.py locks encode->decode == the oracle's closed form
over the ENTIRE 16-bit input range.

Scale notes (100 TB): two chained Arrow-batched ``mapInPandas``,
map-only, zero shuffles beyond the narrow-key spread — the WAV/PPM/PNG/JPEG/GIF plan shape; mu-law
halves payload bytes vs PCM16, shrinking executor->Python transfer.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ds_mapreduce_spark.operators.multimodal import (
    WAV_FEATURE_SCHEMA,
    WAV_SAMPLE_RATE,
)

ULAW_BIAS = 0x84  # 132
ULAW_CLIP = 32635
_WAVE_FORMAT_MULAW = 7


def ulaw_encode_sample(x: int) -> int:
    """16-bit PCM -> 8-bit mu-law (G.711): sign, 3-bit segment (the
    exponent of the biased magnitude), 4-bit mantissa, ones-complement
    on the wire."""
    sign = 0x80 if x < 0 else 0
    if x < 0:
        x = -x
    if x > ULAW_CLIP:
        x = ULAW_CLIP
    x += ULAW_BIAS
    seg = x.bit_length() - 8  # x in [132, 32767] -> 0..7
    mant = (x >> (seg + 3)) & 0x0F
    return (~(sign | (seg << 4) | mant)) & 0xFF


def ulaw_decode_sample(u: int) -> int:
    """8-bit mu-law -> 16-bit PCM (the Sun g711.c reconstruction:
    magnitude ((mant<<3)+bias)<<seg - bias, sign from bit 7)."""
    u = (~u) & 0xFF
    seg = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + ULAW_BIAS) << seg) - ULAW_BIAS
    return -mag if u & 0x80 else mag


#: decode lookup for the vectorized feature path (256 entries)
_ULAW_TABLE = np.array([ulaw_decode_sample(u) for u in range(256)], dtype=np.int64)


def encode_ulaw_wav_bytes(samples, rate: int = WAV_SAMPLE_RATE) -> bytes:
    """A complete RIFF/WAVE container with wFormatTag=7 (mu-law,
    8 bits/sample, mono) — hand-written; stdlib wave is PCM-only."""
    data = bytes(ulaw_encode_sample(int(s)) for s in samples)
    fmt = struct.pack("<HHIIHH", _WAVE_FORMAT_MULAW, 1, rate, rate, 1, 8)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    if len(data) % 2:  # RIFF chunks are word-aligned
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_ulaw_wav(payload: bytes):
    """Hand-parse a RIFF/WAVE container -> (rate, mu-law bytes).

    Walks the chunk stream (honoring the spec's odd-size padding byte,
    skipping unknown chunks like LIST/fact), reads the format tag,
    channel count, rate and sample width FROM the fmt chunk, and
    raises on: a non-RIFF/WAVE signature, truncated chunks, a missing
    fmt or data chunk, or any format other than mono 8-bit mu-law —
    corrupt payloads fail loudly."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        chunk = payload[pos + 8 : pos + 8 + size]
        if len(chunk) != size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            fmt = chunk
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size % 2)  # word alignment
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    # A consistently-framed fmt chunk can still be SHORTER than the 16
    # bytes the unpack needs — without this guard that leaks raw
    # struct.error past the ValueError contract (ADVICE r9 item 1).
    if len(fmt) < 16:
        raise ValueError(f"fmt chunk needs 16 bytes, got {len(fmt)}")
    tag, channels, rate, _bps, _align, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag != _WAVE_FORMAT_MULAW:
        raise ValueError(f"expected mu-law (format 7), got format {tag}")
    if channels != 1 or bits != 8:
        raise ValueError(f"expected mono 8-bit mu-law, got {channels}ch/{bits}b")
    return rate, data


def encode_ulaw(df: DataFrame) -> DataFrame:
    """REAL G.711 encoder: (doc_id, samples PCM16 ints) ->
    (doc_id, payload), a standard mu-law WAV. Arrow-batched, map-only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            payloads = [
                encode_ulaw_wav_bytes(samples) for samples in batch["samples"]
            ]
            yield pd.DataFrame(
                {"doc_id": batch["doc_id"].values, "payload": payloads}
            )

    return df.mapInPandas(run, schema="doc_id bigint, payload binary")


def decode_ulaw_features(media: DataFrame) -> DataFrame:
    """REAL G.711 decoder: hand RIFF parse + mu-law expansion, then
    exact integer amplitude features over the RECONSTRUCTED samples
    (same schema as the PCM WAV decoder, so the two rows' delta shows
    exactly what companding cost). Parity against the closed-form
    oracle proves the whole lossy chain bit-reproducible."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = {k: [] for k in (
                "doc_id", "sample_rate", "n_samples",
                "peak_abs", "sum_abs", "sum_sq",
            )}
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                rate, data = parse_ulaw_wav(bytes(payload))
                pcm = _ULAW_TABLE[np.frombuffer(data, dtype=np.uint8)]
                a = np.abs(pcm)
                rows["doc_id"].append(doc_id)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(len(pcm))
                rows["peak_abs"].append(int(a.max()) if len(a) else 0)
                rows["sum_abs"].append(int(a.sum()))
                rows["sum_sq"].append(int((pcm * pcm).sum()))
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=WAV_FEATURE_SCHEMA)
