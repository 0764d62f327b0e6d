"""Multimodal column plumbing (BASELINE.json 'multimodal columns').

Images/audio/video are carried as opaque ``binary`` columns plus a
typed metadata struct; heavy per-item work (decode, resize,
frame-sample, feature-extract) runs as Arrow-batched ``mapInPandas``
so bytes move executor→Python once per batch, never per row.

The decode step itself is STUBBED: the media libraries (PIL/ffmpeg/
torchaudio) are not in this container, so ``decode_stub`` raises
``NotImplementedError`` when asked for a real decode and otherwise
produces a deterministic fake feature set — the Spark-side plumbing
(schema, batching, partitioning, UDF signature) is real and tested.

Scale notes (100 TB): binary payloads dominate row width, so
``spark.sql.files.maxPartitionBytes`` (not row counts) sizes tasks;
feature extraction is map-only (no shuffle); outputs should be written
columnar so downstream reads prune the payload column away — the
whole point of keeping media opaque-but-columnar.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: metadata carried alongside every payload
META_SCHEMA = "mime string, byte_len bigint"
FEATURE_SCHEMA = "doc_id bigint, byte_len bigint, checksum string, n_frames bigint"


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: utf-8 bytes of the text stand in for
    an encoded media blob (deterministic), with typed metadata."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.encode(F.col(text_col), "utf-8")).cast("bigint").alias("byte_len"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes, real_decode: bool = False) -> dict:
    """Deterministic fake 'decode': byte stats + md5 + fake frame count.

    ``real_decode=True`` is the seam where PIL/ffmpeg would plug in.
    """
    if real_decode:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "plug PIL/ffmpeg in here"
        )
    return {
        "byte_len": len(payload),
        "checksum": hashlib.md5(payload).hexdigest(),
        # pretend 1 frame per 256 bytes, at least one — a stand-in for
        # frame sampling so batch-shape handling is exercised
        "n_frames": max(1, len(payload) // 256),
    }


RESIZE_SCHEMA = "doc_id bigint, width int, height int, resized_sig string, out_bytes bigint"


def resize_stub(payload: bytes, width: int, height: int, real_decode: bool = False) -> dict:
    """Deterministic fake 'resize': the real seam would decode, resample
    to (width, height), and re-encode; the stub derives a deterministic
    signature and plausible output size from the input bytes so the
    Spark-side plumbing (batch shape, schema, partitioning) is testable
    without codecs."""
    if real_decode:
        raise NotImplementedError(
            "image codecs are not available in this environment; plug PIL in here"
        )
    sig = hashlib.md5(payload).hexdigest()
    return {
        "resized_sig": hashlib.md5(f"{sig}:{width}x{height}".encode()).hexdigest(),
        # fake re-encoded size: scales with target area, floor 16 bytes
        "out_bytes": max(16, (width * height) // 8),
    }


def resize_images(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Arrow-batched resize over (doc_id, payload): map-only, one Python
    round-trip per batch; at scale the output is written immediately so
    the original payload column prunes away downstream."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = [resize_stub(p, width, height) for p in batch["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].values,
                    "width": width,
                    "height": height,
                    "resized_sig": [o["resized_sig"] for o in out],
                    "out_bytes": [o["out_bytes"] for o in out],
                }
            )

    return media.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame_sig string"


def sample_frames(media: DataFrame, stride: int = 4) -> DataFrame:
    """Frame sampling: every ``stride``-th frame of each payload becomes
    its own row — the explode-shaped media op (video → frames,
    audio → windows). Row count multiplies by n_frames/stride, so at
    scale the output is written immediately (columnar, partitioned by
    doc range) rather than held through further wide transforms.

    The per-frame decode is the stub seam: ``frame_sig`` is a
    deterministic function of (payload checksum, frame index) standing
    in for decoded frame bytes; a real deployment plugs ffmpeg into the
    same ``mapInPandas`` batch loop with this exact schema.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids: list[int] = []
            idxs: list[int] = []
            sigs: list[str] = []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                info = decode_stub(payload)
                for idx in range(0, info["n_frames"], stride):
                    ids.append(doc_id)
                    idxs.append(idx)
                    sigs.append(
                        hashlib.md5(f"{info['checksum']}:{idx}".encode()).hexdigest()
                    )
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_sig": sigs})

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, meta)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            feats = [decode_stub(p) for p in batch["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].values,
                    "byte_len": [f["byte_len"] for f in feats],
                    "checksum": [f["checksum"] for f in feats],
                    "n_frames": [f["n_frames"] for f in feats],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def payload_simhash_pairs(
    media: DataFrame, chunks: int = 4, max_hamming: int = 3
) -> DataFrame:
    """Byte-level near-duplicate detection over OPAQUE binary payloads —
    the codec-free member of the multimodal family: two payloads that
    share most of their byte stream (same image re-encoded with
    different metadata, same audio clip with a trimmed header) collide
    without decoding anything. Each payload's hex string yields
    overlapping byte 4-grams (hex 8-grams, stride 2); their md5-derived
    32-bit hashes feed the SAME per-bit-majority fold and chunk-
    pigeonhole pairing as the token simhash
    (operators/dedup.simhash_fold / simhash_pairs_from_signatures) —
    one shared arithmetic, two modalities. Map-only until the (tiny)
    chunk-key self-join; the payload column itself never shuffles.
    """
    from ds_mapreduce_spark.operators.dedup import (
        simhash_fold,
        simhash_pairs_from_signatures,
    )

    d = (
        media.select("doc_id", F.hex(F.col("payload")).alias("hx"))
        .where(F.length("hx") >= 8)
        .select(
            "doc_id",
            F.expr(
                "transform(sequence(1, length(hx) - 7, 2), i -> "
                "CAST(conv(substring(md5(substring(hx, i, 8)), 1, 8), 16, 10)"
                " AS BIGINT))"
            ).alias("th"),
        )
    )
    sh = simhash_fold(d)
    return simhash_pairs_from_signatures(sh, bits=32, chunks=chunks).where(
        F.col("hamming") <= max_hamming
    )
