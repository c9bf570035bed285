"""Multimodal (binary) column support — X5.

Images/audio/video ride through the engine as opaque ``binary``
payloads plus a typed metadata struct (the reference's document blob,
main.py:433, 692, generalized). The Spark-side plumbing — schema,
Arrow batching, partition behavior — is real; only the *codec* is a
stub because this container ships no image/audio libraries.

Pattern: ``mapInPandas`` so one Python worker call handles an Arrow
batch of documents (not one RPC per file like the reference,
main.py:700-707). Batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``; with ~MB-scale blobs
you lower it so a batch fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, header_hex string, lang string, decoded string"
)


def decode_media(content: bytes, mime: str) -> object:
    """The genuinely-unavailable step: decode an image/audio/video
    payload. STUB — no codecs in this environment."""
    raise NotImplementedError(
        "media codecs (PIL/ffmpeg/librosa) are not available in this "
        "container; wire a real decoder here in production"
    )


def _extract_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake feature extraction: byte length + first-4-
    bytes hex + a 'decoded' marker. Stands in for decode_media so the
    distributed plumbing is fully exercised and testable."""
    for pdf in batches:
        content = pdf["content"]
        meta = pdf["meta"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": content.map(len).astype("int32"),
                "header_hex": content.map(lambda b: bytes(b[:4]).hex()),
                "lang": meta.map(lambda m: m["lang"]),
                "decoded": content.map(
                    lambda b: f"stub:{len(b)}b"  # decode_media() in production
                ),
            }
        )


def with_binary_features(binary_df: DataFrame) -> DataFrame:
    """(doc_id, content binary, meta struct) → extracted features via
    an Arrow-batched mapInPandas."""
    return binary_df.mapInPandas(_extract_batch, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Typed multimodal transform surface: decode / resize / frame-sample.
# The Spark-side contract (schemas, Arrow batching, partition behavior)
# is real and tested; the codec calls are the clearly-stubbed step
# (this container ships no PIL/ffmpeg). Each deterministic fake keeps
# the byte-shape arithmetic honest so downstream sizing logic is
# exercisable.
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = "doc_id bigint, width int, height int, n_bytes int"
FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes int"


def resize_image(content: bytes, width: int, height: int) -> bytes:
    """STUB — real impl: PIL/opencv decode → resample → re-encode."""
    raise NotImplementedError("image codecs unavailable in this container")


def sample_frames(content: bytes, every_n: int) -> list[bytes]:
    """STUB — real impl: ffmpeg/pyav demux → keyframe sample."""
    raise NotImplementedError("video codecs unavailable in this container")


def with_resized_images(
    binary_df: DataFrame, width: int, height: int
) -> DataFrame:
    """(doc_id, content) → resize metadata rows. Production swaps the
    deterministic fake for resize_image(); batch shape identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # fake: "resized" size scales with target area, bounded by
            # the source payload (deterministic, codec-free)
            n = pdf["content"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "n_bytes": n.clip(upper=width * height * 3).astype("int32"),
                }
            )

    return binary_df.select("doc_id", "content").mapInPandas(
        run, schema=RESIZE_SCHEMA
    )


def with_sampled_frames(binary_df: DataFrame, every_n: int = 10) -> DataFrame:
    """(doc_id, content) → one row per sampled frame. Production swaps
    the deterministic fake for sample_frames(); the explode shape (one
    input row → many output rows) is the real contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_bytes": []}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                n_frames = max(len(bytes(content)) // (64 * every_n), 1)
                for i in range(n_frames):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i * every_n)
                    out["frame_bytes"].append(64)
            yield pd.DataFrame(out)

    return binary_df.select("doc_id", "content").mapInPandas(
        run, schema=FRAME_SCHEMA
    )
