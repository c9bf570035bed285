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
