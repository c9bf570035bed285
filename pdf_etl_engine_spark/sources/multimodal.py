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


def _decode_bmp(content: bytes) -> dict:
    """BMP header parse (public spec): 'BM' + 14-byte file header +
    DIB header carrying width/height/bpp."""
    import struct

    if len(content) < 30:
        raise ValueError("BMP truncated before DIB header")
    dib_size = struct.unpack_from("<I", content, 14)[0]
    if dib_size >= 40:  # BITMAPINFOHEADER family
        w, h = struct.unpack_from("<ii", content, 18)
        bpp = struct.unpack_from("<H", content, 28)[0]
    elif dib_size == 12:  # BITMAPCOREHEADER: 16-bit dims
        w, h = struct.unpack_from("<hh", content, 18)
        bpp = struct.unpack_from("<H", content, 24)[0]
    else:
        raise ValueError(f"unknown BMP DIB header size {dib_size}")
    return {
        "kind": "image",
        "format": "bmp",
        "width": abs(w),
        "height": abs(h),  # negative height = top-down rows
        "bits_per_pixel": bpp,
    }


def _decode_ppm(content: bytes) -> dict:
    """Netpbm header parse: magic, then width/height (ASCII, ``#``
    comments allowed) — P1-P3 ASCII, P4-P6 binary."""
    import re as _re

    toks = _re.findall(
        rb"#[^\n]*|\S+", content[:2048]
    )  # comments consumed as single tokens
    toks = [t for t in toks if not t.startswith(b"#")]
    if len(toks) < 3:
        raise ValueError("Netpbm truncated header")
    magic = toks[0].decode("ascii", "replace")
    return {
        "kind": "image",
        "format": {"P1": "pbm", "P4": "pbm", "P2": "pgm", "P5": "pgm",
                   "P3": "ppm", "P6": "ppm"}[magic],
        "width": int(toks[1]),
        "height": int(toks[2]),
        "bits_per_pixel": 1 if magic in ("P1", "P4") else 8,
    }


def _decode_wav(content: bytes) -> dict:
    """RIFF/WAVE chunk walk: the fmt chunk gives channels/rate, the
    data chunk size over byte-rate gives duration."""
    import struct

    if content[8:12] != b"WAVE":
        raise ValueError("RIFF without WAVE form type")
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= len(content):
        cid, size = content[pos : pos + 4], struct.unpack_from(
            "<I", content, pos + 4
        )[0]
        if cid == b"fmt " and pos + 24 <= len(content):
            fmt = struct.unpack_from("<HHIIHH", content, pos + 8)
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None:
        raise ValueError("WAV missing fmt chunk")
    _audio_fmt, channels, rate, byte_rate, _align, bits = fmt
    return {
        "kind": "audio",
        "format": "wav",
        "channels": channels,
        "sample_rate_hz": rate,
        "bits_per_sample": bits,
        # data_size == 0 is a valid empty recording (0.0 s); None only
        # when the data chunk or byte rate is genuinely absent
        "duration_s": (data_size / byte_rate)
        if (data_size is not None and byte_rate)
        else None,
    }


def decode_media(content: bytes, mime: str) -> dict:
    """Decode a media payload's metadata. REAL for the codec-free
    container formats whose headers are pure-Python parseable — BMP,
    Netpbm (PBM/PGM/PPM), WAV (VERDICT r4 #7) — dispatched on magic
    bytes, not caller-supplied mime (content wins over labels).
    Compressed codecs (JPEG/PNG/MP4/...) still raise: those need
    PIL/ffmpeg, unavailable in this container — wire them here in
    production. Malformed payloads of a recognized format raise
    ValueError (quarantine, like the PDF path)."""
    if content[:2] == b"BM":
        return _decode_bmp(content)
    if content[:2] in (b"P1", b"P2", b"P3", b"P4", b"P5", b"P6") and (
        len(content) > 2 and content[2:3].isspace()
    ):
        return _decode_ppm(content)
    if content[:4] == b"RIFF":
        return _decode_wav(content)
    raise NotImplementedError(
        f"no pure-Python decoder for this payload (mime={mime!r}); "
        "JPEG/PNG/MP4 etc. need PIL/ffmpeg — wire a real codec here "
        "in production"
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


def with_synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic media-payload synthesis for the x5b decode query:
    each document becomes a REAL BMP header (doc_id%3==0), WAV header
    (==1), or an unsupported-codec payload (==2), with dimensions /
    duration as pure functions of (doc_id, n_chars) — so a SQL oracle
    can recompute what decode_media must read back from the bytes.
    Header-only payloads (declared sizes, truncated data) are valid
    input for the chunk walkers."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            out = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                m = int(doc_id) % 3
                if m == 0:
                    w = int(doc_id) % 1024 + 1
                    h = int(doc_id) % 768 + 1
                    dib = struct.pack("<IiiHH", 40, w, h, 1, 24) + b"\x00" * 20
                    payload = (
                        b"BM" + struct.pack("<IHHI", 54, 0, 0, 54) + dib
                    )
                elif m == 1:
                    secs = int(n_chars) % 100 + 1
                    byte_rate = 8000 * 1 * 16 // 8
                    payload = (
                        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
                        + b"fmt " + struct.pack("<I", 16)
                        + struct.pack("<HHIIHH", 1, 1, 8000, byte_rate, 2, 16)
                        + b"data" + struct.pack("<I", secs * byte_rate)
                    )
                else:
                    payload = b"\x89PNG\r\n\x1a\n" + bytes(8)
                out.append({"doc_id": doc_id, "content": payload})
            yield pd.DataFrame(out, columns=["doc_id", "content"])

    return docs.select("doc_id", "n_chars").mapInPandas(
        run, schema="doc_id bigint, content binary"
    )


MEDIA_META_SCHEMA = (
    "doc_id bigint, kind string, format string, width int, height int, "
    "bits_per_pixel int, channels int, sample_rate_hz int, "
    "bits_per_sample int, duration_s double, decode_error string"
)

_MEDIA_META_COLS = [f.split()[0] for f in MEDIA_META_SCHEMA.split(", ")]


def with_media_metadata(binary_df: DataFrame) -> DataFrame:
    """(doc_id, content binary) → REAL decoded media metadata rows via
    Arrow-batched ``mapInPandas`` over :func:`decode_media` — the
    non-stub path (BMP/Netpbm/WAV). A payload that can't be decoded
    yields a ``decode_error`` row instead of failing its task, the
    same quarantine-not-drop contract as extraction
    (pipeline.extract_kpis_batch)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                row = dict.fromkeys(_MEDIA_META_COLS)
                row["doc_id"] = doc_id
                try:
                    row.update(decode_media(bytes(content), ""))
                except Exception as e:  # noqa: BLE001 — quarantined per row
                    row["decode_error"] = f"{type(e).__name__}: {e}"[:200]
                rows.append(row)
            yield pd.DataFrame(rows, columns=_MEDIA_META_COLS)

    return binary_df.select("doc_id", "content").mapInPandas(
        run, schema=MEDIA_META_SCHEMA
    )


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
