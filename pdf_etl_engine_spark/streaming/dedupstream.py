"""Streaming near-dup ingest (SURVEY.md §2.9 × X22): dedup at INGEST
time instead of in batch sweeps.

The batch incremental operators (operators/incremental.py) check a new
document batch against the fingerprint store; this module closes the
loop the 100 TB pipeline actually runs — a Structured Streaming query
whose every micro-batch (1) probes the store for exact (sha-256) and
near (MinHash band) duplicates, (2) emits only the surviving docs, and
(3) appends the survivors' fingerprints so the NEXT micro-batch dedups
against them too. At 100 TB you dedup each crawl shard as it lands;
re-sweeping the accepted corpus per day is the scale-killer.

Exactly-once: foreachBatch is at-least-once, so every write is keyed
by ``batch_id`` and idempotent — micro-batch k overwrites
``accepted/batch=k`` and ``store/delta_k`` (never appends to a shared
file set), so a replay after a crash reproduces byte-identical output
instead of duplicating it (the streaming/ingest.py transaction-marker
discipline, applied to the dedup loop; pinned by the replay test in
tests/test_streaming_dedup.py).

Determinism contract for the ORACLE-graded twin (stw_incremental_dedup
in streaming/windowq.py): the staged stream presents the batch docs in
doc_id order — one single-file micro-batch per doc_id quartile
(ntile(4), maxFilesPerTrigger=1) — and within a micro-batch the
exact-layer winner per content_sha is min(doc_id). First-accepted is
therefore globally min(doc_id) per text, which is what the oracle's
``b2.doc_id < b.doc_id NOT EXISTS`` clause expresses — the result is
independent of how the engine re-slices micro-batches (a coarser
slicing merges batches; min(doc_id) is associative).

No reference counterpart: the reference ingests via per-file push
notifications with no dedup at all (main.py:666-707); this is the
LLM-data-pipeline extension of its ingest trigger.
"""

from __future__ import annotations

import os
import pathlib
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_etl_engine_spark.operators.incremental import fingerprints


def _store_deltas(store_dir: str) -> list[str]:
    """Committed store deltas: every ``delta_*`` dir with a _SUCCESS
    marker (a replayed/overwritten partial write is invisible until
    its marker lands). Only ``delta_``-prefixed dirs qualify — a
    stray committed dir under the store root (checkpoint debris, a
    user mkdir) is ignored instead of crashing read_store's
    before_batch parse (ADVICE r13)."""
    root = pathlib.Path(store_dir)
    if not root.exists():
        return []
    return sorted(
        str(p) for p in root.iterdir()
        if p.is_dir()
        and p.name.startswith("delta_")
        and (p / "_SUCCESS").exists()
    )


def read_store(
    spark: SparkSession, store_dir: str, before_batch: int | None = None
) -> DataFrame:
    """The fingerprint store = union of all committed deltas (base
    seed + one delta per accepted micro-batch). ``before_batch``
    restricts the view to deltas from batches strictly earlier — the
    replay guard: a re-run micro-batch must probe the store AS IT WAS
    before its first attempt, or it would anti-join against its own
    previously-written fingerprints and drop every row (caught by
    tests/test_streaming_dedup.py's replay pin)."""
    deltas = _store_deltas(store_dir)
    if before_batch is not None:
        deltas = [
            d
            for d in deltas
            if not d.rsplit("delta_", 1)[1].isdigit()
            or int(d.rsplit("delta_", 1)[1]) < before_batch
        ]
    if not deltas:
        raise ValueError(f"empty fingerprint store: {store_dir}")
    return spark.read.parquet(*deltas)


def seed_store(
    spark: SparkSession,
    store_dir: str,
    corpus: DataFrame,
    near: bool = True,
) -> None:
    """Write the base delta: the accepted corpus' fingerprints.
    ``near=False`` seeds the exact-layer-only store (no MinHash —
    see fingerprints(bands=False)); only valid when every probe of
    this store also runs near=False."""
    fingerprints(corpus, bands=near).write.mode("overwrite").parquet(
        f"{store_dir}/delta_base"
    )


def dedup_batch_fn(
    spark: SparkSession,
    store_dir: str,
    accepted_dir: str,
    near: bool = False,
):
    """The foreachBatch body: probe → filter → append, idempotent per
    batch_id. Returned as a closure so tests can invoke it directly
    with a repeated batch_id to pin replay idempotence.

    Probe semantics per micro-batch (matching the batch-mode
    dedup_against_store):

    * exact layer — keep only the min(doc_id) row per content_sha
      within the batch (first-wins), then anti-join the store's shas;
    * near layer (``near=True``) — drop survivors sharing ANY
      (band_id, band_sig) with the store (rows-only semantics, same
      as x22b; OFF for the oracle-graded twin).

    Writes: survivors' fingerprints (+ ``lang``) → ``store/delta_<id>``,
    then accepted docs → ``accepted/batch=<id>`` (doc_id, lang) DERIVED
    from the just-written delta files. Both mode OVERWRITE into
    batch-keyed dirs — the exactly-once lever.

    r16 write fusion (VERDICT r15 #4, guide §2 fewer jobs / §6 I/O):
    the r15 body ran THREE jobs per micro-batch — localCheckpoint the
    survivors (the probe plan), write accepted rows, write the
    fingerprint delta. The survivor probe now runs exactly once, as
    part of the delta write (the delta carries ``lang`` alongside the
    fingerprint columns — seed deltas don't need it, and every store
    probe selects its fingerprint columns explicitly so mixed delta
    schemas are fine), and the tiny accepted projection is read back
    from the committed delta files — the files on disk ARE the
    materialization the localCheckpoint used to buy. Two jobs, one
    probe. Replay contract unchanged: both writes stay batch-id-keyed
    overwrites, a replayed batch still probes the store strictly
    before itself (read_store(before_batch)), and a crash between the
    two writes replays into overwrites of both (delta_<id> is excluded
    from its own probe either way). Pinned by the replay test below."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        store = read_store(spark, store_dir, before_batch=batch_id)
        # near=False probes only content_sha — skip the MinHash pass
        # (fingerprints(bands=False); schema-compatible sentinel rows)
        fp = fingerprints(batch_df, bands=near)
        doc_sha = fp.select("fp_id", "content_sha").distinct()
        # within-batch first-wins: one winner per content_sha
        winners = doc_sha.groupBy("content_sha").agg(
            F.min("fp_id").alias("fp_id")
        )
        survive = winners.join(
            store.select("content_sha").distinct(),
            "content_sha",
            "left_anti",
        ).select("fp_id")
        if near:
            near_hit = (
                fp.join(survive, "fp_id", "left_semi")
                .join(
                    store.select("band_id", "band_sig").distinct(),
                    ["band_id", "band_sig"],
                    "left_semi",
                )
                .select("fp_id")
                .distinct()
            )
            survive = survive.join(near_hit, "fp_id", "left_anti")
        # job 1: survivors' fingerprints + lang → the batch delta
        # (fp semi-joined to the survivor ids ≡ fingerprints(accepted):
        # fingerprints are deterministic per doc)
        delta = fp.join(survive, "fp_id", "left_semi").join(
            batch_df.select(F.col("doc_id").alias("fp_id"), "lang"),
            "fp_id",
        )
        delta.write.mode("overwrite").parquet(
            f"{store_dir}/delta_{batch_id}"
        )
        # job 2: accepted (doc_id, lang) projected from the committed
        # delta files (distinct: near=True deltas carry one row per
        # band; the exact layer's sentinel is one row per doc already)
        (
            spark.read.parquet(f"{store_dir}/delta_{batch_id}")
            .select(F.col("fp_id").alias("doc_id"), "lang")
            .distinct()
            .write.mode("overwrite")
            .parquet(f"{accepted_dir}/batch={batch_id}")
        )

    return process


def run_streaming_dedup(
    spark: SparkSession,
    stage_dir: str,
    schema: str,
    store_dir: str,
    accepted_dir: str,
    checkpoint_dir: str,
    near: bool = False,
) -> None:
    """Drain the staged batch files through the dedup loop: one
    micro-batch per staged file (maxFilesPerTrigger=1 — the staging
    order IS the arrival order), availableNow, exactly-once via the
    batch-keyed writes."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            dedup_batch_fn(spark, store_dir, accepted_dir, near=near)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stage_ordered_quartiles(
    spark: SparkSession,
    docs: DataFrame,
    stage_dir: str,
    order_col: str = "doc_id",
) -> None:
    """Stage ``docs`` as 4 single-file parquets in ``order_col``
    quartile order (file name = quartile index, so the file source's
    (mtime, path) ordering presents them in key order). Each staged
    file gets an EXPLICIT strictly-increasing mtime (base + quartile
    index via os.utime): write order alone is not enough — coarse
    filesystem timestamp granularity can tie all four files, and a
    tie lets the source reorder micro-batch arrival (ADVICE r13)."""
    stage = pathlib.Path(stage_dir)
    if (stage / "_STAGED").exists():
        return
    from pyspark.sql.window import Window

    shutil.rmtree(stage, ignore_errors=True)
    stage.mkdir(parents=True)
    quart = docs.withColumn(
        "q", F.ntile(4).over(Window.orderBy(order_col))
    )
    base = time.time()
    for i in range(1, 5):
        tmp = stage / f"_tmp_{i}"
        (
            quart.filter(F.col("q") == i)
            .drop("q")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(tmp))
        )
        part = next(tmp.glob("part-*.parquet"))
        staged = stage / f"{i:02d}.parquet"
        shutil.move(str(part), staged)
        os.utime(staged, (base + i, base + i))
        shutil.rmtree(tmp)
    (stage / "_STAGED").touch()


# ---------------------------------------------------------------------------
# Streaming VECTOR ingest: encode-at-ingest for the persisted IVF-PQ
# index (the embedding twin of the fingerprint loop above)
# ---------------------------------------------------------------------------


def vector_ingest_batch_fn(spark: SparkSession, index_dir: str):
    """The foreachBatch body for streaming IVF-PQ ingest: each vector
    micro-batch is assigned + residual-encoded against the FROZEN
    coarse model (collected once, a ≤8-row closure — the
    append-without-retrain discipline of append_ivfpq_index) and its
    packed codes land in ``codes/batch=<id>`` partitioned by cell —
    batch-keyed OVERWRITE, so replays are idempotent exactly like the
    fingerprint loop. Encoding is map-only per vector, so the final
    code set is independent of micro-batch slicing by construction —
    which is why the post-drain probe can be graded against the BATCH
    IVF-PQ oracle verbatim."""
    from pdf_etl_engine_spark.operators.ann_index import (
        _ivfpq_assign_encode_arrow,
    )

    cent_rows = spark.read.parquet(f"{index_dir}/centroids").collect()

    def process(batch_df: DataFrame, batch_id: int) -> None:
        codes = _ivfpq_assign_encode_arrow(batch_df, cent_rows)
        codes.repartition("cell").write.mode("overwrite").partitionBy(
            "cell"
        ).parquet(f"{index_dir}/codes/batch={batch_id}")

    return process


def run_streaming_vector_ingest(
    spark: SparkSession,
    stage_dir: str,
    schema: str,
    index_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain staged vector files through the encode-at-ingest loop:
    one micro-batch per file, availableNow, exactly-once via the
    batch-keyed code writes."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            vector_ingest_batch_fn(spark, index_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
