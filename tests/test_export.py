"""Training-shard export capstone (operators/export.py): the
filter → dedup → shuffle → shard → manifest pipeline must be
deterministic per epoch, re-permuted across epochs, duplicate-free,
and honest in its manifest accounting."""

from __future__ import annotations

import pytest

import hashlib
import json
import os

from pdf_etl_engine_spark.operators.export import export_training_shards

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _content_hash(spark, out_dir) -> str:
    rows = (
        spark.read.parquet(out_dir)
        .orderBy("shard", "pos")
        .select("shard", "pos", "doc_id", "n_tokens")
        .collect()
    )
    h = hashlib.sha256()
    for r in rows:
        h.update(f"{r['shard']}|{r['pos']}|{r['doc_id']}|{r['n_tokens']}".encode())
    return h.hexdigest()


@pytest.mark.slow
def test_export_manifest_accounts_for_every_doc(spark, tmp_path):
    out = str(tmp_path / "shards")
    m = export_training_shards(spark, SF_DIR, out, epoch=0, n_shards=4)
    assert m["n_docs_in"] > 0
    assert (
        m["n_docs_out"] + m["n_dropped_quality"] + m["n_dropped_dup"]
        == m["n_docs_in"]
    )
    assert m["n_docs_out"] == sum(
        s["n_docs"] for s in m["shards"].values()
    )
    assert m["n_tokens_out"] > 0
    # manifest on disk matches the returned one
    with open(os.path.join(out, "_manifest.json")) as fh:
        assert json.load(fh)["n_docs_out"] == m["n_docs_out"]
    # no duplicate text survived
    df = spark.read.parquet(out)
    assert df.count() == df.select("text").distinct().count()
    # every shard's pos is a dense 1..n_docs sequence (loader contract)
    for r in (
        df.groupBy("shard")
        .agg({"pos": "max", "*": "count"})
        .collect()
    ):
        assert r["max(pos)"] == r["count(1)"]


@pytest.mark.slow
def test_export_is_deterministic_per_epoch_and_reshuffles_across(
    spark, tmp_path
):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    c = str(tmp_path / "c")
    export_training_shards(spark, SF_DIR, a, epoch=0)
    export_training_shards(spark, SF_DIR, b, epoch=0)
    export_training_shards(spark, SF_DIR, c, epoch=1)
    ha, hb, hc = (
        _content_hash(spark, p) for p in (a, b, c)
    )
    assert ha == hb  # same epoch: byte-identical training order
    assert ha != hc  # next epoch: fresh permutation
    # both epochs ship the same DOCUMENTS, just reordered
    da = {r["doc_id"] for r in spark.read.parquet(a).select("doc_id").collect()}
    dc = {r["doc_id"] for r in spark.read.parquet(c).select("doc_id").collect()}
    assert da == dc


@pytest.mark.slow
def test_export_with_bpe_tokens(spark, tmp_path):
    from pdf_etl_engine_spark.catalog import load_table
    from pdf_etl_engine_spark.operators import tokenizer

    docs = load_table(spark, SF_DIR, "documents")
    merges = tokenizer.train_bpe(docs, n_merges=8)
    out = str(tmp_path / "shards")
    m = export_training_shards(spark, SF_DIR, out, merges=merges)
    df = spark.read.parquet(out)
    assert "bpe_tokens" in df.columns and "n_bpe_tokens" in df.columns
    row = df.orderBy("shard", "pos").first()
    # tokens match the driver-side segmenter for the same text
    words = [w for w in row["text"].split(" ") if w]
    expect = [
        t for w in words for t in tokenizer.segment_word(w, merges)
    ]
    assert list(row["bpe_tokens"]) == expect
    assert row["n_bpe_tokens"] == len(expect)
    assert m["n_docs_out"] == df.count()
