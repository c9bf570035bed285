"""Incremental corpus dedup (operators/incremental.py): exact and
near layers against a fingerprint store, and the accept-loop that
keeps the store current. Controlled tiny corpus so each layer's
decision is individually observable.
"""

from __future__ import annotations

import pytest

from pdf_etl_engine_spark.operators import incremental as I

DOC_SCHEMA = "doc_id bigint, lang string, text string"

CORPUS = [
    (0, "en", "the quick brown fox jumps over the lazy dog today"),
    (1, "en", "pack my box with five dozen liquor jugs right now"),
    (2, "de", "alle meine entchen schwimmen auf dem see heute morgen"),
]

BATCH = [
    # exact duplicate of corpus doc 0 → dropped by the exact layer
    (10, "en", "the quick brown fox jumps over the lazy dog today"),
    # near duplicate of doc 1 (one word changed) → passes exact,
    # dropped by the band layer
    (11, "en", "pack my box with five dozen liquor jugs right away"),
    # novel → accepted
    (12, "en", "completely unrelated sentence about spark physical plans"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


@pytest.mark.slow
def test_exact_layer_drops_only_byte_identical(spark):
    store = I.fingerprints(_df(spark, CORPUS))
    accepted = I.dedup_against_store(_df(spark, BATCH), store, near=False)
    assert sorted(r["doc_id"] for r in accepted.collect()) == [11, 12]


@pytest.mark.slow
def test_near_layer_drops_band_collisions(spark):
    store = I.fingerprints(_df(spark, CORPUS))
    accepted = I.dedup_against_store(_df(spark, BATCH), store, near=True)
    assert sorted(r["doc_id"] for r in accepted.collect()) == [12]


@pytest.mark.slow
def test_accept_loop_extends_the_store(spark):
    """Appending an accepted batch's fingerprints makes the store
    reject a re-offer of the same content."""
    store = I.fingerprints(_df(spark, CORPUS))
    batch = _df(spark, BATCH)
    accepted = I.dedup_against_store(batch, store, near=True)
    grown = store.unionByName(I.fingerprints(accepted))
    reoffer = _df(spark, [(20, "en", BATCH[2][2])])  # novel doc, again
    assert I.dedup_against_store(reoffer, grown).count() == 0
    # genuinely new content still passes the grown store
    fresh = _df(spark, [(21, "en", "yet another brand new document body")])
    assert I.dedup_against_store(fresh, grown).count() == 1


def test_store_carries_no_text(spark):
    fp = I.fingerprints(_df(spark, CORPUS))
    assert set(fp.columns) == {"fp_id", "content_sha", "band_id", "band_sig"}


@pytest.mark.slow
def test_staged_store_matches_lazy_fingerprints(spark):
    """The disk-staged store and the lazily-derived store hold the
    same fingerprint rows for the same corpus."""
    sf = "/root/testdata/sf0.001"
    staged = I.staged_store(spark, sf)
    corpus, _ = I._corpus_batch(spark, sf)
    lazy = I.fingerprints(corpus)
    assert staged.count() == lazy.count()
    assert staged.exceptAll(lazy).count() == 0


@pytest.mark.slow
def test_bucketed_store_shuffle_free_probe(spark, sf_dir):
    """VERDICT r4 #6: the fingerprint store as bucketed tables — the
    store side of both probe joins is an Exchange-free bucketed scan,
    results identical to the lazy-store path, and append() keeps the
    store incremental (a re-probed accepted batch fully dedups)."""
    import uuid

    from pdf_etl_engine_spark.operators.incremental import (
        BucketedFingerprintStore,
        _corpus_batch,
        dedup_against_store,
        fingerprints,
    )

    name = f"fp_store_{uuid.uuid4().hex[:8]}"
    prior = {
        k: spark.conf.get(k)
        for k in ("spark.sql.adaptive.enabled",
                  "spark.sql.autoBroadcastJoinThreshold")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    store = BucketedFingerprintStore(spark, name, n_buckets=4)
    try:
        corpus, batch = _corpus_batch(spark, sf_dir)
        store.create(corpus)
        out = store.dedup(batch, near=True)

        plan = out._jdf.queryExecution().executedPlan().toString()
        lines = plan.splitlines()
        scan_idx = [i for i, l in enumerate(lines) if name in l]
        assert len(scan_idx) == 2, "expected both store tables scanned"
        for i in scan_idx:
            assert "Bucketed: true" in lines[i]
            # nothing between the bucketed scan and its join but
            # Sort/Filter/ColumnarToRow — no Exchange on the store side
            # (the window is the store branch only; the batch side's
            # Exchange is expected and sits outside it)
            for j in range(max(0, i - 3), i):
                assert "Exchange" not in lines[j], lines[j]
                assert any(
                    tok in lines[j]
                    for tok in ("Sort", "Filter", "ColumnarToRow")
                ), lines[j]

        # parity with the lazy-store path
        lazy = dedup_against_store(batch, fingerprints(corpus), near=True)
        assert out.count() == lazy.count()
        assert sorted(r["doc_id"] for r in out.select("doc_id").collect()) \
            == sorted(r["doc_id"] for r in lazy.select("doc_id").collect())

        # accept-loop: appending the surviving batch makes it a dup
        store.append(out)
        assert store.dedup(out, near=True).count() == 0
    finally:
        for k, v in prior.items():
            spark.conf.set(k, v)
        for t in (store.sha_table, store.band_table):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


@pytest.mark.slow
def test_bands_false_fingerprints_schema_and_parity(spark):
    """r15: bands=False skips the MinHash pass but must stay
    schema-identical (sentinel band row, one per doc) and must give
    the exact layer the same answer whether the store or batch side
    carries full bands, sentinels, or a mix."""
    full = I.fingerprints(_df(spark, CORPUS))
    cheap = I.fingerprints(_df(spark, CORPUS), bands=False)
    assert full.schema == cheap.schema
    assert cheap.count() == len(CORPUS)  # one sentinel row per doc
    # sentinel can never collide with a real band probe
    assert cheap.filter("band_id >= 0").count() == 0
    batch = _df(spark, BATCH)
    expect = sorted(
        r["doc_id"]
        for r in I.dedup_against_store(batch, full, near=False).collect()
    )
    for store in (cheap, full.unionByName(cheap)):
        got = sorted(
            r["doc_id"]
            for r in I.dedup_against_store(batch, store, near=False).collect()
        )
        assert got == expect
