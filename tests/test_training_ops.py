"""Pins for the training/sketching operators (x48/x49/x50).

The oracle-parity lane already grades all three value-exact against
DuckDB at sf0.01; these tests pin the properties the oracle CANNOT
see — the Misra–Gries exactness margin, eviction behavior under a
tiny capacity, bounded model state, and the DSIR weight's
distribution-matching direction.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F

from pdf_etl_engine_spark import registry
from pdf_etl_engine_spark.catalog import load_table
from pdf_etl_engine_spark.operators.training import (
    _HH_CAP,
    mg_candidates,
    perceptron_features,
)
from pdf_etl_engine_spark.registry import QUERIES

registry.load_all()

SF_DIR = "/root/testdata/sf0.001"


def test_mg_bound_makes_topk_provably_exact(spark):
    """The two-pass heavy hitter is EXACT iff the k-th true count
    exceeds N/(cap+1) — the Misra–Gries absence bound. Pin that the
    testdata sits far inside that margin (so the graded oracle match
    is guaranteed, not lucky), and that the candidate pass actually
    contains every token of the exact top-k."""
    docs = load_table(spark, SF_DIR, "documents")
    tokens = docs.select(
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda w: w != "")
        ).alias("token")
    )
    n_total = tokens.count()
    exact_topk = [
        r["token"]
        for r in tokens.groupBy("token")
        .count()
        .orderBy(F.desc("count"), "token")
        .limit(25)
        .collect()
    ]
    kth = (
        tokens.groupBy("token")
        .count()
        .orderBy(F.desc("count"), "token")
        .limit(25)
        .agg(F.min("count"))
        .collect()[0][0]
    )
    assert kth > n_total / (_HH_CAP + 1), (
        "MG exactness margin violated on testdata: "
        f"kth={kth} N/(cap+1)={n_total / (_HH_CAP + 1):.1f}"
    )
    cand = {r["token"] for r in mg_candidates(tokens).distinct().collect()}
    assert set(exact_topk) <= cand


def test_mg_eviction_keeps_heavy_keys_under_tiny_cap(spark):
    """Adversarial eviction: capacity 4 over a stream where one key
    holds 60% of the mass and 200 singletons churn the summary. The
    heavy key must survive every eviction round (the MG guarantee:
    absence implies count <= n_p/(cap+1))."""
    rows = [("hot",)] * 300 + [(f"rare_{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "token string").coalesce(1)
    out = mg_candidates(df, cap=4)
    cand = {
        r["token"] for r in out.filter("token IS NOT NULL").collect()
    }
    assert "hot" in cand
    assert len(cand) <= 4
    # the partition marker must carry the full token count
    assert out.agg(F.sum("np")).collect()[0][0] == 500


def test_mg_summary_is_capacity_bounded_per_partition(spark):
    """The pass-1 output is <= cap rows per partition whatever the
    vocabulary (the 100 TB memory contract)."""
    rows = [(f"tok_{i}",) for i in range(5000)]
    df = spark.createDataFrame(rows, "token string").repartition(4)
    out = mg_candidates(df, cap=64).filter("token IS NOT NULL")
    per_part = out.withColumn(
        "pid", F.spark_partition_id()
    ).groupBy("pid").count()
    # all-singleton partitions may evict to an EMPTY summary — that is
    # the MG bound working (every count <= n_p/(cap+1)), so coalesce
    max_rows = per_part.agg(
        F.coalesce(F.max("count"), F.lit(0))
    ).collect()[0][0]
    assert max_rows <= 64


def test_perceptron_converges_and_separates_separable_fixture(spark):
    """On a linearly separable synthetic corpus (label word decides
    the class), 3 full-batch iterations must reach zero
    misclassifications — pinning that the distributed gradient loop
    actually learns, not just terminates."""
    rows = [
        (i, "good clean prose text", "en")
        if i % 2 == 0
        else (i, "spam junk noise garbage", "de")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        # reuse the registered query end-to-end on the fixture dir
        out = QUERIES["x49_quality_perceptron"](spark, d).collect()
    miscl = out[0]["n_misclassified"]
    assert miscl == 0, f"separable fixture not separated: {miscl} left"


def test_perceptron_feature_matrix_has_bias_for_empty_docs(spark):
    """Docs with no tokens still get the bias feature — every doc
    participates in every margin pass."""
    docs = spark.createDataFrame(
        [(1, "", "en"), (2, "a b", "fr")],
        "doc_id long, text string, lang string",
    )
    feat = perceptron_features(docs)
    assert feat.filter("doc_id = 1").count() == 1  # bias row only
    assert feat.filter("doc_id = 1 AND b = 32 AND x = 1").count() == 1


def test_dsir_weights_favor_target_distribution(spark):
    """Gibbs-direction sanity: averaged over the TARGET subcorpus the
    importance log-ratio must be at least the raw-corpus average
    (per-token it is a KL-flavored quantity; equality only if the
    distributions coincide)."""
    out = QUERIES["x50_dsir_importance"](spark, SF_DIR)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang")
    j = out.join(docs, "doc_id")
    per_tok = (F.col("dsir_weight") / F.col("n_tokens")).alias("ptw")
    means = (
        j.select("lang", per_tok)
        .groupBy((F.col("lang") == "en").alias("is_target"))
        .agg(F.avg("ptw").alias("m"))
        .collect()
    )
    m = {r["is_target"]: r["m"] for r in means}
    assert m[True] >= m[False]


def test_mg_merge_property_absence_bound():
    """Property (hypothesis): for ANY stream and ANY batch split,
    every key absent from the final Misra–Gries summary has true
    count <= n/(cap+1), and the summary never exceeds cap keys.
    This is the exactness precondition x48's oracle match rests on."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdf_etl_engine_spark.operators.training import mg_merge

    @settings(max_examples=200, deadline=None)
    @given(
        stream=st.lists(
            st.integers(min_value=0, max_value=30), max_size=400
        ),
        cap=st.integers(min_value=1, max_value=8),
        data=st.data(),
    )
    def run(stream, cap, data):
        truth = Counter(stream)
        counts: dict = {}
        i = 0
        while i < len(stream):
            j = data.draw(
                st.integers(min_value=i + 1, max_value=len(stream))
            )
            counts = mg_merge(counts, Counter(stream[i:j]).items(), cap)
            assert len(counts) <= cap
            i = j
        n = len(stream)
        for key, true_c in truth.items():
            if key not in counts:
                assert true_c <= n / (cap + 1), (
                    f"absent key {key} true={true_c} > "
                    f"n/(cap+1)={n / (cap + 1):.1f}"
                )

    run()


def test_curriculum_shards_balanced_and_complete(spark):
    """x51: every doc lands in exactly one of four shards, and global
    quartile cuts keep the shards within a sane balance band (exact
    quantiles of a continuous-ish score → ~25% each; wide tolerance
    for the discrete fixed-point ties)."""
    out = QUERIES["x51_curriculum_shards"](spark, SF_DIR)
    rows = out.groupBy("shard").count().collect()
    by_shard = {r["shard"]: r["count"] for r in rows}
    total = sum(by_shard.values())
    assert set(by_shard) == {1, 2, 3, 4}
    assert total == 500
    for s, c in by_shard.items():
        assert 0.10 <= c / total <= 0.45, f"shard {s} holds {c}/{total}"


def test_curriculum_assignment_is_broadcast_not_window(spark):
    """x51's scale contract: shard assignment must be a broadcast of
    the single-row cutoff model + map-only comparisons — never a
    corpus-wide Window/ntile (which would single-partition the
    world)."""
    df = QUERIES["x51_curriculum_shards"](spark, SF_DIR)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in p
    assert "SortMergeJoin" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_line_boilerplate_threshold_semantics(spark):
    """x52: universal lines (nav/copyright, df=corpus) and the
    newsletter banner (df=half) are removed; the 'pair' line — shared
    by exactly TWO docs but occurring FOUR times corpus-wide (twice
    per doc) — sits below the df>=3 DOCUMENT-frequency threshold and
    must survive with BOTH in-doc copies intact (an occurrence count
    would wrongly strip it)."""
    out = QUERIES["x52_line_boilerplate"](spark, SF_DIR).collect()
    assert len(out) == 500
    for r in out:
        # universal nav + copyright always removed; newsletter on even
        expected_removed = 3 if r["doc_id"] % 2 == 0 else 2
        assert r["n_removed"] == expected_removed, r
        assert "copyright" not in r["clean_tail"], r
        assert "nav menu home" not in r["clean_tail"], r
    sample = [r for r in out if r["doc_id"] == 3][0]
    pair_line = f"pair {3 // 2}"
    assert sample["clean_tail"].endswith(f"{pair_line}\n{pair_line}")


def test_line_boilerplate_is_single_window_no_selfjoin(spark):
    """x52's df test must be one line-keyed window (mark in place),
    never a self-join producing a pair relation."""
    df = QUERIES["x52_line_boilerplate"](spark, SF_DIR)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in p
    assert "Join" not in p


def test_curation_pipeline_stage_semantics(spark):
    """x53: benchmark docs (doc_id%97==0) never appear; every text is
    unique among survivors (exact dedup held); shard covers 1..4."""
    out = QUERIES["x53_curation_pipeline"](spark, SF_DIR)
    rows = out.collect()
    assert rows, "pipeline emptied the corpus"
    assert all(r["doc_id"] % 97 != 0 for r in rows)
    assert {r["shard"] for r in rows} == {1, 2, 3, 4}
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    survivors = out.select("doc_id").join(docs, "doc_id")
    n = survivors.count()
    assert survivors.select("text").distinct().count() == n


def test_curation_pipeline_plan_shape(spark):
    """x53's composed plan, both sides of the survivors checkpoint:
    upstream — the benchmark gram probe broadcasts, the dedup is one
    text-keyed window, no cartesian; downstream — the single-row
    cutoff model broadcasts onto the checkpointed survivors."""
    from pdf_etl_engine_spark.operators.training import (
        assign_quartile_shards,
        curation_survivors,
    )

    docs = load_table(spark, SF_DIR, "documents")
    up = curation_survivors(docs)  # pre-checkpoint subtree
    pu = up._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in pu
    assert "BroadcastHashJoin" in pu  # gram probe
    assert "Window" in pu  # keep-first dedup
    assert "SortMergeJoin" not in pu
    down = QUERIES["x53_curation_pipeline"](spark, SF_DIR)
    pd_ = down._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in pd_
    assert "Broadcast" in pd_  # cutoff model onto the checkpoint scan


def test_mg_merge_does_not_mutate_input():
    """mg_merge is documented pure: the caller's pre-merge summary
    must survive untouched on BOTH paths — no eviction (the silent
    in-place hazard) and eviction."""
    from pdf_etl_engine_spark.operators.training import mg_merge

    pre = {"a": 3, "b": 1}
    snapshot = dict(pre)
    out = mg_merge(pre, [("a", 2), ("c", 1)], cap=10)  # no eviction
    assert pre == snapshot and out["a"] == 5
    out2 = mg_merge(pre, [(f"k{i}", 1) for i in range(20)], cap=2)
    assert pre == snapshot and len(out2) <= 2


def test_x48_certificate_raises_on_flat_vocabulary(spark, tmp_path):
    """x48's execution-time certificate: a corpus whose k-th count
    sits at/below N/(cap+1) (here: every token unique, so NO rank can
    certify) must fail with the named margin diagnosis, not an opaque
    oracle mismatch. Uses a monkeypatched tiny cap via the same corpus
    trick as the eviction pin: all-distinct tokens."""
    import pytest

    # 30 docs x 40 unique tokens: every count is 1, N=1200, and
    # 1*(cap+1)=4097 > 1200 would certify -- so go the other way:
    # make N large enough that 1*(_HH_CAP+1) <= N.
    n_docs, toks_per_doc = 120, 40
    rows = [
        (i, " ".join(f"tok{i}_{j}" for j in range(toks_per_doc)))
        for i in range(n_docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "flat")
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")
    n_total = n_docs * toks_per_doc
    assert 1 * (_HH_CAP + 1) <= n_total, "fixture must violate margin"
    with pytest.raises(Exception, match="exactness margin violated"):
        QUERIES["x48_heavy_hitters"](spark, d).collect()
