"""Physical-plan shape tests: correctness says WHAT came back; these
pin HOW — the plan properties that decide whether a query survives a
1000-executor 100 TB run (SURVEY.md §4).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pdf_etl_engine_spark import registry
from pdf_etl_engine_spark.catalog import load_table

registry.load_all()

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_topk_is_take_ordered(spark):
    """T1 must plan as TakeOrderedAndProject (per-partition heaps),
    never a global Sort + Limit."""
    df = registry.QUERIES["t1_results_topk"](spark, SF_DIR)
    p = plan_of(df)
    assert "TakeOrderedAndProject" in p


def test_dim_joins_broadcast(spark):
    """J1/J5: dimension joins must be broadcast — the fact side must
    not shuffle for the join."""
    for name in ("j1_lookup_broadcast", "j5_multiway_equi"):
        p = plan_of(registry.QUERIES[name](spark, SF_DIR))
        assert "BroadcastHashJoin" in p, name
        assert "SortMergeJoin" not in p, name


def test_semi_anti_physical(spark):
    p2 = plan_of(registry.QUERIES["j2_semi_exists"](spark, SF_DIR))
    assert "LeftSemi" in p2
    p3 = plan_of(registry.QUERIES["j3_anti"](spark, SF_DIR))
    assert "LeftAnti" in p3


def test_filter_pushdown_to_scan(spark):
    """P4: equality predicates must reach the parquet reader as
    PushedFilters, not run post-scan only."""
    df = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter(
            (F.col("o_orderstatus") == "F")
            & (F.col("o_orderpriority") == "1-URGENT")
        )
        .select("o_orderkey")
    )
    p = plan_of(df)
    assert "PushedFilters: [" in p
    assert "EqualTo(o_orderstatus,F)" in p


def test_column_pruning(spark):
    """A 2-column projection must scan 2 columns, not the table."""
    df = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
    )
    p = plan_of(df)
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in p


def test_relational_paths_have_no_python(spark):
    """Every oracle-graded query must stay JVM-side: no BatchEvalPython
    / ArrowEvalPython / mapInPandas in the plan (Python is allowed only
    in the explicitly-Python operators: extractor U1, multimodal X5 —
    x5b/x5c/x5d are X5's oracle-graded decode/resize/format queries
    and are Python BY DESIGN, the Arrow-batched codec path)."""
    from concurrent.futures import ThreadPoolExecutor

    names = sorted(
        set(registry.ORACLES)
        - {"x5b_media_decode", "x5c_resize_pipeline", "x5d_media_formats",
           "x42_image_ahash_dedup", "x43_audio_fingerprint_dedup",
           "x4j_lsh_near_dup_k10", "x4j2_lsh_near_dup_colocated",
           "x4m_lsh_near_dup_mixed", "x4n_lsh_near_dup_multiprobe",
           "x4k_knn_join_brute", "x4l_knn_join_blocked", "x45_semdedup",
           "x27_ngram_surprisal"}
        # x42/x43: real pixel/PCM decode, Python by design (x5 family);
        # x4j/x4j2/x4k/x45: Arrow-vectorized dense-linear-algebra
        # rescore kernels Spark has no native operator for (the JVM
        # fold/chain forms measured 68-500 s at sf1 vs 8-20 s; see the
        # x4j docstring). x27: Arrow trigram-count kernel (the JVM
        # explode form measured 5.4x the oracle at sf1; see its
        # docstring). The GRADED-window twin x45b stays fully JVM.
    )

    def check(name: str) -> str | None:
        # driver-side analysis only — thread-safe, no job runs
        p = plan_of(registry.QUERIES[name](spark, SF_DIR))
        hit = any(
            marker in p
            for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas")
        )
        return name if hit else None

    with ThreadPoolExecutor(max_workers=8) as pool:
        offenders = [n for n in pool.map(check, names) if n]
    assert not offenders, f"Python in relational plans: {offenders}"


def test_whole_stage_codegen_on_kernels(spark):
    """The coercion kernel must run inside whole-stage codegen.
    (AQE finalizes the physical plan only on execution, so run first.)"""
    df = registry.QUERIES["f2_coerce_number"](spark, SF_DIR)
    df.collect()
    p = plan_of(df)
    # '*(n)' prefixes mark WholeStageCodegen stages in the compact
    # plan string; both the kernel projection and the aggregate must
    # sit inside one.
    assert "*(1) Project" in p or "*(1) HashAggregate" in p, p[:500]


def test_partition_pruning_on_fact_table(spark, tmp_path):
    """The reference located data by string-building table names
    (main.py:262-264); our single partitioned fact table must prune
    partitions for a (tenant, folder) read."""
    df = spark.createDataFrame(
        [("t1", "f1", 1.0), ("t1", "f2", 2.0), ("t2", "f1", 3.0)],
        "tenant_id string, folder_id string, v double",
    )
    path = str(tmp_path / "facts")
    df.write.partitionBy("tenant_id", "folder_id").parquet(path)
    read = (
        spark.read.parquet(path)
        .filter((F.col("tenant_id") == "t1") & (F.col("folder_id") == "f2"))
    )
    p = plan_of(read)
    # the partition-key equalities must appear as PartitionFilters on
    # the scan (directory-level pruning). The compact plan string
    # truncates long filter lists with '…', so assert on the stable
    # prefix only.
    pf = p.split("PartitionFilters: [", 1)
    assert len(pf) == 2, f"no PartitionFilters in plan: {p}"
    filters = pf[1]
    assert "isnotnull(tenant_id" in filters
    assert "= t1)" in filters
    assert "isnotnull(folder_id" in filters


def test_asof_join_is_not_nested_loop(spark):
    """J7's union+window rewrite must avoid BroadcastNestedLoopJoin
    (the theta-join trap)."""
    p = plan_of(registry.QUERIES["j7_range_asof"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "Window" in p


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Bucketing: co-locating both sides of a recurring join key at
    WRITE time removes the shuffle at READ time — the strategy for
    repeated 100 TB fact-fact joins where broadcast is impossible.
    Both tables bucketed by the join key → SortMergeJoin with NO
    Exchange on either side."""
    import uuid

    # (warehouse dir is a static conf — tables land in the session's
    # default warehouse and are dropped below; see .gitignore)
    suffix = uuid.uuid4().hex[:8]
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    t_li, t_o = f"li_b_{suffix}", f"o_b_{suffix}"
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(t_li))
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(t_o))
    try:
        # disable broadcast so the join strategy question is real
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(t_li).join(
            spark.table(t_o),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {t_li}")
        spark.sql(f"DROP TABLE IF EXISTS {t_o}")


def test_query_construction_schedules_no_job(spark):
    """Building a registered query must be pure plan construction —
    no Spark job may run until the caller executes the DataFrame
    (x4e formerly ran an eager count() while building centroids)."""
    sc = spark.sparkContext
    # warm the table cache first: cache fill is a legitimate job
    for t in ("embeddings", "documents", "lineitem", "events"):
        load_table(spark, SF_DIR, t)
    # Known exemption (documented, not drift): x4f_ann_index_topk
    # materializes its LSH index on first use and collects the probe's
    # L bucket ids — a serving-path side effect its docstring declares.
    for name in ("x4e_ann_ivf_topk", "x4_cosine_topk", "t1_results_topk",
                 "a2_groupby_pricing_summary",
                 "x22_incremental_dedup_exact",
                 "x22b_incremental_dedup_near"):
        group = f"build-probe-{name}"
        sc.setJobGroup(group, "plan construction probe")
        try:
            registry.QUERIES[name](spark, SF_DIR)
        finally:
            sc.setJobGroup(None, None)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        assert not jobs, f"{name} scheduled job(s) {jobs} at build time"


def test_window_suite_single_exchange(spark):
    """w123 computes three window frames over two sort orders but must
    shuffle at most ONCE in the query itself: both window specs
    partition by user_id, so one hash exchange feeds the in-partition
    sorts. Since r13 the events cache is laid out clustered+sorted by
    (user_id, ts, event_id) at fill time (catalog.load_table), so the
    only exchange in the plan STRING is the one-time cache fill's —
    split it off before counting — and at runtime AQE elides even the
    query's own exchange once the cached stage's hashpartitioning is
    visible (pinned in test_window_exchange_elided_at_runtime)."""
    p = plan_of(registry.QUERIES["w123_window_suite"](spark, SF_DIR))
    outer = p.split("InMemoryRelation")[0]
    assert outer.count("Exchange hashpartitioning") <= 1, p


def test_window_exchange_elided_at_runtime(spark):
    """The clustered events cache must let AQE drop the window's
    exchange entirely: after execution, the final plan's query section
    (above the InMemoryRelation) contains NO exchange — the Window
    reads the cache's hashpartitioning(user_id) directly. This is the
    in-memory twin of the bucketed-table shuffle elision the 100 TB
    layout depends on."""
    df = registry.QUERIES["w0_row_number"](spark, SF_DIR)
    df.count()
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in p
    outer = p.split("InMemoryRelation")[0]
    assert "Exchange" not in outer, p
    assert "Sort" not in outer, p  # cache order serves the frame too


def test_deterministic_shuffle_is_take_ordered(spark):
    """x11's bounded shuffle preview must plan as TakeOrderedAndProject
    (per-partition heaps), not a global sort."""
    p = plan_of(registry.QUERIES["x11_deterministic_shuffle"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in p


def test_sequence_packing_single_exchange(spark):
    """x12: window cumsum + same-key aggregation — the groupBy(lang,
    seq_id) reuses the window's hashpartitioning(lang) (partial agg
    runs map-side on the sorted partitions; no second full shuffle of
    the rows)."""
    p = plan_of(registry.QUERIES["x12_sequence_packing"](spark, SF_DIR))
    assert p.count("Exchange hashpartitioning") <= 2

def test_curation_map_only_ops_have_no_exchange(spark):
    """X15/X17 (PII redact, HTML strip) are per-row regex transforms —
    the plan must be a single map stage: no Exchange, no Window, no
    Python."""
    for name in ("x15_pii_redact", "x17_html_strip"):
        p = plan_of(registry.QUERIES[name](spark, SF_DIR))
        # the table cache's one-time build plan (below InMemoryTableScan)
        # may repartition; the QUERY itself must not.
        query_part = p.split("InMemoryTableScan", 1)[0]
        assert "Exchange" not in query_part, f"{name} shuffles: {p[:400]}"
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_contamination_benchmark_side_is_broadcast(spark):
    """X16: the benchmark n-gram set must broadcast — corpus-side
    grams must not shuffle for the membership join."""
    p = plan_of(registry.QUERIES["x16_contamination"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_tfidf_df_join_is_not_unconditional_broadcast(spark):
    """X20 (VERDICT r5 #5): the vocabulary-sized df table must NOT
    carry an unconditional broadcast hint — noise tokens make a corpus
    vocabulary unbounded. Discriminator: with the auto-broadcast
    threshold disabled the tf⋈df join MUST fall back to a shuffle
    join (a hinted broadcast would ignore the threshold); the only
    surviving broadcast is the deliberately-hinted single-row N. At
    real sizes the planner/AQE still broadcasts df when its ACTUAL
    size qualifies — which is the safe adaptive behavior."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan_of(registry.QUERIES["x20_tfidf_terms"](spark, SF_DIR))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" not in p, p[:1200]
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p, p[:1200]
    # the single-row N cross join keeps its explicit broadcast
    assert p.count("BroadcastExchange") == 1, p[:1200]


def test_stratified_sample_window_is_partitioned(spark):
    """X18: the per-stratum rank must be a PARTITION BY lang window
    (never a single-partition global window)."""
    df = registry.QUERIES["x18_stratified_sample"](spark, SF_DIR)
    p = plan_of(df)
    assert "Window" in p
    assert "hashpartitioning(lang" in p


def test_salted_running_sum_parity_on_skewed_key(spark):
    """w5's two-phase salted rewrite must be a PHYSICAL rewrite only:
    bit-identical to the plain single-window running sum on a fixture
    where one hot key owns 80% of rows (the case the salt exists for)."""
    from pyspark.sql.window import Window

    rows = []
    for i in range(4000):  # hot key: one user, 80% of rows
        rows.append((i, 7, f"2024-01-{1 + (i % 28):02d} 00:{i % 60:02d}:00",
                     round(0.01 * (i % 997), 2)))
    for i in range(4000, 5000):
        rows.append((i, i % 50, f"2024-02-{1 + (i % 28):02d} 00:00:00",
                     round(0.01 * (i % 97), 2)))
    ev = spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, ts_s STRING, value DOUBLE"
    ).select(
        "event_id", "user_id",
        F.col("ts_s").cast("timestamp_ntz").alias("ts"), "value",
    )
    ev.createOrReplaceTempView("events_skewed_w5")

    cents = F.round(F.col("value") * 100).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    plain = {
        (r["event_id"], r["running_value"])
        for r in ev.select(
            "event_id",
            (F.sum(cents).over(w).cast("double") / 100.0).alias(
                "running_value"
            ),
        ).collect()
    }

    from pdf_etl_engine_spark.operators import windows as W

    # run the salted operator body over the fixture by swapping the
    # catalog load with a monkeypatched loader
    import pdf_etl_engine_spark.operators.windows as wmod

    orig = wmod.load_table
    wmod.load_table = lambda _s, _d, _n: ev
    try:
        salted = {
            (r["event_id"], r["running_value"])
            for r in W.w5_salted_running_sum(spark, SF_DIR).collect()
        }
    finally:
        wmod.load_table = orig
    # oracle-side rounding (stable_round) only nudges +5e-10
    plain_rounded = {(e, round(v + 5e-10, 4)) for e, v in plain}
    assert salted == plain_rounded


def test_salted_running_sum_wide_exchange_is_salted(spark):
    """The events-wide shuffle in w5 must hash on (user_id, chunk) —
    never on user_id alone; only the per-(key, chunk) totals relation
    (thousands of times smaller) may partition on the bare key.

    Pinned against the UNCACHED plan: since r13 the events cache is
    clustered by user_id, and once that cache is materialized
    hashpartitioning(user_id) satisfies ClusteredDistribution(user_id,
    chunk), so the wide exchange elides entirely (no shuffle at all —
    strictly better locally, and irrelevant to this pin: the salting
    contract is about the PARQUET scan path a 100 TB events table
    takes, where no pre-clustering exists). Unpersist + rebuild makes
    the pin deterministic regardless of which tests warmed the cache
    first."""
    from pdf_etl_engine_spark import catalog

    load_table(spark, SF_DIR, "events").unpersist(blocking=True)
    catalog._DF_CACHE.clear()
    df = registry.QUERIES["w5_salted_running_sum"](spark, SF_DIR)
    p = plan_of(df)
    import re

    exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", p)
    assert exchanges, p
    salted = [e for e in exchanges if "user_id" in e and "chunk" in e]
    assert salted, f"no (user_id, chunk) exchange in plan:\n{p}"


def test_salted_running_sum_keeps_null_key_rows(spark):
    """NULL user_id / NULL ts rows form real window partitions in the
    plain form; the salted rewrite's join must be null-safe so they
    survive with identical running values."""
    from pyspark.sql.window import Window

    ev = spark.createDataFrame(
        [
            (1, None, "2024-01-01 00:00:00", 1.0),
            (2, None, "2024-01-01 00:01:00", 2.5),
            (3, 5, None, 4.0),
            (4, 5, "2024-02-01 00:00:00", 1.5),
        ],
        "event_id LONG, user_id LONG, ts_s STRING, value DOUBLE",
    ).select(
        "event_id", "user_id",
        F.col("ts_s").cast("timestamp_ntz").alias("ts"), "value",
    )
    cents = F.round(F.col("value") * 100).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    plain = {
        (r["event_id"], round(r["rv"] + 5e-10, 4))
        for r in ev.select(
            "event_id", (F.sum(cents).over(w).cast("double") / 100.0).alias("rv")
        ).collect()
    }

    import pdf_etl_engine_spark.operators.windows as wmod

    orig = wmod.load_table
    wmod.load_table = lambda _s, _d, _n: ev
    try:
        salted = {
            (r["event_id"], r["running_value"])
            for r in wmod.w5_salted_running_sum(spark, SF_DIR).collect()
        }
    finally:
        wmod.load_table = orig
    assert salted == plain


def test_cow_file_pruning_is_semi_join(spark, tmp_path):
    """delete_rows/merge_rows must select rewrite candidates with a
    broadcast LEFT SEMI join on _src_file — never an isin literal: a
    tenant-wide delete can hit 10⁵+ files, and a literal list that
    size is serialized into every task (VERDICT r5)."""
    from pdf_etl_engine_spark.sources import writers

    df = spark.createDataFrame(
        [("t1", "f1", float(i)) for i in range(20)],
        "tenant_id string, folder_id string, amount double",
    )
    path = str(tmp_path / "cow_plan")
    writers.append_rows(df.repartition(4), path)
    cur = writers.read_fact_table(spark, path).withColumn(
        "_src_file", F.input_file_name()
    )
    hit_files = (
        cur.filter(F.col("amount") >= 10.0)
        .groupBy("_src_file")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    surv = writers._cow_survivors(cur, hit_files.select("_src_file"))
    p = plan_of(surv)
    assert "BroadcastHashJoin" in p and "LeftSemi" in p, p[:600]
    # no literal file-list predicate anywhere in the plan
    assert "_src_file IN " not in p and "INSET" not in p, p[:600]
    # end-to-end: the semi-join path deletes correctly
    n = writers.delete_rows(spark, path, "amount >= 10.0")
    assert n == 10
    left = writers.read_fact_table(spark, path)
    assert left.count() == 10 and left.agg(F.max("amount")).first()[0] == 9.0


def test_x25_pack_single_hash_shuffle(spark):
    """x25: the pack-stream window's hashpartitioning(source) is the
    ONLY row shuffle — the per-source aggregate reuses the window's
    partitioning (no second full shuffle), and there is no join."""
    p = plan_of(registry.QUERIES["x25_sequence_pack"](spark, SF_DIR))
    assert p.count("Exchange hashpartitioning") == 1, p[:400]
    assert "Join" not in p


def test_x26_blocklist_has_no_join(spark):
    """x26: the subdomain match is a map-side suffix-chain
    arrays_overlap against the constant blocklist — NO join (a
    LIKE-join would be a nested loop at corpus scale); the only
    shuffles are the two-phase countDistinct aggregate."""
    p = plan_of(registry.QUERIES["x26_url_blocklist"](spark, SF_DIR))
    assert "Join" not in p
    assert p.count("Exchange hashpartitioning") <= 2, p[:400]


def test_x27_surprisal_join_is_hash_not_loop(spark):
    """x27: the score join back on the trigram key must be a hash
    join (broadcast or shuffled — AQE's call by model size), never a
    nested loop; model building adds exactly one row-shuffle."""
    p = plan_of(registry.QUERIES["x27_ngram_surprisal"](spark, SF_DIR))
    assert "NestedLoop" not in p
    assert ("BroadcastHashJoin" in p) or ("SortMergeJoin" in p) or (
        "ShuffledHashJoin" in p
    )


def test_gopher_rules_no_quadratic_mode_and_doc_local_shuffles(spark):
    """X36: the top-bigram mode must ride the explode + groupBy path
    (the O(distinct × grams) array-fold variant measured 13× slower
    than DuckDB at sf0.1) and the join back to the map-only metrics
    must be an equi-join, never a cartesian."""
    p = plan_of(registry.QUERIES["x36_gopher_rules"](spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Generate explode" in p  # the gram explode is present
    # the per-doc mode is an aggregate, not a per-row array filter scan
    assert "max(c" in p or "max(" in p


def test_embedding_outliers_broadcasts_tiny_sides(spark):
    """X37: centroids (labels rows) and label stats must broadcast —
    the corpus-sized side never shuffles for either join."""
    p = plan_of(registry.QUERIES["x37_embedding_outliers"](spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert p.count("BroadcastHashJoin") >= 2, p[:1500]
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p


def test_dataset_card_single_pass(spark):
    """X38: one aggregation over one scan — the card must not re-scan
    the corpus per metric."""
    df = registry.QUERIES["x38_dataset_card"](spark, SF_DIR)
    p = plan_of(df)
    assert "Join" not in p
    from tests.test_profiling import _leaf_scans

    assert _leaf_scans(p) == 1


def test_pagerank_iterations_are_equi_joins(spark):
    """X39: every iteration must be an equi-join + partial aggregate —
    no cartesian/nested-loop anywhere in the 3-iteration plan."""
    p = plan_of(registry.QUERIES["x39_link_pagerank"](spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "partial_sum" in p  # contributions combine map-side


def test_graded_near_dup_is_lsh_equi_not_quadratic(spark):
    """X4i (r7, the GRADED near-dup representative) and x4j (r10, the
    production k=10 parameterization the sf1 sweep substitutes): pair
    generation must ride the (table, bucket) equi-join shuffle key —
    never the O(n²) BroadcastNestedLoop the exact x4c baseline
    deliberately plans as. x4i keeps everything codegen-side; x4j's
    bucket/rescore kernels are Arrow-vectorized BY DESIGN (see its
    docstring) but its candidate join must still be key-driven and
    its ID-only candidate rows must never carry the vector payload."""
    for name in ("x4i_lsh_near_dup_arith", "x4j_lsh_near_dup_k10"):
        p = plan_of(registry.QUERIES[name](spark, SF_DIR))
        assert "BroadcastNestedLoopJoin" not in p, name
        assert "CartesianProduct" not in p, name
        assert "Join" in p, name
    p = plan_of(
        registry.QUERIES["x4i_lsh_near_dup_arith"](spark, SF_DIR)
    )
    assert "Python" not in p  # x4i: planes + cosine codegen-side
    p = plan_of(registry.QUERIES["x4j_lsh_near_dup_k10"](spark, SF_DIR))
    # x4j: Arrow kernels present (vectorized batches, not row UDFs)...
    assert "ArrowEvalPython" in p or "MapInPandas" in p
    assert "BatchEvalPython" not in p  # ...never row-at-a-time Python


def test_colocated_near_dup_is_fused_group_kernel(spark):
    """x4j2 (VERDICT r10 #2): the co-located near-dup must plan as
    ONE group-kernel over the (table, bucket) exchange — no join at
    all (candidate generation IS the grouping), no broadcast of the
    vector relation (removing the full-corpus-in-one-process matrix
    is the point of the variant), nothing nested-loop, and only
    corpus×L-bounded rows ever carry the vector payload through an
    exchange. Construction must also stay pure plan-building: no
    driver materialization of the vectors (the matrix path's old
    eager toPandas), which the no-job probe asserts directly."""
    sc = spark.sparkContext
    load_table(spark, SF_DIR, "embeddings")  # cache fill is legitimate
    group = "build-probe-x4j2"
    sc.setJobGroup(group, "plan construction probe")
    try:
        df = registry.QUERIES["x4j2_lsh_near_dup_colocated"](spark, SF_DIR)
    finally:
        sc.setJobGroup(None, None)
    assert not sc.statusTracker().getJobIdsForGroup(group)
    p = plan_of(df)
    assert "FlatMapGroupsInPandas" in p  # the fused bucket kernel
    assert "Join" not in p  # pair generation never materializes a join
    assert "BroadcastExchange" not in p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p  # never row-at-a-time Python


def test_colocated_rescore_primitive_never_broadcasts_vectors(spark):
    """colocated_rescore (the generic pair-rescore primitive x4j2's
    docstring contrasts, used standalone and via BucketedVectorStore):
    the vector payload must arrive through co-partitioned SHUFFLE_HASH
    joins — never a broadcast of the embeddings relation, never a
    nested loop — and the cosine must run in an Arrow-native kernel."""
    from pdf_etl_engine_spark.operators.extensions import (
        colocated_rescore,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    cand = spark.range(0, 100).select(
        F.col("id").alias("vec_a"), (F.col("id") + 7).alias("vec_b")
    )
    p = plan_of(colocated_rescore(cand, emb))
    assert p.count("ShuffledHashJoin") >= 2  # both vector joins
    assert "MapInArrow" in p
    assert "BroadcastExchange" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


@pytest.mark.slow
def test_bucketed_vector_store_probe_exchange_free(spark, sf_dir):
    """BucketedVectorStore (the x22 pattern on vectors): the store
    side of both rescore joins must read straight from its buckets —
    zero Exchange on the vector side, the only shuffles left are the
    pair relation's — and the rescored output must hash-match the
    per-process-matrix path (x4j vs x4j2 parity is separately graded
    by the shared oracle)."""
    import uuid

    from pdf_etl_engine_spark.operators.extensions import (
        BucketedVectorStore,
    )

    name = f"vec_store_{uuid.uuid4().hex[:8]}"
    prior = {
        k: spark.conf.get(k)
        for k in ("spark.sql.adaptive.enabled",
                  "spark.sql.autoBroadcastJoinThreshold")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    store = BucketedVectorStore(spark, name, n_buckets=4)
    try:
        emb = load_table(spark, sf_dir, "embeddings")
        store.create(emb)
        # exchange-free candidate input so every Exchange in the plan
        # is attributable to the rescore itself (missing ids drop out
        # of the inner joins — harmless)
        cand = spark.range(0, 200).select(
            F.col("id").alias("vec_a"),
            (F.col("id") + 7).alias("vec_b"),
        )
        out = store.rescore(cand)
        fmt = out._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        # both vector probes read straight from their buckets...
        assert fmt.count("Bucketed: true") == 2, fmt
        # ...and the ONLY exchanges in the whole rescore are the pair
        # side's (repartition(vec_a) feeding dedup + join #1, then the
        # vec_b-side pair exchange) — zero on the vector/store side
        tree = fmt.split("\n\n")[0]
        n_exchange = sum(
            1 for l in tree.splitlines() if "Exchange" in l
        )
        assert n_exchange == 2, tree

        # value parity with the matrix-path kernel on the same pairs
        from pdf_etl_engine_spark.operators.extensions import (
            _pair_cosine_kernel,
            _vector_matrix,
        )

        matrix_out = cand.dropDuplicates(["vec_a", "vec_b"]).mapInPandas(
            _pair_cosine_kernel(_vector_matrix(sf_dir)),
            "vec_a bigint, vec_b bigint, cos_raw double",
        )
        a = {(r.vec_a, r.vec_b): r.cos_raw for r in out.collect()}
        b = {(r.vec_a, r.vec_b): r.cos_raw for r in matrix_out.collect()}
        assert a == b  # bit-exact, not approx: same fold order
    finally:
        for k, v in prior.items():
            spark.conf.set(k, v)
        spark.sql(f"DROP TABLE IF EXISTS {store.table}")


def test_interval_join_is_bucketed_equi_not_bnlj(spark):
    """J9: the interval-overlap join must ride the hour-bucket
    blocking — a plain hash equi-join, never the O(A×B) nested loop
    the naive theta join plans as."""
    p = plan_of(registry.QUERIES["j9_interval_bucket_join"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "Join" in p


def test_pii_redact_is_map_only(spark):
    """x44: regex count + replace must stay inside a single map-side
    projection — no keyed shuffle, no Python, no join. (The catalog's
    round-robin input repartition of the tiny test tables is not a
    keyed exchange and is allowed.) At 100 TB this is the difference
    between a pass-through scan and a cluster-wide reshuffle of the
    corpus."""
    p = plan_of(registry.QUERIES["x44_pii_redact"](spark, SF_DIR))
    assert "Exchange hashpartitioning" not in p, p[:1200]
    assert "Exchange rangepartitioning" not in p, p[:1200]
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Join" not in p, p[:1200]


def test_semdedup_codebook_broadcasts_and_prune_is_fused(spark):
    """x45: the centroid codebook rides a broadcast into the
    assignment pass (its 8-row cross join is a deliberate
    BroadcastNestedLoopJoin — bounded by codebook size, the x4h
    shape), and since r11 the in-cluster prune is the FUSED
    per-centroid group kernel (the x4j2 discipline): one
    FlatMapGroupsInPandas over the centroid_id exchange, no candidate
    pair relation ever materializes, and certainly no
    CartesianProduct between corpus-sized relations."""
    p = plan_of(registry.QUERIES["x45_semdedup"](spark, SF_DIR))
    assert "CartesianProduct" not in p, p[:1500]
    assert "BroadcastExchange" in p, p[:1500]
    assert "FlatMapGroupsInPandas" in p, p[:1500]


def test_sql_text_q3_broadcasts_and_take_orders(spark):
    """sql1: the ANSI-SQL-text surface must plan exactly like the
    hand-built joins — the filtered customer dim broadcasts into the
    orders/lineitem join and the top-10 is TakeOrderedAndProject
    (per-partition heaps), never a global Sort. Also pins that the
    exact-DECIMAL cents arithmetic (the r7 rounding fix) stays wholly
    JVM-side — no Python in the plan."""
    p = plan_of(registry.QUERIES["sql1_tpch_q3_text"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p, p[:1500]
    assert "TakeOrderedAndProject" in p, p[:1500]
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_semdedup_hot_cluster_splits_under_aqe(spark):
    """The JOIN-BASED in-cluster prune (x45's r10 shape, still the
    right variant when cluster blocks exceed one task's memory — the
    r11 fused group kernel trades that for zero pair
    materialization): "a hot cluster splits under AQE" (VERDICT
    r7 #5), measured here on a skewed-cluster fixture where cluster 0
    holds ~50% of all vectors. With the skew thresholds scaled to
    fixture size (the 256 MB production default, scaled so the
    sub-MB hot partition qualifies), AQE must mark the pairs
    self-join SortMergeJoin(skew=true) and split both skewed sides
    (AQEShuffleRead skewed) — turning the one-task hot cluster into
    parallel mapper-range sub-joins. tools/semdedup_skew_bench.py
    records the wall-clock effect at two sizes.

    Two conditions make the split legal, both true of this shape:
    the join is Inner (both skewed sides splittable) and the
    downstream `distinct(vec_id)` re-shuffles on a different key, so
    splitting destroys no reusable output partitioning. (A downstream
    groupBy(centroid_id) WOULD suppress the split to save its
    shuffle — that variant needs forceOptimizeSkewedJoin;
    documented.)"""
    n = 40_000
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.when(F.pmod(F.xxhash64("id"), F.lit(100)) < 50, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id", F.lit(7)), F.lit(31)) + 1)
            .alias("centroid_id"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        .repartition(32)
        .localCheckpoint()
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        a, b = df.alias("a"), df.alias("b")
        j = (
            a.join(
                b,
                (F.col("a.centroid_id") == F.col("b.centroid_id"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .select(F.col("b.vec_id").alias("vec_id"))
            .distinct()
        )
        n_removed = len(j.collect())  # AQE finalizes THIS df's plan
        p = plan_of(j)
        assert "(skew=true)" in p, p[:2000]
        # reads print "skewed" or "coalesced and skewed" depending on
        # whether the coalescing rule also touched the stage
        assert "and skewed" in p or "AQEShuffleRead skewed" in p, p[:2000]
        # every vector except cluster minima has a lower-id cluster-mate
        n_clusters = df.select("centroid_id").distinct().count()
        assert n_removed == n - n_clusters
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_substring_span_dedup_plan(spark):
    """x46: no pair relation anywhere (the duplicate test is a window
    count on the hash key, not a self-join) — no join node at all —
    and exactly two wide exchanges: the (h1, h2) gram shuffle and the
    doc_id island shuffle (plus the catalog cache's round-robin)."""
    p = plan_of(registry.QUERIES["x46_substring_span_dedup"](spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Join" not in p
    wide = p.count("hashpartitioning")
    assert wide == 2, f"expected 2 hash exchanges, plan has {wide}"


def test_span_cut_join_reuses_partitioning(spark):
    """x46c adds only an equi-join of the span aggregate back onto
    documents — no nested loop, no cartesian; the span side's island
    exchange is the one x46 already paid."""
    p = plan_of(registry.QUERIES["x46c_span_cut"](spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    wide = p.count("hashpartitioning")
    assert wide <= 3, f"span cut grew wide exchanges: {wide}"


def test_pq_encode_is_map_only(spark):
    """x47/x47c encode: the fixed-codebook path must be pure map-side
    (no exchange but the catalog cache's); and neither PQ path may
    fall out of codegen into interpreted projection — the unrolled
    1024-term form overflowed the 64KB JVM method limit (caught at
    the sf1 anchor as a 6.8x slowdown); the loop form keeps the
    expression tree constant-size (higher-order functions are
    CodegenFallback by design — the same trade every F.aggregate
    kernel in this codebase makes — but a SMALL interpreted
    expression, not a 2000-node one)."""
    df = registry.QUERIES["x47_pq_encode"](spark, SF_DIR)
    df.collect()
    p = plan_of(df)
    assert "hashpartitioning" not in p
    assert "Join" not in p
    # the codebook must appear as ONE array literal, not 1024
    # unrolled CreateArray children (the 64KB-overflow failure mode)
    assert "element_at([31,61,-13" in p.replace(" ", "")[:20000] or \
        "element_at([31, 61, -13" in p[:20000], p[:300]


def test_pq_adc_broadcasts_queries_and_limits_partially(spark):
    """x47b: the query side must broadcast (never shuffle the code
    scan for the pairing) and the per-query top-5 must push a
    partial WindowGroupLimit below the exchange."""
    p = plan_of(registry.QUERIES["x47b_pq_adc_topk"](spark, SF_DIR))
    assert "BroadcastExchange" in p
    assert "WindowGroupLimit" in p
    assert "CartesianProduct" not in p


def test_trained_pq_codebook_broadcasts(spark):
    """x47c: assignment joins against the trained codebook must
    broadcast the (≤128-row) codebook, never sort-merge the corpus
    against it."""
    p = plan_of(
        registry.QUERIES["x47c_pq_encode_trained"](spark, SF_DIR)
    )
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_ivfpq_probe_joins_on_cell(spark):
    """x47d: the ADC scan must reach codes via an EQUI-join on the
    cell key with the per-(query, cell) LUT side broadcast — never a
    cartesian between corpus-sized relations — and the per-query
    top-5 must partial-limit below its exchange."""
    p = plan_of(registry.QUERIES["x47d_ivfpq_topk"](spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert "BroadcastExchange" in p
    assert "WindowGroupLimit" in p


def test_heavy_hitter_candidate_join_broadcasts(spark):
    """x48: the Misra–Gries candidate set (≤ cap×partitions rows)
    must broadcast for the exact pass — the token stream never
    shuffles for the membership join — and the final top-k is
    per-partition heaps, not a global sort."""
    p = plan_of(registry.QUERIES["x48_heavy_hitters"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "TakeOrderedAndProject" in p


def test_perceptron_margin_pass_has_no_model_join(spark):
    """x49b (the scoring shape x49 iterates): the 33-weight model
    must enter the plan as a LITERAL array — no join, no broadcast
    relation, no Python — so each training iteration is exactly one
    doc-keyed aggregation over the feature matrix."""
    from pdf_etl_engine_spark.operators.training import (
        _margins,
        perceptron_features,
    )

    docs = load_table(spark, SF_DIR, "documents")
    p = plan_of(_margins(perceptron_features(docs), [1] * 33))
    assert "Join" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_dsir_model_side_broadcasts(spark):
    """x50: the 64-row log-ratio model must broadcast; the corpus
    token stream must never sort-merge against it."""
    p = plan_of(registry.QUERIES["x50_dsir_importance"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
