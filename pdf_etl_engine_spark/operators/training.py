"""Distributed model-training and sketching operators (SURVEY.md
§2.11 extension surface, third wave): bounded-memory frequent-items
(heavy hitters), supervised classifier training (the CCNet/fastText
quality-filter recipe in its deterministic integer form), and
distribution-matching data selection (DSIR importance weights).

Why these belong in a 100 TB pretraining-data engine: the reference's
curation story ends at regex heuristics (main.py:563-571), but every
production pipeline also (a) profiles the corpus's token head — at a
vocabulary that does NOT fit one hash table, which is what the
Misra–Gries two-pass bounds; (b) trains a quality classifier on
labeled exemplars and scores the corpus with it (CCNet trains
fastText on Wikipedia-vs-CommonCrawl); (c) re-weights the corpus
toward a target domain (DSIR, Xie et al. 2023: hashed-n-gram
importance weights between raw and target distributions).

Design rules shared with the rest of the package:

* Integer arithmetic wherever the semantics allow (perceptron weights,
  feature hashes, counts) so both engines are bit-identical by
  construction; the one float surface (DSIR's log-ratios) goes through
  the x27 fixed-point discipline — round each log to 1e-6 BEFORE any
  order-dependent sum, accumulate as BIGINT.
* Model state that fits the driver (a 33-weight perceptron, a 64-row
  log-ratio table) is collected per iteration — same bounded-metadata
  rule as x32b's BPE argmax and x45b's Lloyd steps; everything
  corpus-sized stays distributed.
* No O(n²): heavy-hitter candidates bound the exact-pass hash table,
  classifier iterations are K groupBy-sums, DSIR is two corpus scans
  plus a 64-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pdf_etl_engine_spark.catalog import load_table
from pdf_etl_engine_spark.functions.stable import stable_round
from pdf_etl_engine_spark.registry import query

# Word-hash family: Karp-Rabin fold over code points mod a Mersenne
# prime, then mod the feature dimension — the x46 span-hash contract
# at word granularity, so DuckDB recomputes the identical bucket with
# list_reduce. Base 31 / seed 7 keeps it distinct from the span grams'
# (131, 7) / (137, 11) pairs.
_HASH_M = 2_147_483_647
_HASH_B = 31
_HASH_SEED = 7


def _word_bucket(w: Column, dim: int) -> Column:
    """Hash one whitespace token into [0, dim) — identical on both
    engines (integer fold, no engine hash builtin)."""
    codes = F.transform(
        F.sequence(F.lit(1), F.length(w)),
        lambda i: F.ascii(w.substr(i, F.lit(1))).cast("long"),
    )
    h = F.aggregate(
        codes,
        F.lit(_HASH_SEED).cast("long"),
        lambda a, c: (a * _HASH_B + c) % _HASH_M,
    )
    return (h % dim).cast("int")


def _word_bucket_sql(expr: str, dim: int) -> str:
    """DuckDB twin of _word_bucket over a VARCHAR expression."""
    return (
        f"CAST(list_reduce([CAST({_HASH_SEED} AS BIGINT)] || "
        f"list_transform(range(1, len({expr}) + 1), "
        f"i -> CAST(ascii(substr({expr}, CAST(i AS INTEGER), 1)) AS BIGINT)), "
        f"(a, c) -> (a * {_HASH_B} + c) % {_HASH_M}) % {dim} AS INTEGER)"
    )


_TOKS_SQL = "list_filter(string_split(text, ' '), w -> w <> '')"


def _words() -> Column:
    """Non-empty whitespace tokens (the curation.py contract)."""
    return F.filter(F.split(F.col("text"), " "), lambda w: w != "")


# ---------------------------------------------------------------------------
# X48 — heavy hitters: exact top-k frequent tokens via a bounded-memory
# Misra–Gries candidate pass
# ---------------------------------------------------------------------------

_HH_K = 25
_HH_CAP = 4096


def mg_candidates(tokens: DataFrame, cap: int = _HH_CAP) -> DataFrame:
    """Pass 1 of the heavy-hitters two-pass: per-PARTITION Misra–Gries
    summaries of at most ``cap`` tokens each, streamed batch-by-batch
    through one Arrow kernel (state lives across the partition's
    batches, so the summary sees the whole partition, not one batch).

    Guarantee (the reason this is exact, not approximate, when used as
    a candidate filter): within a partition of n_p tokens, Misra–Gries
    with capacity C retains every token whose partition count exceeds
    n_p/(C+1) — each eviction round removes C+1 total mass, so a token
    can be fully evicted only if its count is at most (evicted mass)/
    (C+1) ≤ n_p/(C+1). Summing over partitions: any token ABSENT from
    every summary has global count ≤ N/(C+1). Therefore if the true
    k-th count exceeds N/(C+1) — checkable after the exact pass — the
    candidate union provably contains the true top-k.

    Batch merge is the Apache DataSketches frequent-items shape:
    pre-aggregate the Arrow batch with C++-side
    ``pyarrow.compute.value_counts`` (hash aggregation on the raw
    Arrow buffers — no pandas conversion, no np.unique string sort),
    add into the running dict, and when the dict exceeds ``cap``
    subtract the (size-cap)-th smallest count from everything and drop
    the non-positive — one vectorized eviction per overflow instead of
    per-item decrements.

    Scale: the summary is ≤ cap rows PER PARTITION regardless of
    vocabulary size — this is the operator you reach for when the
    vocabulary (URLs, n-grams, user-ids) would blow the hash-aggregate
    that a plain groupBy needs. Output rows: ≤ cap × n_partitions.

    Output schema ``(token, np)``: candidate rows carry token with
    np NULL; ONE marker row per partition carries token NULL with
    np = the partition's total token count — so pass 2 can certify
    exactness (k-th count vs N/(cap+1)) without a third corpus scan.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def mg(batches):
        counts: dict[str, int] = {}
        n_part = 0
        for batch in batches:
            n_part += batch.num_rows
            vc = pc.value_counts(batch.column("token"))
            counts = mg_merge(
                counts,
                zip(
                    vc.field("values").to_pylist(),
                    vc.field("counts").to_pylist(),
                ),
                cap,
            )
        toks = list(counts.keys())
        yield pa.RecordBatch.from_pydict(
            {
                "token": pa.array(toks + [None], pa.string()),
                "np": pa.array([None] * len(toks) + [n_part], pa.int64()),
            }
        )

    return tokens.mapInArrow(mg, "token string, np long")


def mg_merge(counts: dict, batch_counts, cap: int) -> dict:
    """Merge pre-aggregated (key, count) pairs into a Misra–Gries
    summary of capacity ``cap``. Pure function (property-tested in
    tests/test_training_ops.py): on overflow, subtract the
    (size−cap)-th smallest count from every key and drop the
    non-positive — each such eviction subtracts its decrement from
    MORE than cap keys, so the cumulative decrement D satisfies
    D·(cap+1) ≤ total inserted mass, giving the absence bound
    true_count(absent key) ≤ D ≤ n/(cap+1). The input dict is never
    mutated (copied up front), so a caller retaining the pre-merge
    summary — e.g. streaming-state retry paths — stays intact."""
    import numpy as np

    counts = dict(counts)
    for t, c in batch_counts:
        counts[t] = counts.get(t, 0) + c
    if len(counts) > cap:
        vals = np.fromiter(counts.values(), dtype=np.int64)
        m = int(
            np.partition(vals, len(counts) - cap - 1)[
                len(counts) - cap - 1
            ]
        )
        counts = {t: c - m for t, c in counts.items() if c - m > 0}
    return counts


@query(
    "x48_heavy_hitters",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({_TOKS_SQL}) AS token FROM documents
    ),
    tot AS (SELECT count(*) AS n_total FROM toks)
    SELECT token, CAST(count(*) AS BIGINT) AS cnt,
           count(*) * {_HH_CAP + 1} > (SELECT n_total FROM tot)
             AS mg_exact
    FROM toks GROUP BY token
    ORDER BY cnt DESC, token LIMIT {_HH_K}
    """,
)
def x48_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X48: exact top-25 most frequent tokens, computed with a
    bounded-memory two-pass instead of an unbounded hash aggregate.

    Pass 1 (map-only): per-partition Misra–Gries summaries — at most
    4096 candidate tokens per partition, whatever the vocabulary.
    Pass 2: exact counts restricted to the broadcast candidate set
    (the groupBy hash table is ≤ |candidates| keys by construction),
    then top-k with a deterministic (cnt DESC, token) tie-break.

    The oracle is the PLAIN exact top-k — the two-pass must reproduce
    it bit-for-bit, which it provably does whenever the k-th count
    exceeds N/(cap+1) (see mg_candidates; tests/test_training_ops.py
    pins that margin on the testdata and pins an adversarial eviction
    case where cap is tiny and the guarantee still holds). The
    precondition is also CERTIFIED IN THE RESULT: ``mg_exact`` is
    cnt·(cap+1) > N per row — if the k-th (smallest) returned row is
    true, the whole top-k is provably exact; a false row means that
    rank is only heavy-hitter-approximate. N comes from the pass-1
    partition markers, not a third corpus scan, and the oracle
    recomputes the identical certificate.

    Scale shape: a plain groupBy on a 100 TB URL/n-gram column builds
    a hash aggregate proportional to the DISTINCT count — spill city.
    Here the only full-vocabulary structure is the per-partition
    4096-entry dict inside the Arrow kernel; the shuffle carries
    candidate tokens only (≤ cap × partitions rows for pass 1's
    distinct, then counts for ≤ that many keys in pass 2, map-side
    partial aggregation doing the heavy lifting). The broadcast side
    is its own subplan, executed exactly once — the candidate pass
    does not re-run inside the probe side, so this is a literal two
    passes over the data.

    Honest cost note (sf1, trivial ~50-token vocabulary): 1.2 s vs
    0.4 s for the plain single-pass groupBy the oracle runs — the
    bounded-memory construction pays one extra corpus scan + the
    kernel, and only wins when the distinct count is too large for a
    hash aggregate (URLs/n-grams), which the testdata cannot show."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(F.explode(_words()).alias("token"))
    # lazy localCheckpoint: pass 1 has two consumers (candidates +
    # the N certificate) — materializing its ≤(cap+1)×partitions rows
    # keeps the corpus scan count at exactly two (ann_index precedent)
    pass1 = mg_candidates(tokens).localCheckpoint(eager=False)
    cand = pass1.filter(F.col("token").isNotNull()).select("token").distinct()
    total = pass1.agg(F.sum("np").alias("n_total"))
    exact = (
        tokens.join(F.broadcast(cand), "token")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .join(F.broadcast(total))
    )
    res = exact.select(
        "token",
        "cnt",
        (F.col("cnt") * (_HH_CAP + 1) > F.col("n_total")).alias("mg_exact"),
    ).orderBy(F.desc("cnt"), "token").limit(_HH_K)
    # execution-time certificate: if ANY returned rank fails
    # cnt·(cap+1) > N, the two-pass result is only
    # heavy-hitter-approximate and would diverge from the plain-top-k
    # oracle in whole rows — fail loudly with the diagnosis instead
    # of surfacing as an opaque parity mismatch. The check is a
    # single-partition window over the ≤k already-limited rows (cost
    # is nil; tests/test_training_ops.py pins both directions).
    res = res.withColumn(
        "_all_exact",
        F.min(F.col("mg_exact").cast("int")).over(Window.partitionBy()),
    )
    cert = F.when(F.col("_all_exact") == 1, F.lit(True)).otherwise(
        F.raise_error(
            F.lit(
                "x48_heavy_hitters: Misra-Gries exactness margin violated "
                "(some returned rank has cnt*(cap+1) <= N) - the corpus "
                "vocabulary is too flat for cap=%d; raise the cap or "
                "accept approximate heavy hitters" % _HH_CAP
            )
        )
    )
    return res.where(cert).select("token", "cnt", "mg_exact")


# ---------------------------------------------------------------------------
# X49 — supervised quality-classifier training: averaged-gradient
# perceptron over hashed bag-of-words features, integer-exact
# ---------------------------------------------------------------------------

_PC_DIM = 32  # hashed feature buckets; bucket _PC_DIM is the bias
_PC_ITERS = 3


def perceptron_features(docs: DataFrame, dim: int = _PC_DIM) -> DataFrame:
    """(doc_id, y, b, x): hashed bag-of-words counts plus a bias
    feature (b=dim, x=1) for every doc; y = +1 for lang='en' (the
    CCNet-style "target domain" exemplar label), −1 otherwise."""
    y = F.when(F.col("lang") == "en", 1).otherwise(-1).alias("y")
    words = docs.select("doc_id", y, F.explode(_words()).alias("w"))
    feat = (
        words.groupBy("doc_id", "y", _word_bucket(F.col("w"), dim).alias("b"))
        .agg(F.count("*").alias("x"))
    )
    bias = docs.select(
        "doc_id", y, F.lit(dim).cast("int").alias("b"),
        F.lit(1).cast("long").alias("x"),
    )
    return feat.unionByName(bias)


# Shared 3-iteration-unrolled training CTE: feature matrix -> w1/w2/w3
# weight relations -> mf margins under the final weights. Both x49
# (weights out) and x49b (per-doc scores out) grade the SAME training.
_PC_CTE = f"""
    WITH ws AS (
      SELECT doc_id,
             CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
             {_TOKS_SQL} AS toks
      FROM documents
    ),
    tok AS (SELECT doc_id, y, unnest(toks) AS w FROM ws),
    feat AS (
      SELECT doc_id, y, {_word_bucket_sql('w', _PC_DIM)} AS b,
             count(*) AS x
      FROM tok GROUP BY doc_id, y, b
      UNION ALL
      SELECT doc_id, y, {_PC_DIM}, 1 FROM ws
    ),
    dims AS (
      SELECT CAST(unnest(range(0, {_PC_DIM + 1})) AS INTEGER) AS b
    ),
    g1 AS (SELECT b, sum(y * x) AS d FROM feat GROUP BY b),
    w1 AS (
      SELECT dims.b, CAST(coalesce(g1.d, 0) AS BIGINT) AS wt
      FROM dims LEFT JOIN g1 ON dims.b = g1.b
    ),
    m2 AS (
      SELECT f.doc_id, f.y, sum(w1.wt * f.x) AS s
      FROM feat f JOIN w1 ON f.b = w1.b GROUP BY f.doc_id, f.y
    ),
    g2 AS (
      SELECT b, sum(y * x) AS d FROM feat
      WHERE doc_id IN (SELECT doc_id FROM m2 WHERE y * s <= 0)
      GROUP BY b
    ),
    w2 AS (
      SELECT w1.b, w1.wt + coalesce(g2.d, 0) AS wt
      FROM w1 LEFT JOIN g2 ON w1.b = g2.b
    ),
    m3 AS (
      SELECT f.doc_id, f.y, sum(w2.wt * f.x) AS s
      FROM feat f JOIN w2 ON f.b = w2.b GROUP BY f.doc_id, f.y
    ),
    g3 AS (
      SELECT b, sum(y * x) AS d FROM feat
      WHERE doc_id IN (SELECT doc_id FROM m3 WHERE y * s <= 0)
      GROUP BY b
    ),
    w3 AS (
      SELECT w2.b, w2.wt + coalesce(g3.d, 0) AS wt
      FROM w2 LEFT JOIN g3 ON w2.b = g3.b
    ),
    mf AS (
      SELECT f.doc_id, f.y, sum(w3.wt * f.x) AS s
      FROM feat f JOIN w3 ON f.b = w3.b GROUP BY f.doc_id, f.y
    )
"""


@query(
    "x49_quality_perceptron",
    oracle=_PC_CTE
    + """
    SELECT w3.b AS feature_id, w3.wt AS weight,
           (SELECT CAST(count(*) AS BIGINT) FROM mf WHERE y * s <= 0)
             AS n_misclassified
    FROM w3 ORDER BY feature_id
    """,
)
def x49_quality_perceptron(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X49: a quality classifier TRAINED distributed — the CCNet /
    fastText pretraining-filter recipe (train a linear model on
    target-domain exemplars, score the crawl with it) in its
    deterministic form: a full-batch perceptron over hashed
    bag-of-words counts, integer weights, 3 synchronous iterations.

    Each iteration is two shuffles, both corpus-bounded-small:
    margins = one groupBy(doc_id) over the cached feature matrix with
    the 33 current weights joined in as a broadcast literal; gradient
    = one groupBy(b) sum of y·x over the misclassified docs (≤ 33
    rows out). The model (33 ints) is collected per iteration — the
    x32b/x45b bounded-metadata rule; the feature matrix itself never
    leaves the executors and is built ONCE (persisted across
    iterations; at 100 TB it would be a materialized table).

    Everything is int64 arithmetic, so the unrolled-SQL oracle —
    including both trainings' intermediate weight vectors — matches
    bit-for-bit; y·margin ≤ 0 is an exact integer predicate with no
    float boundary. Output: the trained weight per feature bucket
    (bias = bucket 32) plus the final misclassification count.

    Reference anchor: the reference delegates document understanding
    to an external LLM (main.py:413-512, analyze-master); this is the
    self-contained statistical counterpart a 100 TB pipeline trains
    in-cluster."""
    docs = load_table(spark, sf_dir, "documents")
    feat = perceptron_features(docs).persist()
    try:
        w = train_perceptron(feat)
        misses = _margins(feat, w).filter(
            F.col("y") * F.col("s") <= 0
        ).count()
        out = spark.createDataFrame(
            [(b, int(w[b]), int(misses)) for b in range(len(w))],
            "feature_id int, weight long, n_misclassified long",
        )
        return out.orderBy("feature_id")
    finally:
        feat.unpersist()


def _margins(feat: DataFrame, w: list[int]) -> DataFrame:
    """Per-doc integer margin Σ w_b·x_b under the given weights; the
    33-element model enters the plan as a literal array — broadcast by
    construction, no join."""
    warr = F.array(*[F.lit(int(v)).cast("long") for v in w])
    return (
        feat.withColumn(
            "ws", F.element_at(warr, F.col("b") + 1) * F.col("x")
        )
        .groupBy("doc_id", "y")
        .agg(F.sum("ws").alias("s"))
    )


def train_perceptron(
    feat: DataFrame, iters: int = _PC_ITERS, dim: int = _PC_DIM
) -> list[int]:
    """Run the synchronous full-batch perceptron loop over a persisted
    feature matrix; returns the (dim+1)-element integer weight vector.
    Each iteration collects only the ≤ dim+1 gradient rows (the
    bounded-metadata rule)."""
    w = [0] * (dim + 1)
    for _ in range(iters):
        miscl = _margins(feat, w).filter(F.col("y") * F.col("s") <= 0)
        grad = (
            feat.join(miscl.select("doc_id"), "doc_id")
            .groupBy("b")
            .agg(F.sum(F.col("y") * F.col("x")).alias("d"))
            .collect()  # ≤ dim+1 rows — bounded model state
        )
        for row in grad:
            w[row["b"]] += row["d"]
    return w


@query(
    "x49b_perceptron_filter",
    oracle=_PC_CTE
    + """
    SELECT doc_id, CAST(s AS BIGINT) AS score, s > 0 AS keep
    FROM mf
    """,
)
def x49b_perceptron_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X49b: the APPLY half of the CCNet recipe — train the x49
    perceptron, then score every document with the learned weights and
    flag the keeps (score > 0 ⇒ predicted target-domain). This is the
    end-to-end shape a pipeline runs: one training job over labeled
    exemplars, one map-side scoring pass over the full corpus.

    Training iterates over a persisted feature matrix; the RETURNED
    scoring DataFrame is built over a FRESH (uncached) feature scan —
    the training cache is released before return, and at 100 TB you
    would not cache the corpus-wide matrix anyway: scoring is one
    scan + one doc-keyed aggregation with the constant-size model as
    a broadcast literal (doc_id is the write order, so AQE coalesces
    the exchange). Training determinism as in x49, so the
    unrolled-SQL oracle reproduces every per-doc integer score."""
    docs = load_table(spark, sf_dir, "documents")
    feat = perceptron_features(docs).persist()
    try:
        w = train_perceptron(feat)
    finally:
        feat.unpersist()
    return _margins(perceptron_features(docs), w).select(
        "doc_id",
        F.col("s").alias("score"),
        (F.col("s") > 0).alias("keep"),
    )


# ---------------------------------------------------------------------------
# X50 — DSIR: distribution-matching importance weights
# ---------------------------------------------------------------------------

_DSIR_DIM = 64


@query(
    "x50_dsir_importance",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest({_TOKS_SQL}) AS w FROM documents
    ),
    b AS (
      SELECT doc_id, lang, {_word_bucket_sql('w', _DSIR_DIM)} AS b
      FROM tok
    ),
    model AS (
      SELECT b,
             count(*) AS r,
             count(*) FILTER (WHERE lang = 'en') AS t
      FROM b GROUP BY b
    ),
    tot AS (SELECT sum(r) AS rn, sum(t) AS tn FROM model),
    lr AS (
      SELECT b,
             CAST(round(ln(CAST(t + 1 AS DOUBLE) / (tn + {_DSIR_DIM}))
                        * 1000000) AS BIGINT)
             - CAST(round(ln(CAST(r + 1 AS DOUBLE) / (rn + {_DSIR_DIM}))
                          * 1000000) AS BIGINT) AS lr_fp
      FROM model, tot
    ),
    scored AS (
      SELECT doc_id, b.b, count(*) AS x FROM b GROUP BY doc_id, b.b
    )
    SELECT s.doc_id,
           CAST(sum(s.x) AS BIGINT) AS n_tokens,
           round(CAST(sum(s.x * lr.lr_fp) AS DOUBLE) / 1000000
                 + 5e-10, 4) AS dsir_weight
    FROM scored s JOIN lr ON s.b = lr.b
    GROUP BY s.doc_id
    """,
)
def x50_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X50: DSIR importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling") — score every raw
    document by how much more likely its hashed-unigram bag is under
    the TARGET distribution (here the lang='en' subcorpus, standing in
    for the paper's Wikipedia/books target) than under the raw corpus
    distribution. Resampling keeps docs ∝ exp(weight); the weight is
    the deliverable (the top-fraction cut is x10/x18's job).

    dsir_weight(d) = Σ_b x_{{d,b}} · [ln p̂_target(b) − ln p̂_raw(b)]
    with add-1 smoothing over the 64 hashed buckets.

    Cross-engine float discipline (the x27 rule): each of the 64
    log-probabilities is rounded to 1e-6 and differenced as BIGINT
    fixed-point BEFORE the per-doc sum — the accumulation is integer
    and order-free, and cross-engine libm drift is confined to the 64
    pre-sum roundings, where it only matters if ln(x)·1e6 lands within
    an ulp of a .5 boundary (improbable, not impossible — the same
    guarantee x27 makes, not a stronger one); only the final display
    round is float.

    Scale shape: the heavy work — tokenize + per-character Karp-Rabin
    hashing — runs ONCE: a single per-(doc_id, lang, bucket) staging
    aggregation feeds BOTH the 64-row model and the per-doc scoring
    side. The staged relation is ≤64 ints-rows per document (~1000×
    smaller than the text it derives from), so it is
    localCheckpoint-materialized rather than recomputed per branch —
    ReuseExchange cannot unify the branches here because the cached
    table's nested adaptive plan defeats exchange canonicalization,
    and re-running the per-character fold twice costs more than
    storing the counts (measured at sf1; the opposite trade from
    x27, whose per-doc TRIGRAM relation was 10× larger and OOMed
    when stored). Scoring joins the broadcast 64-row log-ratio
    table. No shuffle carries text. At 100 TB the model table stays
    64 rows — the broadcast is constant regardless of corpus size,
    and staged is the (tiny) feature table you would materialize
    anyway."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(_words()).alias("w")
    ).withColumn("b", _word_bucket(F.col("w"), _DSIR_DIM)).drop("w")
    # one (doc_id, lang) pair per doc → (doc_id, b) already unique;
    # both consumers below hang off this single materialized aggregate
    staged = (
        tok.groupBy("doc_id", "lang", "b")
        .agg(F.count("*").alias("x"))
        .localCheckpoint(eager=False)
    )
    model = staged.groupBy("b").agg(
        F.sum("x").alias("r"),
        F.coalesce(
            F.sum(F.when(F.col("lang") == "en", F.col("x"))), F.lit(0)
        ).alias("t"),
    )
    win = Window.partitionBy()
    model = model.withColumn("rn", F.sum("r").over(win)).withColumn(
        "tn", F.sum("t").over(win)
    )

    def _lp(cnt: str, tot: str) -> Column:
        return F.round(
            F.log(
                (F.col(cnt) + 1).cast("double")
                / (F.col(tot) + _DSIR_DIM)
            )
            * 1_000_000
        ).cast("long")

    lr = model.select(
        "b", (_lp("t", "tn") - _lp("r", "rn")).alias("lr_fp")
    )
    scored = staged.select("doc_id", "b", "x")
    return (
        scored.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("x").alias("n_tokens"),
            stable_round(
                F.sum(F.col("x") * F.col("lr_fp")).cast("double")
                / 1_000_000,
                4,
            ).alias("dsir_weight"),
        )
    )


# ---------------------------------------------------------------------------
# X51 — curriculum shard assignment by global difficulty quantiles
# ---------------------------------------------------------------------------

# Shared difficulty/quartile-shard contract, used by BOTH x51 (the
# standalone operator) and x53 (stage 5 of the composed pipeline) in
# both engines — one definition, four call sites, zero drift.
_DIFF_COLS_SQL = """
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CASE WHEN len(toks) = 0 THEN 0
                  ELSE (SELECT CAST(sum(len(t.w)) * 1000 AS BIGINT)
                        FROM unnest(toks) AS t(w)) // len(toks)
             END AS difficulty_fp
"""
_SHARD_SQL_TAIL = """
    cuts AS (
      SELECT CAST(round(quantile_cont(difficulty_fp, 0.25) * 1000)
                  AS BIGINT) AS q1,
             CAST(round(quantile_cont(difficulty_fp, 0.50) * 1000)
                  AS BIGINT) AS q2,
             CAST(round(quantile_cont(difficulty_fp, 0.75) * 1000)
                  AS BIGINT) AS q3
      FROM __SRC__
    )
    SELECT doc_id, n_tokens, difficulty_fp,
           CAST(1 + CAST(difficulty_fp * 1000 > q1 AS INTEGER)
                  + CAST(difficulty_fp * 1000 > q2 AS INTEGER)
                  + CAST(difficulty_fp * 1000 > q3 AS INTEGER)
                AS INTEGER) AS shard
    FROM __SRC__, cuts
"""


def _shard_sql(src: str) -> str:
    """The quartile-cuts CTE + shard SELECT over a relation exposing
    (doc_id, n_tokens, difficulty_fp)."""
    return _SHARD_SQL_TAIL.replace("__SRC__", src)


def difficulty_cols() -> tuple[Column, Column]:
    """(n_tokens, difficulty_fp): token count and mean token length in
    1e-3 fixed point — map-only integer arithmetic, identical to
    _DIFF_COLS_SQL."""
    toks = _words()
    n_tokens = F.size(toks).cast("long")
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
    )
    # integer-exact quotient: strip the remainder first so the
    # (double) division is of an exactly-divisible pair — the result
    # is the BIGINT floor quotient by construction (operands are
    # nonnegative and < 2^53), matching the oracle's `//` exactly
    # rather than by truncation of a rounded double
    num = (sum_len * 1000).cast("long")
    difficulty = (
        F.when(n_tokens == 0, F.lit(0).cast("long"))
        .otherwise((num - num % n_tokens) / n_tokens)
        .cast("long")
    )
    return n_tokens.alias("n_tokens"), difficulty.alias("difficulty_fp")


def assign_quartile_shards(diff: DataFrame) -> DataFrame:
    """Append the quartile shard to a (doc_id, n_tokens,
    difficulty_fp) relation: one exact `percentile` aggregate
    (single-row cutoff model, broadcast) + map-only comparisons —
    the Spark twin of _shard_sql."""
    cuts = diff.agg(
        *[
            F.round(F.expr(f"percentile(difficulty_fp, {p})") * 1000)
            .cast("long")
            .alias(q)
            for q, p in (("q1", 0.25), ("q2", 0.50), ("q3", 0.75))
        ]
    )
    d1000 = F.col("difficulty_fp") * 1000
    return diff.join(F.broadcast(cuts)).select(
        "doc_id",
        "n_tokens",
        "difficulty_fp",
        (
            F.lit(1)
            + (d1000 > F.col("q1")).cast("int")
            + (d1000 > F.col("q2")).cast("int")
            + (d1000 > F.col("q3")).cast("int")
        ).cast("int").alias("shard"),
    )


@query(
    "x51_curriculum_shards",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             {_TOKS_SQL} AS toks
      FROM documents
    ),
    diff AS (
      SELECT doc_id, {_DIFF_COLS_SQL}
      FROM d
    ),
    {_shard_sql("diff")}
    """,
)
def x51_curriculum_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X51: curriculum data ordering — assign every document to one of
    four difficulty shards by GLOBAL quantiles of a per-doc difficulty
    score (here: mean token length in 1e-3 fixed point — the cheap
    deterministic stand-in for a perplexity score; swap in x27's
    surprisal for the production signal). Curriculum schedules
    (easy→hard) are a standard pretraining data-ordering lever; the
    engine-side primitive is "bin by corpus-wide quantiles without a
    global sort".

    Scale shape: difficulty is map-only integer arithmetic in
    whole-stage codegen; the three quartile cutoffs are ONE exact
    `percentile` aggregate (a single-row model — broadcast into the
    assignment pass as a constant, the x50/x45 model-broadcast
    discipline), and shard assignment is map-only comparisons — no
    global sort, no per-doc window over the corpus (contrast ntile,
    which would single-partition the world). At 100 TB you would
    swap the exact percentile for `approx_percentile` (t-digest,
    mergeable, bounded state) and accept ±ε shard boundaries; the
    exact form is kept here because the oracle must match
    bit-for-bit.

    Boundary determinism: difficulty is integer fixed-point; the
    interpolated quartiles are scaled ×1000 and rounded to BIGINT in
    BOTH engines before the strict > comparisons, so a doc sitting
    exactly on a cutoff grades identically everywhere.

    Reference anchor: the reference serves results in one global
    recency order (main.py:809); this is the corpus-ordering
    counterpart a training pipeline needs. SURVEY §2.11 (mixture /
    ordering family: x23, x33, x40)."""
    docs = load_table(spark, sf_dir, "documents")
    diff = docs.select("doc_id", *difficulty_cols())
    return assign_quartile_shards(diff)


# ---------------------------------------------------------------------------
# X53 — the curation pipeline composed end-to-end
# ---------------------------------------------------------------------------


@query(
    "x53_curation_pipeline",
    oracle=f"""
    WITH ws AS (
      SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents
    ),
    scored AS (
      SELECT doc_id, text, toks, {_DIFF_COLS_SQL}
      FROM ws
    ),
    quality AS (
      SELECT * FROM scored
      WHERE n_tokens BETWEEN 10 AND 5000
        AND difficulty_fp <= 15000
        AND doc_id % 97 <> 0
    ),
    deduped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY text ORDER BY doc_id) AS rn
        FROM quality
      ) WHERE rn = 1
    ),
    bench AS (
      SELECT DISTINCT
             array_to_string(list_slice(toks, i, i + 4), ' ') AS g
      FROM ws, UNNEST(range(1, greatest(len(toks) - 3, 1))) AS t(i)
      WHERE doc_id % 97 = 0
    ),
    contaminated AS (
      SELECT DISTINCT d.doc_id
      FROM deduped d,
           UNNEST(range(1, greatest(len(d.toks) - 3, 1))) AS t(i)
      WHERE array_to_string(list_slice(d.toks, i, i + 4), ' ')
              IN (SELECT g FROM bench)
    ),
    survivors AS (
      SELECT doc_id, n_tokens, difficulty_fp FROM deduped
      WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    {_shard_sql("survivors")}
    """,
)
def x53_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X53: the curation pipeline COMPOSED — the end-to-end DAG a user
    actually submits, every stage an operator graded individually
    elsewhere in this registry:

      1. quality gate (x36's Gopher-lite form): 10 ≤ n_tokens ≤ 5000,
         mean word length ≤ 15.0 (integer fixed-point);
      2. benchmark exclusion: the doc_id % 97 held-out set (x16's
         convention) leaves the training corpus entirely;
      3. exact dedup, keep-first (x2b): one survivor per identical
         text, lowest doc_id wins — a text-keyed window, no self-join;
      4. decontamination (x16): drop any doc sharing a distinct word
         5-gram with the benchmark set (benchmark grams broadcast —
         eval suites are MBs against a 100 TB corpus);
      5. curriculum assignment (x51): quartile shards of the
         survivors' difficulty, single-row cutoff model broadcast.

    Composing matters because Catalyst optimizes ACROSS stages: the
    quality predicates push into the one corpus scan that feeds both
    the dedup window and the gram explode; nothing materializes
    between stages. Whole pipeline in one plan: one text-keyed
    exchange (dedup), one gram-keyed broadcast probe (decontam), one
    single-row aggregate (cuts) — the corpus never shuffles its text
    twice. All arithmetic integer fixed-point; the one float surface
    (quantile interpolation) is scaled+rounded to BIGINT in both
    engines (the x51 rule).

    Reference anchor: this is the batch form of the reference's whole
    ingest-to-results lifecycle (main.py:656-816) for the curation
    domain; SURVEY §2.11's composition deliverable."""
    docs = load_table(spark, sf_dir, "documents")
    # survivors feeds BOTH the cutoff aggregate and the final probe —
    # lazy localCheckpoint (3 integer columns) so the four upstream
    # stages execute once, not twice (the x50 two-consumer rule)
    survivors = curation_survivors(docs).localCheckpoint(eager=False)
    return assign_quartile_shards(survivors)


def curation_survivors(docs: DataFrame) -> DataFrame:
    """Stages 1-4 of x53 (quality gate → benchmark exclusion →
    keep-first exact dedup → 5-gram decontamination) as one lazy
    subtree: (doc_id, n_tokens, difficulty_fp) of the surviving
    corpus. Factored out so the plan pins can inspect the
    pre-checkpoint shape."""
    toks = _words()
    scored = docs.select("doc_id", "text", *difficulty_cols())
    quality = scored.filter(
        (F.col("n_tokens") >= 10)
        & (F.col("n_tokens") <= 5000)
        & (F.col("difficulty_fp") <= 15000)
        & (F.col("doc_id") % 97 != 0)
    )
    w_txt = Window.partitionBy("text").orderBy("doc_id")
    deduped = (
        quality.withColumn("rn", F.row_number().over(w_txt))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    from pdf_etl_engine_spark.operators.curation import _ngrams

    grams5 = _ngrams(toks, 5)
    bench = (
        docs.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode(grams5).alias("g"))
        .distinct()
    )
    dgrams = deduped.select(
        "doc_id", F.explode(grams5).alias("g")
    ).distinct()
    contaminated = dgrams.join(F.broadcast(bench), "g").select(
        "doc_id"
    ).distinct()
    return deduped.join(contaminated, "doc_id", "left_anti").select(
        "doc_id", "n_tokens", "difficulty_fp"
    )
