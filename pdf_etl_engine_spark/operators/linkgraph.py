"""Link-graph analytics over the corpus (SURVEY.md §2.11 extension
surface): PageRank as a document-quality signal — the Common-Crawl-
style centrality score web-corpus curation pipelines mix into their
quality filters (harmonic centrality / PageRank over the host graph).

The reference has no graph processing at all; this is the Spark-first
iterative-join formulation. Determinism discipline: ranks are
FIXED-POINT INTEGERS and every update is integer arithmetic
(``div`` + scaled damping), so both engines produce bit-identical
ranks in any join/aggregation order — the same trick the x37/x4g
float-free twins use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_etl_engine_spark.catalog import load_table
from pdf_etl_engine_spark.registry import query

_PR_SCALE = 1_000_000  # initial rank per node, fixed-point units
_PR_BASE = 150_000  # (1 - damping) × scale
_PR_ITERS = 3

# deterministic synthetic link graph: the corpus has no hyperlinks, so
# each doc links to three pseudo-random targets derived from doc_id
# (both engines build the identical edge set — curation-fixture rule)
_PR_EDGES = ((7, 1), (13, 3), (31, 7))


@query(
    "x39_link_pagerank",
    oracle=f"""
    WITH n AS (SELECT count(*) AS n FROM documents),
    edges AS (
      SELECT DISTINCT d.doc_id AS src, t.tgt
      FROM documents d, n,
           unnest([{", ".join(f"(d.doc_id * {a} + {b}) % n.n"
                              for a, b in _PR_EDGES)}]) AS t(tgt)
      WHERE t.tgt <> d.doc_id
    ),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    r0 AS (SELECT doc_id, CAST({_PR_SCALE} AS BIGINT) AS rank
           FROM documents),
    c1 AS (SELECT e.tgt, sum(r.rank // g.deg) AS s
           FROM edges e JOIN r0 r ON r.doc_id = e.src
                        JOIN deg g ON g.src = e.src GROUP BY e.tgt),
    r1 AS (SELECT r0.doc_id,
                  {_PR_BASE} + 85 * coalesce(c1.s, 0) // 100 AS rank
           FROM r0 LEFT JOIN c1 ON r0.doc_id = c1.tgt),
    c2 AS (SELECT e.tgt, sum(r.rank // g.deg) AS s
           FROM edges e JOIN r1 r ON r.doc_id = e.src
                        JOIN deg g ON g.src = e.src GROUP BY e.tgt),
    r2 AS (SELECT r1.doc_id,
                  {_PR_BASE} + 85 * coalesce(c2.s, 0) // 100 AS rank
           FROM r1 LEFT JOIN c2 ON r1.doc_id = c2.tgt),
    c3 AS (SELECT e.tgt, sum(r.rank // g.deg) AS s
           FROM edges e JOIN r2 r ON r.doc_id = e.src
                        JOIN deg g ON g.src = e.src GROUP BY e.tgt),
    r3 AS (SELECT r2.doc_id,
                  {_PR_BASE} + 85 * coalesce(c3.s, 0) // 100 AS rank
           FROM r2 LEFT JOIN c3 ON r2.doc_id = c3.tgt)
    SELECT r3.doc_id, coalesce(g.deg, 0) AS out_degree, r3.rank
    FROM r3 LEFT JOIN deg g ON r3.doc_id = g.src
    """,
)
def x39_link_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X39: PageRank over the corpus link graph (3 damped
    iterations, damping 0.85) — the link-structure quality signal
    (CommonCrawl centrality) that complements the content-based
    filters (x7/x21/x27/x36) in a web-scale curation mix.

    Determinism: ranks are fixed-point BIGINTs; each iteration is
    ``rank div out_degree`` per edge, an exact integer sum per target,
    and scaled damping ``base + 85·s div 100`` — no floats anywhere,
    so any shuffle/accumulation order gives identical ranks.

    Scale shape: the canonical distributed PageRank — per iteration
    one equi-join (ranks ⋈ edges on src) and one partial-aggregated
    groupBy(tgt). Both sides are keyed by node id, so on a cluster you
    pre-partition edges ONCE by src and co-partition ranks to make the
    join exchange-free across all K iterations (only the groupBy
    shuffles); K is a constant (3), not data-dependent — no
    convergence loop on the driver."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()  # bounded scalar (single-row agg)
    d = F.col("doc_id")
    targets = F.array(*[(d * a + b) % n for a, b in _PR_EDGES])
    edges = (
        docs.select(d.alias("src"), F.explode(targets).alias("tgt"))
        .filter(F.col("src") != F.col("tgt"))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = docs.select(
        "doc_id", F.lit(_PR_SCALE).cast("bigint").alias("rank")
    )
    contrib_edges = edges.join(deg, "src")
    for _ in range(_PR_ITERS):
        contribs = (
            contrib_edges.join(
                ranks.withColumnRenamed("doc_id", "src"), "src"
            )
            .select("tgt", F.expr("rank div deg").alias("c"))
            .groupBy("tgt")
            .agg(F.sum("c").alias("s"))
        )
        ranks = ranks.join(
            contribs, ranks["doc_id"] == contribs["tgt"], "left"
        ).select(
            "doc_id",
            (
                F.lit(_PR_BASE)
                + F.expr("85 * coalesce(s, 0) div 100")
            ).alias("rank"),
        )
    return ranks.join(deg, ranks["doc_id"] == deg["src"], "left").select(
        "doc_id",
        F.coalesce(F.col("deg"), F.lit(0)).alias("out_degree"),
        "rank",
    )
