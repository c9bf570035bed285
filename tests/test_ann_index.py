"""Bucket-partitioned ANN index (operators/ann_index.py): the probe
must (a) statically prune to the query's L bucket partitions and
(b) return exactly x4b's answer — same (k, L) ⇒ same candidate set.
"""

from __future__ import annotations

import pytest

import pathlib

from pyspark.sql import functions as F

from pdf_etl_engine_spark import registry
from pdf_etl_engine_spark.operators import ann_index

registry.load_all()

SF_DIR = "/root/testdata/sf0.001"


def _build(spark, tmp_path_factory):
    out = str(tmp_path_factory.getbasetemp() / "ann_index")
    if not pathlib.Path(out, "_SUCCESS").exists():
        ann_index.build_ann_index(spark, SF_DIR, out)
    return out


@pytest.mark.slow
def test_index_layout_is_partitioned(spark, tmp_path_factory):
    out = _build(spark, tmp_path_factory)
    tdirs = sorted(p.name for p in pathlib.Path(out).glob("t=*"))
    assert len(tdirs) == ann_index.N_TABLES
    bdirs = list(pathlib.Path(out, tdirs[0]).glob("b=*"))
    assert 1 <= len(bdirs) <= 2**ann_index.N_BITS


@pytest.mark.slow
def test_probe_prunes_partitions(spark, tmp_path_factory):
    """The probe's scan must carry the bucket disjuncts as PARTITION
    filters (directory pruning), not data filters, and must read
    fewer files than the full index holds."""
    out = _build(spark, tmp_path_factory)
    df = ann_index.probe_ann_index(spark, SF_DIR, out)
    plan = df._jdf.queryExecution().executedPlan().toString()
    part_lines = [
        line for line in plan.splitlines() if "PartitionFilters" in line
    ]
    assert part_lines and any("t#" in line for line in part_lines), plan

    def _partitions_read(pdf):
        """Partition directories the scan actually lists after
        partition-filter pruning (FileSourceScanLike.selectedPartitions)."""
        node = pdf._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
        return node.selectedPartitions().partitionCount()

    total = _partitions_read(spark.read.parquet(out))
    pruned = _partitions_read(
        spark.read.parquet(out).filter((F.col("t") == 0) & (F.col("b") == 0))
    )
    # one (t, b) cell out of the L × 2^k partition tree
    assert pruned == 1 and total >= ann_index.N_TABLES


@pytest.mark.slow
def test_probe_matches_query_time_lsh(spark, tmp_path_factory):
    """Same (k, L) hyperplanes ⇒ the index probe and x4b produce the
    identical top-10 (ids and rounded scores)."""
    out = _build(spark, tmp_path_factory)
    via_index = [
        (r["vec_id"], r["cos_sim"])
        for r in ann_index.probe_ann_index(spark, SF_DIR, out).collect()
    ]
    via_query = [
        (r["vec_id"], r["cos_sim"])
        for r in registry.QUERIES["x4b_ann_lsh_topk"](spark, SF_DIR).collect()
    ]
    assert via_index == via_query
