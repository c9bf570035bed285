#!/usr/bin/env python
"""Synthesize an sf1 scale point (10x sf0.1) for the second-scale-point
bench (VERDICT r6 #3): 6M lineitem / 1.5M orders / 1M events / 50k
documents / 20k embeddings.

The driver's testdata is read-only and ships no sf1, so sf1 is derived
DETERMINISTICALLY from sf0.1 by 10x replication with disjoint key
offsets — every replica keeps sf0.1's exact value distributions
(selectivities, group cardinalities per key, skew) while foreign keys
stay consistent (lineitem.l_orderkey offsets match orders.o_orderkey,
o_custkey matches customer, etc.). Uniqueness-sensitive columns are
kept unique across replicas: document text gets a per-replica suffix
(so dedup rates scale instead of collapsing to 90% dups) and
embeddings rotate by k positions (norm-preserving, bucket-diverse).

No RNG anywhere — rerunning the script reproduces byte-identical
tables, and both engines in the bench read the same files.

Output: $SPARK_GRAFT_SF1_DIR (default /tmp/spark-graft-testdata/sf1).
Skipped (fast) when the output's _SUCCESS marker already exists.
"""

from __future__ import annotations

import os

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SF1_SRC", "/root/testdata/sf0.1")
OUT = os.environ.get(
    "SPARK_GRAFT_SF1_DIR", "/tmp/spark-graft-testdata/sf1"
)
REPLICAS = 10

# per-table key offsets = (max key at sf0.1) + 1
_OFF = {
    "c_custkey": 15000,
    "s_suppkey": 1000,
    "p_partkey": 20000,
    "o_orderkey": 150000,
    "event_id": 100000,
    "user_id": 1500,
    "doc_id": 5000,
    "vec_id": 2000,
}

_SQL = {
    "region": "SELECT * FROM src",
    "nation": "SELECT * FROM src",
    "customer": f"""
        SELECT c_custkey + k * {_OFF['c_custkey']} AS c_custkey,
               c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM src, range({REPLICAS}) t(k)""",
    "supplier": f"""
        SELECT s_suppkey + k * {_OFF['s_suppkey']} AS s_suppkey,
               s_name, s_nationkey, s_acctbal
        FROM src, range({REPLICAS}) t(k)""",
    "part": f"""
        SELECT p_partkey + k * {_OFF['p_partkey']} AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM src, range({REPLICAS}) t(k)""",
    "orders": f"""
        SELECT o_orderkey + k * {_OFF['o_orderkey']} AS o_orderkey,
               o_custkey + k * {_OFF['c_custkey']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM src, range({REPLICAS}) t(k)""",
    "lineitem": f"""
        SELECT l_orderkey + k * {_OFF['o_orderkey']} AS l_orderkey,
               l_partkey + k * {_OFF['p_partkey']} AS l_partkey,
               l_suppkey + k * {_OFF['s_suppkey']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM src, range({REPLICAS}) t(k)""",
    "events": f"""
        SELECT event_id + k * {_OFF['event_id']} AS event_id,
               ts, user_id + k * {_OFF['user_id']} AS user_id,
               event_type, value, props
        FROM src, range({REPLICAS}) t(k)""",
    "documents": f"""
        SELECT doc_id + k * {_OFF['doc_id']} AS doc_id,
               CASE WHEN k = 0 THEN text
                    ELSE text || ' r' || CAST(k AS VARCHAR) END AS text,
               lang, source,
               CAST(length(CASE WHEN k = 0 THEN text
                    ELSE text || ' r' || CAST(k AS VARCHAR) END) AS BIGINT)
                 AS n_chars
        FROM src, range({REPLICAS}) t(k)""",
    "embeddings": f"""
        SELECT vec_id + k * {_OFF['vec_id']} AS vec_id,
               CASE WHEN k = 0 THEN embedding ELSE
                 embedding[CAST(k AS INTEGER) + 1 :] ||
                 embedding[: CAST(k AS INTEGER)]
               END AS embedding,
               label
        FROM src, range({REPLICAS}) t(k)""",
}


def synth(out_dir: str = OUT, src_dir: str = SRC) -> str:
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for table, sql in _SQL.items():
        con.execute(
            f"CREATE OR REPLACE VIEW src AS "
            f"SELECT * FROM '{src_dir}/{table}.parquet'"
        )
        con.execute(
            f"COPY ({sql}) TO '{out_dir}/{table}.parquet' "
            f"(FORMAT PARQUET, COMPRESSION SNAPPY)"
        )
    with open(marker, "w"):
        pass
    return out_dir


if __name__ == "__main__":
    d = synth()
    con = duckdb.connect()
    for t in _SQL:
        n = con.execute(f"SELECT count(*) FROM '{d}/{t}.parquet'").fetchone()[0]
        print(t, n)
