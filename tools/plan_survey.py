"""Round-15 optimization survey: capture the formatted physical plan
of EVERY registered query and flag plan smells mechanically.

    python tools/plan_survey.py [sf_dir] [out_dir]

Writes one ``<query>.txt`` per query under ``out_dir`` (default
``plans/r15/survey``) plus a ``SUMMARY.tsv`` with per-query columns:

  exchanges      count of Exchange nodes (shuffle boundaries)
  bcast          count of BroadcastExchange nodes
  py_nodes       BatchEvalPython / ArrowEvalPython / MapInArrow /
                 FlatMapGroupsInPandas / FlatMapCoGroupsInPandas
  batch_eval     row-at-a-time BatchEvalPython specifically (smell)
  cartesian      CartesianProduct / BroadcastNestedLoopJoin (smell)
  smj            SortMergeJoin count
  pushed         1 if any scan shows a non-empty PushedFilters
  scans          parquet scan count
  build_s        seconds spent CONSTRUCTING the DataFrame (driver-side
                 work at plan time: training, collects, artifact builds)

The survey is read-only: no query executes (only whatever work its
constructor performs by design).
"""

from __future__ import annotations

import io
import os
import re
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_etl_engine_spark import registry  # noqa: E402
from pdf_etl_engine_spark.session import get_spark  # noqa: E402


def survey_one(spark, name: str, sf_dir: str) -> tuple[str, dict]:
    t0 = time.perf_counter()
    df = registry.QUERIES[name](spark, sf_dir)
    build_s = time.perf_counter() - t0
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    flags = {
        "exchanges": len(re.findall(r"^\(\d+\) Exchange", plan, re.M)),
        "bcast": len(re.findall(r"^\(\d+\) BroadcastExchange", plan, re.M)),
        "py_nodes": len(
            re.findall(
                r"^\(\d+\) (?:BatchEvalPython|ArrowEvalPython|MapInArrow"
                r"|FlatMapGroupsInPandas|FlatMapCoGroupsInPandas"
                r"|MapInPandas|PythonMapInArrow)",
                plan,
                re.M,
            )
        ),
        "batch_eval": len(
            re.findall(r"^\(\d+\) BatchEvalPython", plan, re.M)
        ),
        "cartesian": len(
            re.findall(
                r"^\(\d+\) (?:CartesianProduct|BroadcastNestedLoopJoin)",
                plan,
                re.M,
            )
        ),
        "smj": len(re.findall(r"^\(\d+\) SortMergeJoin", plan, re.M)),
        "pushed": int(
            bool(re.search(r"PushedFilters: \[[^\]]", plan))
        ),
        "scans": len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)),
        "build_s": round(build_s, 3),
    }
    return plan, flags


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            "r15",
            "survey",
        )
    )
    os.makedirs(out_dir, exist_ok=True)
    registry.load_all()
    spark = get_spark(app_name="plan-survey", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    cols = (
        "exchanges bcast py_nodes batch_eval cartesian smj pushed "
        "scans build_s"
    ).split()
    for name in sorted(registry.QUERIES):
        try:
            plan, flags = survey_one(spark, name, sf_dir)
            with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
                fh.write(plan)
            rows.append((name, [str(flags[c]) for c in cols]))
            print(f"{name}: {flags}", flush=True)
        except Exception as exc:
            rows.append((name, ["ERR"] * len(cols)))
            print(f"{name}: ERROR {type(exc).__name__}: {exc}", flush=True)
    with open(os.path.join(out_dir, "SUMMARY.tsv"), "w") as fh:
        fh.write("query\t" + "\t".join(cols) + "\n")
        for name, vals in rows:
            fh.write(name + "\t" + "\t".join(vals) + "\n")
    print(f"wrote {out_dir}/SUMMARY.tsv ({len(rows)} queries)")


if __name__ == "__main__":
    main()
