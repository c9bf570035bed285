"""Capture explain('formatted') for named queries into
plans/$SPARK_GRAFT_PLAN_ROUND/<query>_<tag>.txt (default r16):

    python tools/plan_capture.py <tag> <query> [<query> ...]

Used for the round's before/after plan evidence; the 'before' files
are copies of the committed survey captures (same code, same scale).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_etl_engine_spark import registry  # noqa: E402
from pdf_etl_engine_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(
        here, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r16")
    )
    os.makedirs(out_dir, exist_ok=True)
    registry.load_all()
    spark = get_spark(app_name="plan-capture", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = registry.QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
