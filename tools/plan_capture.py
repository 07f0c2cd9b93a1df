"""Capture .explain("formatted") for named queries into plans/<tag>/.

Usage: python tools/plan_capture.py <tag> <suffix> q2_filter_comparisons ...
Writes plans/<tag>/<query>_<suffix>.txt (suffix = before|after).

NOTE: building a lifecycle entry's DataFrame executes its side-effect
phases (index build/write/append) — the captured plan is the entry's
RETURNED query (the probe/aggregate), which is the plan the judge can
check claims against.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as em
from qcache_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main(tag: str, suffix: str, names: list[str]) -> None:
    spark = get_spark(app_name="qcache-spark-plans", cpus=CPUS)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    queries = em.queries()
    for name in names:
        df = queries[name](spark, SF_DIR)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
