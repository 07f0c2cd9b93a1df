"""The r6 OOM reproducer, re-run under the r7 cache registry.

SCALING.md §12 recorded the failure: q95 + q91 + q99 back-to-back in
ONE driver JVM at sf10 accumulated one pinned persisted frame per
operator family until the third query OOMed. The central registry
(qcache_spark/opcache.py) now budget-evicts across families and bench
releases at query boundaries; this probe re-runs the exact same
back-to-back sequence in one JVM — with the registry's default budget
and an explicit release between queries — and prints per-query wall
times plus the registry/footprint state after each step.

Usage: python tools/backtoback_probe.py [sf_dir=REPO/.scaledata/sf10]
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as em
from bench import CachedDirLoader, HEAVY_SWEEP_TABLES
from qcache_spark import opcache
from qcache_spark.session import get_spark

SEQUENCE = ["q95_prefix_jaccard_join", "q91_triangle_count",
            "q99_neardup_clusters"]


def main() -> None:
    d = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scaledata", "sf10"
    )
    spark = get_spark(app_name="backtoback-probe")
    loader = CachedDirLoader(spark, d)
    loader.warm(HEAVY_SWEEP_TABLES)
    prev_loader = em.load_table
    em.load_table = (
        lambda s, dd, n: loader(s, dd, n) if dd == d else prev_loader(s, dd, n)
    )
    queries = em.queries()
    steps = []
    for q in SEQUENCE:
        t0 = time.perf_counter()
        n = queries[q](spark, d).toPandas().shape[0]
        t = time.perf_counter() - t0
        steps.append({
            "query": q,
            "rows": int(n),
            "t_sec": round(t, 2),
            "families_after": opcache.families(spark),
            "cached_bytes_after": opcache.cached_bytes(spark),
            # r8: the number the budget loop actually charges
            "registry_bytes_after": opcache.registry_bytes(spark),
        })
        print(f"[probe] {q}: {t:.1f} s, {n} rows, "
              f"families={steps[-1]['families_after']}, "
              f"cached={steps[-1]['cached_bytes_after'] >> 20} MiB",
              file=sys.stderr)
        # the bench-style workload boundary
        released = opcache.release(spark)
        print(f"[probe] released {released} families", file=sys.stderr)
    print(json.dumps({
        "sf_dir": d,
        "driver_memory": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        "budget_bytes": opcache.budget_bytes(),
        "sequence": steps,
        "outcome": "completed-one-jvm",
    }))


if __name__ == "__main__":
    main()
