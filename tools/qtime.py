"""Time a subset of headline queries with bench.py's exact methodology
(cached loader, warmup + median of N) without running the whole suite —
the optimization-round iteration harness (guide §1: measure first).

Usage: python tools/qtime.py q107_minhash_index_probe q116_minhash_admit
Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_RUNS as in
       bench.py.
Prints one JSON line {"queries": {name: median_sec}, "queries_min": ...}.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as em
from bench import RUNS, CachedDirLoader
from qcache_spark import opcache
from qcache_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main(names: list[str]) -> None:
    spark = get_spark(app_name="qcache-spark-qtime", cpus=CPUS)
    loader = CachedDirLoader(spark, SF_DIR)
    warm = loader.warm(
        ["lineitem", "orders", "customer", "part", "nation", "region",
         "events", "documents", "embeddings"]
    )
    em.load_table = lambda spark, sf_dir, name: loader(spark, sf_dir, name)
    queries = em.queries()
    timings, timings_min = {}, {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"qtime:{name}")
        fn(spark, SF_DIR).toPandas()  # warmup/plan-compile
        runs = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).toPandas()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 4)
        timings_min[name] = round(min(runs), 4)
        spark.sparkContext.setJobDescription(None)
        opcache.release(spark)
    print(json.dumps({
        "queries": timings,
        "queries_min": timings_min,
        "cache_warm_sec": round(warm, 3),
        "loadavg_5m": round(os.getloadavg()[1], 2),
    }))


if __name__ == "__main__":
    main(sys.argv[1:])
