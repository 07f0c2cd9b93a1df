"""Multi-decade scale sweep: the HEAVY query set at sf0.01 and sf0.1
(/root/testdata) plus sf1 (synthesized by tools/make_scale.py), per-
decade exponents between adjacent points. Evidence for SCALING.md §11
— at sf0.01→0.1 fixed scheduling overhead dominates and exponents
under-read; the 0.1→1 decade is the first one where data cost is
visible. Prints one JSON line.

Usage: python tools/scale_sweep.py [runs=3]
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as em
from bench import CachedDirLoader, HEAVY_SWEEP_TABLES
from qcache_spark.session import get_spark

POINTS = [
    (0.01, "/root/testdata/sf0.01"),
    (0.1, "/root/testdata/sf0.1"),
    (1.0, os.path.join(REPO, ".scaledata", "sf1")),
    (10.0, os.path.join(REPO, ".scaledata", "sf10")),  # skipped if absent
]
HEAVY = [
    "q31_minhash_lsh_pairs",
    "q56_bm25_top_terms",
    "q57_asof_join",
    "q60_decontamination",
    "q67_training_pipeline",
    "q71_dedup_clusters",
    "q90_pagerank",
    "q91_triangle_count",       # wedge join — classic superlinear risk
    "q95_prefix_jaccard_join",  # candidate-pair blowup risk class
    "q99_neardup_clusters",     # join-heavy + iterative composition
]


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="scale-sweep")
    queries = em.queries()
    results: dict[str, dict[float, float]] = {q: {} for q in HEAVY}
    prev_loader = em.load_table
    try:
        for sf, d in POINTS:
            if not os.path.isdir(d):
                continue
            loader = CachedDirLoader(spark, d)
            loader.warm(HEAVY_SWEEP_TABLES)
            em.load_table = (
                lambda s, dd, n, _l=loader, _d=d: _l(s, dd, n)
                if dd == _d
                else prev_loader(s, dd, n)
            )
            for q in HEAVY:
                fn = queries[q]
                fn(spark, d).toPandas()  # warmup / plan compile
                t = min(
                    _timed(fn, spark, d) for _ in range(runs)
                )
                results[q][sf] = round(t, 4)
            em.load_table = prev_loader
            for df in loader.cache.values():
                df.unpersist(blocking=False)
    finally:
        em.load_table = prev_loader
    out = {}
    for q, pts in results.items():
        sfs = sorted(pts)
        exps = {}
        for a, b in zip(sfs, sfs[1:]):
            dec = math.log10(b / a)
            exps[f"{a:g}->{b:g}"] = round(
                math.log10(pts[b] / pts[a]) / dec, 3
            )
        out[q] = {"t_sec": {f"{s:g}": pts[s] for s in sfs}, "exponent": exps}
    print(json.dumps({"sweep": out, "runs": runs}))


def _timed(fn, spark, d) -> float:
    t0 = time.perf_counter()
    fn(spark, d).toPandas()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
