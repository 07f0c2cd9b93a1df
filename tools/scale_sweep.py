"""Multi-decade scale sweep: heavy queries at sf0.01 and sf0.1
(/root/testdata) plus sf1/sf10 (synthesized by tools/make_scale.py),
per-decade exponents between adjacent points. Evidence for SCALING.md
§11 — at sf0.01→0.1 fixed scheduling overhead dominates and exponents
under-read; the 0.1→1 decade is the first one where data cost is
visible.

Two modes:

* **fresh-JVM (default)** — each (query, scale-point) runs in its OWN
  subprocess/SparkSession. This is the r7 first-class protocol
  (VERDICT r6 item 7): the r6 probe found that running three heavy
  queries back-to-back in one JVM at sf10 OOMed the third via
  accumulated persisted caches, so the by-hand workaround (fresh JVM
  per measurement) is now the recorded, reproducible default. Results
  (min of N runs, default 2) are written to
  ``.scaledata/sweep_fresh.json`` where bench.py picks them up into
  BENCH extras.
* **--shared-jvm** — the original single-session mode over the wider
  HEAVY list; faster for iterating, but measures cache-accumulation
  interference along with the queries.

Usage:
    python tools/scale_sweep.py [runs=2]            # fresh-JVM, 4 queries
    python tools/scale_sweep.py --shared-jvm [runs=3]
"""
from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

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
    "q131_dsir_selection",      # unigram+bigram explode — the heavy
                                # scan among the r11 governance ops
]
# the fresh-JVM protocol's query set (VERDICT r6 item 7)
FRESH = [
    "q90_pagerank",
    "q91_triangle_count",
    "q95_prefix_jaccard_join",
    "q99_neardup_clusters",
]
# Fixed CONTROL point, measured in the same sweep session (VERDICT r10
# Next #2): q57_asof_join at sf1 — untouched since r5, one key
# shuffle, no iterative state. The shared VM's throughput drifts
# tens-of-percent WITHIN a day (SCALING §18d: the same measurement
# read 88.7 s at one hour and 115-165 s later, same code, idle), so
# raw seconds are not comparable across rounds; every sweep entry also
# carries t_norm = t_sec / control_sec, and cross-round comparisons
# should use the normalized columns (or the ratio of controls), never
# raw seconds. Falls back to sf0.1 when the synthesized sf1 is absent.
CONTROL_QUERY = "q57_asof_join"
CONTROL_SFS = [1.0, 0.1]
FRESH_OUT = os.path.join(REPO, ".scaledata", "sweep_fresh.json")
# heap for each fresh worker JVM: sf10's cached tables + shuffle state
# need far more than bench's 8g default (q90's localCheckpoint died
# deserializing cached blocks at 8g; 79 s green at a bigger heap).
# One worker runs at a time, so a large heap is safe on the 128 GiB
# box. Raised 48g -> 80g in r9: q90's sf10 point measured 88.7 s at
# 48g vs 63.9 s at 80g (same code, same data, same box) — the
# localCheckpoint rank state over 120 M edges is GC-bound at 48g, so
# the smaller heap was charging memory pressure to the algorithm.
SWEEP_DRIVER_MEMORY = os.environ.get("SWEEP_DRIVER_MEMORY", "80g")


def _exponents(pts: dict[float, float]) -> dict[str, float]:
    sfs = sorted(pts)
    return {
        f"{a:g}->{b:g}": round(
            math.log10(pts[b] / pts[a]) / math.log10(b / a), 3
        )
        for a, b in zip(sfs, sfs[1:])
    }


def _timed(fn, spark, d) -> float:
    t0 = time.perf_counter()
    fn(spark, d).toPandas()
    return time.perf_counter() - t0


def _run_query(spark, queries, loader, d: str, q: str, runs: int) -> float:
    import __spark_entry__ as em

    prev_loader = em.load_table
    em.load_table = (
        lambda s, dd, n, _l=loader, _d=d: _l(s, dd, n)
        if dd == _d
        else prev_loader(s, dd, n)
    )
    try:
        fn = queries[q]
        fn(spark, d).toPandas()  # warmup / plan compile
        return min(_timed(fn, spark, d) for _ in range(runs))
    finally:
        em.load_table = prev_loader


def worker(q: str, d: str, runs: int) -> None:
    """One (query, point) measurement in THIS process's own
    SparkSession — invoked as a subprocess by the fresh-JVM driver.
    Prints exactly one JSON line on stdout."""
    import __spark_entry__ as em
    from bench import CachedDirLoader, HEAVY_SWEEP_TABLES
    from qcache_spark.session import get_spark

    spark = get_spark(app_name=f"sweep-{q}")
    loader = CachedDirLoader(spark, d)
    loader.warm(HEAVY_SWEEP_TABLES)
    t = _run_query(spark, em.queries(), loader, d, q, runs)
    print(json.dumps({"query": q, "dir": d, "t_sec": round(t, 4)}))


def _run_fresh_worker(q: str, d: str, runs: int, cpus: int | None = None):
    """One fresh-JVM (query, point) measurement via subprocess;
    None on failure (logged to stderr). ``cpus`` pins the worker's
    core count (SPARK_GRAFT_CPUS → local[n] + shuffle partitions) for
    the core-scaling mode."""
    env = {**os.environ, "SPARK_DRIVER_MEMORY": SWEEP_DRIVER_MEMORY}
    if cpus is not None:
        env["SPARK_GRAFT_CPUS"] = str(cpus)
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__),
         "--worker", q, d, str(runs)],
        capture_output=True,
        text=True,
        timeout=7200,
        cwd=REPO,
        env=env,
    )
    line = next(
        (l for l in reversed(proc.stdout.splitlines())
         if l.startswith("{")),
        None,
    )
    if proc.returncode != 0 or line is None:
        print(
            f"[sweep] {q} @ {d}: worker failed rc={proc.returncode}\n"
            + proc.stderr[-2000:],
            file=sys.stderr,
        )
        return None
    return json.loads(line)["t_sec"]


def _measure_control(runs: int):
    """The fixed control point, same protocol as the sweep queries —
    its seconds calibrate the box for this session's sweep."""
    for want_sf in CONTROL_SFS:
        for sf, d in POINTS:
            if sf == want_sf and os.path.isdir(d):
                t = _run_fresh_worker(CONTROL_QUERY, d, runs)
                if t is not None:
                    print(
                        f"[sweep] control {CONTROL_QUERY} sf{sf:g}: {t} s",
                        file=sys.stderr,
                    )
                    return {"query": CONTROL_QUERY, "sf": sf, "t_sec": t}
    return None


def _sweep_block(results, runs, control):
    """Assemble the sweep JSON: raw seconds + exponents, plus
    control-normalized t_norm columns when a control was measured."""
    c = control["t_sec"] if control else None
    return {
        "protocol": "fresh-jvm-per-query-point",
        "runs": runs,
        "control": control,
        "sweep": {
            q: {
                "t_sec": {f"{s:g}": pts[s] for s in sorted(pts)},
                **(
                    {
                        "t_norm": {
                            f"{s:g}": round(pts[s] / c, 3)
                            for s in sorted(pts)
                        }
                    }
                    if c
                    else {}
                ),
                "exponent": _exponents(pts),
            }
            for q, pts in results.items()
            if pts
        },
    }


def main_fresh(runs: int) -> None:
    control = _measure_control(runs)
    results: dict[str, dict[float, float]] = {q: {} for q in FRESH}
    for q in FRESH:
        for sf, d in POINTS:
            if not os.path.isdir(d):
                continue
            t = _run_fresh_worker(q, d, runs)
            if t is None:
                continue
            results[q][sf] = t
            print(f"[sweep] {q} sf{sf:g}: {t} s", file=sys.stderr)
    out = _sweep_block(results, runs, control)
    os.makedirs(os.path.dirname(FRESH_OUT), exist_ok=True)
    with open(FRESH_OUT, "w") as f:
        json.dump(out, f)
    print(json.dumps(out))


def main_shared(runs: int) -> None:
    import __spark_entry__ as em
    from bench import CachedDirLoader, HEAVY_SWEEP_TABLES
    from qcache_spark.session import get_spark

    spark = get_spark(app_name="scale-sweep")
    queries = em.queries()
    results: dict[str, dict[float, float]] = {q: {} for q in HEAVY}
    for sf, d in POINTS:
        if not os.path.isdir(d):
            continue
        loader = CachedDirLoader(spark, d)
        loader.warm(HEAVY_SWEEP_TABLES)
        for q in HEAVY:
            results[q][sf] = round(
                _run_query(spark, queries, loader, d, q, runs), 4
            )
            # workload boundary — drop operator-lifetime caches so the
            # next query measures itself, not its predecessor's pins
            from qcache_spark import opcache

            opcache.release(spark)
        for df in loader.cache.values():
            df.unpersist(blocking=False)
    out = {
        q: {"t_sec": {f"{s:g}": pts[s] for s in sorted(pts)},
            "exponent": _exponents(pts)}
        for q, pts in results.items()
    }
    print(json.dumps({"sweep": out, "runs": runs}))


def main_merge(paths: list[str]) -> None:
    """Merge N sweep_fresh.json passes into one block: min per
    (query, point) across passes, exponents recomputed — the r7
    protocol ("min per point across two full fresh-JVM sweeps").
    The control point min-merges the same way and t_norm is
    recomputed against it. Writes the merged block to FRESH_OUT and
    prints it."""
    merged: dict[str, dict[float, float]] = {}
    runs = 0
    control = None
    for p in paths:
        with open(p) as f:
            blk = json.load(f)
        runs = max(runs, blk.get("runs", 0))
        c = blk.get("control")
        if c and (control is None or c["t_sec"] < control["t_sec"]):
            control = c
        for q, d in blk["sweep"].items():
            pts = merged.setdefault(q, {})
            for sf_s, t in d["t_sec"].items():
                sf = float(sf_s)
                pts[sf] = min(pts[sf], t) if sf in pts else t
    out = _sweep_block(merged, runs, control)
    out["note"] = (
        f"min per point across {len(paths)} full fresh-JVM "
        f"sweep passes ({runs} timed runs each)"
    )
    with open(FRESH_OUT, "w") as f:
        json.dump(out, f)
    print(json.dumps(out))


CORES_OUT = os.path.join(REPO, ".scaledata", "core_scaling_sf1.json")
CORES_POINTS = [8, 32]


def main_cores(runs: int) -> None:
    """Core scaling at sf1 (VERDICT r12 Next #4): the sf0.1 bench is a
    latency-floor benchmark — per-query fixed cost (AQE planning + job
    scheduling) dominates sub-second queries, so 50/69 run no faster
    on 32 cores than 8 and the c8/c32 block cannot evidence
    parallelism. At sf1 the heavy queries have real work per core:
    fresh JVM per (query, cpus) point, min of ``runs`` warm runs,
    ratio = t_c8/t_c32 (ideal 4.0 for CPU-bound). Written to
    .scaledata/core_scaling_sf1.json; bench.py embeds it in extras."""
    d = next(
        (p for sf, p in POINTS if sf == 1.0 and os.path.isdir(p)), None
    )
    if d is None:
        print("[cores] no sf1 data — run tools/make_scale.py first",
              file=sys.stderr)
        sys.exit(1)
    out: dict = {
        "protocol": "fresh-jvm-per-query-cpus-point",
        "sf": 1.0,
        "runs": runs,
        "cpus_points": CORES_POINTS,
        "queries": {},
    }
    for q in HEAVY:
        pts: dict[str, float] = {}
        for cpus in CORES_POINTS:
            t = _run_fresh_worker(q, d, runs, cpus=cpus)
            if t is None:
                continue
            pts[f"c{cpus}"] = t
            print(f"[cores] {q} c{cpus}: {t} s", file=sys.stderr)
        if len(pts) == len(CORES_POINTS):
            pts["ratio_c8_over_c32"] = round(
                pts[f"c{CORES_POINTS[0]}"] / pts[f"c{CORES_POINTS[1]}"], 2
            )
        out["queries"][q] = pts
    os.makedirs(os.path.dirname(CORES_OUT), exist_ok=True)
    with open(CORES_OUT, "w") as f:
        json.dump(out, f)
    print(json.dumps(out))


if __name__ == "__main__":
    args = sys.argv[1:]
    if args[:1] == ["--worker"]:
        worker(args[1], args[2], int(args[3]))
    elif args[:1] == ["--shared-jvm"]:
        main_shared(int(args[1]) if len(args) > 1 else 3)
    elif args[:1] == ["--merge"]:
        main_merge(args[1:])
    elif args[:1] == ["--cores"]:
        main_cores(int(args[1]) if len(args) > 1 else 2)
    else:
        main_fresh(int(args[0]) if args else 2)
