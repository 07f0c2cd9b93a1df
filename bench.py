"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Model: like the reference (an in-memory cache server), datasets are
cached in memory once (persist + materialize), then queries run
against the cached tables — we time the QUERY path, the analogue of
the reference's 7-70 ms query latencies (BASELINE.md). Cache warm
time is reported separately inside the JSON (not part of `value`).
"""
from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.storagelevel import StorageLevel

import __spark_entry__ as em
from qcache_spark import opcache
from qcache_spark.session import get_spark, load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def contention_verdict(
    worst_ratio: float,
    median_over_min_total: float,
    loadavg_5m: float,
    cpus: int,
) -> tuple[str, list[str]]:
    """Grade a run's contention evidence: PASS / CAUTION / DIRTY.

    VERDICT r11 Wrong #3: a record taken on a busy box (the r4 and
    r11 driver-run artifacts — 2-10x inflated heavy-query medians)
    must not silently become the committed evidence. Thresholds from
    observed behavior: idle-box median/min sits within ~1.3x; the r4
    artifact showed per-query worst ratios >3; the r11 driver re-run
    (loadavg 9-11 under other tenants) showed worst 1.69.
    """
    reasons: list[str] = []
    dirty = False
    if worst_ratio > 3.0:
        dirty = True
        reasons.append(
            f"worst per-query median/min {worst_ratio:.2f} > 3.0 "
            "(another process stole cores mid-run)"
        )
    elif worst_ratio > 1.8:
        reasons.append(f"worst per-query median/min {worst_ratio:.2f} > 1.8")
    if median_over_min_total > 1.35:
        reasons.append(
            f"total median/min {median_over_min_total:.2f} > 1.35"
        )
    if loadavg_5m > 1.5 * cpus:
        dirty = True
        reasons.append(
            f"loadavg_5m {loadavg_5m:.1f} far above bench parallelism "
            f"({cpus} cpus)"
        )
    if dirty:
        return "DIRTY", reasons
    return ("CAUTION", reasons) if reasons else ("PASS", reasons)
# Median of 5: sub-100 ms queries sit near the JVM's GC jitter floor,
# and a single 200 ms pause can double a median-of-3.
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))

HEADLINE = [
    "q39_baseline_workload",  # the reference's own benchmark query shape
    "q1_pricing_summary",
    "q2_filter_comparisons",
    "q5_filter_like",
    "q12_distinct",
    "q13_topk_offset",
    "q15_from_subquery",
    "q16_in_subquery",
    "q20_join_broadcast",
    "q21_join_multi",
    "q22_window_rank",
    "q24_rollup",
    "q25_time_bucket",
    "q26_dedup_exact_text",
    "q29_lang_id",
    "q30_cosine_topk",
    "q31_minhash_lsh_pairs",
    "q36_sessionize",
    "q54_hash_split",
    "q56_bm25_top_terms",
    "q57_asof_join",
    "q60_decontamination",
    "q62_chunk_documents",
    "q63_top_terms_by_lang",
    "q64_stratified_sample",
    "q66_shared_spans",
    "q67_training_pipeline",
    "q68_sequence_packing",
    "q71_dedup_clusters",
    "q78_chunk_dup_stats",
    "q79_contrastive_dataset",
    "q83_ngram_novelty",
    "q84_vocab_overlap",
    "q87_fuzzy_match",
    "q88_skewed_join",
    "q89_interval_join",
    "q90_pagerank",
    "q91_triangle_count",
    "q92_event_transitions",
    "q93_time_bucket_ohlc",
    "q94_percentile_outliers",
    "q95_prefix_jaccard_join",
    "q96_knn_label_consistency",
    "q97_token_pmi",
    "q98_cohort_retention",
    "q99_neardup_clusters",
    "q100_top_revenue_orders",
    "q101_snapshot_diff",
    "q102_pagerank_dangling",
    "q103_salted_aggregate",
    "q104_skewed_join_composite",
    "q105_minhash_probe",
    "q106_token_budget_mix",
    "q107_minhash_index_probe",
    "q108_token_mix_upsampled",
    "q111_distribution_match",
    "q112_balanced_shards",
    "q114_semantic_dedup",
    "q116_minhash_admit",
    "q117_ivf_admit",
    "q124_int8_rerank_search",
    "q126_crossmodal_curation",
    "q128_zorder_layout_scan",
    "q129_pq_adc_search",
    "q130_distribution_drift",
    "q131_dsir_selection",
    "q132_quality_constraints",
    "q134_ivfpq_search",
    "q136_zorder_incremental",
]


# The r5 HEADLINE prefix, frozen: totals over THIS subset stay
# comparable round-over-round even as new entries join HEADLINE
# (reported as extras.total_r5_headline_subset; the top-level `value`
# tracks the full current suite and grows with coverage by design).
R5_HEADLINE = HEADLINE[: HEADLINE.index("q68_sequence_packing") + 1]


# Tables the heavy-query sweep needs warm (shared with tools/scale_sweep.py)
HEAVY_SWEEP_TABLES = [
    "lineitem", "orders", "customer", "events", "documents", "embeddings",
]


class CachedDirLoader:
    """Serve load_table from a pre-persisted in-memory cache, the
    engine's operating model (datasets live in the cache, queries hit
    memory, not cold parquet)."""

    def __init__(self, spark, sf_dir: str):
        self.cache = {}
        self.spark = spark
        self.sf_dir = sf_dir

    # Tables whose single small parquet file would otherwise cache as
    # ~3 partitions, capping parallelism at 3 of N cores. On a real
    # cluster the scan's row-group splits give natural parallelism;
    # here we re-spread once at cache-warm time.
    WIDE = {"lineitem", "orders", "events", "documents", "embeddings"}

    def warm(self, names):
        t0 = time.perf_counter()
        for name in names:
            df = load_table(self.spark, self.sf_dir, name)
            if name in self.WIDE:
                df = df.repartition(CPUS)
            df = df.persist(StorageLevel.MEMORY_AND_DISK)
            df.count()  # materialize
            self.cache[name] = df
        return time.perf_counter() - t0

    def __call__(self, spark, sf_dir, name):
        if sf_dir == self.sf_dir and name in self.cache:
            return self.cache[name]
        return load_table(spark, sf_dir, name)


def _one_run(fn, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).toPandas()
    return time.perf_counter() - t0


def main() -> None:
    # AQE stays ON: its per-stage re-planning costs ~0.2 s per query
    # at this scale, but it is the scale-correct default (skew joins,
    # runtime partition coalescing) and the static planner mis-plans
    # the LSH self-joins without it (broadcast-timeout pathology).
    spark = get_spark(app_name="qcache-spark-bench", cpus=CPUS)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]

    loader = CachedDirLoader(spark, SF_DIR)
    warm_sec = loader.warm(
        ["lineitem", "orders", "customer", "part", "nation", "region", "events",
         "documents", "embeddings"]
    )
    # Route the entry queries' load_table through the cache
    em.load_table = lambda spark, sf_dir, name: loader(spark, sf_dir, name)

    queries = em.queries()
    timings: dict[str, float] = {}
    timings_min: dict[str, float] = {}
    for name in HEADLINE:
        if name not in queries:
            continue
        fn = queries[name]
        # Full-result materialization via Arrow (toPandas), the
        # engine's bulk-fetch path: row-at-a-time collect() adds
        # ~0.5 s of Py4J row conversion per 100k result rows, which
        # measures the legacy driver protocol, not the engine.
        fn(spark, SF_DIR).toPandas()  # warmup/plan-compile run
        runs = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).toPandas()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 4)
        timings_min[name] = round(min(runs), 4)
        # Workload boundary: drop operator-lifetime persisted frames
        # (triangles' oriented edges, percentile/curriculum ranges, …)
        # so heavy queries don't accumulate pinned caches across the
        # suite — the measured sf10 OOM mode (SCALING.md §12). The
        # loader's warmed base tables are NOT registry-managed and
        # stay cached.
        opcache.release(spark)

    total = round(sum(timings.values()), 4)
    total_min = round(sum(timings_min.values()), 4)
    total_r5_subset = round(
        sum(t for n, t in timings.items() if n in R5_HEADLINE), 4
    )
    # Contention evidence (VERDICT r4: BENCH_r04's heavy-query medians
    # were 2-10x inflated by a busy machine and unusable). On an idle
    # box median/min per query sit within ~1.3x; a large gap means
    # another process stole the cores mid-run — flag the run as dirty
    # rather than publishing artifact numbers as if they were real.
    worst = max(
        ((n, timings[n] / timings_min[n]) for n in timings if timings_min[n] > 0),
        key=lambda kv: kv[1],
        default=("", 1.0),
    )
    try:
        load1, load5, _ = os.getloadavg()
    except OSError:  # pragma: no cover
        load1 = load5 = -1.0
    m_over_m = round(total / total_min, 3) if total_min else 1.0
    verdict, verdict_reasons = contention_verdict(
        worst[1], m_over_m, load5, CPUS
    )
    contention = {
        "median_over_min_total": m_over_m,
        "worst_query": worst[0],
        "worst_ratio": round(worst[1], 2),
        # 1- and 5-min load average at the END of the timed loop: on a
        # 32-core box a loadavg far above the bench's own parallelism
        # is direct evidence another process stole the cores (the
        # BENCH_r04 artifact; a leftover JVM reproduced it locally).
        "loadavg_1m": round(load1, 2),
        "loadavg_5m": round(load5, 2),
        "verdict": verdict,
        "verdict_reasons": verdict_reasons,
        "dirty": verdict == "DIRTY",
    }

    # Bucketed-storage delta (catalog bucket_by path): the SAME q22
    # window query against orders stored bucketed+sorted by its window
    # key — quantifies the exchange-free per-key plan the bucketed
    # layout buys. Reported under "extras" so `value` stays comparable
    # round-over-round.
    extras: dict[str, float] = {"total_r5_headline_subset": total_r5_subset}
    try:
        from qcache_spark.cache.catalog import DatasetCatalog

        cat = DatasetCatalog(max_cache_size_bytes=1 << 34)
        item = cat.insert(
            "orders_bucketed",
            loader(spark, SF_DIR, "orders"),
            bucket_by=("o_custkey", CPUS),
        )
        plain_loader = em.load_table
        try:
            em.load_table = (
                lambda s, d, n: item.df if n == "orders" else plain_loader(s, d, n)
            )
            fn = queries["q22_window_rank"]
            fn(spark, SF_DIR).toPandas()
            runs = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).toPandas()
                runs.append(time.perf_counter() - t0)
            extras["q22_window_rank_bucketed"] = round(statistics.median(runs), 4)
        finally:
            # restore unconditionally — a failure mid-probe must not leave
            # the bucketed routing installed for the rest of the bench
            em.load_table = plain_loader
        cat.delete("orders_bucketed")
    except Exception as e:  # the delta probe must never fail the bench
        extras["q22_window_rank_bucketed_error"] = str(e)[:200]

    # Lifecycle phase split (VERDICT r9 Next #3): the gated lifecycle
    # entries (q107/q116/q117) rebuild their index from scratch each
    # run BY DESIGN (admit is not idempotent), so their headline
    # seconds conflate one-time build+write with the operator's actual
    # product — O(batch) steady-state probe/admit. Record the phases
    # separately so the O(batch) claim is a tracked number: build_sec
    # = construct + write + load; probe_sec = batch-vs-corpus pair
    # materialization off the loaded index; admit_sec = probe + drop +
    # append survivors.
    try:
        import shutil as _shutil
        import tempfile as _tempfile

        from qcache_spark.operators.dedup import MinHashIndex
        from qcache_spark.operators.similarity import IVFIndex

        lc_root = _tempfile.mkdtemp(prefix="qcache_bench_lifecycle_")
        phases: dict[str, dict] = {}

        docs = loader(spark, SF_DIR, "documents")
        corpus = docs.filter("doc_id % 4 != 0")
        batch = docs.filter("doc_id % 4 = 0").select("doc_id", "text")
        t0 = time.perf_counter()
        MinHashIndex(corpus).write(spark, lc_root + "/mh")
        mh = MinHashIndex.load(spark, lc_root + "/mh")
        build = time.perf_counter() - t0
        t0 = time.perf_counter()
        mh.probe(batch, verify_threshold=0.5).count()  # q107's read path
        probe = time.perf_counter() - t0
        t0 = time.perf_counter()
        mh.admit(batch, verify_threshold=0.5)  # q116's write path
        admit = time.perf_counter() - t0
        phases["minhash_q107_q116"] = {
            "build_sec": round(build, 3),
            "probe_sec": round(probe, 3),
            "admit_sec": round(admit, 3),
        }

        emb = loader(spark, SF_DIR, "embeddings")
        ecorp = emb.filter("vec_id % 4 != 0")
        ebatch = emb.filter("vec_id % 4 = 0")
        t0 = time.perf_counter()
        IVFIndex(ecorp, n_centroids=8, iters=1).write(spark, lc_root + "/ivf")
        ivf = IVFIndex.load(spark, lc_root + "/ivf")
        build = time.perf_counter() - t0
        t0 = time.perf_counter()
        ivf.dup_probe(ebatch, threshold=0.40, n_probe=1).count()
        probe = time.perf_counter() - t0
        t0 = time.perf_counter()
        ivf.admit(ebatch, threshold=0.40, n_probe=1)  # q117's write path
        admit = time.perf_counter() - t0
        phases["ivf_q117"] = {
            "build_sec": round(build, 3),
            "probe_sec": round(probe, 3),
            "admit_sec": round(admit, 3),
        }
        _shutil.rmtree(lc_root, ignore_errors=True)
        opcache.release(spark)
        extras["lifecycle_phases"] = phases
    except Exception as e:  # the phase probe must never fail the bench
        extras["lifecycle_phases_error"] = str(e)[:200]

    # Scale sweep (VERDICT r2 advice #7 / r4 item 7): the 5 heaviest
    # queries at sf0.01 vs the main SF, exponent = log10(t_big /
    # t_small) per decade of data. ~1.0 = linear scaling, <1 = fixed
    # per-stage overhead still amortizing (expected at these sizes:
    # scheduling floor ~0.2-0.3 s/query), >1 = superlinear — a plan
    # that would NOT survive 100x. Skippable via
    # SPARK_GRAFT_SCALE_SWEEP=0.
    HEAVY = [
        "q31_minhash_lsh_pairs",
        "q56_bm25_top_terms",
        "q57_asof_join",
        "q60_decontamination",
        "q67_training_pipeline",
        "q71_dedup_clusters",  # iterative CC — the likeliest superlinear plan
        "q90_pagerank",        # iterative ranking — same risk class as CC
        "q91_triangle_count",  # wedge join — the classic superlinear risk
        "q95_prefix_jaccard_join",  # candidate-pair blowup risk class
        "q99_neardup_clusters",  # join-heavy + iterative composition
    ]
    sweep_dir = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.01")
    if (
        os.environ.get("SPARK_GRAFT_SCALE_SWEEP", "1") != "0"
        and os.path.isdir(sweep_dir)
        and os.path.realpath(sweep_dir) != os.path.realpath(SF_DIR)
    ):
        prev_loader = em.load_table
        try:
            small = CachedDirLoader(spark, sweep_dir)
            small.warm(["lineitem", "orders", "customer", "events", "documents",
                        "embeddings"])
            em.load_table = (
                lambda s, d, n: small(s, d, n)
                if d == sweep_dir
                else prev_loader(s, d, n)
            )
            sf_small = float(sweep_dir.rstrip("/").rsplit("sf", 1)[-1])
            decades = math.log10(float(sf) / sf_small)
            sweep = {}
            for name in HEAVY:
                if name not in queries or name not in timings_min:
                    continue
                fn = queries[name]
                fn(spark, sweep_dir).toPandas()  # warmup
                t_small = min(
                    _one_run(fn, spark, sweep_dir) for _ in range(3)
                )
                t_big = timings_min[name]
                sweep[name] = {
                    "sf_small": sf_small,
                    "t_small": round(t_small, 4),
                    "t_big": t_big,
                    "exponent": round(
                        math.log10(t_big / t_small) / decades, 3
                    ),
                }
            extras["scale_sweep"] = sweep
        except Exception as e:  # the sweep must never fail the bench
            extras["scale_sweep_error"] = str(e)[:200]
        finally:
            # unconditional restore: an exception mid-sweep must not leave
            # the sweep-dir routing wrapper installed (wrappers nest across
            # reruns and the published loader state would differ from the
            # clean path)
            em.load_table = prev_loader

    # Fresh-JVM multi-decade sweep (VERDICT r6 item 7): if
    # tools/scale_sweep.py has been run this round (one subprocess +
    # SparkSession per (query, scale-point) — the protocol that
    # survives the cross-query cache-accumulation OOM the r6 probe
    # hit), embed its 4-point results so BENCH_r{N} carries the
    # reproducible third-decade evidence.
    fresh_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".scaledata",
        "sweep_fresh.json",
    )
    if os.path.isfile(fresh_path):
        try:
            with open(fresh_path) as f:
                extras["scale_sweep_fresh_jvm"] = json.load(f)
        except Exception as e:
            extras["scale_sweep_fresh_jvm_error"] = str(e)[:200]

    # Core scaling at sf1 (VERDICT r12 Next #4): the sf0.1 suite is a
    # latency-floor benchmark where per-query fixed cost flattens the
    # c8-vs-c32 comparison; tools/scale_sweep.py --cores measures the
    # heavy queries at sf1 with a fresh JVM per (query, cpus) point —
    # embed its block when present so BENCH_r{N} carries the
    # parallel-scaling evidence at a scale where cores have work.
    cores_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".scaledata",
        "core_scaling_sf1.json",
    )
    if os.path.isfile(cores_path):
        try:
            with open(cores_path) as f:
                extras["core_scaling_sf1_fresh_jvm"] = json.load(f)
        except Exception as e:
            extras["core_scaling_sf1_error"] = str(e)[:200]

    payload = json.dumps(
        {
            "metric": "qcache_spark headline query suite (median per query, tables cached in memory)",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "queries_min": timings_min,
            "total_min": total_min,
            "contention": contention,
            "extras": extras,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "cache_warm_sec": round(warm_sec, 3),
            "cpus": CPUS,
        }
    )
    # Durable copy FIRST (VERDICT r7 item 5: BENCH_r07's stdout tail
    # was truncated before the per-query timings and the round's
    # numbers were unrecoverable). The default target is the
    # UNCOMMITTED `.latest` sidecar, NOT the committed record:
    # driver/CI re-runs used to overwrite BENCH_local.json and leave
    # the working tree disagreeing with the committed evidence
    # (VERDICT r12 Wrong #5). The builder's record workflow opts in
    # explicitly with SPARK_GRAFT_BENCH_OUT=BENCH_local.json; empty
    # string disables the durable copy.
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_local.json.latest"),
    )
    if out_path and contention["dirty"]:
        # A DIRTY run must never overwrite the committed record
        # (VERDICT r11 Wrong #3): divert it to a .dirty sidecar so
        # the numbers are preserved as evidence but cannot be
        # mistaken for clean measurements.
        diverted = out_path + ".dirty"
        print(
            f"bench: contention verdict DIRTY "
            f"({'; '.join(verdict_reasons)}) — writing {diverted} "
            f"instead of {out_path}",
            file=sys.stderr,
        )
        out_path = diverted
    if out_path:
        try:
            with open(out_path, "w") as f:
                f.write(payload + "\n")
        except OSError as e:  # the durable copy must never fail the bench
            print(f"bench: could not write {out_path}: {e}", file=sys.stderr)
    print(payload)


if __name__ == "__main__":
    main()
