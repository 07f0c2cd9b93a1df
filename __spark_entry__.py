"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship query (compile_query pipeline) at sf0.001.
`queries()` — one entry per implemented operator (SURVEY.md §2 +
    beyond-reference extensions); each callable (spark, sf_dir) → DataFrame.
`oracle_sql()` — DuckDB-equivalent ANSI SQL per query key.

Column-name contract: every computed/aggregate column is aliased the
same on both sides. Double columns produced by ARITHMETIC WITH
DIFFERENT ASSOCIATION ORDERS (parallel partial aggregation) are
rounded identically on both sides (3 decimals); stored values and
per-row deterministic expressions are compared exactly.
"""
from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window

from qcache_spark import compile_query, compile_update
from qcache_spark.session import load_table


def _gq(spark, sf_dir, table, q):
    """Grammar-query router: small tables run on the driver-local
    executor (qcache_spark.fastpath — the reference's own operating
    regime, sub-ms on its 1k-400k-row envelope); above the size
    threshold, or for any construct the local executor declines, the
    Catalyst plan runs. The Spark fallback goes through this module's
    `load_table` global so harnesses (bench.py) can inject cached
    frames."""
    from qcache_spark import fastpath

    df = fastpath.try_local(spark, sf_dir, table, q)
    if df is not None:
        return df
    return compile_query(q, load_table(spark, sf_dir, table)).sliced


def _round_doubles(df: DataFrame, scale: int = 3) -> DataFrame:
    """Round every floating column to `scale` decimals, keeping names —
    neutralizes partial-aggregation association-order differences
    between Spark and the DuckDB oracle."""
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.DoubleType, T.FloatType)):
            cols.append(F.round(F.col(f.name), scale).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def _ivf_cache_path(sf_dir: str, n_centroids: int, iters: int) -> str:
    """Cache path for a persisted IVF index, keyed by sf-dir AND the
    build parameters AND the on-disk format version — changing any of
    them lands on a fresh path, so a stale artifact from an older code
    version or a different parameterization can never be silently
    served (VERDICT r5 item 8)."""
    import tempfile

    from qcache_spark.operators.similarity import IVF_FORMAT_VERSION

    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(
        tempfile.gettempdir(),
        f"qcache_spark_ivf_{sf_tag}_v{IVF_FORMAT_VERSION}"
        f"_c{n_centroids}_i{iters}",
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pricing summary via the qcache query-dict compiler."""
    sf_dir = "/root/testdata/sf0.001"
    return QUERIES["q1_pricing_summary"](spark, sf_dir)


# ---------------------------------------------------------------------------
# qcache-parity queries — routed through the query-dict compiler so the
# correctness gate exercises the engine itself (SURVEY.md §2.2-2.8).
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark, sf_dir):
    """§2.4 group_by + multi-aggregate (+ §2.2 where, §2.6 order_by)."""
    q = {
        "where": ["<=", "l_quantity", 49],
        "group_by": ["l_returnflag", "l_linestatus"],
        "select": [
            "l_returnflag",
            "l_linestatus",
            ["sum", "l_quantity"],
            ["msum", "l_extendedprice"],
            ["mavg", "l_discount"],
            ["count", "l_orderkey"],
        ],
        "order_by": ["l_returnflag", "l_linestatus"],
    }
    return _gq(spark, sf_dir, "lineitem", q)


def q2_filter_comparisons(spark, sf_dir):
    """§2.2 comparison + logical conjunction; raw stored values. The
    output is paged (order_by + limit) the way every qcache client
    consumes results — the engine still filters the full table, and
    unsliced-length carries the total match count."""
    q = {
        "where": ["&", [">", "l_quantity", 45], ["<", "l_discount", 0.05]],
        "select": ["l_orderkey", "l_linenumber", "l_quantity", "l_discount"],
        "order_by": ["l_orderkey", "l_linenumber"],
        "limit": 1000,
    }
    return _gq(spark, sf_dir, "lineitem", q)


def q3_filter_disjunction_not(spark, sf_dir):
    """§2.2 | and ! operators."""
    q = {
        "where": [
            "|",
            ["==", "c_mktsegment", "'BUILDING'"],
            ["!", [">=", "c_acctbal", 1000]],
        ],
        "select": ["c_custkey", "c_mktsegment", "c_acctbal"],
    }
    return _gq(spark, sf_dir, "customer", q)


def q4_filter_in_list(spark, sf_dir):
    """§2.2 in-list membership."""
    q = {
        "where": ["in", "o_orderpriority", ["1-URGENT", "2-HIGH"]],
        "select": ["o_orderkey", "o_orderpriority"],
    }
    return _gq(spark, sf_dir, "orders", q)


def q5_filter_like(spark, sf_dir):
    """§2.2 like with % wildcards (case-sensitive)."""
    q = {
        "where": ["like", "p_name", "'%widget%'"],
        "select": ["p_partkey", "p_name"],
    }
    return _gq(spark, sf_dir, "part", q)


def q6_filter_ilike(spark, sf_dir):
    """§2.2 ilike (case-insensitive)."""
    q = {
        "where": ["ilike", "p_type", "'ECONOMY'"],
        "select": ["p_partkey", "p_type"],
    }
    return _gq(spark, sf_dir, "part", q)


def q7_filter_bits(spark, sf_dir):
    """§2.2 any_bits/all_bits bitmask filters."""
    q = {
        "where": ["&", ["any_bits", "p_size", 8], ["all_bits", "p_size", 3]],
        "select": ["p_partkey", "p_size"],
    }
    return _gq(spark, sf_dir, "part", q)


def q8_alias_arithmetic(spark, sf_dir):
    """§2.3 computed column (nested prefix expression)."""
    q = {
        "select": [
            "l_orderkey",
            "l_linenumber",
            ["=", "revenue", ["*", "l_extendedprice", ["-", 1, "l_discount"]]],
            ["=", "charged", ["*", ["*", "l_extendedprice", ["-", 1, "l_discount"]], ["+", 1, "l_tax"]]],
        ],
        "where": [">", "l_quantity", 48],
    }
    return _gq(spark, sf_dir, "lineitem", q)


def q9_alias_math_fn(spark, sf_dir):
    """§2.3 unary math function in alias."""
    q = {
        "select": ["p_partkey", ["=", "price_sqrt", ["sqrt", "p_retailprice"]]],
        "where": ["<=", "p_partkey", 100],
    }
    return _gq(spark, sf_dir, "part", q)


def q10_agg_global(spark, sf_dir):
    """§2.4 whole-table aggregate without group_by."""
    q = {
        "select": [["max", "l_extendedprice"], ["min", "l_quantity"], ["count", "l_orderkey"]],
    }
    return _gq(spark, sf_dir, "lineitem", q)


def q11_count_star(spark, sf_dir):
    """§2.4 [["count"]] COUNT(*) special case."""
    q = {"select": [["count"]], "where": ["==", "o_orderstatus", "'F'"]}
    return _gq(spark, sf_dir, "orders", q)


def q12_distinct(spark, sf_dir):
    """§2.5 distinct on a column subset."""
    q = {
        "distinct": ["l_returnflag", "l_linestatus"],
        "select": ["l_returnflag", "l_linestatus"],
    }
    return _gq(spark, sf_dir, "lineitem", q)


def q13_topk_offset(spark, sf_dir):
    """§2.6 order_by desc + offset + limit (top-k with pagination)."""
    q = {
        "select": ["o_orderkey", "o_totalprice"],
        "order_by": ["-o_totalprice", "o_orderkey"],
        "offset": 5,
        "limit": 10,
    }
    return _gq(spark, sf_dir, "orders", q)


def q14_groupby_nunique(spark, sf_dir):
    """§2.4 duck-typed aggregate names (nunique → countDistinct)."""
    q = {
        "group_by": ["l_returnflag"],
        "select": ["l_returnflag", ["nunique", "l_partkey"], ["max", "l_shipdate"]],
    }
    return _gq(spark, sf_dir, "lineitem", q)


def q15_from_subquery(spark, sf_dir):
    """§2.7 from-subquery: aggregate inner, filter+alias outer."""
    q = {
        "from": {
            "group_by": ["o_custkey"],
            "select": ["o_custkey", ["msum", "o_totalprice"], ["count", "o_orderkey"]],
        },
        "where": [">", "o_totalprice", 1000000],
        "select": [
            "o_custkey",
            ["=", "avg_price", ["/", "o_totalprice", "o_orderkey"]],
        ],
    }
    return _gq(spark, sf_dir, "orders", q)


def q16_in_subquery(spark, sf_dir):
    """§2.7 in-subquery against the root frame → left-semi join. The
    output is paged (order_by + limit) the way every qcache client
    consumes results (the reference API always serves slices, with
    X-QCache-unsliced-length carrying the full count) — the engine
    still computes the complete semi-join before the slice."""
    q = {
        "where": ["in", "o_custkey", {"where": [">", "o_totalprice", 400000], "select": ["o_custkey"]}],
        "select": ["o_orderkey", "o_custkey", "o_totalprice"],
        "order_by": ["o_orderkey"],
        "limit": 1000,
    }
    return _gq(spark, sf_dir, "orders", q)


def q17_not_in_subquery(spark, sf_dir):
    """§2.7 negated in-subquery → left-anti join."""
    q = {
        "where": ["!", ["in", "o_custkey", {"where": [">", "o_totalprice", 400000], "select": ["o_custkey"]}]],
        "select": [["count"]],
    }
    return _gq(spark, sf_dir, "orders", q)


def q18_update_statement(spark, sf_dir):
    """§2.8 update as copy-on-write (self-referring *= on matching rows)."""
    p = load_table(spark, sf_dir, "part")
    q = {"update": [["*", "p_retailprice", 2]], "where": [">", "p_size", 30]}
    return compile_update(q, p).select("p_partkey", "p_size", "p_retailprice")


def q19_isnull(spark, sf_dir):
    """§2.2 isnull + negation (events.props has no nulls; the check is
    structural — count of null vs non-null partitions the table)."""
    q = {
        "where": ["!", ["isnull", "props"]],
        "select": [["count"]],
    }
    return _gq(spark, sf_dir, "events", q)


# ---------------------------------------------------------------------------
# Beyond-reference extensions: joins, windows, rollup, time windows —
# expressed directly in the DataFrame API (reference lists joins as
# unrealized future work, README.rst:509-511).
# ---------------------------------------------------------------------------

def q20_join_broadcast(spark, sf_dir):
    """Broadcast hash join: fact (orders) ⋈ small dim (customer)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner")
    return joined.groupBy("c_mktsegment").agg(
        F.count("o_orderkey").alias("n_orders"),
        (F.sum(F.round(F.col("o_totalprice") * 10000).cast("long")) / 10000.0).alias("total_price"),
    )


def q21_join_multi(spark, sf_dir):
    """Multi-way join through dims: orders→customer→nation→region."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy("r_name").agg(
        (F.sum(F.round(F.col("o_totalprice") * 10000).cast("long")) / 10000.0).alias("revenue"),
        F.count("o_orderkey").alias("n_orders"),
    )


def q22_window_rank(spark, sf_dir):
    """Ranking window: top-3 orders per customer."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


def q23_window_running_sum(spark, sf_dir):
    """Analytic window: per-user running event-value sum."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.filter(F.col("user_id") < 50).select(
        "user_id",
        "event_id",
        F.round(F.sum(F.col("value").cast("decimal(28,6)")).over(w).cast("double"), 6).alias("running_value"),
    )


def q24_rollup(spark, sf_dir):
    """Rollup aggregate (absent in reference; free on Spark)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q25_time_bucket(spark, sf_dir):
    """Tumbling event-time window (batch form of the streaming op)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour").start.alias("window_start"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 10000).cast("long")) / 10000.0).alias("sum_value"),
        )
    )




# ---------------------------------------------------------------------------
# North-star data-pipeline operators (dedup / text analysis / similarity)
# over the documents & embeddings tables.
# ---------------------------------------------------------------------------

from qcache_spark.operators import asof as _asof
from qcache_spark.operators import dedup as _dedup
from qcache_spark.operators import funnel as _funnel
from qcache_spark.operators import sampling as _sampling
from qcache_spark.operators import similarity as _similarity
from qcache_spark.operators import text as _text
from qcache_spark.operators import timeseries as _timeseries


def q26_dedup_exact_text(spark, sf_dir):
    """Exact dedup on whitespace/case-normalized text: 8-byte
    fingerprint shuffle key, min(doc_id) representative."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return _dedup.exact_dedup_representatives(docs, key).select("keep_id", "n_members")


def q27_dedup_token_set(spark, sf_dir):
    """Bag-of-words dedup: identical distinct-token SETS are
    permutation duplicates (catches shuffled boilerplate)."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.array_join(
        F.sort_array(F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))),
        " ",
    )
    return _dedup.exact_dedup_representatives(docs, key).select("keep_id", "n_members")


def q28_text_token_stats(spark, sf_dir):
    """Token counting: whitespace + BPE-ish regex tokens."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        _text.whitespace_token_count(F.col("text")).alias("n_ws_tokens"),
        _text.bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
    )


def q29_lang_id(spark, sf_dir):
    """Language ID via stopword-hit argmax heuristic (all codegen)."""
    docs = load_table(spark, sf_dir, "documents")
    return _text.language_id(docs).select("doc_id", "lang_pred")


def q30_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 vs the vec_id=0 embedding
    (TakeOrderedAndProject — per-partition k-heaps, no global sort)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return _similarity.cosine_topk(emb, list(qvec), k=10)


def q31_minhash_lsh_pairs(spark, sf_dir):
    """MinHash+LSH near-dup candidate pairs with exact-Jaccard verify
    (not SQL-expressible: rows-only driver check)."""
    docs = load_table(spark, sf_dir, "documents")
    return _dedup.minhash_lsh_pairs(docs, verify_threshold=0.5).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def q32_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard over a blocked candidate set (doc_id<150
    all-pairs), threshold 0.3."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    ids = docs.select("doc_id")
    cand = (
        ids.select(F.col("doc_id").alias("id_a"))
        .join(ids.select(F.col("doc_id").alias("id_b")))
        .filter(F.col("id_a") < F.col("id_b"))
    )
    return _dedup.ngram_jaccard_pairs(docs, cand).filter(F.col("jaccard") >= 0.3)


def q33_simhash(spark, sf_dir):
    """64-bit SimHash sketch per document. The gate variant uses the
    md5-derived 60-bit token hash so the DuckDB oracle computes the
    IDENTICAL sketch value (full hash_match gate); production callers
    default to the faster xxhash64 (dedup.simhash)."""
    docs = load_table(spark, sf_dir, "documents")
    return _dedup.simhash(docs, hash_fn="md5").select("doc_id", "simhash")


def q34_embedding_dup_pairs(spark, sf_dir):
    """Embedding near-dup pairs via hyperplane LSH + exact cosine
    verify — FULLY oracle-gated since round 2: the oracle replicates
    the ALGORITHM (same literal hyperplanes, same sign bits, same
    band buckets and cap, same verify cosine), not an idealized
    answer, so LSH's probabilistic recall on this corpus's
    threshold-marginal pairs (cosine 0.40-0.51) is irrelevant to the
    gate. Bit-equality of the sign bits holds because the engine uses
    the sequential-fold signature (use_expr_signature) whose add
    order matches DuckDB's list_dot_product — the same cross-engine
    float contract q51 already pins for the cosine kernel."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = _similarity.embedding_dup_pairs(
        emb, threshold=0.4, use_expr_signature=True
    )
    return pairs.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


def q35_quality_score(spark, sf_dir):
    """Quality scoring: punctuation/digit/stopword ratios + composite."""
    docs = load_table(spark, sf_dir, "documents")
    return _text.quality_score(docs).select(
        "doc_id", "n_tokens", "punct_ratio", "digit_ratio",
        "stopword_ratio", "mean_token_len", "quality_score",
    )



def q36_sessionize(spark, sf_dir):
    """Session windows (10-min gap) over events — batch form of the
    streaming sessionizer (same plan runs under readStream with a
    watermark; see qcache_spark.streaming)."""
    from qcache_spark.streaming import sessionize

    e = load_table(spark, sf_dir, "events")
    return sessionize(e, gap="10 minutes", streaming=False).select(
        "user_id", "session_start", "n_events"
    )


def q37_sliding_windows(spark, sf_dir):
    """Sliding-window rates (1h window, 15min slide): rows-only check
    (each event lands in 4 windows)."""
    from qcache_spark.streaming import sliding_rates

    e = load_table(spark, sf_dir, "events")
    return sliding_rates(e, "1 hour", "15 minutes", streaming=False)


def q38_media_features(spark, sf_dir):
    """Multimodal plumbing: media table derived from documents
    (payload = UTF-8 text bytes) → Arrow-batched mapInPandas feature
    extraction. Deriving from parquet makes every output column —
    including the fake-decode dims, which are seeded by the sha256
    content digest — reproducible by the DuckDB oracle (full gate)."""
    from qcache_spark.operators import multimodal as _mm

    docs = load_table(spark, sf_dir, "documents")
    media = _mm.media_from_documents(docs)
    return _mm.extract_image_features(media).select(
        "media_id", "width", "height", "payload_bytes", "payload_sha256"
    )



def q39_baseline_workload(spark, sf_dir):
    """The reference's own benchmark query shape
    (util/memory_benchmark.py:108-111): select+distinct on 4 columns,
    equality filter on a low-cardinality string, limit 50 — the
    apples-to-apples latency comparison point against BASELINE.md."""
    q = {
        "where": ["==", "o_orderpriority", "'2-HIGH'"],
        "distinct": ["o_custkey", "o_orderstatus", "o_orderpriority"],
        "select": ["o_custkey", "o_orderstatus", "o_orderpriority"],
        "order_by": ["o_custkey", "o_orderstatus"],
        "limit": 50,
    }
    return _gq(spark, sf_dir, "orders", q)



def q40_update_in_where(spark, sf_dir):
    """§2.8 update: simple assignment with in-list where grammar."""
    c = load_table(spark, sf_dir, "customer")
    q = {
        "update": [["c_mktsegment", "'PRIORITY'"]],
        "where": ["in", "c_mktsegment", ["'BUILDING'", "'AUTOMOBILE'"]],
    }
    return compile_update(q, c).select("c_custkey", "c_mktsegment")


def q41_cube(spark, sf_dir):
    """Cube aggregate (grouping sets family; absent in reference)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(F.round(F.col("l_extendedprice") * 10000).cast("long")) / 10000.0).alias("revenue"),
    )


def q42_ivf_search(spark, sf_dir):
    """IVF ANN search, gated: probe ALL clusters so the result must
    equal the brute-force top-k exactly — this exact-matches the
    whole IVF machinery (assignment partitions the corpus without
    dropping/duplicating vectors, per-cluster exact cosine, top-k
    merge). The approximate n_probe<n_centroids path and its
    partition-prune plan are pytest-gated
    (tests/test_operators.py::test_ivf_partitioned_write_prunes)."""
    from qcache_spark.operators.similarity import IVFIndex

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    index = IVFIndex(emb, n_centroids=8, iters=1)
    return index.search(list(qvec), k=10, n_probe=8).select(
        "vec_id", F.round("cosine", 6).alias("cosine")
    )


def q43_json_extract(spark, sf_dir):
    """JSON field extraction from the events.props string column
    (JSON ops are absent in the reference — SURVEY.md §2.9)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
        F.countDistinct(F.get_json_object("props", "$.k")).alias("n_distinct_k"),
    )


def q44_contains(spark, sf_dir):
    """`contains` filter op — the reference's aspirational substring
    operator (skipped test test_qframe.py:92-95), realized."""
    q = {
        "where": ["contains", "p_name", "'old'"],
        "select": ["p_partkey", "p_name"],
    }
    return _gq(spark, sf_dir, "part", q)


def q45_median_agg(spark, sf_dir):
    """§2.4 duck-typed aggregate: median (pandas groupby method name)."""
    q = {
        "group_by": ["l_returnflag"],
        "select": ["l_returnflag", ["median", "l_quantity"], ["min", "l_extendedprice"]],
    }
    return _gq(spark, sf_dir, "lineitem", q)



def q46_stateful_stream(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState):
    drain the event stream with per-user running-profile state, return
    the final per-user state — oracle-checkable as a batch GROUP BY."""
    from qcache_spark.streaming import read_event_stream, run_to_memory_sink, user_profiles_stateful

    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    run_to_memory_sink(user_profiles_stateful(stream), "q46_profiles", "update")
    final = spark.table("q46_profiles").groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.round(F.max("total_value"), 6).alias("total_value"),
        F.max("max_value").alias("max_value"),
    )
    return final



def q47_union(spark, sf_dir):
    """Set op (absent in the single-table reference, SURVEY §2.5):
    union of two engine-compiled slices."""
    o = load_table(spark, sf_dir, "orders")
    hi = compile_query(
        {"where": [">", "o_totalprice", 450000], "select": ["o_orderkey", "o_totalprice"]}, o
    ).sliced
    urgent = compile_query(
        {"where": ["&", ["==", "o_orderpriority", "'1-URGENT'"], ["<", "o_totalprice", 10000]],
         "select": ["o_orderkey", "o_totalprice"]}, o
    ).sliced
    return hi.unionByName(urgent)


def q48_intersect(spark, sf_dir):
    """INTERSECT (distinct) of two customer-key sets."""
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 300000).select("o_custkey")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return big.intersect(urgent)


def q49_except(spark, sf_dir):
    """EXCEPT (distinct): customers with orders but never urgent ones."""
    o = load_table(spark, sf_dir, "orders")
    all_c = o.select("o_custkey")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    # subtract = EXCEPT DISTINCT (set semantics; exceptAll would only
    # remove one occurrence per match)
    return all_c.subtract(urgent)


def q50_argmin_argmax(spark, sf_dir):
    """Deterministic first/last alternative: min_by/max_by (the
    reference's first/last are input-order-dependent; at scale
    arg-min/max by an explicit ordering column is the reproducible
    form)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        F.min("o_totalprice").alias("min_price"),
    )


def q51_embedding_pairs_exact(spark, sf_dir):
    """Exact pairwise cosine over a blocked candidate set (vec_id <
    300 all-pairs), threshold 0.4 — gates the shared cosine verify
    kernel (similarity.cosine_pairs, the same arithmetic
    embedding_dup_pairs applies to its LSH candidates) against a
    brute-force SQL oracle. The q32 pattern, for embeddings."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    ids = emb.select("vec_id")
    cand = (
        ids.select(F.col("vec_id").alias("id_a"))
        .join(ids.select(F.col("vec_id").alias("id_b")))
        .filter(F.col("id_a") < F.col("id_b"))
    )
    return _similarity.cosine_pairs(emb, cand).filter(F.col("cosine") >= 0.4)


def q52_repetition_stats(spark, sf_dir):
    """Repetition/boilerplate quality signals (Gopher/C4-style gates):
    token distinctness, duplicate-2-gram fraction, duplicate-line
    ratio — one tokenize pass, all built-in collection expressions."""
    docs = load_table(spark, sf_dir, "documents")
    return _text.repetition_stats(docs).select(
        "doc_id", "n_tokens", "distinct_token_ratio", "dup_2gram_frac",
        "dup_line_ratio",
    )


def q53_pii_scrub(spark, sf_dir):
    """PII detection + redaction: per-type match counts and the
    scrubbed text (chained regexp_replace, RE2/Java-compatible
    patterns). The corpus is synthetic (zero PII), so the oracle
    asserts the exact zero-count/no-op-redaction fixpoint; planted-PII
    semantics are pinned by tests/test_operators.py."""
    docs = load_table(spark, sf_dir, "documents")
    return _text.pii_redact(_text.pii_stats(docs)).select(
        "doc_id", "n_email", "n_phone", "n_ipv4", "text_redacted"
    )


def q54_hash_split(spark, sf_dir):
    """Deterministic hash sampling + train/valid/test split over
    documents: keep the ~50% of docs whose md5-derived 60-bit hash
    falls below the sample threshold, then assign splits 80/10/10 from
    an independent seed. Pure scan-stage expressions — no shuffle, no
    RNG — so the same rows land in the same split on any engine /
    partitioning (the DuckDB oracle reproduces every row exactly)."""
    docs = load_table(spark, sf_dir, "documents")
    sampled = _sampling.hash_sample(docs, "doc_id", 0.5, seed=7, hash_fn="md5")
    return _sampling.train_test_split(
        sampled, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1},
        seed=11, hash_fn="md5",
    ).select(
        "doc_id",
        _sampling.hash60(F.col("doc_id"), seed=11, hash_fn="md5").alias("split_hash"),
        "split",
    )


def q55_canonical_selection(spark, sf_dir):
    """Canonical doc per dup cluster: cluster on the permutation-
    insensitive token-set fingerprint (q27's key, which has real
    multi-member clusters in this corpus), keep the highest-quality
    member (ties -> lowest doc_id). One hash shuffle, map-side partial
    max_by over a (quality, -id) struct — no window sort."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.array_join(
        F.sort_array(F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))),
        " ",
    )
    scored = _text.quality_score(docs)
    return _dedup.canonical_representatives(scored, key, "quality_score").select(
        "keep_id", "best_quality", "n_members"
    )


def q56_bm25_top_terms(spark, sf_dir):
    """Top-5 BM25 terms per document: explode -> (doc,term) TF agg ->
    vocab-sized DF agg + join -> broadcast 1-row corpus stats ->
    per-doc top-k window. The score arithmetic is written in one
    canonical order so DuckDB reproduces identical doubles."""
    docs = load_table(spark, sf_dir, "documents")
    return _text.bm25_top_terms(docs, k=5)


def q57_asof_join(spark, sf_dir):
    """As-of join: each event joined to the user's most recent order
    (o_orderdate <= ts, ties -> highest o_orderkey). Union + running
    last() over one key shuffle — no range-join explosion; see
    operators/asof.py. Oracle = DuckDB row_number over the inequality
    join (an independent formulation of the same spec)."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    out = _asof.asof_join(
        e, o,
        left_on="ts", right_on="o_orderdate",
        left_by="user_id", right_by="o_custkey",
        right_cols=["o_orderkey", "o_totalprice"],
        tie_break="o_orderkey",
    )
    return out.select(
        "event_id", "user_id",
        F.col("o_orderkey").alias("asof_orderkey"),
        F.col("o_totalprice").alias("asof_totalprice"),
    )


def q58_stream_dedup(spark, sf_dir):
    """Streaming dedup with watermark-bounded state: drain the event
    stream dropping repeat (user_id, event_type) arrivals via
    dropDuplicatesWithinWatermark. The watermark covers the corpus
    span here, so the drained output is exactly the distinct key set
    (the SQL oracle); on an unbounded feed the same plan holds state
    only for the watermark horizon."""
    from qcache_spark.streaming import (
        dedup_within_watermark,
        read_event_stream,
        run_to_memory_sink,
    )

    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    out = dedup_within_watermark(
        stream.select("user_id", "event_type", "ts"),
        ["user_id", "event_type"],
        watermark="365 days",
    )
    run_to_memory_sink(out.select("user_id", "event_type"), "q58_dedup", "append")
    return spark.table("q58_dedup")


def q59_unigram_surprise(spark, sf_dir):
    """Perplexity-proxy quality score: per-doc mean negative unigram
    log-prob under the corpus's own unigram LM. Per-term contributions
    are fixed-point-snapped before summing so the distributed sum is
    exact long arithmetic (order-independent; bit-equal in DuckDB)."""
    docs = load_table(spark, sf_dir, "documents")
    return _text.unigram_surprise(docs)


def q60_decontamination(spark, sf_dir):
    """Benchmark decontamination: distinct word 3-grams each corpus
    doc shares with the held-out eval slice (doc_id % 97 == 0). Eval
    n-gram set is broadcast -> map-only probe on the corpus scan. The
    engine joins on xxhash64 of the n-gram; the oracle joins the
    n-gram strings — equality-equivalent (64-bit collisions aside)."""
    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return _dedup.ngram_contamination(corpus, ev, n=3)


def q61_asof_tolerance(spark, sf_dir):
    """As-of join with a tolerance window: like q57 but a match
    farther back than the tolerance is nulled out (pandas merge_asof
    `tolerance` semantics). The corpus's events sit ~8200-9200 days
    after the order history, so an 8400-day window keeps roughly half
    the matches — both branches are exercised. Because the as-of match
    is the NEAREST preceding row, candidate-window filtering and
    post-hoc nulling are equivalent — the engine picks the
    one-comparison-per-row form; the oracle puts the window in the
    inequality-join ON clause (an independent formulation of the same
    spec)."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    out = _asof.asof_join(
        e, o,
        left_on="ts", right_on="o_orderdate",
        left_by="user_id", right_by="o_custkey",
        right_cols=["o_orderkey", "o_totalprice"],
        tie_break="o_orderkey",
        tolerance="8400 DAYS",
    )
    return out.select(
        "event_id", "user_id",
        F.col("o_orderkey").alias("asof_orderkey"),
        F.col("o_totalprice").alias("asof_totalprice"),
    )


def q62_chunk_documents(spark, sf_dir):
    """Overlapping token-window chunking (chunk_size=32, stride=16):
    documents -> model-sized training sequences. Entirely scan-stage
    (one projection + Generate, no shuffle); the oracle reproduces the
    same window rule with DuckDB list functions over the same shared
    tokenizer regex."""
    docs = load_table(spark, sf_dir, "documents")
    return _text.chunk_documents(docs, chunk_size=32, stride=16)


def q63_top_terms_by_lang(spark, sf_dir):
    """Per-language top-20 terms (vocabulary building / corpus audit):
    explode -> (lang, term) partial-agg shuffle -> top-k window over
    the vocab-sized table. Ties break by term so both engines rank
    identically."""
    docs = load_table(spark, sf_dir, "documents")
    return _text.top_terms_by_group(docs, k=20, group_col="lang")


def q64_stratified_sample(spark, sf_dir):
    """Deterministic stratified sample: the 10 lowest-hashing docs per
    source (md5-portable hash, ties by doc_id) — selects ~40% of this
    corpus, so the rank cutoff is genuinely exercised. Catalyst's
    WindowGroupLimit turns the rank filter into a per-map-task top-N
    heap, so the group shuffle carries samples, not the corpus; the
    oracle reproduces the identical hash + ordering in DuckDB."""
    docs = load_table(spark, sf_dir, "documents")
    return _sampling.stratified_sample(
        docs, "source", 10, "doc_id", seed=7, hash_fn="md5"
    ).select("doc_id", "source", "sample_rank")


def q65_stream_enrich(spark, sf_dir):
    """Stream-static enrichment: drain the event stream joined (per
    micro-batch, broadcast, zero streaming state) against the customer
    dimension, then aggregate the drained rows per (segment, type).
    The oracle is the equivalent batch join+groupBy — stream-static
    join semantics guarantee the drained result equals the batch
    result over the same files."""
    from qcache_spark.streaming import (
        enrich_with_dimension,
        read_event_stream,
        run_to_memory_sink,
    )

    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    cust = load_table(spark, sf_dir, "customer")
    enriched = enrich_with_dimension(
        stream.select("event_id", "user_id", "event_type"),
        cust,
        "user_id",
        "c_custkey",
        ["c_mktsegment"],
    )
    run_to_memory_sink(enriched, "q65_enrich", "append")
    return (
        spark.table("q65_enrich")
        .groupBy(
            F.col("c_mktsegment").alias("mktsegment"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def q66_shared_spans(spark, sf_dir):
    """Exact shared-span pairs: docs sharing ≥1 verbatim 8-token span
    + the distinct-span count (exact-substring duplication, the
    copy-paste complement to MinHash set similarity). Inverted-index
    self-join on 64-bit span hashes with posting-list cap; the oracle
    joins the span STRINGS (hash↔string equality-equivalent, q60's
    argument)."""
    docs = load_table(spark, sf_dir, "documents")
    return _dedup.shared_ngram_pairs(docs, n=8)


def q67_training_pipeline(spark, sf_dir):
    """Flagship end-to-end training-data pipeline, composed from the
    engine's operator families:

      exact dedup (min-id representative per normalized-text
      fingerprint) -> benchmark decontamination (drop docs sharing any
      3-gram with the doc_id%97 eval slice) -> quality gate
      (composite >= 0.76) -> language gate (lang_pred == 'en') ->
      deterministic md5 train/valid/test split.

    Scale shape, per stage: the dedup shuffle carries (8-byte hash,
    id); the kept/clean joins are id-only semi/anti joins; the
    contamination probe is a map-only broadcast join; quality + lang
    are ONE codegen scan; the split is a scan-stage expression. No
    stage ever shuffles document bodies. The oracle composes the
    individually-gated SQL formulations of q26/q60/q35/q29/q54 into
    one CTE chain — both engines execute the whole funnel, not just
    the pieces."""
    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)

    norm_key = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    # NOTE (r5): a one-window min-id formulation (partitionBy
    # fingerprint) was tried and REVERTED: it halves the exchanges and
    # scans, but AQE coalesces the tiny post-window shuffle to one
    # partition and every downstream text stage (shingling, language
    # id) then runs single-task — 3.1 s -> 5.2 s at sf0.1. The
    # agg+semi-join shape keeps the scan's full parallelism under the
    # heavy text work, which is what actually matters at scale.
    reps = _dedup.exact_dedup_representatives(corpus, norm_key)
    kept = corpus.join(
        reps.select(F.col("keep_id").alias("doc_id")), "doc_id", "left_semi"
    )
    cont = _dedup.ngram_contamination(kept, ev, n=3)
    clean = kept.join(cont.select("doc_id"), "doc_id", "left_anti")

    scored = _text.language_id(_text.quality_score(clean))
    filtered = scored.filter(
        (F.col("quality_score") >= 0.76) & (F.col("lang_pred") == "en")
    )
    out = _sampling.train_test_split(
        filtered, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1},
        seed=11, hash_fn="md5",
    )
    return out.select("doc_id", "quality_score", "split")


def q68_sequence_packing(spark, sf_dir):
    """Sequence packing over q62's chunks: 8 hash buckets (md5-
    portable), 128-token packs, budget-aligned tape windows. The
    oracle reproduces the identical bucket hash, tape order, and
    floor-division pack assignment in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = _text.chunk_documents(docs, chunk_size=32, stride=16)
    return _text.pack_sequences(
        chunks, token_budget=128, n_buckets=8, hash_fn="md5"
    ).select("doc_id", "chunk_id", "n_chunk_tokens", "bucket", "tape_offset", "pack_id")


def q69_rollup_qgrammar(spark, sf_dir):
    """Grouping-sets family expressed in the JSON q-grammar (VERDICT
    r2 advice #9 / r4 item 9): {"group_by": {"rollup": [...]}}
    compiles through plans/compiler._parse_structured_group_by to
    DataFrame.rollup — subtotal + grand-total rows from one partial-agg
    shuffle (Spark Expand), no second pass over the table. The local
    executor declines structured group_by, so this always serves from
    the Catalyst plan."""
    q = {
        "where": ["<=", "l_quantity", 25],
        "group_by": {"rollup": ["l_returnflag", "l_linestatus"]},
        "select": [
            "l_returnflag",
            "l_linestatus",
            ["sum", "l_quantity"],
            ["count", "l_orderkey"],
        ],
    }
    return _gq(spark, sf_dir, "lineitem", q)


def q70_ivf_pruned_search(spark, sf_dir):
    """IVF ANN with a PRUNED probe over the persisted partitioned
    index (VERDICT r2 advice #10 / r4 item 10): n_probe=3 of
    n_centroids=8, so the scan touches only the probed cluster_id
    partitions of the on-disk index (PartitionFilters on the file
    index — tests/test_operators.py::test_ivf_pruned_entry_plan_and_recall
    asserts both the prune and recall >= 0.6 vs the exact q30 top-k).
    Complements q42, which probes ALL clusters to exact-match the
    brute-force oracle.

    Fully oracle-gated since r8 (VERDICT r7 item 6): the build is
    deterministic (stride-seeded centroids + 1 Lloyd step), so the
    DuckDB oracle replays the ENTIRE pipeline — init centroids = the 8
    lowest vec_ids, argmin-L2 assignment (row_number over d2 with ci
    tiebreak, matching np.argmin's first-wins), per-dim mean refine
    with empty-cluster carryover, 3 nearest clusters to the query, and
    exact top-10 cosine over their members. Distances are compared as
    c.c - 2 x.c (the same algebra _assign_udf uses); last-ulp float
    divergence between BLAS and DuckDB could only flip an assignment
    on a near-tie, and the gate data has none (verified stable across
    fresh index rebuilds at sf0.001/0.01/0.1).
    """
    from qcache_spark.operators.similarity import IVFIndex

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").first()[0])
    params = {"n_centroids": 8, "iters": 1}
    path = _ivf_cache_path(sf_dir, **params)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        IVFIndex(emb, **params).write(spark, path)
    try:
        index = IVFIndex.load(spark, path, expect=params)
    except Exception:
        # Stale artifact (older format version / different params /
        # unreadable sidecar): rebuild in place rather than serving
        # wrong probes (VERDICT r5 item 8).
        IVFIndex(emb, **params).write(spark, path)
        index = IVFIndex.load(spark, path, expect=params)
    out = index.search(qvec, k=10, n_probe=3)
    return out.select(
        "vec_id", F.round(F.col("cosine"), 6).alias("cosine")
    )


def q71_dedup_clusters(spark, sf_dir):
    """Connected components (alternating large-star/small-star,
    operators/dedup.py:dedup_clusters) over the exact shared-span pair
    graph (q66's edge set — chosen BECAUSE it is SQL-expressible, so
    the clustering itself gets an external oracle: the DuckDB side
    rebuilds the same pairs and closes them with a recursive CTE).
    cluster_id = min doc_id of each component; singletons label
    themselves."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = _dedup.shared_ngram_pairs(docs, n=8)
    return _dedup.dedup_clusters(pairs, docs.select("doc_id"))


def q72_cardinality_sketch(spark, sf_dir):
    """HLL cardinality sketch vs exact count, per source
    (operators/sketch.py): the 100 TB pattern is the ESTIMATE — a
    fixed-size sketch per shuffle row instead of the raw key domain.

    Envelope-gated since r9 (VERDICT r8 item 4; rows-only before):
    HLL++ estimates are engine-specific, so the gated columns are the
    EXACT count (replicable by any engine) and ``est_ok`` — whether
    the estimate landed within the documented 3-sigma envelope
    (|est - exact| <= max(3, 3 x rsd x exact), rsd = 0.02, the same
    bound tests/test_operators.py::test_cardinality_estimate_within_rsd
    pins). The oracle computes the exact side and asserts TRUE, so a
    drifted estimator now hash-FAILS the gate instead of passing a
    row count."""
    from qcache_spark.operators import sketch

    docs = load_table(spark, sf_dir, "documents")
    est = sketch.cardinality_by(docs, ["source"], "doc_id", rsd=0.02)
    exact = sketch.cardinality_by(docs, ["source"], "doc_id", exact=True)
    joined = est.withColumnRenamed("n_distinct", "n_distinct_est").join(
        exact.withColumnRenamed("n_distinct", "n_distinct_exact"), "source"
    )
    bound = F.greatest(F.lit(3.0), 0.06 * F.col("n_distinct_exact"))
    return joined.select(
        "source",
        "n_distinct_exact",
        (
            F.abs(F.col("n_distinct_est") - F.col("n_distinct_exact")) <= bound
        ).alias("est_ok"),
    )


def q73_asof_forward(spark, sf_dir):
    """FORWARD as-of: each event joined to the user's NEXT order
    (o_orderdate >= ts, ties -> lowest o_orderkey) — the mirror
    direction of q57, exercising operators/asof.py's direction switch
    under the oracle. Same union + running-first shape over one key
    shuffle."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    out = _asof.asof_join(
        e, o,
        left_on="ts", right_on="o_orderdate",
        left_by="user_id", right_by="o_custkey",
        right_cols=["o_orderkey", "o_totalprice"],
        tie_break="o_orderkey",
        direction="forward",
    )
    return out.select(
        "event_id", "user_id",
        F.col("o_orderkey").alias("asof_orderkey"),
        F.col("o_totalprice").alias("asof_totalprice"),
    )


def q74_event_gaps(spark, sf_dir):
    """Per-user inter-event gap statistics via a LAG window (the
    sessionization precursor): gap = microseconds since the user's
    previous event in (ts, event_id) order. One key-partitioned window
    shuffle; the per-user aggregate reuses the same exchange (both
    partition by user_id), which AQE plans as a single shuffle."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.withColumn(
        "gap_us",
        F.expr("timestampdiff(MICROSECOND, lag(ts) OVER "
               "(PARTITION BY user_id ORDER BY ts, event_id), ts)"),
    )
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("gap_us").alias("max_gap_us"),
        F.min("gap_us").alias("min_gap_us"),
        F.sum("gap_us").alias("sum_gap_us"),
    )


def q75_negative_sampling(spark, sf_dir):
    """Deterministic negative sampling for contrastive training
    (operators/sampling.py:negative_pairs): k=4 hash-drawn negatives
    per anchor doc, md5-portable so the oracle regenerates the exact
    pair set. Scan-stage explode + one equi-join against the id set —
    no RNG state, no driver sampling."""
    docs = load_table(spark, sf_dir, "documents")
    return _sampling.negative_pairs(docs, k=4, hash_fn="md5")


def q77_group_centroids(spark, sf_dir):
    """Per-label mean embedding (operators/similarity.py:
    group_centroids), exploded to (label, pos, centroid_val) scalars.
    Fixed-point sums make the distributed mean bit-reproducible and
    oracle-matchable with zero tolerance despite float addition being
    non-associative."""
    emb = load_table(spark, sf_dir, "embeddings")
    return _similarity.group_centroids(emb, "label")


def q78_chunk_dup_stats(spark, sf_dir):
    """Per-document boilerplate fraction (operators/text.py:
    chunk_dup_stats): share of a doc's 32-token chunks that repeat
    verbatim in other docs. Oracle groups the chunk STRINGS where the
    engine groups 64-bit fingerprints (equality-equivalent, q66's
    argument)."""
    docs = load_table(spark, sf_dir, "documents")
    return _text.chunk_dup_stats(docs, chunk_size=32, stride=16)


def q79_contrastive_dataset(spark, sf_dir):
    """Contrastive training-pair builder, composed from two gated
    operators: the POSITIVE for each anchor is its strongest exact
    shared-span partner (q66's edge set; max n_shared, ties -> lowest
    partner id), and each anchor gets k=2 hash-drawn NEGATIVES (q75's
    generator, md5-portable). One window over the pair edges + one
    equi-join — the anchor/positive/negative triples a contrastive
    embedding run trains on, reproducible bit-for-bit across engines."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = _dedup.shared_ngram_pairs(docs, n=8)
    sym = pairs.select(
        F.col("id_a").alias("anchor_id"),
        F.col("id_b").alias("positive_id"),
        "n_shared",
    ).unionByName(
        pairs.select(
            F.col("id_b").alias("anchor_id"),
            F.col("id_a").alias("positive_id"),
            "n_shared",
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("n_shared").desc(), F.col("positive_id").asc()
    )
    best = (
        sym.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    negs = _sampling.negative_pairs(docs, k=2, hash_fn="md5")
    return best.join(negs, "anchor_id").select(
        "anchor_id", "positive_id", "n_shared", "j", "negative_id"
    )


def q76_curriculum_buckets(spark, sf_dir):
    """Curriculum bucketing: exact NTILE(10) over document length with
    deterministic tie-break (operators/sampling.py:curriculum_buckets)
    — the easy→hard scheduling / quality-threshold primitive.

    Scale path (round 6): distributed exact NTILE — range repartition
    on (score, id), per-partition-id row_number windows, broadcast
    cumulative offsets, NTILE arithmetic on the global rank. No
    empty-partition-spec Window / SinglePartition exchange anywhere in
    the plan (plan-asserted in tests); same oracle as before because
    the bucket assignment is bit-identical to SQL NTILE."""
    docs = load_table(spark, sf_dir, "documents")
    return _sampling.curriculum_buckets(docs, "n_chars").select(
        "doc_id", "n_chars", "bucket"
    )


def q80_embedding_quantize(spark, sf_dir):
    """Int8 scalar quantization of the embedding column
    (operators/similarity.py:quantize_embeddings) — the embedding-store
    compression primitive (float32 -> int8 + one scale/vector = 4x
    smaller ANN index). Gate emits an exact-integer summary per vector
    (scale pinned at 1e-9 resolution via floor, quantized sums, max
    magnitude) so the oracle comparison has zero float tolerance; the
    reconstruction-error bound is pytest-checked."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _similarity.quantize_embeddings(emb)
    sum_q = F.aggregate(
        F.col("qvec"), F.lit(0).cast("long"), lambda a, x: a + x
    )
    sum_abs_q = F.aggregate(
        F.col("qvec"), F.lit(0).cast("long"), lambda a, x: a + F.abs(x)
    )
    return q.select(
        "vec_id",
        F.floor(F.col("scale") * F.lit(1e9)).cast("long").alias("scale_e9"),
        sum_q.alias("sum_q"),
        sum_abs_q.alias("sum_abs_q"),
        F.array_max(F.transform(F.col("qvec"), F.abs)).alias("max_abs_q"),
    )


def q81_weighted_sample(spark, sf_dir):
    """Length-weighted deterministic Bernoulli sample
    (operators/sampling.py:weighted_sample): P[keep] = n_chars/1024,
    md5-portable hash, exact decimal-domain comparison — the oracle
    reproduces the identical kept set with HUGEINT arithmetic. Scan-
    stage narrow filter; no RNG, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return _sampling.weighted_sample(
        docs, "n_chars", denom=1024, seed=3, hash_fn="md5"
    ).select("doc_id", "n_chars")


def q82_user_funnel(spark, sf_dir):
    """Strict ordered conversion funnel view -> click -> purchase
    (operators/funnel.py:user_funnel): step i+1 counts only events
    strictly after the user's first completion of step i. Every
    shuffle keys on user_id (min-agg + equi-join per step); no global
    ordering, no per-user history materialization."""
    events = load_table(spark, sf_dir, "events")
    return _funnel.user_funnel(events, ["view", "click", "purchase"])


def q83_ngram_novelty(spark, sf_dir):
    """Inter-document trigram novelty (operators/text.py:
    ngram_novelty): per document, its distinct word-trigram count and
    how many of those trigrams no smaller-id document contains —
    the ingest-order "new content" measure. Scan-stage gram flatMap,
    one partial-agg shuffle on the gram for min-doc attribution, one
    equi-join back; integers only, zero float tolerance."""
    docs = load_table(spark, sf_dir, "documents")
    return _text.ngram_novelty(docs, n=3)


def q84_vocab_overlap(spark, sf_dir):
    """Pairwise language vocabulary overlap (operators/text.py:
    vocab_overlap): distinct-token sets per lang, intersection sizes
    for all unordered lang pairs (zero-overlap pairs included via the
    broadcast sizes cross join). The cross-corpus contamination probe.
    Vocabulary-sized shuffles only; bodies never move."""
    docs = load_table(spark, sf_dir, "documents")
    return _text.vocab_overlap(docs, "lang")


def q85_fk_orphan_audit(spark, sf_dir):
    """Referential-integrity audit over the star schema: orphan counts
    for lineitem->orders, orders->customer, customer->nation. Each
    relation projects to its KEY COLUMN before the anti-join, so the
    exchanges carry 8-byte keys, never rows — auditing 100 TB of fact
    tables shuffles only the key sets (and the dim sides broadcast).
    The data-quality gate every pipeline runs before training."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    def audit(name, child_keys, parent_keys):
        cond = (
            child_keys[child_keys.columns[0]]
            == parent_keys[parent_keys.columns[0]]
        )
        return child_keys.join(parent_keys, cond, "left_anti").agg(
            F.lit(name).alias("relation"),
            F.count(F.lit(1)).alias("n_orphans"),
        )

    out = audit("lineitem->orders", li, orders.select("o_orderkey"))
    out = out.unionByName(
        audit(
            "orders->customer",
            orders.select("o_custkey"),
            cust.select("c_custkey"),
        )
    )
    return out.unionByName(
        audit(
            "customer->nation",
            cust.select("c_nationkey"),
            F.broadcast(nation.select("n_nationkey")),
        )
    )


def q86_table_profile(spark, sf_dir):
    """Column-profile report over orders (operators/text.py:
    profile_table): per column, row/null/exact-distinct counts and
    min/max rendered to strings. ONE aggregation pass for all columns
    (single scan + 1-row shuffle); the unpivot explodes the single
    aggregated row. Float columns are excluded from the GATE because
    Java and DuckDB format doubles differently — the operator itself
    profiles any type."""
    orders = load_table(spark, sf_dir, "orders")
    return _text.profile_table(
        orders,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
         "o_orderdate"],
    )


def q87_fuzzy_match(spark, sf_dir):
    """Fuzzy record linkage (operators/dedup.py:edit_distance_pairs):
    part-name pairs within Levenshtein distance 2, candidates blocked
    on the lowercased last name token (the head noun), block
    membership capped at 50 by id order. Blocking equi-join +
    JVM levenshtein verify — the Fellegi–Sunter shape with zero
    Python; the cap bounds any hot block at cap^2 candidates. Oracle:
    DuckDB's levenshtein over the identical block/cap construction."""
    part = load_table(spark, sf_dir, "part")
    return _dedup.edit_distance_pairs(
        part, text_col="p_name", id_col="p_partkey",
        max_dist=2, block_cap=50,
    )


def q88_skewed_join(spark, sf_dir):
    """Explicit skew-split join under the oracle
    (operators/skew.py:skewed_join): events->customer enrichment where
    the hottest user_ids route through a broadcast branch and the cold
    tail through the normal shuffle, unioned; the split is EXACT for
    inner joins, so the oracle is the plain SQL join — the gate checks
    that the plan surgery changes nothing semantically. Aggregated to
    market segment (count + summed value) to keep the wire result
    small."""
    from qcache_spark.operators.skew import skewed_join

    e = load_table(spark, sf_dir, "events").select("user_id", "value")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = skewed_join(e, c, on="user_id", top_n=10, min_count=50)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        # order-independent long sum (the dsum pattern, SCALING.md §2)
        (F.sum(F.round(F.col("value") * 10000).cast("long")) / 10000.0)
        .alias("sum_value"),
    )


def q89_interval_join(spark, sf_dir):
    """Stream-stream interval join, gated on its batch path
    (streaming/joins.py:interval_join — batch/stream unification:
    the parity pytest proves the streaming run produces these same
    rows): each view event paired with the same user's purchases
    within the next 4 hours. The streaming form is THE stateful join
    shape — watermark on both sides + the interval condition bound
    the buffered state to rate x (watermark + within). Output keeps
    integer ids and the gap in seconds (no wire timestamps — Java/
    DuckDB timestamp rendering differs; the gap captures the times)."""
    from qcache_spark.streaming import interval_join

    e = load_table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    j = interval_join(v, p, on="user_id", within="4 hours", streaming=False)
    return j.select(
        F.col("event_id").alias("view_id"),
        F.col("event_id_r").alias("purchase_id"),
        "user_id",
        # ntz has no direct long cast; ntz->ltz is a wall-time identity
        # under the engine's UTC-pinned session, ltz->long is epoch s
        (
            F.col("ts_r").cast("timestamp").cast("long")
            - F.col("ts").cast("timestamp").cast("long")
        ).alias("gap_s"),
    )


def q90_pagerank(spark, sf_dir):
    """PageRank (operators/graph.py) over the bipartite order<->part
    purchase graph from lineitem — edges in both directions, weighted
    by line count (duplicates kept deliberately: an order with 3 lines
    of one part pushes 3 edge-contributions, and the SQL oracle
    replicates that). 3 iterations in exact integer micro-units (floor
    division everywhere), so DuckDB unrolling the same 3 rounds
    produces IDENTICAL longs — the only way an iterative float-free
    algorithm gets a value-exact external oracle. Top 20 parts,
    deterministic tiebreak on id."""
    from qcache_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # LONG node ids, not strings: orders even (2k), parts odd (2k+1).
    # The per-round joins sort/shuffle the edge set on the node id;
    # long keys cut the q90 sweep time ~2x vs 'o<key>'/'p<key>'
    # strings (string sort + bigger shuffle payload). The wire output
    # decodes back to the readable prefixed form.
    o_id = (F.col("l_orderkey") * 2).cast("long")
    p_id = (F.col("l_partkey") * 2 + 1).cast("long")
    edges = li.select(o_id.alias("src"), p_id.alias("dst")).union(
        li.select(p_id.alias("src"), o_id.alias("dst"))
    )
    ranks = pagerank(edges, iters=3)
    return (
        ranks.filter(F.col("id") % 2 == 1)
        .select(
            F.concat(F.lit("p"), F.expr("(id - 1) div 2").cast("string"))
            .alias("id"),
            "rank",
        )
        .orderBy(F.col("rank").desc(), "id")
        .limit(20)
    )


def _pagerank_oracle_sql(iters: int = 3) -> str:
    """Unroll the exact integer PageRank iteration as chained CTEs —
    DuckDB's recursive CTEs do not allow per-step aggregation, but a
    fixed iteration count needs no recursion."""
    parts = [
        """
        WITH e AS (
            SELECT CAST(l_orderkey * 2 AS BIGINT) AS src,
                   CAST(l_partkey * 2 + 1 AS BIGINT) AS dst
            FROM lineitem
            UNION ALL
            SELECT CAST(l_partkey * 2 + 1 AS BIGINT),
                   CAST(l_orderkey * 2 AS BIGINT)
            FROM lineitem
        ), nodes AS (
            SELECT DISTINCT id FROM (
                SELECT src AS id FROM e UNION SELECT dst FROM e
            )
        ), deg AS (
            SELECT src AS id, COUNT(*) AS deg FROM e GROUP BY 1
        ), r0 AS (
            SELECT id, CAST(1000000 AS BIGINT) AS rank FROM nodes
        )"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""", r{i} AS (
            SELECT n.id,
                   CAST(150000 + (85 * COALESCE(c.s, 0)) // 100
                        AS BIGINT) AS rank
            FROM nodes n LEFT JOIN (
                SELECT e.dst AS id, SUM(r.rank // d.deg) AS s
                FROM e
                JOIN r{i - 1} r ON e.src = r.id
                JOIN deg d ON r.id = d.id
                GROUP BY 1
            ) c ON n.id = c.id
        )"""
        )
    parts.append(
        f"""
        SELECT 'p' || CAST((id - 1) // 2 AS VARCHAR) AS id, rank
        FROM r{iters}
        WHERE id % 2 = 1
        ORDER BY rank DESC, 'p' || CAST((id - 1) // 2 AS VARCHAR)
        LIMIT 20
    """
    )
    return "".join(parts)


def _pagerank_dangling_oracle_sql(iters: int = 3) -> str:
    """Unrolled weighted + dangling-redistribution PageRank: same
    chained-CTE device as _pagerank_oracle_sql, plus per-round scalar
    subqueries for the dangling mass D = SUM(rank) over out-degree-0
    nodes and its floor share D // n — the exact integers the engine
    computes driver-side."""
    share = (
        "(SELECT COALESCE(SUM(rank), 0) FROM r{prev} "
        "WHERE id NOT IN (SELECT id FROM deg)) "
        "// (SELECT COUNT(*) FROM nodes)"
    )
    parts = [
        """
        WITH e AS (
            SELECT CAST(o_custkey * 2 AS BIGINT) AS src,
                   CAST(o_orderkey * 2 + 1 AS BIGINT) AS dst,
                   CAST(o_orderkey % 3 + 1 AS BIGINT) AS w
            FROM orders
        ), nodes AS (
            SELECT DISTINCT id FROM (
                SELECT src AS id FROM e UNION SELECT dst FROM e
            )
        ), deg AS (
            SELECT src AS id, SUM(w) AS deg FROM e GROUP BY 1
        ), r0 AS (
            SELECT id, CAST(1000000 AS BIGINT) AS rank FROM nodes
        )"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""", r{i} AS (
            SELECT n.id,
                   CAST(150000 + (85 * (COALESCE(c.s, 0) +
                        {share.format(prev=i - 1)})) // 100
                        AS BIGINT) AS rank
            FROM nodes n LEFT JOIN (
                SELECT e.dst AS id, SUM((r.rank * e.w) // d.deg) AS s
                FROM e
                JOIN r{i - 1} r ON e.src = r.id
                JOIN deg d ON r.id = d.id
                GROUP BY 1
            ) c ON n.id = c.id
        )"""
        )
    parts.append(
        f"""
        SELECT CAST((id - 1) // 2 AS BIGINT) AS o_key, rank
        FROM r{iters}
        WHERE id % 2 = 1
        ORDER BY rank DESC, o_key
        LIMIT 20
    """
    )
    return "".join(parts)


def q91_triangle_count(spark, sf_dir):
    """Top-20 triangle-participation nodes of the part co-purchase
    graph (operators/graph.py:triangle_participation): parts are
    adjacent when some order contains both. Degree-ordered orientation
    bounds the wedge join at m^1.5 total with no hub hotspot (the
    "last reducer" fix); the DuckDB oracle brute-forces the canonical
    a<b<c closure, proving orientation exact. Edge build is a
    lineitem self-join on the order key — per-order line counts are
    bounded (TPC-H <= 7), so the pair fanout is O(rows), not O(rows^2).
    """
    from qcache_spark.operators.graph import triangle_participation

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
    )
    return (
        triangle_participation(edges)
        .orderBy(F.col("n_triangles").desc(), "id")
        .limit(20)
    )


def q92_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix of user event sequences
    (operators/funnel.py:event_transitions): counts + distinct users
    per (prev_type -> next_type) pair. One user-keyed window (lag) +
    one vocabulary-bounded agg; oracle is the identical LAG in SQL."""
    events = load_table(spark, sf_dir, "events")
    return _funnel.event_transitions(events)


def q93_time_bucket_ohlc(spark, sf_dir):
    """Hourly OHLC bars per event type (operators/timeseries.py:ohlc):
    the resample/downsample primitive as ONE partial agg — open/close
    via min_by/max_by on the composite (ts, id) key, no window, no
    per-bucket sort; the exchange carries one row per (type, hour).
    Integer epoch buckets + long micro-unit sums on the wire."""
    events = load_table(spark, sf_dir, "events")
    return _timeseries.ohlc(events, bucket_seconds=3600)


def q94_percentile_outliers(spark, sf_dir):
    """Exact per-type p99 + winsorized tail statistics
    (operators/timeseries.py:grouped_percentile_stats): distributed
    grouped rank via ONE range shuffle + per-partition sorts +
    broadcast offsets — the q76 distributed-NTILE device generalized
    to per-group rank, so no event type's history ever transits a
    single task. Oracle replicates with a plain per-type ROW_NUMBER
    (exact at sf0.01; the plans differ, the values must not)."""
    events = load_table(spark, sf_dir, "events")
    return _timeseries.grouped_percentile_stats(events, pct=0.99)


def q95_prefix_jaccard_join(spark, sf_dir):
    """Lossless set-similarity self-join at shingle-set Jaccard >= 0.6
    (operators/dedup.py:prefix_jaccard_pairs): prefix filtering over
    the global rarest-first element order — the EXACT counterpart to
    the probabilistic MinHash-LSH pairs (q31), over the same 3-gram
    shingle space. The oracle brute-forces the UNBLOCKED element join;
    green proves prefix filtering loses no pair. Integer threshold
    arithmetic, zero float tolerance."""
    docs = load_table(spark, sf_dir, "documents")
    return _dedup.prefix_jaccard_pairs(docs, threshold_pct=60, shingle_size=3)


def q96_knn_label_consistency(spark, sf_dir):
    """k-NN label-noise audit (operators/similarity.py:
    knn_label_agreement): every 8th vector probes the corpus; exact-
    integer int8 dot products rank neighbors (portable across engines,
    unlike float cosine), WindowGroupLimit keeps the per-probe top-k
    pre-shuffle. Oracle replicates quantization + dot + ranking in
    SQL — value-exact, no float tolerance anywhere."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 8 == 0)
    return _similarity.knn_label_agreement(emb, probes, k=5)


def q97_token_pmi(spark, sf_dir):
    """Top-100 PMI collocations within a +-2 token window
    (operators/text.py:token_cooccurrence_pmi): pair generation is
    scan-stage array zipping (no positional self-join); exchanges are
    vocabulary-bounded. PMI ships as round(pmi*1e6) LONG with a fixed
    ln association order so the SQL oracle reproduces every bit."""
    docs = load_table(spark, sf_dir, "documents")
    return _text.token_cooccurrence_pmi(docs, window=2, min_count=5, top_n=100)


def q98_cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users bucketed by first-activity day,
    distinct active users per (cohort_day, day_offset) — the product-
    analytics/engagement primitive. Integer epoch-day arithmetic on
    the wire. Shuffles: one (user, day) distinct, one per-user min
    agg, one user-keyed join, one final vocabulary-bounded agg —
    every exchange keys on user or on the tiny (cohort, offset) pair;
    no windows, no per-user history collection."""
    events = load_table(spark, sf_dir, "events")
    epoch_day = (
        F.col("ts").cast("timestamp").cast("long") / F.lit(86400)
    ).cast("long")
    activity = events.select(
        F.col("user_id").alias("u"), epoch_day.alias("d")
    ).distinct()
    first = activity.groupBy("u").agg(F.min("d").alias("d0"))
    return (
        activity.join(first, "u")
        .groupBy(
            F.col("d0").alias("cohort_day"),
            (F.col("d") - F.col("d0")).alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def q99_neardup_clusters(spark, sf_dir):
    """Connected components over the LOSSLESS q95 prefix-Jaccard pair
    graph (dedup.prefix_jaccard_pairs -> dedup.dedup_clusters), plus
    each component's size — the full near-dup clustering pipeline a
    corpus build runs, with BOTH stages externally checkable: the
    oracle rebuilds the brute-force pair set and closes it with a
    recursive CTE (the q71 device over the q95 edge set)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = _dedup.prefix_jaccard_pairs(docs, threshold_pct=60, shingle_size=3)
    clusters = _dedup.dedup_clusters(
        pairs.select("id_a", "id_b"), docs.select("doc_id")
    )
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return clusters.join(sizes, "cluster_id").select(
        "doc_id", "cluster_id", "cluster_size"
    )


def q100_top_revenue_orders(spark, sf_dir):
    """The canonical BI join-agg shape (TPC-H Q3): segment-filtered
    customers ⋈ date-filtered orders ⋈ lineitem, revenue per order,
    top 10. The plan Catalyst should produce unaided: the segment
    filter and date predicates push into the scans, the customer side
    broadcasts under AQE, and the one real shuffle keys on the group.
    Revenue in exact cent-units (round to long) — no float sums on
    the wire; the timestamp renders as a string (identical in both
    engines under UTC)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cut = F.lit("1998-06-01").cast("timestamp_ntz")
    revenue = F.sum(
        F.round(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
        ).cast("long")
    )
    return (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cut)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > cut)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(revenue.alias("revenue_c"))
        .orderBy(F.col("revenue_c").desc(), "l_orderkey")
        .limit(10)
    )


def q101_snapshot_diff(spark, sf_dir):
    """Snapshot-drift audit (operators/diff.py:snapshot_diff_summary):
    yesterday's orders vs a deterministically mutated today — rows
    with key % 11 == 0 deleted, key % 13 == 0 re-keyed as additions,
    key % 7 == 0 re-prioritized — classified added/removed/changed/
    unchanged plus per-column change counts. ONE full-outer join on
    the key (the only shuffle; null-safe comparisons in the
    projection) + a 1-row aggregation. The oracle rebuilds the same
    mutation and the same census in SQL."""
    from qcache_spark.operators.diff import snapshot_diff_summary

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_custkey"
    )
    key = F.col("o_orderkey")
    mutated = orders.filter(key % 11 != 0).withColumn(
        "o_orderpriority",
        F.when(key % 7 == 0, F.lit("0-DIFF")).otherwise(F.col("o_orderpriority")),
    )
    additions = orders.filter(key % 13 == 0).select(
        (key + 90_000_000).alias("o_orderkey"),
        "o_orderstatus",
        "o_orderpriority",
        "o_custkey",
    )
    today = mutated.unionByName(additions)
    return snapshot_diff_summary(orders, today, ["o_orderkey"])


def q102_pagerank_dangling(spark, sf_dir):
    """Weighted PageRank WITH dangling-mass redistribution
    (operators/graph.py:pagerank, both r7 opt-ins): the customer ->
    order purchase graph is maximally dangling — every order node is
    a sink — so without redistribution all sink mass leaks each round.
    Edge weight = o_orderkey % 3 + 1 (deterministic integers). The
    exact-integer round (floor divisions, literal per-round dangling
    share D div n) unrolls verbatim in the DuckDB oracle — same longs
    or nothing. Top 20 order nodes, tiebreak on decoded key."""
    from qcache_spark.operators.graph import pagerank

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = (F.col("o_custkey") * 2).cast("long")
    ordn = (F.col("o_orderkey") * 2 + 1).cast("long")
    w = (F.col("o_orderkey") % 3 + 1).cast("long")
    edges = orders.select(cust.alias("src"), ordn.alias("dst"), w.alias("w"))
    ranks = pagerank(
        edges, iters=3, weight_col="w", redistribute_dangling=True
    )
    return (
        ranks.filter(F.col("id") % 2 == 1)
        .select(F.expr("(id - 1) div 2").alias("o_key"), "rank")
        .orderBy(F.col("rank").desc(), "o_key")
        .limit(20)
    )


def q103_salted_aggregate(spark, sf_dir):
    """Skew-safe two-phase salted aggregation
    (operators/skew.py:salted_aggregate): partials over (keys, salt),
    recombined over keys — the map-side decomposition that bounds any
    hot key's reducer at 1/salt_buckets of its rows. The oracle is the
    PLAIN group-by, so green proves the rewrite semantics-free (the
    q88 device, applied to the aggregation side). Sums ride in long
    micro-units: a salted float sum would change association order and
    hash-mismatch by design; long sums are order-independent."""
    from qcache_spark.operators.skew import salted_aggregate

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "qty_e4", F.round(F.col("l_quantity") * 10000).cast("long")
    )
    out = salted_aggregate(
        li,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty_e4": ("sum", "qty_e4"),
            "n_rows": ("count", "l_orderkey"),
            "min_price": ("min", "l_extendedprice"),
            "max_price": ("max", "l_extendedprice"),
        },
        salt_buckets=16,
    )
    return out.orderBy("l_returnflag", "l_linestatus")


def q104_skewed_join_composite(spark, sf_dir):
    """Composite-key skew-split join (operators/skew.py:skewed_join,
    VERDICT r7 item 8): each event enriched with its (user_id,
    event_type) history profile — hot value COMBINATIONS route through
    a broadcast branch, the cold tail through the normal shuffle. The
    oracle is the PLAIN 2-key SQL join (the q88/q103 device), so green
    proves the OR-of-conjunction routing semantics-free, including
    null-component rows. Aggregated per event_type; sums are exact
    longs (counts of counts), order-independent by construction."""
    from qcache_spark.operators.skew import skewed_join

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    profile = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_hist")
    )
    joined = skewed_join(
        ev, profile, ["user_id", "event_type"], top_n=10, min_count=50
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("n_hist").alias("sum_hist"),
        )
        .orderBy("event_type")
    )


def q105_minhash_probe(spark, sf_dir):
    """Incremental near-dup probe (operators/dedup.py:
    minhash_probe_pairs): a NEW batch (doc_id % 4 == 0) deduped
    against the EXISTING corpus (the other 75%) without re-pairing the
    corpus — the daily-ingestion pattern at 100 TB. Corpus postings
    take ONE exchange (bucket-cap window + join share it); the batch
    side is broadcast; verify recomputes shingles only for candidate
    corpus members. Oracle: brute-force batch x corpus shingle
    Jaccard >= 0.5 — valid for the same reason as q31's (LSH recall
    1.0 at this threshold on this corpus, hash-Jaccard == string-
    Jaccard absent 32-bit collisions)."""
    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    return _dedup.minhash_probe_pairs(
        corpus, batch, verify_threshold=0.5
    ).select(
        "batch_id", "corpus_id", F.round("jaccard", 6).alias("jaccard")
    )


def q107_minhash_index_probe(spark, sf_dir):
    """Persisted, appendable MinHash-LSH index (operators/dedup.py:
    MinHashIndex — VERDICT r8 missing #1): the q105 probe re-derived
    and re-shuffled corpus postings from raw text on every batch
    admission (~38 TB at 100 TB of text); this entry exercises the
    full index lifecycle instead — BUILD postings+sets parquet from
    half the corpus, WRITE, LOAD (format-version-checked), APPEND the
    other half as new files (O(batch) I/O), then PROBE the batch off
    the loaded index: stored postings narrowed to touched buckets by a
    broadcast semi-join (no corpus shuffle), verify from stored
    shingle sets (no corpus text recompute). Same split and the same
    brute-force batch x corpus oracle as q105 — the result must be
    bit-identical to the from-text probe."""
    import shutil
    import tempfile

    from qcache_spark.operators.dedup import (
        MINHASH_FORMAT_VERSION,
        MinHashIndex,
    )

    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    # build on %4 in {1,2}, append %4 == 3 — the gate covers append too
    built = docs.filter((F.col("doc_id") % 4 == 1) | (F.col("doc_id") % 4 == 2))
    appended = docs.filter(F.col("doc_id") % 4 == 3)
    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join(
        tempfile.gettempdir(),
        f"qcache_spark_minhash_{sf_tag}_v{MINHASH_FORMAT_VERSION}",
    )
    # rebuild fresh each run: append is not idempotent (by design — it
    # admits a batch), so a stable path must start from a clean build
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(path + "_meta", ignore_errors=True)
    MinHashIndex(built).write(spark, path)
    index = MinHashIndex.load(spark, path)
    index.append(appended)
    return index.probe(batch, verify_threshold=0.5).select(
        "batch_id", "corpus_id", F.round("jaccard", 6).alias("jaccard")
    )


def q106_token_budget_mix(spark, sf_dir):
    """Domain-mixture selection under per-language character budgets
    (operators/sampling.py:token_budget_mix): deterministic md5-hash
    order per lang, exact cumulative cutoff at the budget — the
    "N tokens of code, M of web" data-mixing primitive. The oracle
    replays the identical hash (the q54 md5 device) and the grouped
    cumulative sum as a SQL window; exact because weights are integer
    chars and the hash order is total (ties impossible: doc_id is in
    the order key)."""
    from qcache_spark.operators.sampling import token_budget_mix

    docs = load_table(spark, sf_dir, "documents")
    out = token_budget_mix(
        docs,
        "lang",
        "n_chars",
        _Q106_BUDGETS,
        key_col="doc_id",
        seed=0,
        hash_fn="md5",
    )
    return out.select("doc_id", "lang", "n_chars", "cum_weight")


# shared by the q106 entry and its generated oracle — one source of
# truth for the budget boundaries
_Q106_BUDGETS = {"en": 25_000, "de": 9_000, "es": 9_000, "fr": 9_000,
                 "zh": 9_000}


def q109_quantile_sketch_audit(spark, sf_dir):
    """GK quantile sketch under a rank-space envelope gate
    (operators/sketch.py:quantile_rank_audit — the approx-quantiles
    analogue of q72's HLL envelope): per source, percentile_approx
    p50/p95 estimates at accuracy=1000 must be values whose duplicate
    rank interval intersects the guaranteed window
    (p ± 1/accuracy) x n. Gated columns are the exact side only — n
    and the ok booleans — which the oracle replicates as COUNT + TRUE,
    so an out-of-bound sketch hash-fails. Cost shape at 100 TB: the
    one-pass GK sketch + a broadcast join of O(groups) estimates and
    one partial-agg count pass; no sort, no exact-rank machinery."""
    from qcache_spark.operators import sketch

    docs = load_table(spark, sf_dir, "documents")
    return sketch.quantile_rank_audit(
        docs, ["source"], "n_chars", [0.5, 0.95], accuracy=1000
    )


def q110_ivf_append_search(spark, sf_dir):
    """IVF index APPEND (operators/similarity.py:IVFIndex.append —
    the embeddings analogue of q107's MinHash admission loop): build
    the index on even vec_ids, write, load (version-checked), append
    the odd half — assigned to the EXISTING centroids, appended as new
    files inside the cluster_id partitions, O(batch) — then run the
    pruned 3-of-8 probe over the grown index. The oracle replays the
    q70 deterministic pipeline with the BUILD restricted to even ids
    (stride-seeded init + one Lloyd step) and the ASSIGNMENT over all
    ids, exactly what build+append produces."""
    import shutil
    import tempfile

    from qcache_spark.operators.similarity import (
        IVF_FORMAT_VERSION,
        IVFIndex,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").first()[0])
    built = emb.filter(F.col("vec_id") % 2 == 0)
    appended = emb.filter(F.col("vec_id") % 2 == 1)
    params = {"n_centroids": 8, "iters": 1}
    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join(
        tempfile.gettempdir(),
        f"qcache_spark_ivfapp_{sf_tag}_v{IVF_FORMAT_VERSION}",
    )
    # rebuild fresh each run: append is not idempotent (it ADMITS a
    # batch), so the stable path starts from a clean build every time
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(path + "_meta", ignore_errors=True)
    IVFIndex(built, **params).write(spark, path)
    index = IVFIndex.load(spark, path, expect=params)
    index.append(appended)
    out = index.search(qvec, k=10, n_probe=3)
    return out.select(
        "vec_id", F.round(F.col("cosine"), 6).alias("cosine")
    )


def q120_minhash_delete_probe(spark, sf_dir):
    """Index deletion/retraction (operators/dedup.py:
    MinHashIndex.delete — the GDPR/takedown lifecycle step): build the
    index on doc_id %4 != 0, DELETE the %8 == 5 subset (tombstones —
    one small parquet append, O(|ids|) regardless of corpus size; the
    probe masks them with a broadcast anti-join BEFORE the bucket-cap
    window), then probe the %4 == 0 batch. The oracle is the q105
    brute-force batch x corpus Jaccard with the corpus restricted to
    the UNDELETED ids — i.e. probe-after-delete must be exactly what a
    rebuild-without-the-deleted-docs would answer."""
    import shutil
    import tempfile

    from qcache_spark.operators.dedup import (
        MINHASH_FORMAT_VERSION,
        MinHashIndex,
    )

    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join(
        tempfile.gettempdir(),
        f"qcache_spark_minhash_del_{sf_tag}_v{MINHASH_FORMAT_VERSION}",
    )
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(path + "_meta", ignore_errors=True)
    idx = MinHashIndex(corpus)
    idx.write(spark, path)
    idx.delete(corpus.filter(F.col("doc_id") % 8 == 5).select("doc_id"))
    index = MinHashIndex.load(spark, path)
    return index.probe(batch, verify_threshold=0.5).select(
        "batch_id", "corpus_id", F.round("jaccard", 6).alias("jaccard")
    )


def q122_minhash_merge_probe(spark, sf_dir):
    """Parallel index construction (operators/dedup.py:
    MinHashIndex.merge): the corpus shards %4 == 1|2 and %4 == 3 are
    built as INDEPENDENT indexes — each build sees only its shard, no
    cross-shard shuffle anywhere — then folded together with O(shard)
    file appends (the second shard never touches disk before the
    merge), and the %4 == 0 batch is probed off the merged result.
    Oracle: identical to q105/q107 — the merged index must answer
    exactly what one index built over the whole corpus answers."""
    import shutil
    import tempfile

    from qcache_spark.operators.dedup import (
        MINHASH_FORMAT_VERSION,
        MinHashIndex,
    )

    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    shard_a = docs.filter(
        (F.col("doc_id") % 4 == 1) | (F.col("doc_id") % 4 == 2)
    )
    shard_b = docs.filter(F.col("doc_id") % 4 == 3)
    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join(
        tempfile.gettempdir(),
        f"qcache_spark_minhash_merge_{sf_tag}_v{MINHASH_FORMAT_VERSION}",
    )
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(path + "_meta", ignore_errors=True)
    idx = MinHashIndex(shard_a)
    idx.write(spark, path)
    idx.merge(MinHashIndex(shard_b))
    index = MinHashIndex.load(spark, path)
    return index.probe(batch, verify_threshold=0.5).select(
        "batch_id", "corpus_id", F.round("jaccard", 6).alias("jaccard")
    )


def q121_ivf_delete_search(spark, sf_dir):
    """Vector deletion (operators/similarity.py:IVFIndex.delete —
    q120's embeddings analogue): build the index on ALL vectors,
    tombstone the vec_id %5 == 0 subset (one O(ids) parquet append;
    search/dup_probe mask them with a broadcast anti-join), then run
    an ALL-clusters probe — which makes IVF exactly brute force (the
    q42 device), so the oracle is exact top-10 cosine over the
    UNDELETED ids: deletion must behave as if those vectors were
    never indexed, while the centroids (and thus the partitions)
    stay untouched."""
    import shutil
    import tempfile

    from qcache_spark.operators.similarity import IVF_FORMAT_VERSION, IVFIndex

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").first()[0])
    params = {"n_centroids": 8, "iters": 1}
    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join(
        tempfile.gettempdir(),
        f"qcache_spark_ivf_del_{sf_tag}_v{IVF_FORMAT_VERSION}",
    )
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(path + "_meta", ignore_errors=True)
    # NOTE: no manual path+"_tombstones" cleanup — write() itself
    # clears a previous occupant's tombstones (ADVICE r9 #1), and this
    # gate re-proves that every round: a prior run's tombstones sit at
    # exactly that path when write() runs.
    IVFIndex(emb, **params).write(spark, path)
    idx = IVFIndex.load(spark, path, expect=params)
    idx.delete(emb.filter(F.col("vec_id") % 5 == 0).select("vec_id"))
    index = IVFIndex.load(spark, path, expect=params)
    out = index.search(qvec, k=10, n_probe=8)
    return out.select(
        "vec_id", F.round(F.col("cosine"), 6).alias("cosine")
    )


def q119_ivf_compacted_search(spark, sf_dir):
    """q110's lifecycle plus COMPACTION (operators/similarity.py:
    IVFIndex.compact — the embeddings analogue of q115): build on
    even vec_ids, append the odd half (a second file round inside
    every cluster_id partition), compact — assignments rewritten to
    ONE id-sorted file per cluster under generation-1 dirs, meta
    pointer flipped, superseded partitions removed — then LOAD (which
    must follow the pointer) and run the pruned 3-of-8 probe. Same
    oracle as q110: compaction must be result-invisible while
    collapsing admission small files (probes otherwise pay per-file
    footer opens and lose row-group pruning)."""
    import shutil
    import tempfile

    from qcache_spark.operators.similarity import (
        IVF_FORMAT_VERSION,
        IVFIndex,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").first()[0])
    built = emb.filter(F.col("vec_id") % 2 == 0)
    appended = emb.filter(F.col("vec_id") % 2 == 1)
    params = {"n_centroids": 8, "iters": 1}
    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join(
        tempfile.gettempdir(),
        f"qcache_spark_ivfcompact_{sf_tag}_v{IVF_FORMAT_VERSION}",
    )
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(path + "_meta", ignore_errors=True)
    IVFIndex(built, **params).write(spark, path)
    idx = IVFIndex.load(spark, path, expect=params)
    idx.append(appended)
    idx.compact()
    index = IVFIndex.load(spark, path, expect=params)
    out = index.search(qvec, k=10, n_probe=3)
    return out.select(
        "vec_id", F.round(F.col("cosine"), 6).alias("cosine")
    )


def q108_token_mix_upsampled(spark, sf_dir):
    """Mixture UPSAMPLING (operators/sampling.py:token_budget_mix
    epochs — VERDICT r8 item 6): low-resource domains whose budget
    exceeds their corpus repeat deterministic hash-order passes
    (with-replacement) until the budget fills, stopping exactly
    mid-pass; each row carries its 1-based pass in `epoch`. At the
    sf0.01 gate, 'de' (19.5k chars total) runs ~2.6 passes against a
    50k budget while 'en' stays a single under-budget prefix — both
    planned as unioned prefix branches over ONE cached range shuffle
    (only epochs that can contribute are planned). The oracle replays
    the identical integer arithmetic: per-lang totals + the same md5
    hash-order cumsum, cross-joined with pass numbers."""
    from qcache_spark.operators.sampling import token_budget_mix

    docs = load_table(spark, sf_dir, "documents")
    out = token_budget_mix(
        docs,
        "lang",
        "n_chars",
        _Q108_BUDGETS,
        key_col="doc_id",
        seed=0,
        hash_fn="md5",
        epochs=_Q108_EPOCHS,
    )
    return out.select("doc_id", "lang", "n_chars", "cum_weight", "epoch")


_Q108_BUDGETS = {"de": 50_000, "zh": 25_000, "en": 30_000}
_Q108_EPOCHS = 3


def _token_mix_upsampled_oracle_sql() -> str:
    """DuckDB replica of q108: same md5 60-bit hash and per-lang
    cumsum as q106's oracle, plus per-lang totals and an explicit
    cross join over pass numbers — overall cumulative =
    (epoch-1) x total + within-pass cumulative, same integer cutoff.
    Generated from the SAME budgets/epochs constants as the entry."""
    case = " ".join(
        f"WHEN '{g}' THEN {b}" for g, b in _Q108_BUDGETS.items()
    )
    return f"""
        WITH h AS (
            SELECT doc_id, lang, n_chars,
                   ('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hh
            FROM documents
            WHERE lang IS NOT NULL AND doc_id IS NOT NULL
              AND n_chars IS NOT NULL
        ), c AS (
            SELECT doc_id, lang, n_chars,
                   SUM(n_chars) OVER (
                       PARTITION BY lang ORDER BY hh, doc_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS cum,
                   SUM(n_chars) OVER (PARTITION BY lang) AS total
            FROM h
        ), e AS (
            SELECT c.*, ep.epoch
            FROM c CROSS JOIN (
                SELECT unnest(range(1, {_Q108_EPOCHS + 1})) AS epoch
            ) ep
        )
        SELECT doc_id, lang, n_chars,
               CAST((epoch - 1) * total + cum AS BIGINT) AS cum_weight,
               CAST(epoch AS INT) AS epoch
        FROM e
        WHERE (epoch - 1) * total + cum <= (CASE lang {case} END)
    """


def _token_budget_mix_oracle_sql() -> str:
    """DuckDB replica of q106: identical md5 60-bit hash (the q54
    device), identical per-lang cumulative window, identical integer
    budget cutoffs — generated from the SAME budgets dict as the
    entry, so the boundaries cannot drift."""
    case = " ".join(
        f"WHEN '{g}' THEN {b}" for g, b in _Q106_BUDGETS.items()
    )
    return f"""
        WITH h AS (
            SELECT doc_id, lang, n_chars,
                   ('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hh
            FROM documents
            WHERE lang IS NOT NULL AND doc_id IS NOT NULL
              AND n_chars IS NOT NULL
        ), c AS (
            SELECT doc_id, lang, n_chars,
                   SUM(n_chars) OVER (
                       PARTITION BY lang ORDER BY hh, doc_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS cum
            FROM h
        )
        SELECT doc_id, lang, n_chars, CAST(cum AS BIGINT) AS cum_weight
        FROM c
        WHERE cum <= (CASE lang {case} END)
    """


def q111_distribution_match(spark, sf_dir):
    """Largest exact subsample matching a target language distribution
    (operators/sampling.py:distribution_matched_sample — categorical
    importance resampling, the DoReMi/DSIR-style mixture-reshaping
    primitive): integer-exact quotas k_g = floor(w_g * N / W) with
    N = min_g floor(n_g * W / w_g), selection = the k_g-row prefix of
    each group's deterministic md5 hash order (via token_budget_mix
    with unit weights — no per-group single reducer). The oracle
    replays the identical integer arithmetic and hash-order
    row_number; 'zh' is deliberately outside the target (dropped)."""
    from qcache_spark.operators.sampling import distribution_matched_sample

    docs = load_table(spark, sf_dir, "documents")
    out = distribution_matched_sample(
        docs, "lang", _Q111_TARGET, key_col="doc_id", seed=0, hash_fn="md5"
    )
    return out.select("doc_id", "lang", "sample_rank")


_Q111_TARGET = {"en": 5, "de": 2, "es": 2, "fr": 1}


def _distribution_match_oracle_sql() -> str:
    """DuckDB replica of q111: same md5 60-bit hash, same integer
    quota arithmetic (N = min floor(n*W/w), k = floor(w*N/W)), same
    per-group hash-order row_number cutoff — generated from the SAME
    target dict as the entry."""
    tw = {str(g): int(w) for g, w in _Q111_TARGET.items() if w > 0}
    W = sum(tw.values())
    values = ", ".join(f"('{g}', {w})" for g, w in tw.items())
    return f"""
        WITH tw AS (SELECT * FROM (VALUES {values}) AS t(lang, w)),
        cnt AS (
            SELECT CAST(lang AS VARCHAR) AS lang, COUNT(*) AS n
            FROM documents
            WHERE doc_id IS NOT NULL AND lang IS NOT NULL
            GROUP BY 1
        ),
        nn AS (
            SELECT MIN((COALESCE(c.n, 0) * {W}) // t.w) AS nt
            FROM tw t LEFT JOIN cnt c ON c.lang = t.lang
        ),
        k AS (SELECT t.lang, (t.w * nn.nt) // {W} AS kq FROM tw t, nn),
        h AS (
            SELECT doc_id, lang,
                   ('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hh
            FROM documents
            WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        ),
        r AS (
            SELECT doc_id, lang,
                   ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hh, doc_id) AS rnk
            FROM h
        )
        SELECT r.doc_id, r.lang, CAST(r.rnk AS BIGINT) AS sample_rank
        FROM r JOIN k ON k.lang = r.lang
        WHERE r.rnk <= k.kq
    """


def q112_balanced_shards(spark, sf_dir):
    """Weight-balanced training-shard assignment
    (operators/sampling.py:balanced_shards): global rank by
    (n_chars desc, doc_id) dealt round-robin over 8 shards —
    per-shard char totals differ pairwise by at most one document's
    n_chars, so data-parallel readers stay in step. The rank is
    distributed-exact (range repartition + per-partition windows +
    broadcast offsets, NO single-reducer global window — plan-asserted
    in pytest); the oracle replays it as one SQL window, valid at
    oracle scale."""
    from qcache_spark.operators.sampling import balanced_shards

    docs = load_table(spark, sf_dir, "documents")
    out = balanced_shards(
        docs,
        "n_chars",
        _Q112_SHARDS,
        key_col="doc_id",
        shard_col="shard",
        rank_col="shard_rank",
    )
    return out.select("doc_id", "n_chars", "shard", "shard_rank")


_Q112_SHARDS = 8


def _balanced_shards_oracle_sql() -> str:
    """DuckDB replica of q112: one global window over the identical
    total order (COALESCE(n_chars,0) DESC, doc_id), round-robin
    modulo — generated from the SAME shard count as the entry."""
    return f"""
        SELECT doc_id, n_chars,
               CAST((ROW_NUMBER() OVER (
                   ORDER BY COALESCE(n_chars, 0) DESC, doc_id) - 1)
                   % {_Q112_SHARDS} AS INT) AS shard,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY COALESCE(n_chars, 0) DESC, doc_id)
                   AS BIGINT) AS shard_rank
        FROM documents
        WHERE doc_id IS NOT NULL
    """


def q113_cluster_safe_split(spark, sf_dir):
    """Leakage-safe train/test split (operators/sampling.py:
    cluster_split): assignment keyed on the near-dup CLUSTER id
    (q71's connected components over the q66 shared-span pair graph),
    so near-duplicate documents can never straddle the split — the
    eval-contamination guard a per-document split lacks. The oracle
    wraps the q71 recursive-CTE clustering (already individually
    gated) and applies the q54 md5 threshold device to the cluster
    id; gating (doc_id, split) end-to-end checks the composition:
    any clustering or threshold drift flips a split value."""
    from qcache_spark.operators.sampling import cluster_split

    docs = load_table(spark, sf_dir, "documents")
    pairs = _dedup.shared_ngram_pairs(docs, n=8)
    clusters = _dedup.dedup_clusters(pairs, docs.select("doc_id"))
    out = cluster_split(
        docs, clusters, _Q113_WEIGHTS, seed=11, hash_fn="md5"
    )
    return out.select("doc_id", "split")


_Q113_WEIGHTS = {"train": 0.9, "test": 0.1}


def q114_semantic_dedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) over the
    embeddings table (operators/similarity.py:semantic_dedup):
    deterministic k-means — the q70 IVF build, 8 stride-seeded
    centroids + 1 Lloyd step with empty-cluster carryover — then
    within each cluster every vector with a LOWER-id neighbor at
    cosine >= 0.40 is dropped (this corpus's near-dup band is cosine
    0.40-0.51, the q34 pairs; the "dominated by a smaller id" policy
    is order-free, so the kept set is partition-invariant). The
    quadratic stage is confined within clusters: ONE self-join keyed
    on cluster_id over an opcache'd (id, vector, norm) base. The
    oracle replays the ENTIRE pipeline — the q70 clustering CTEs plus
    a NOT EXISTS dominated filter — and cluster ids are part of the
    gated output, so assignment drift fails the hash, not just
    membership. Cross-engine float stability: assignment algebra is
    q70's (c.c - 2 x.c), the cosine kernel is q51's (index-order
    fold = DuckDB list_dot_product)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return _similarity.semantic_dedup(
        emb, n_centroids=8, iters=1, threshold=0.40
    ).select("vec_id", F.col("cluster_id").cast("long").alias("cluster_id"))


def q115_minhash_compacted_probe(spark, sf_dir):
    """q107's index lifecycle plus COMPACTION (operators/dedup.py:
    MinHashIndex.compact): build postings+sets from doc_id %4 in
    {1,2}, append %4==3 (a second file round inside every _band=
    partition), then compact — postings rewritten into ONE
    bucket-sorted file per band under generation-1 dirs, the meta
    sidecar's generation pointer flipped, superseded dirs removed —
    reload from disk (load() must follow the pointer) and probe
    %4==0 off the compacted files. Gated by the same brute-force
    batch x corpus Jaccard oracle as q105/q107: compaction must be
    result-invisible while collapsing append small files (365 daily
    admissions = 365 files per band otherwise; each probe then pays
    per-file footer opens and loses _bucket row-group pruning)."""
    import shutil
    import tempfile

    from qcache_spark.operators.dedup import (
        MINHASH_FORMAT_VERSION,
        MinHashIndex,
    )

    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    built = docs.filter((F.col("doc_id") % 4 == 1) | (F.col("doc_id") % 4 == 2))
    appended = docs.filter(F.col("doc_id") % 4 == 3)
    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join(
        tempfile.gettempdir(),
        f"qcache_spark_minhash_compact_{sf_tag}_v{MINHASH_FORMAT_VERSION}",
    )
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(path + "_meta", ignore_errors=True)
    idx = MinHashIndex(built)
    idx.write(spark, path)
    idx.append(appended)
    idx.compact()
    index = MinHashIndex.load(spark, path)
    return index.probe(batch, verify_threshold=0.5).select(
        "batch_id", "corpus_id", F.round("jaccard", 6).alias("jaccard")
    )


def q116_minhash_admit(spark, sf_dir):
    """The complete admission primitive (operators/dedup.py:
    MinHashIndex.admit): probe the batch (doc_id %4 == 0) against the
    indexed corpus (%4 != 0), drop rows that near-duplicate the
    corpus OR are dominated by a lower-id row of the same batch
    (intra-batch LSH self-join at the index's own parameters), append
    only the survivors, return them. The oracle is fully brute-force:
    batch ids minus (any corpus neighbor at jaccard >= 0.5) minus
    (any LOWER-id batch neighbor at >= 0.5) — dominance is a pair
    property, so a row dominated only by an already-dropped row is
    still dropped (order-free, partition-invariant). LSH recall 1.0
    vs brute force on this corpus is pinned by the q31/q105 gates;
    hash-vs-string shingle Jaccard equivalence by the same."""
    import shutil
    import tempfile

    from qcache_spark.operators.dedup import (
        MINHASH_FORMAT_VERSION,
        MinHashIndex,
    )

    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join(
        tempfile.gettempdir(),
        f"qcache_spark_minhash_admit_{sf_tag}_v{MINHASH_FORMAT_VERSION}",
    )
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(path + "_meta", ignore_errors=True)
    idx = MinHashIndex(corpus)
    idx.write(spark, path)
    return idx.admit(batch, verify_threshold=0.5).select("doc_id")


def q117_ivf_admit(spark, sf_dir):
    """The embeddings admission step (operators/similarity.py:
    IVFIndex.dup_probe/admit — q116's analogue for vectors): build the
    deterministic IVF index on the corpus (vec_id %4 != 0; the q70
    build — 8 stride-seeded centroids + 1 Lloyd step), write + load
    it, then ADMIT the batch (%4 == 0): drop batch vectors that
    near-duplicate the corpus within their home cluster (n_probe=1 —
    SemDeDup's within-cluster discipline applied incrementally,
    cosine >= 0.40) or a lower-id batch vector sharing the home
    cluster (dominated policy), append only the survivors. The oracle
    replays everything: k-means fit on the CORPUS subset, c1
    assignment for both sides, and two NOT EXISTS filters. Cost is
    O(batch): batch assignment is one Arrow matmul, the corpus side
    is partition-pruned to touched cluster dirs, the join broadcasts
    the batch."""
    import shutil
    import tempfile

    from qcache_spark.operators.similarity import IVF_FORMAT_VERSION, IVFIndex

    emb = load_table(spark, sf_dir, "embeddings")
    batch = emb.filter(F.col("vec_id") % 4 == 0)
    corpus = emb.filter(F.col("vec_id") % 4 != 0)
    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join(
        tempfile.gettempdir(),
        f"qcache_spark_ivf_admit_{sf_tag}_v{IVF_FORMAT_VERSION}",
    )
    # admit is not idempotent (it admits); start from a clean build
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(path + "_meta", ignore_errors=True)
    params = {"n_centroids": 8, "iters": 1}
    IVFIndex(corpus, **params).write(spark, path)
    idx = IVFIndex.load(spark, path, expect=params)
    return idx.admit(batch, threshold=0.40, n_probe=1).select("vec_id")


def q118_streaming_admit(spark, sf_dir):
    """Streaming ingestion through the persistent near-dup index
    (streaming/admission.py): doc_id %3 == 1 and %3 == 2 land as two
    files, drained one micro-batch each (maxFilesPerTrigger=1,
    availableNow) through MinHashIndex.admit — batch 2 is deduped
    against corpus PLUS batch 1's admitted survivors, the state no
    watermark-bounded streaming operator could hold. Returns every id
    the index holds afterwards. The oracle replays the sequential
    admission exactly: S1 = %3==1 survivors vs the corpus (q116's two
    NOT EXISTS), S2 = %3==2 survivors vs corpus UNION S1, result =
    corpus + S1 + S2 — the strongest external gate the streaming
    family has (q46/q58 gate batch-degenerate paths; this gates true
    multi-micro-batch stateful behavior)."""
    import shutil
    import tempfile

    from qcache_spark.operators.dedup import (
        MINHASH_FORMAT_VERSION,
        MinHashIndex,
    )
    from qcache_spark.streaming import streaming_admit

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 == 1).select("doc_id", "text")
    b2 = docs.filter(F.col("doc_id") % 3 == 2).select("doc_id", "text")
    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = os.path.join(
        tempfile.gettempdir(),
        f"qcache_spark_stream_admit_{sf_tag}_v{MINHASH_FORMAT_VERSION}",
    )
    shutil.rmtree(root, ignore_errors=True)
    land = os.path.join(root, "landing")
    # distinct dirs written in order: both mtime and path order agree,
    # so the file source drains a before b deterministically
    b1.coalesce(1).write.parquet(os.path.join(land, "a"))
    b2.coalesce(1).write.parquet(os.path.join(land, "b"))
    idx_path = os.path.join(root, "index")
    MinHashIndex(corpus).write(spark, idx_path)
    idx = MinHashIndex.load(spark, idx_path)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{land}/*/")
    )
    q = streaming_admit(
        stream, idx, checkpoint_dir=os.path.join(root, "ckpt"),
        verify_threshold=0.5,
    )
    q.awaitTermination()
    reloaded = MinHashIndex.load(spark, idx_path)
    return reloaded.sets.select(F.col("_id").alias("doc_id"))


def q123_ivf_streaming_admit(spark, sf_dir):
    """Streaming ingestion through the persistent EMBEDDINGS index
    (streaming/admission.py generalized over IVFIndex — q118's
    missing modality, VERDICT r9 Next #4): vec_id %3 == 1 and %3 == 2
    land as two files drained one micro-batch each
    (maxFilesPerTrigger=1, availableNow) through IVFIndex.admit —
    batch 2 is deduped against the corpus PLUS batch 1's admitted
    survivors within each vector's home cluster (n_probe=1, cosine >=
    0.40, plus the lower-id dominated policy intra-batch). Returns
    every vec_id the index holds afterwards. The oracle replays the
    sequential admission exactly: the q117 k-means replay (stride
    seed + 1 Lloyd step) assigns every vector, S1 = %3==1 survivors
    vs the %3==0 corpus (two NOT EXISTS), S2 = %3==2 survivors vs
    corpus UNION S1, result = corpus + S1 + S2. Per micro-batch the
    cost is O(batch): assignment is one Arrow matmul, the corpus side
    is partition-pruned to touched cluster dirs, the watermark +
    admission lease go through the Hadoop FS layer."""
    import shutil
    import tempfile

    from qcache_spark.operators.similarity import IVF_FORMAT_VERSION, IVFIndex
    from qcache_spark.streaming import streaming_admit

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 3 == 0)
    b1 = emb.filter(F.col("vec_id") % 3 == 1)
    b2 = emb.filter(F.col("vec_id") % 3 == 2)
    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = os.path.join(
        tempfile.gettempdir(),
        f"qcache_spark_ivf_stream_{sf_tag}_v{IVF_FORMAT_VERSION}",
    )
    shutil.rmtree(root, ignore_errors=True)
    land = os.path.join(root, "landing")
    # distinct dirs written in order: both mtime and path order agree,
    # so the file source drains a before b deterministically
    b1.coalesce(1).write.parquet(os.path.join(land, "a"))
    b2.coalesce(1).write.parquet(os.path.join(land, "b"))
    idx_path = os.path.join(root, "index")
    params = {"n_centroids": 8, "iters": 1}
    IVFIndex(corpus, **params).write(spark, idx_path)
    idx = IVFIndex.load(spark, idx_path, expect=params)
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{land}/*/")
    )
    q = streaming_admit(
        stream, idx, checkpoint_dir=os.path.join(root, "ckpt"),
        threshold=0.40, n_probe=1,
    )
    q.awaitTermination()
    reloaded = IVFIndex.load(spark, idx_path, expect=params)
    return reloaded.assigned.select("vec_id")


def q124_int8_rerank_search(spark, sf_dir):
    """Quantized-storage ANN (operators/similarity.py:IVFIndex
    store_int8=True — the q80 quantization COMPOSED into the index,
    VERDICT r9 Next #7): the index persists int8 codes + scale beside
    the float vectors; search ranks candidates from the CODES ONLY
    (parquet column pruning never reads the float pages in the
    ranking stage — 4x less I/O per probe at the 100 TB tier), takes
    the top-40 shortlist (ties to the lower vec_id), then re-scores
    the shortlist EXACTLY from the float column through a pushed-down
    id IN-filter. The oracle replays both stages: q80's
    floor(x/scale + 0.5) quantization, the int8-cosine top-40 window
    (scale cancels in cosine), and the exact rerank top-10. n_probe
    covers all 8 clusters so the quantize+rerank composition is the
    thing under test (pruning is q42/q119's gate)."""
    import shutil
    import tempfile

    from qcache_spark.operators.similarity import IVF_FORMAT_VERSION, IVFIndex

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").first()[0])
    params = {"n_centroids": 8, "iters": 1, "store_int8": True}
    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join(
        tempfile.gettempdir(),
        f"qcache_spark_ivf_sq8_{sf_tag}_v{IVF_FORMAT_VERSION}",
    )
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(path + "_meta", ignore_errors=True)
    IVFIndex(emb, **params).write(spark, path)
    index = IVFIndex.load(spark, path, expect=params)
    out = index.search(qvec, k=10, n_probe=8, rerank=40)
    return out.select(
        "vec_id", F.round(F.col("cosine"), 6).alias("cosine")
    )


def q125_ivf_refit_search(spark, sf_dir):
    """Centroid-drift rebuild (operators/similarity.py:IVFIndex.refit
    — the lifecycle verb append's contract defers to): build the index
    on even vec_ids, append the odd half (assigned to the STALE
    even-only centroids — the drift scenario), then REFIT: centroids
    re-fit on the full live corpus, assignments rewritten under
    generation 1, meta pointer flipped, superseded generation deleted.
    Because the deterministic k-means (stride-seeded init by id order
    + 1 Lloyd step) sees exactly the same rows a fresh build on ALL
    vectors would, refit reproduces the fresh build's assignments and
    search results exactly (centroids to ~1e-12 — FP summation order)
    — so the oracle is q70's fresh-build SQL replay verbatim (init = 8
    lowest vec_ids, one Lloyd step, 3 nearest clusters to the query,
    exact top-10 cosine over their members)."""
    import shutil
    import tempfile

    from qcache_spark.operators.similarity import IVF_FORMAT_VERSION, IVFIndex

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").first()[0])
    built = emb.filter(F.col("vec_id") % 2 == 0)
    appended = emb.filter(F.col("vec_id") % 2 == 1)
    params = {"n_centroids": 8, "iters": 1}
    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join(
        tempfile.gettempdir(),
        f"qcache_spark_ivf_refit_{sf_tag}_v{IVF_FORMAT_VERSION}",
    )
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(path + "_meta", ignore_errors=True)
    IVFIndex(built, **params).write(spark, path)
    idx = IVFIndex.load(spark, path, expect=params)
    idx.append(appended)
    idx.refit()
    index = IVFIndex.load(spark, path, expect=params)
    out = index.search(qvec, k=10, n_probe=3)
    return out.select(
        "vec_id", F.round(F.col("cosine"), 6).alias("cosine")
    )


def q126_crossmodal_curation(spark, sf_dir):
    """Cross-modal curation funnel — the q67 flagship's missing
    modality composed in: exact TEXT dedup (q26's min-id
    representatives over the normalized-text fingerprint) selects the
    kept documents, SemDeDup then prunes semantic near-duplicates over
    the SURVIVORS' embeddings (doc_id == vec_id in the testdata;
    q114's within-cluster dominated policy with the k-means fit on the
    kept subset — the realistic order: cheap exact dedup first shrinks
    the corpus the quadratic-within-cluster stage sees), and q35's
    composite quality gate (>= 0.76) keeps the trainable remainder.
    Returns (doc_id, cluster_id, quality_score).

    The oracle composes the three individually-gated SQL formulations
    — the q26 GROUP BY fingerprint as the kept set, the q114 k-means +
    NOT EXISTS chain with its corpus CTE restricted to kept ids, and
    the q35 composite — so both engines execute the whole cross-modal
    funnel, not just the pieces. Scale shape: the text-dedup shuffle
    carries (8-byte hash, id); the embeddings side joins by id
    (left_semi) before any vector work; SemDeDup's quadratic stage is
    cluster-confined; quality is one codegen scan."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    norm_key = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    reps = _dedup.exact_dedup_representatives(docs, norm_key)
    kept_emb = emb.join(
        reps.select(F.col("keep_id").alias("vec_id")), "vec_id", "left_semi"
    )
    sd = _similarity.semantic_dedup(
        kept_emb, n_centroids=8, iters=1, threshold=0.40
    )
    qual = _text.quality_score(docs).select("doc_id", "quality_score")
    return (
        sd.select(
            F.col("vec_id").alias("doc_id"),
            F.col("cluster_id").cast("long").alias("cluster_id"),
        )
        .join(qual, "doc_id")
        .filter(F.col("quality_score") >= 0.76)
        .select("doc_id", "cluster_id", "quality_score")
    )


def q127_index_tool_lifecycle(spark, sf_dir):
    """The maintenance-CLI lifecycle end-to-end (qcache_spark/
    index_tool.py — VERDICT r10 Next #5: the tool was pytest-only;
    this gates its operator surface against an external oracle):
    build the IVF index on even vec_ids, append the odd half (drift),
    then run every maintenance verb THROUGH ``index_tool.run`` — the
    dispatch a scheduler/cron job uses — in the order an operator
    would: ``fsck`` (must be ok), ``compact`` (small-file rewrite,
    generation flip, superseded gen retained), ``refit`` (centroid-
    drift rebuild on the live corpus), ``vacuum`` (terminal delete of
    the retention window), ``fsck`` again (must still be ok), then
    load and run the pruned 3-of-8 search. Each writer verb acquires
    the index's single-writer lease internally (round-11 Wrong #1
    closure), so this also proves the lease acquire/release cycle
    across verbs. Because refit's deterministic k-means sees exactly
    the rows a fresh build on ALL vectors sees, the oracle is q70's
    fresh-build SQL replay (same as q125) — compact and vacuum must
    be result-invisible through the whole chain."""
    import shutil
    import tempfile

    from qcache_spark import index_tool
    from qcache_spark.operators.similarity import IVF_FORMAT_VERSION, IVFIndex

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").first()[0])
    built = emb.filter(F.col("vec_id") % 2 == 0)
    appended = emb.filter(F.col("vec_id") % 2 == 1)
    params = {"n_centroids": 8, "iters": 1}
    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join(
        tempfile.gettempdir(),
        f"qcache_spark_ivftool_{sf_tag}_v{IVF_FORMAT_VERSION}",
    )
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(path + "_meta", ignore_errors=True)
    shutil.rmtree(path + "_tombstones", ignore_errors=True)
    IVFIndex(built, **params).write(spark, path)
    IVFIndex.load(spark, path, expect=params).append(appended)
    for verb in ("fsck", "compact", "refit", "vacuum", "fsck"):
        report = index_tool.run(spark, verb, path)
        if verb == "fsck" and not report["ok"]:
            raise AssertionError(f"index_tool fsck failed: {report}")
    index = IVFIndex.load(spark, path, expect=params)
    out = index.search(qvec, k=10, n_probe=3)
    return out.select(
        "vec_id", F.round(F.col("cosine"), 6).alias("cosine")
    )


def q128_zorder_layout_scan(spark, sf_dir):
    """Write-time multi-dimensional clustering (operators/layout.py:
    zorder_write — the Delta ``OPTIMIZE ZORDER BY`` / Iceberg
    sort-order discipline as a plain DataFrame transform): events is
    rewritten clustered on the bit-interleaved (user_id, value)
    Morton key — a static shift/and/or JVM expression (whole-stage
    codegen, no UDF), one repartitionByRange exchange plus a
    partition-local sort — and the gated query is a selective BOX
    aggregate over the rewritten copy. The layout must be
    result-invisible, so the oracle is the same box aggregate on the
    SOURCE table; what the layout BUYS (file min/max envelopes tight
    on both columns at once, so stats pruning skips most files for
    the box — vs zero skipped on arrival order) is pinned in
    tests/test_layout.py, the same gate-vs-plan division as the IVF
    partition-prune asserts. The value sum is micro-unit integer so
    the hash gate is FP-exact cross-engine."""
    import tempfile

    from qcache_spark.operators import layout as _layout

    e = load_table(spark, sf_dir, "events")
    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join(
        tempfile.gettempdir(),
        f"qcache_spark_zorder_{sf_tag}_v{_layout.LAYOUT_FORMAT_VERSION}",
    )
    _layout.zorder_write(e, ["user_id", "value"], path, bits=10, partitions=16)
    back = spark.read.parquet(path)
    # Box chosen non-empty at every sf (user_id tops out at 14/149/
    # 1499 for sf0.001/0.01/0.1 — the box gets MORE selective as the
    # table grows, the realistic shape for a point-ish lookup).
    box = back.filter(
        F.col("user_id").between(4, 9) & F.col("value").between(50.0, 250.0)
    )
    return box.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(
            F.round(F.col("value").cast("double") * 1e6).cast("bigint")
        ).alias("sum_value_micro"),
    )


def q136_zorder_incremental(spark, sf_dir):
    """Incremental z-order maintenance (operators/layout.py:ZTable —
    VERDICT r11 Missing #2; Delta's incremental ``OPTIMIZE ... ZORDER
    BY`` shape under the MinHashIndex generation-flip discipline):
    events lands in three waves — create() clusters the first wave
    and FREEZES the key space (cols/bits/bounds in the meta sidecar),
    two append()s admit the rest as arrival-order chunks (O(batch)
    I/O, clustered chunks never rewritten), then compact() clusters
    ONLY the un-clustered tail into the frozen key space and flips
    the meta pointer, and vacuum() ages out the retained superseded
    dirs. The gated query is q128's selective box aggregate over the
    post-lifecycle live table: the whole maintenance chain must be
    result-invisible, so the oracle is the same aggregate on the
    source table. What compaction BUYS (pruned_fraction recovery to
    within eps of a full rewrite; lease fencing on every writer) is
    pinned in tests/test_layout.py — the gate-vs-plan division used
    throughout."""
    import shutil
    import tempfile

    from qcache_spark.operators import layout as _layout

    e = load_table(spark, sf_dir, "events")
    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join(
        tempfile.gettempdir(),
        f"qcache_spark_ztable_{sf_tag}_v{_layout.ZTABLE_FORMAT_VERSION}",
    )
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(path + "_meta", ignore_errors=True)
    t = _layout.ZTable.create(
        e.filter(F.col("event_id") % 3 == 0),
        ["user_id", "value"], path, bits=10, partitions=8,
    )
    t.append(e.filter(F.col("event_id") % 3 == 1))
    t.append(e.filter(F.col("event_id") % 3 == 2))
    t.compact(retain=1, partitions=8)
    t.vacuum()
    back = _layout.ZTable.load(spark, path).df
    box = back.filter(
        F.col("user_id").between(4, 9) & F.col("value").between(50.0, 250.0)
    )
    return box.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(
            F.round(F.col("value").cast("double") * 1e6).cast("bigint")
        ).alias("sum_value_micro"),
    )


def q137_ztable_streaming_admit(spark, sf_dir):
    """Streaming admission into an incrementally-maintained z-ordered
    table (operators/layout.py:ZTable.admit + the shared
    streaming/admission.py plumbing — the q118/q123 admission
    machinery driving the q136 table family): events wave 0 creates
    the table (frozen key space); waves 1 and 2 land as two parquet
    files drained one micro-batch each (maxFilesPerTrigger=1,
    availableNow — the q118 deterministic-order device) through
    streaming_admit, each becoming one arrival chunk under the
    checkpoint-scoped replay watermark and the single-writer lease;
    then compact() clusters the streamed tail into the frozen Morton
    space and vacuum() removes the superseded dirs. The gated query
    is q128's box aggregate over the post-stream post-compact live
    table — the entire stream-ingest-then-maintain chain must be
    result-invisible, so the oracle is the same aggregate on the
    source table."""
    import shutil
    import tempfile

    from qcache_spark.operators import layout as _layout
    from qcache_spark.streaming import streaming_admit

    e = load_table(spark, sf_dir, "events")
    cols = [
        "event_id", "ts", "user_id", "event_type", "value", "session_len"
    ]
    e = e.select(*[c for c in cols if c in e.columns])
    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = os.path.join(
        tempfile.gettempdir(),
        f"qcache_spark_ztstream_{sf_tag}_v{_layout.ZTABLE_FORMAT_VERSION}",
    )
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(root + "_meta", ignore_errors=True)
    base = os.path.join(root, "table")
    t = _layout.ZTable.create(
        e.filter(F.col("event_id") % 3 == 0),
        ["user_id", "value"], base, bits=10, partitions=8,
    )
    land = os.path.join(root, "landing")
    e.filter(F.col("event_id") % 3 == 1).coalesce(1).write.parquet(
        os.path.join(land, "a")
    )
    e.filter(F.col("event_id") % 3 == 2).coalesce(1).write.parquet(
        os.path.join(land, "b")
    )
    schema = t.df.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{land}/*/")
    )
    q = streaming_admit(
        stream, t, checkpoint_dir=os.path.join(root, "ckpt")
    )
    q.awaitTermination()
    t.compact(retain=1, partitions=8)
    t.vacuum()
    back = _layout.ZTable.load(spark, base).df
    box = back.filter(
        F.col("user_id").between(4, 9) & F.col("value").between(50.0, 250.0)
    )
    return box.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(
            F.round(F.col("value").cast("double") * 1e6).cast("bigint")
        ).alias("sum_value_micro"),
    )


def q129_pq_adc_search(spark, sf_dir):
    """Product-quantization ANN with asymmetric-distance ranking
    (operators/similarity.py:pq_train/pq_encode/pq_search — Jégou et
    al. 2011, the FAISS PQ shape; the vector-codebook counterpart of
    q124's scalar SQ8): deterministic per-subspace k-means (m=4
    subspaces x 16 codes, the IVF init/refine discipline applied to
    each list_slice'd subvector), the corpus stored as 4 code ids +
    the exact norm (~16-60x smaller than the float column), ranking
    via the broadcast LUT — a chain of m element_at lookups summed,
    pure JVM codegen; the ranking scan never touches the float
    column — then the top-40 shortlist (ties -> lower vec_id) is
    re-scored EXACTLY through a pushed-down id IN-filter. The oracle
    replays ALL of it: the 4 subspace k-means, the argmin encode, the
    LUT ADC scores, the shortlist window and the exact rerank
    (assignment margins verified tie-free at sf0.001/0.01/0.1:
    smallest argmin gap 8.8e-7 vs ~1e-13 cross-engine FP noise)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").first()[0])
    books = _similarity.pq_train(emb, m=4, n_codes=16, iters=1)
    codes = _similarity.pq_encode(emb, books)
    out = _similarity.pq_search(codes, emb, books, qvec, k=10, rerank=40)
    return out.select(
        "vec_id", F.round(F.col("cosine"), 6).alias("cosine")
    )


_PQ_E_Q_PART = """e AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 0)"""


def _pq_oracle_sql(m: int = 4, n_codes: int = 16, dim: int = 64) -> str:
    """DuckDB replay of the FULL q129 PQ pipeline, generated from the
    same (m, n_codes) parameterization the entry uses so the two
    cannot drift: per subspace — init = the subvectors of the n_codes
    lowest vec_ids, one Lloyd step (argmin by the c.c - 2 x.c algebra
    with first-wins tiebreak, per-dim mean refine, empty-cluster
    carryover), final argmin encode, LUT = dot(query subvector,
    codebook row) — then the ADC score sum, the top-40 shortlist
    window (ties -> lower vec_id) and the exact cosine rerank top-10
    (q124's two-stage formulation)."""
    parts, joins, adc_sum = _pq_subspace_parts(m, n_codes, dim)
    parts = [_PQ_E_Q_PART] + parts
    tail = f""",
        adc AS (
          SELECT e.vec_id,
                 ({adc_sum})
                   / (sqrt(list_dot_product(e.v, e.v))
                      * sqrt(list_dot_product(q.qv, q.qv))) AS ac
          FROM e {joins} CROSS JOIN q
        ),
        short AS (
          SELECT vec_id FROM (
            SELECT vec_id, row_number() OVER (ORDER BY ac DESC, vec_id) AS rn
            FROM adc
          ) WHERE rn <= 40
        )
        SELECT vec_id, ROUND(c, 6) AS cosine FROM (
          SELECT e.vec_id,
                 list_dot_product(e.v, q.qv)
                   / (sqrt(list_dot_product(e.v, e.v))
                      * sqrt(list_dot_product(q.qv, q.qv))) AS c,
                 row_number() OVER (
                   ORDER BY list_dot_product(e.v, q.qv)
                     / (sqrt(list_dot_product(e.v, e.v))
                        * sqrt(list_dot_product(q.qv, q.qv))) DESC,
                     e.vec_id
                 ) AS rn
          FROM e JOIN short USING (vec_id) CROSS JOIN q
        ) WHERE rn <= 10"""
    return "WITH " + ",".join(parts) + tail


def _pq_subspace_parts(
    m: int, n_codes: int, dim: int
) -> tuple[list[str], str, str]:
    """The per-subspace PQ CTE chain shared by the q129 (standalone
    PQ) and q134 (IVF+PQ composition) oracles: codebook training,
    argmin encode and the query LUT per subspace — returns
    (cte_parts, code/lut join clause, ADC sum expression). Assumes
    `e`/`q` CTEs are already in scope."""
    dsub = dim // m
    parts = []
    for s in range(m):
        a, b = s * dsub + 1, (s + 1) * dsub
        parts.append(f"""
        sub{s} AS (SELECT vec_id, list_slice(v, {a}, {b}) AS vs FROM e),
        init{s} AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS ci, vs AS cv
          FROM sub{s} ORDER BY vec_id LIMIT {n_codes}
        ),
        asg{s} AS (
          SELECT vec_id, vs, ci FROM (
            SELECT t.vec_id, t.vs, i.ci,
                   row_number() OVER (
                     PARTITION BY t.vec_id
                     ORDER BY list_dot_product(i.cv, i.cv)
                              - 2 * list_dot_product(t.vs, i.cv), i.ci
                   ) AS rn
            FROM sub{s} t CROSS JOIN init{s} i
          ) WHERE rn = 1
        ),
        dims{s} AS (
          SELECT ci, generate_subscripts(vs, 1) AS pos, unnest(vs) AS val
          FROM asg{s}
        ),
        mean{s} AS (
          SELECT ci, pos, SUM(val) / COUNT(*) AS cv FROM dims{s} GROUP BY ci, pos
        ),
        cb{s} AS (
          SELECT i.ci, COALESCE(mm.mv, i.cv) AS cv
          FROM init{s} i LEFT JOIN (
            SELECT ci, list(cv ORDER BY pos) AS mv FROM mean{s} GROUP BY ci
          ) mm USING (ci)
        ),
        code{s} AS (
          SELECT vec_id, ci FROM (
            SELECT t.vec_id, c.ci,
                   row_number() OVER (
                     PARTITION BY t.vec_id
                     ORDER BY list_dot_product(c.cv, c.cv)
                              - 2 * list_dot_product(t.vs, c.cv), c.ci
                   ) AS rn
            FROM sub{s} t CROSS JOIN cb{s} c
          ) WHERE rn = 1
        ),
        lut{s} AS (
          SELECT c.ci, list_dot_product(list_slice(q.qv, {a}, {b}), c.cv) AS ip
          FROM cb{s} c CROSS JOIN q
        )""")
    joins = " ".join(
        f"JOIN code{s} ON code{s}.vec_id = e.vec_id "
        f"JOIN lut{s} ON lut{s}.ci = code{s}.ci"
        for s in range(m)
    )
    adc_sum = " + ".join(f"lut{s}.ip" for s in range(m))
    return parts, joins, adc_sum


# q70's deterministic coarse-k-means CTE chain (init = n_centroids
# lowest vec_ids, argmin by c.c - 2 x.c with first-wins tiebreak,
# per-dim mean refine with empty-cluster carryover, probe selection,
# re-assign) — the building block the q134 IVFPQ oracle composes with
# the PQ subspace chain. Assumes `e`/`q` CTEs are in scope.
_IVF_COARSE_PARTS = """init AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS ci, v
          FROM e ORDER BY vec_id LIMIT {n_centroids}
        ),
        a0 AS (
          SELECT vec_id, v, ci FROM (
            SELECT e.vec_id, e.v, i.ci,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_dot_product(i.v, i.v)
                              - 2 * list_dot_product(e.v, i.v), i.ci
                   ) AS rn
            FROM e CROSS JOIN init i
          ) WHERE rn = 1
        ),
        cdims AS (
          SELECT ci, generate_subscripts(v, 1) AS pos, unnest(v) AS val
          FROM a0
        ),
        cmeans AS (
          SELECT ci, pos, SUM(val) / COUNT(*) AS cv FROM cdims GROUP BY ci, pos
        ),
        c1 AS (
          SELECT i.ci, COALESCE(mm.mv, i.v) AS v
          FROM init i LEFT JOIN (
            SELECT ci, list(cv ORDER BY pos) AS mv FROM cmeans GROUP BY ci
          ) mm USING (ci)
        ),
        probes AS (
          SELECT ci FROM c1, q
          ORDER BY list_dot_product(c1.v, c1.v)
                   - 2 * list_dot_product(c1.v, q.qv), ci
          LIMIT {n_probe}
        ),
        a1 AS (
          SELECT vec_id, ci FROM (
            SELECT e.vec_id, c.ci,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_dot_product(c.v, c.v)
                              - 2 * list_dot_product(e.v, c.v), c.ci
                   ) AS rn
            FROM e CROSS JOIN c1 c
          ) WHERE rn = 1
        )"""


def _ivfpq_oracle_sql(
    m: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    n_centroids: int = 8,
    n_probe: int = 3,
    n_short: int = 40,
    k: int = 10,
) -> str:
    """DuckDB replay of the q134 IVFPQ composition, built from the
    SAME two gated chains its Spark counterpart composes: the q70
    coarse k-means (assignment + probe selection) and the q129 PQ
    subspace chain (codebooks trained on the FULL build corpus,
    exactly like IVFIndex(store_pq=True)). The ADC ranking is
    restricted to the probed clusters' members, the top-`n_short`
    shortlist (ties -> lower vec_id) is exact-reranked to top-`k` —
    pq_search's two-stage shape under IVF pruning."""
    parts, joins, adc_sum = _pq_subspace_parts(m, n_codes, dim)
    coarse = _IVF_COARSE_PARTS.format(n_centroids=n_centroids, n_probe=n_probe)
    parts = [_PQ_E_Q_PART, coarse] + parts
    tail = f""",
        adc AS (
          SELECT e.vec_id,
                 ({adc_sum})
                   / (sqrt(list_dot_product(e.v, e.v))
                      * sqrt(list_dot_product(q.qv, q.qv))) AS ac
          FROM e {joins}
          JOIN a1 ON a1.vec_id = e.vec_id
          CROSS JOIN q
          WHERE a1.ci IN (SELECT ci FROM probes)
        ),
        short AS (
          SELECT vec_id FROM (
            SELECT vec_id, row_number() OVER (ORDER BY ac DESC, vec_id) AS rn
            FROM adc
          ) WHERE rn <= {n_short}
        )
        SELECT vec_id, ROUND(c, 6) AS cosine FROM (
          SELECT e.vec_id,
                 list_dot_product(e.v, q.qv)
                   / (sqrt(list_dot_product(e.v, e.v))
                      * sqrt(list_dot_product(q.qv, q.qv))) AS c,
                 row_number() OVER (
                   ORDER BY list_dot_product(e.v, q.qv)
                     / (sqrt(list_dot_product(e.v, e.v))
                        * sqrt(list_dot_product(q.qv, q.qv))) DESC,
                     e.vec_id
                 ) AS rn
          FROM e JOIN short USING (vec_id) CROSS JOIN q
        ) WHERE rn <= {k}"""
    return "WITH " + ",".join(parts) + tail


def _crossmodal_oracle_sql(semantic_dedup_sql: str) -> str:
    """DuckDB replica of q126, composed from the gated q26/q114/q35
    formulations (one source of truth: the q114 chain is passed in and
    rewritten to scope its corpus CTE to the kept documents)."""
    sd_inner = semantic_dedup_sql.replace(
        "FROM embeddings",
        "FROM embeddings WHERE vec_id IN (SELECT keep_id FROM kept_docs)",
        1,
    )
    return (
        r"""
        WITH kept_docs AS (
            SELECT MIN(doc_id) AS keep_id
            FROM documents
            GROUP BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
        ), qfeat AS (
            SELECT doc_id,
                   len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
                   length(text) AS n_chars,
                   len(regexp_extract_all(text, '[\.,;:!\?"''\(\)\[\]\{}]')) AS n_punct,
                   len(regexp_extract_all(text, '[0-9]')) AS n_digits,
                   len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|in|that|with|for|was)\b')) AS n_stop
            FROM documents
        ), qratios AS (
            SELECT doc_id,
                   n_punct / GREATEST(n_chars, 1)::DOUBLE AS raw_punct,
                   n_digits / GREATEST(n_chars, 1)::DOUBLE AS raw_digit,
                   n_stop / GREATEST(n_tokens, 1)::DOUBLE AS raw_stop,
                   (n_chars - (n_tokens - 1)) / GREATEST(n_tokens, 1)::DOUBLE AS raw_mtl
            FROM qfeat
        ), qscore AS (
            SELECT doc_id,
                   ROUND(
                       0.25 * LEAST(raw_stop * 2, 1.0)
                     + 0.25 * (1 - LEAST(raw_digit * 5, 1.0))
                     + 0.25 * (1 - LEAST(raw_punct * 5, 1.0))
                     + 0.25 * (CASE WHEN raw_mtl >= 3 AND raw_mtl <= 10
                               THEN 1.0 ELSE 0.0 END),
                   6) AS quality_score
            FROM qratios
        )
        SELECT sd.vec_id AS doc_id, sd.cluster_id, qs.quality_score
        FROM ("""
        + sd_inner
        + r""") sd
        JOIN qscore qs ON qs.doc_id = sd.vec_id
        WHERE qs.quality_score >= 0.76
    """
    )


def _cluster_safe_split_oracle_sql() -> str:
    """DuckDB replica of q113: the q71 clustering SQL (verbatim, one
    source of truth) as a derived table, then the q54 integer-
    threshold split keyed on the cluster id — thresholds taken from
    sampling.split_thresholds on the SAME weights dict as the
    entry."""
    (train_name, train_t), = _sampling.split_thresholds(_Q113_WEIGHTS)
    seed = 11
    return f"""
        SELECT doc_id,
               CASE WHEN ('0x' || substr(md5('{seed}:' ||
                        CAST(cluster_id AS VARCHAR)), 1, 15))::BIGINT
                        < {train_t}
                    THEN '{train_name}' ELSE 'test' END AS split
        FROM ({OPERATOR_ORACLES['q71_dedup_clusters']}) labels
    """


def q130_distribution_drift(spark, sf_dir):
    """Snapshot drift audit (operators/drift.py:population_stability —
    per-bucket PSI between two corpus snapshots): yesterday = even
    doc_ids, today = odd doc_ids; tracked columns are categorical
    `lang`/`source` and `n_chars` under the FROZEN integer binning
    the operator requires (drift must be measured against fixed bins
    or the bins absorb the drift). Each snapshot is scanned once and
    partial-aggregated to O(buckets) counter rows before any
    exchange; psi_e6 is snapped per bucket with one fixed
    parenthesization so the oracle replays it bit-for-bit."""
    from qcache_spark.operators import drift as _drift

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    curr = docs.filter(F.col("doc_id") % 2 == 1)
    out = _drift.population_stability(
        base, curr, ["lang", "source"], {"n_chars": _Q130_EDGES}
    )
    return out.orderBy("column", "bucket")


_Q130_EDGES = [100, 200, 300, 400]


def _psi_pair_sql(
    base_where: str,
    curr_where: str,
    cats: list[str],
    num_edges: dict[str, list[int]],
    batch_lit: int | None = None,
    source: str = "documents",
) -> str:
    """Shared DuckDB replica of operators/drift.py's PSI pipeline,
    generated from the SAME edge lists and null-bucket label as the
    operator: melt both snapshots to (column, bucket), count,
    full-outer align, then the identical smoothed-PSI double
    expression snapped at 1e6. `batch_lit` prepends a literal
    batch_id column (the streaming monitor's output shape)."""
    from qcache_spark.operators.drift import NULL_BUCKET, numeric_bucket_label

    melts = []
    for c in cats:
        melts.append(
            f"""SELECT '{c}' AS "column",
                   COALESCE(CAST({c} AS VARCHAR), '{NULL_BUCKET}') AS bucket
            FROM {{snap}}"""
        )
    for c, edges in num_edges.items():
        labels = numeric_bucket_label(edges)
        nbranch = f"WHEN {c} IS NULL THEN '{NULL_BUCKET}' " + " ".join(
            f"WHEN {c} < {hi} THEN '{lab}'"
            for hi, lab in zip(edges, labels[:-1])
        )
        melts.append(
            f"""SELECT '{c}',
                   CASE {nbranch} ELSE '{labels[-1]}' END
            FROM {{snap}}"""
        )
    melt = "\n            UNION ALL\n            ".join(melts)
    prefix = (
        f"CAST({batch_lit} AS BIGINT) AS batch_id, "
        if batch_lit is not None
        else ""
    )
    return f"""
        WITH snap_b AS (SELECT * FROM {source} WHERE {base_where}),
        snap_c AS (SELECT * FROM {source} WHERE {curr_where}),
        bc AS (
            SELECT "column", bucket, COUNT(*) AS base_n
            FROM ({melt.format(snap="snap_b")}) m GROUP BY 1, 2
        ),
        cc AS (
            SELECT "column", bucket, COUNT(*) AS curr_n
            FROM ({melt.format(snap="snap_c")}) m GROUP BY 1, 2
        ),
        j AS (
            SELECT COALESCE(bc."column", cc."column") AS "column",
                   COALESCE(bc.bucket, cc.bucket) AS bucket,
                   COALESCE(base_n, 0) AS base_n,
                   COALESCE(curr_n, 0) AS curr_n
            FROM bc FULL OUTER JOIN cc
              ON bc."column" = cc."column" AND bc.bucket = cc.bucket
        ),
        t AS (
            SELECT "column", SUM(base_n) AS base_total,
                   SUM(curr_n) AS curr_total, COUNT(*) AS k
            FROM j GROUP BY 1
        ),
        pq AS (
            SELECT j."column", j.bucket, j.base_n, j.curr_n,
                   (CAST(j.base_n AS DOUBLE) + 0.5)
                     / (CAST(t.base_total AS DOUBLE) + 0.5 * t.k) AS p,
                   (CAST(j.curr_n AS DOUBLE) + 0.5)
                     / (CAST(t.curr_total AS DOUBLE) + 0.5 * t.k) AS q
            FROM j JOIN t ON j."column" = t."column"
        )
        SELECT {prefix}"column", bucket, base_n, curr_n,
               CAST(ROUND((q - p) * ln(q / p) * 1e6) AS BIGINT) AS psi_e6
        FROM pq
    """


def _distribution_drift_oracle_sql() -> str:
    """q130: the shared PSI replica over the parity snapshots."""
    return (
        _psi_pair_sql(
            "doc_id % 2 = 0",
            "doc_id % 2 = 1",
            ["lang", "source"],
            {"n_chars": _Q130_EDGES},
        )
        + ' ORDER BY "column", bucket'
    )


def q131_dsir_selection(spark, sf_dir):
    """DSIR data selection (operators/selection.py:importance_select —
    Xie et al. 2023's hashed-n-gram importance resampling): target =
    the English docs of src0/src1/src2 (the corpus-by-example to get
    more of), raw = the whole corpus; every raw doc scored by the sum
    of its unigram+bigram buckets' add-1-smoothed log(p_tgt/p_raw),
    snapped per bucket to e6 units so the doc score is an exact long
    sum; top-100 kept (score desc, doc_id tiebreak). The bucket
    log-ratio table (1024 rows) is broadcast onto the exploded
    features; the only data-sized shuffle is the doc_id sum."""
    from qcache_spark.operators import selection as _selection

    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(
        (F.col("lang") == "en") & F.col("source").isin(list(_Q131_TARGET_SRC))
    )
    out = _selection.importance_select(
        docs, target, k=100, n_buckets=_Q131_BUCKETS
    )
    return out.select(
        "doc_id",
        "n_features",
        "score_units",
        F.col("sel_rank").cast("long").alias("sel_rank"),
    )


_Q131_TARGET_SRC = ("src0", "src1", "src2")
_Q131_BUCKETS = 1024


def _dsir_oracle_sql() -> str:
    """DuckDB replica of q131, generated from the same target slice,
    bucket count, tokenizer regex, md5 bucket hash and ln
    parenthesization as the operator (lower + split on non-letter/
    digit runs, empties dropped, adjacent-pair bigrams over the
    FILTERED token list)."""
    from qcache_spark.operators.text import WORD_SPLIT_REGEX

    B = _Q131_BUCKETS
    src = ", ".join(f"'{s}'" for s in _Q131_TARGET_SRC)
    toks = (
        f"list_filter(regexp_split_to_array(lower(text), "
        f"'{WORD_SPLIT_REGEX}'), t -> t <> '')"
    )
    feats = (
        "list_concat(toks, CASE WHEN len(toks) >= 2 THEN "
        "list_transform(generate_series(2, len(toks)), "
        "i -> toks[i - 1] || ' ' || toks[i]) "
        "ELSE [] END)"
    )
    bucket = f"(('0x' || substr(md5(f), 1, 15))::BIGINT % {B})"
    return f"""
        WITH rtoks AS (
            SELECT doc_id, {toks} AS toks FROM documents
            WHERE text IS NOT NULL
        ),
        rbuckets AS (
            SELECT doc_id, {bucket} AS bucket
            FROM rtoks, UNNEST({feats}) AS u(f)
        ),
        ttoks AS (
            SELECT {toks} AS toks FROM documents
            WHERE text IS NOT NULL
              AND lang = 'en' AND source IN ({src})
        ),
        tbuckets AS (
            SELECT {bucket} AS bucket
            FROM ttoks, UNNEST({feats}) AS u(f)
        ),
        rb AS (SELECT bucket, COUNT(*) AS raw_n FROM rbuckets GROUP BY 1),
        tb AS (SELECT bucket, COUNT(*) AS tgt_n FROM tbuckets GROUP BY 1),
        tot AS (
            SELECT (SELECT SUM(raw_n) FROM rb) AS raw_total,
                   (SELECT COALESCE(SUM(tgt_n), 0) FROM tb) AS tgt_total
        ),
        units AS (
            SELECT rb.bucket,
                   CAST(ROUND(
                       ((ln(COALESCE(tb.tgt_n, 0) + 1.0)
                           - ln(tot.tgt_total + {float(B)}))
                        - (ln(rb.raw_n + 1.0)
                           - ln(tot.raw_total + {float(B)}))) * 1e6
                   ) AS BIGINT) AS unit_e6
            FROM rb LEFT JOIN tb ON rb.bucket = tb.bucket, tot
        ),
        scores AS (
            SELECT r.doc_id, COUNT(*) AS n_features,
                   CAST(SUM(u.unit_e6) AS BIGINT) AS score_units
            FROM rbuckets r JOIN units u ON r.bucket = u.bucket
            GROUP BY 1
        ),
        ranked AS (
            SELECT doc_id, n_features, score_units,
                   CAST(ROW_NUMBER() OVER (
                       ORDER BY score_units DESC, doc_id
                   ) AS BIGINT) AS sel_rank
            FROM scores
        )
        SELECT doc_id, n_features, score_units, sel_rank
        FROM ranked WHERE sel_rank <= 100 ORDER BY sel_rank
    """


def q132_quality_constraints(spark, sf_dir):
    """Deequ-style constraint suite (operators/quality.py:
    check_constraints — the declarative batch gate between "crawled"
    and "trainable"): eight constraints over `documents` evaluated in
    ONE aggregation pass (single scan, one counter row over the
    wire, static explode unpivot). The suite deliberately mixes
    passing and failing checks (n_chars_max and lang_known fail on
    this corpus) so both verdict paths are gated. All arithmetic is
    exact fixed-point e6 integer division — bit-equal in DuckDB."""
    from qcache_spark.operators import quality as _quality

    docs = load_table(spark, sf_dir, "documents")
    out = _quality.check_constraints(docs, _Q132_CONSTRAINTS)
    return out.orderBy("check_name")


_Q132_CONSTRAINTS = [
    {"name": "doc_id_complete", "kind": "completeness", "col": "doc_id",
     "min_rate": 1.0},
    {"name": "doc_id_unique", "kind": "uniqueness", "col": "doc_id",
     "min_rate": 1.0},
    {"name": "text_complete", "kind": "completeness", "col": "text",
     "min_rate": 0.99},
    {"name": "n_chars_min", "kind": "min", "col": "n_chars", "bound": 10},
    {"name": "n_chars_max", "kind": "max", "col": "n_chars", "bound": 400},
    {"name": "lang_known", "kind": "in_set", "col": "lang",
     "values": ["en", "de", "es", "fr"], "min_rate": 0.95},
    {"name": "text_wordy", "kind": "matches", "col": "text",
     "pattern": r"\p{L}{3}", "min_rate": 0.9},
    {"name": "corpus_size", "kind": "row_count", "op": ">=", "bound": 100},
]


def _quality_constraints_oracle_sql() -> str:
    """DuckDB replica of q132, generated from the SAME constraint
    list as the entry: one aggregate CTE of raw counts/extrema, then
    one UNION ALL verdict select per constraint replaying the exact
    integer fixed-point arithmetic ((cnt * 1e6) // total)."""
    from qcache_spark.operators.quality import E6

    aggs = ["COUNT(*) AS n_total"]
    selects = []
    for i, spec in enumerate(_Q132_CONSTRAINTS):
        kind, a = spec["kind"], f"m{i}"
        col = spec.get("col", "*")
        if kind == "completeness":
            aggs.append(f"COUNT({col}) AS {a}")
            metric, op = (f"CASE WHEN n_total = 0 THEN CAST(NULL AS BIGINT) "
                          f"ELSE ({a} * {E6}) // n_total END"), ">="
            thr = int(round(spec["min_rate"] * E6))
        elif kind == "uniqueness":
            aggs.append(f"COUNT(DISTINCT {col}) AS {a}")
            aggs.append(f"COUNT({col}) AS {a}d")
            metric, op = (f"CASE WHEN {a}d = 0 THEN CAST(NULL AS BIGINT) "
                          f"ELSE ({a} * {E6}) // {a}d END"), ">="
            thr = int(round(spec["min_rate"] * E6))
        elif kind in ("min", "max"):
            fn = kind.upper()
            aggs.append(f"{fn}({col}) AS {a}")
            metric = f"{a} * {E6}"
            op = ">=" if kind == "min" else "<="
            thr = int(spec["bound"]) * E6
        elif kind == "in_set":
            vals = ", ".join(f"'{v}'" for v in spec["values"])
            aggs.append(
                f"COALESCE(SUM(CASE WHEN {col} IN ({vals}) "
                f"THEN 1 ELSE 0 END), 0) AS {a}"
            )
            metric, op = (f"CASE WHEN n_total = 0 THEN CAST(NULL AS BIGINT) "
                          f"ELSE ({a} * {E6}) // n_total END"), ">="
            thr = int(round(spec["min_rate"] * E6))
        elif kind == "matches":
            aggs.append(
                f"COALESCE(SUM(CASE WHEN regexp_matches({col}, "
                f"'{spec['pattern']}') THEN 1 ELSE 0 END), 0) AS {a}"
            )
            metric, op = (f"CASE WHEN n_total = 0 THEN CAST(NULL AS BIGINT) "
                          f"ELSE ({a} * {E6}) // n_total END"), ">="
            thr = int(round(spec["min_rate"] * E6))
        elif kind == "row_count":
            metric, op = f"n_total * {E6}", spec["op"]
            thr = int(spec["bound"]) * E6
        # NULL-metric rule replayed from quality.py: rates pass
        # vacuously (zero eligible rows); a NULL min/max extremum
        # (all-null/empty column) FAILS its bounds gate.
        null_pass = 0 if kind in ("min", "max", "row_count") else 1
        selects.append(f"""
            SELECT '{spec["name"]}' AS check_name, '{col}' AS "column",
                   '{op}' AS op, CAST({metric} AS BIGINT) AS metric_e6,
                   CAST({thr} AS BIGINT) AS threshold_e6,
                   CASE WHEN CAST({metric} AS BIGINT) IS NULL THEN {null_pass}
                        WHEN CAST({metric} AS BIGINT) {op} {thr}
                        THEN 1 ELSE 0 END AS passed
            FROM m""")
    union = "\n            UNION ALL".join(selects)
    return f"""
        WITH m AS (SELECT {", ".join(aggs)} FROM documents)
        SELECT * FROM ({union}) v ORDER BY check_name
    """


def q133_streaming_drift(spark, sf_dir):
    """Streaming drift monitor (streaming/drift_monitor.py — q130's
    PSI audit attached to a live ingestion stream): the reference
    histogram (doc_id %3 == 0) is frozen ONCE as bounded driver rows;
    batches %3 == 1 and %3 == 2 land as two files drained one
    micro-batch each (maxFilesPerTrigger=1, availableNow, the q118
    deterministic-order device) through foreachBatch, each scored
    against the frozen reference WITHOUT rescanning it; metric rows
    append to a parquet metrics dir keyed by batch_id. The oracle
    replays both micro-batches with the q130 SQL formula — stream ≡
    batch by construction."""
    import shutil
    import tempfile

    from qcache_spark.streaming import drift_monitor, reference_histogram

    docs = load_table(spark, sf_dir, "documents")
    ref = docs.filter(F.col("doc_id") % 3 == 0)
    cols = ["doc_id", "lang", "n_chars"]
    b1 = docs.filter(F.col("doc_id") % 3 == 1).select(*cols)
    b2 = docs.filter(F.col("doc_id") % 3 == 2).select(*cols)
    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = os.path.join(
        tempfile.gettempdir(), f"qcache_spark_stream_drift_{sf_tag}_v1"
    )
    shutil.rmtree(root, ignore_errors=True)
    land = os.path.join(root, "landing")
    # distinct dirs written in order: both mtime and path order agree,
    # so the file source drains a before b deterministically
    b1.coalesce(1).write.parquet(os.path.join(land, "a"))
    b2.coalesce(1).write.parquet(os.path.join(land, "b"))
    ref_hist = reference_histogram(ref, ["lang"], {"n_chars": _Q130_EDGES})
    stream = (
        spark.readStream.schema("doc_id long, lang string, n_chars long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{land}/*/")
    )
    q = drift_monitor(
        stream,
        ref_hist,
        metrics_path=os.path.join(root, "metrics"),
        checkpoint_dir=os.path.join(root, "ckpt"),
        categorical_cols=["lang"],
        numeric_bins={"n_chars": _Q130_EDGES},
    )
    q.awaitTermination()
    return (
        spark.read.parquet(os.path.join(root, "metrics"))
        .orderBy("batch_id", "column", "bucket")
    )


def _streaming_drift_oracle_sql() -> str:
    """q133: the two micro-batches replayed with the shared q130 PSI
    SQL — batch 0 = %3==1 vs the %3==0 reference, batch 1 = %3==2 vs
    the same reference, unioned with literal batch ids."""
    pair0 = _psi_pair_sql(
        "doc_id % 3 = 0", "doc_id % 3 = 1",
        ["lang"], {"n_chars": _Q130_EDGES}, batch_lit=0,
    )
    pair1 = _psi_pair_sql(
        "doc_id % 3 = 0", "doc_id % 3 = 2",
        ["lang"], {"n_chars": _Q130_EDGES}, batch_lit=1,
    )
    return f"""
        SELECT * FROM ({pair0}) b0
        UNION ALL
        SELECT * FROM ({pair1}) b1
        ORDER BY batch_id, "column", bucket
    """


def q134_ivfpq_search(spark, sf_dir):
    """IVF+PQ composed ANN (operators/similarity.py:IVFIndex
    (store_pq=True) — the FAISS IVFPQ shape, composing the gated q70
    coarse quantizer with the gated q129 product quantizer): coarse
    k-means prunes the probe to n_probe=3 of 8 cluster partitions;
    inside the probed clusters candidates are ranked from the m=4
    stored PQ codes via the broadcast LUT (pure JVM — neither the
    float column nor Python touches the ranking scan); the top-40
    shortlist (ties -> lower vec_id) is exact-reranked to top-10
    through a pushed-down id IN-filter. The oracle composes the SAME
    two replay chains (q70 coarse CTEs + q129 subspace CTEs) with the
    ADC ranking restricted to probed-cluster members. Codebooks are
    trained on the FULL build corpus exactly as the index does, so
    the lifecycle pytest's append/refit parity carries over."""
    from qcache_spark.operators.similarity import IVFIndex

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").first()[0])
    index = IVFIndex(
        emb, n_centroids=8, iters=1, store_pq=True, pq_m=4, pq_codes=16
    )
    out = index.search(qvec, k=10, n_probe=3, rerank=40)
    return out.select(
        "vec_id", F.round(F.col("cosine"), 6).alias("cosine")
    )


def q135_dup_source_matrix(spark, sf_dir):
    """Dedup lineage audit: which sources near-duplicate each other —
    the crawl-governance question behind dedup budgeting ("is src3 a
    mirror of src7?"). Composes the gated q31 MinHash+LSH verified
    pairs with a per-side source annotation and aggregates to a
    canonical (least, greatest) source-pair matrix. Spark-first: the
    verified pair set is tiny relative to the corpus, so it is
    BROADCAST onto the doc->source annotation (twice, one per side) —
    no corpus-sized shuffle beyond what q31 itself does. The oracle
    reuses q31's brute-force SQL verbatim as a derived table (one
    source of truth, the q113 composition discipline)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = _dedup.minhash_lsh_pairs(docs, verify_threshold=0.5)
    ann = docs.select("doc_id", "source")
    a = ann.withColumnRenamed("doc_id", "id_a").withColumnRenamed(
        "source", "src_a"
    )
    b = ann.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
        "source", "src_b"
    )
    out = (
        a.join(F.broadcast(pairs), "id_a")
        .join(F.broadcast(b), "id_b")
        .select(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("source_a", "source_b")
    )
    return out


def _dup_source_matrix_oracle_sql() -> str:
    """q135: q31's exact-Jaccard pair SQL verbatim, annotated with
    each side's source and folded to the canonical pair matrix."""
    return f"""
        WITH pairs AS ({OPERATOR_ORACLES["q31_minhash_lsh_pairs"]}),
        ann AS (SELECT doc_id, source FROM documents)
        SELECT LEAST(a.source, b.source) AS source_a,
               GREATEST(a.source, b.source) AS source_b,
               COUNT(*) AS n_pairs
        FROM pairs p
        JOIN ann a ON a.doc_id = p.id_a
        JOIN ann b ON b.doc_id = p.id_b
        GROUP BY 1, 2
        ORDER BY 1, 2
    """


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # --- Gate-slot rotation (round 12) ------------------------------
    # The driver's correctness harness gates the FIRST 50 insertion-
    # order keys (see README "Correctness gating").  Round-12 ordering
    # implements VERDICT r11 Next #1 (rotate the gate to the entries
    # with no / the oldest driver evidence) so that after this round
    # NO registry entry's evidence is older than round 10:
    #   1-2   q136/q137 — incremental z-order maintenance (ZTable)
    #         and its streaming-admission composition, both NEW this
    #         round (VERDICT r11 Missing #2 / Next #3): first driver
    #         evidence.
    #   3     q135 — the one pre-existing entry with no driver
    #         evidence (local-oracle-green since r11; r11 Next #1).
    #   4-8   q70/q80/q89/q91/q104 — the five entries whose latest
    #         driver evidence is round 8 (the named rotation debt).
    #   9-10  q132/q133 — r11-gated, but their code changed THIS
    #         round (q132: NULL-extremum min/max now FAILS, oracle in
    #         lockstep; q133: drift_monitor grew the trigger param —
    #         default path identical, re-gate proves it).
    #   11-45 the 35 entries whose latest driver evidence is round 9
    #         (q33-q57 block, q66/q67, q72, q76, q94, q102,
    #         q106-q113 samplers/sketches).
    #   46-50 q107/q110/q117/q119/q120 — round-10-gated index
    #         lifecycle entries sitting on the r11-reworked lease
    #         path (q121 stays below the cap on its r10 evidence:
    #         the IVF delete path is exercised by in-gate q119's
    #         compacted search and q121's family keeps q110/q117/q119
    #         in-gate).
    # Everything below slot 50 was driver-gated in round 10 or 11 and
    # stays value-checked EVERY pytest run by the local DuckDB replica
    # (tests/test_entry_oracle.py auto-parametrizes all entries).
    "q136_zorder_incremental": q136_zorder_incremental,
    "q137_ztable_streaming_admit": q137_ztable_streaming_admit,
    "q135_dup_source_matrix": q135_dup_source_matrix,
    "q70_ivf_pruned_search": q70_ivf_pruned_search,
    "q80_embedding_quantize": q80_embedding_quantize,
    "q89_interval_join": q89_interval_join,
    "q91_triangle_count": q91_triangle_count,
    "q104_skewed_join_composite": q104_skewed_join_composite,
    "q132_quality_constraints": q132_quality_constraints,
    "q133_streaming_drift": q133_streaming_drift,
    "q33_simhash": q33_simhash,
    "q35_quality_score": q35_quality_score,
    "q36_sessionize": q36_sessionize,
    "q37_sliding_windows": q37_sliding_windows,
    "q38_media_features": q38_media_features,
    "q39_baseline_workload": q39_baseline_workload,
    "q40_update_in_where": q40_update_in_where,
    "q41_cube": q41_cube,
    "q43_json_extract": q43_json_extract,
    "q44_contains": q44_contains,
    "q45_median_agg": q45_median_agg,
    "q46_stateful_stream": q46_stateful_stream,
    "q47_union": q47_union,
    "q48_intersect": q48_intersect,
    "q49_except": q49_except,
    "q50_argmin_argmax": q50_argmin_argmax,
    "q51_embedding_pairs_exact": q51_embedding_pairs_exact,
    "q52_repetition_stats": q52_repetition_stats,
    "q53_pii_scrub": q53_pii_scrub,
    "q54_hash_split": q54_hash_split,
    "q55_canonical_selection": q55_canonical_selection,
    "q56_bm25_top_terms": q56_bm25_top_terms,
    "q57_asof_join": q57_asof_join,
    "q66_shared_spans": q66_shared_spans,
    "q67_training_pipeline": q67_training_pipeline,
    "q72_cardinality_sketch": q72_cardinality_sketch,
    "q76_curriculum_buckets": q76_curriculum_buckets,
    "q94_percentile_outliers": q94_percentile_outliers,
    "q102_pagerank_dangling": q102_pagerank_dangling,
    "q106_token_budget_mix": q106_token_budget_mix,
    "q108_token_mix_upsampled": q108_token_mix_upsampled,
    "q109_quantile_sketch_audit": q109_quantile_sketch_audit,
    "q111_distribution_match": q111_distribution_match,
    "q112_balanced_shards": q112_balanced_shards,
    "q113_cluster_safe_split": q113_cluster_safe_split,
    "q107_minhash_index_probe": q107_minhash_index_probe,
    "q110_ivf_append_search": q110_ivf_append_search,
    "q117_ivf_admit": q117_ivf_admit,
    "q119_ivf_compacted_search": q119_ivf_compacted_search,
    "q120_minhash_delete_probe": q120_minhash_delete_probe,
    # ---- below the 50-slot gate cap (r11-gated) --------------------
    "q121_ivf_delete_search": q121_ivf_delete_search,
    "q127_index_tool_lifecycle": q127_index_tool_lifecycle,
    "q123_ivf_streaming_admit": q123_ivf_streaming_admit,
    "q124_int8_rerank_search": q124_int8_rerank_search,
    "q125_ivf_refit_search": q125_ivf_refit_search,
    "q126_crossmodal_curation": q126_crossmodal_curation,
    "q115_minhash_compacted_probe": q115_minhash_compacted_probe,
    "q116_minhash_admit": q116_minhash_admit,
    "q128_zorder_layout_scan": q128_zorder_layout_scan,
    "q129_pq_adc_search": q129_pq_adc_search,
    "q130_distribution_drift": q130_distribution_drift,
    "q131_dsir_selection": q131_dsir_selection,
    "q134_ivfpq_search": q134_ivfpq_search,
    "q2_filter_comparisons": q2_filter_comparisons,
    "q3_filter_disjunction_not": q3_filter_disjunction_not,
    "q4_filter_in_list": q4_filter_in_list,
    "q6_filter_ilike": q6_filter_ilike,
    "q7_filter_bits": q7_filter_bits,
    "q8_alias_arithmetic": q8_alias_arithmetic,
    "q9_alias_math_fn": q9_alias_math_fn,
    "q10_agg_global": q10_agg_global,
    "q11_count_star": q11_count_star,
    "q12_distinct": q12_distinct,
    "q13_topk_offset": q13_topk_offset,
    "q14_groupby_nunique": q14_groupby_nunique,
    "q15_from_subquery": q15_from_subquery,
    "q16_in_subquery": q16_in_subquery,
    "q17_not_in_subquery": q17_not_in_subquery,
    "q18_update_statement": q18_update_statement,
    "q19_isnull": q19_isnull,
    "q22_window_rank": q22_window_rank,
    "q23_window_running_sum": q23_window_running_sum,
    "q24_rollup": q24_rollup,
    "q25_time_bucket": q25_time_bucket,
    "q26_dedup_exact_text": q26_dedup_exact_text,
    "q27_dedup_token_set": q27_dedup_token_set,
    "q28_text_token_stats": q28_text_token_stats,
    "q29_lang_id": q29_lang_id,
    "q30_cosine_topk": q30_cosine_topk,
    "q32_ngram_jaccard": q32_ngram_jaccard,
    "q34_embedding_dup_pairs": q34_embedding_dup_pairs,
    "q81_weighted_sample": q81_weighted_sample,
    "q82_user_funnel": q82_user_funnel,
    "q83_ngram_novelty": q83_ngram_novelty,
    "q84_vocab_overlap": q84_vocab_overlap,
    "q85_fk_orphan_audit": q85_fk_orphan_audit,
    "q86_table_profile": q86_table_profile,
    "q87_fuzzy_match": q87_fuzzy_match,
    "q88_skewed_join": q88_skewed_join,
    # ---- (r10-gated) -----------------------------------------------
    "q1_pricing_summary": q1_pricing_summary,
    "q5_filter_like": q5_filter_like,
    "q20_join_broadcast": q20_join_broadcast,
    "q21_join_multi": q21_join_multi,
    "q31_minhash_lsh_pairs": q31_minhash_lsh_pairs,
    "q42_ivf_search": q42_ivf_search,
    "q58_stream_dedup": q58_stream_dedup,
    "q59_unigram_surprise": q59_unigram_surprise,
    "q60_decontamination": q60_decontamination,
    "q61_asof_tolerance": q61_asof_tolerance,
    "q62_chunk_documents": q62_chunk_documents,
    "q63_top_terms_by_lang": q63_top_terms_by_lang,
    "q64_stratified_sample": q64_stratified_sample,
    "q65_stream_enrich": q65_stream_enrich,
    "q68_sequence_packing": q68_sequence_packing,
    "q69_rollup_qgrammar": q69_rollup_qgrammar,
    "q71_dedup_clusters": q71_dedup_clusters,
    "q73_asof_forward": q73_asof_forward,
    "q74_event_gaps": q74_event_gaps,
    "q75_negative_sampling": q75_negative_sampling,
    "q77_group_centroids": q77_group_centroids,
    "q78_chunk_dup_stats": q78_chunk_dup_stats,
    "q79_contrastive_dataset": q79_contrastive_dataset,
    "q90_pagerank": q90_pagerank,
    "q92_event_transitions": q92_event_transitions,
    "q93_time_bucket_ohlc": q93_time_bucket_ohlc,
    "q95_prefix_jaccard_join": q95_prefix_jaccard_join,
    "q96_knn_label_consistency": q96_knn_label_consistency,
    "q97_token_pmi": q97_token_pmi,
    "q98_cohort_retention": q98_cohort_retention,
    "q99_neardup_clusters": q99_neardup_clusters,
    "q100_top_revenue_orders": q100_top_revenue_orders,
    "q101_snapshot_diff": q101_snapshot_diff,
    "q103_salted_aggregate": q103_salted_aggregate,
    "q105_minhash_probe": q105_minhash_probe,
    "q114_semantic_dedup": q114_semantic_dedup,
    "q118_streaming_admit": q118_streaming_admit,
    "q122_minhash_merge_probe": q122_minhash_merge_probe,
}



def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)



def _lang_id_oracle_sql(source: str = "documents") -> str:
    """DuckDB replica of text.language_id, generated from the same
    script-range table, lexicons AND tokenizer regex so the heuristic
    and the oracle cannot drift: script codepoint-class checks first
    (literal ranges mean the same thing to Java regex and RE2), then
    tokens = split(lower(text), non-letter/digit runs) and
    per-language membership counts over the token list."""
    tokens = f"regexp_split_to_array(lower(text), '{_text.WORD_SPLIT_REGEX}')"
    score_exprs = []
    for lang, words in _text.LANGUAGE_STOPWORDS.items():
        lexicon = "[" + ", ".join("'" + w + "'" for w in words) + "]"
        score_exprs.append(
            f"len(list_filter(toks, t -> list_contains({lexicon}, t))) AS s_{lang}"
        )
    langs = list(_text.LANGUAGE_STOPWORDS.keys())
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    case_branches = "\n".join(
        f"           WHEN s_{lang} = best THEN '{lang}'" for lang in langs
    )
    script_branches = "\n".join(
        f"           WHEN regexp_matches(text, '{pattern}') THEN '{lang}'"
        for lang, pattern in _text.LANGUAGE_SCRIPTS
    )
    return f"""
        WITH tokenized AS (
            SELECT doc_id, text, {tokens} AS toks FROM {source}
        ), scored AS (
            SELECT doc_id, text, {", ".join(score_exprs)} FROM tokenized
        ), ranked AS (
            SELECT doc_id, text, {best} AS best, * FROM scored
        )
        SELECT doc_id,
           CASE
{script_branches}
                WHEN best < 1 THEN 'und'
{case_branches}
           END AS lang_pred
        FROM ranked
    """


_TOKENS_SQL = "regexp_split_to_array(lower(trim(text)), '\\s+')"
_SHINGLES_SQL = (
    "list_distinct(list_transform(range(1, greatest(len(" + _TOKENS_SQL + ") - 1, 1)), "
    "i -> array_to_string(list_slice(" + _TOKENS_SQL + ", i, i + 2), ' ')))"
)

def _pii_oracle_sql() -> str:
    """Generated from the SAME pattern table as the operator (no
    drift); DuckDB needs the explicit 'g' flag for replace-all."""
    counts = ", ".join(
        f"len(regexp_extract_all(text, '{p}')) AS n_{kind}"
        for kind, p in _text.PII_PATTERNS.items()
    )
    redacted = "text"
    for kind, p in _text.PII_PATTERNS.items():
        redacted = f"regexp_replace({redacted}, '{p}', '<{kind.upper()}>', 'g')"
    return f"SELECT doc_id, {counts}, {redacted} AS text_redacted FROM documents"


OPERATOR_ORACLES: dict[str, str] = {
    "q52_repetition_stats": """
        WITH t AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(text), '\\s+') AS toks,
                   regexp_split_to_array(text, '\\n') AS lines
            FROM documents
        ), g AS (
            SELECT doc_id, toks, lines,
                   list_transform(range(1, greatest(len(toks), 1)),
                                  i -> toks[i] || ' ' || toks[i + 1]) AS two
            FROM t
        )
        SELECT doc_id,
               len(toks) AS n_tokens,
               round(len(list_distinct(toks)) / greatest(len(toks), 1), 6)
                   AS distinct_token_ratio,
               CASE WHEN len(two) < 1 THEN 0.0
                    ELSE round(1 - len(list_distinct(two)) / len(two), 6)
               END AS dup_2gram_frac,
               round(1 - len(list_distinct(lines)) / greatest(len(lines), 1), 6)
                   AS dup_line_ratio
        FROM g
    """,
    # q60: same tokenizer + n-gram spec as dedup.shingles (whole-doc
    # shingle when shorter than n tokens), joined as strings where the
    # engine joins 64-bit hashes of the same strings.
    "q60_decontamination": """
        WITH tok AS (
            SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
            FROM documents
        ), sh AS (
            SELECT doc_id,
                   CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                        ELSE list_transform(range(1, len(toks) - 1),
                                            i -> array_to_string(toks[i:i+2], ' '))
                   END AS shs
            FROM tok
        ), ev AS (
            SELECT DISTINCT s
            FROM (SELECT unnest(shs) AS s FROM sh WHERE doc_id % 97 = 0)
        ), ds AS (
            SELECT DISTINCT doc_id, s
            FROM (SELECT doc_id, unnest(shs) AS s FROM sh WHERE doc_id % 97 <> 0)
        )
        SELECT doc_id, COUNT(*) AS n_contaminated_ngrams
        FROM ds JOIN ev USING (s) GROUP BY doc_id
    """,
    # q58: with the watermark covering the whole corpus, streaming
    # dedup's drained output is exactly the distinct key set.
    "q58_stream_dedup": """
        SELECT DISTINCT user_id, event_type FROM events
    """,
    # q57: independent formulation of the as-of spec — inequality
    # LEFT JOIN + row_number, latest order <= event ts, ties ->
    # highest o_orderkey; unmatched events keep NULL order columns.
    "q57_asof_join": """
        SELECT event_id, user_id, asof_orderkey, asof_totalprice FROM (
            SELECT e.event_id, e.user_id,
                   o.o_orderkey AS asof_orderkey,
                   o.o_totalprice AS asof_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
            FROM events e LEFT JOIN orders o
              ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        ) WHERE rn = 1
    """,
    # q79: q66's pair CTE + best-partner window + q75's negative CTE
    # joined on the anchor — the composed formulations of the two
    # gated generators, so the composition itself is oracle-checked.
    "q79_contrastive_dataset": """
        WITH toks AS (
            SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
            FROM documents
        ), grams AS (
            SELECT doc_id, unnest(
                CASE WHEN len(tk) < 8 THEN [array_to_string(tk, ' ')]
                     ELSE list_distinct(list_transform(range(1, len(tk) - 6),
                          i -> array_to_string(list_slice(tk, i, i + 7), ' ')))
                END) AS g
            FROM toks
        ), keep AS (
            SELECT g FROM grams GROUP BY g HAVING count(*) BETWEEN 2 AND 200
        ), pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM grams a JOIN keep USING (g) JOIN grams b USING (g)
            WHERE a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ), sym AS (
            SELECT id_a AS anchor_id, id_b AS positive_id, n_shared FROM pairs
            UNION ALL
            SELECT id_b, id_a, n_shared FROM pairs
        ), best AS (
            SELECT anchor_id, positive_id, n_shared FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                    ORDER BY n_shared DESC, positive_id ASC) AS rn
                FROM sym
            ) WHERE rn = 1
        ), d AS (
            SELECT MAX(doc_id) + 1 AS domain FROM documents
        ), negs AS (
            SELECT anchor_id, j,
                   ('0x' || substr(md5('29:' || CAST(anchor_id AS VARCHAR)
                        || ':' || CAST(j AS VARCHAR)), 1, 15))::BIGINT
                       % domain AS negative_id
            FROM (SELECT doc_id AS anchor_id FROM documents
                  WHERE doc_id IS NOT NULL)
            CROSS JOIN (SELECT unnest(range(1, 3)) AS j) CROSS JOIN d
        )
        SELECT b.anchor_id, b.positive_id, b.n_shared, n.j, n.negative_id
        FROM best b JOIN negs n USING (anchor_id)
        WHERE n.negative_id != n.anchor_id
          AND n.negative_id IN (SELECT doc_id FROM documents)
    """,
    # q75: identical md5-derived 60-bit hash ("29:{anchor}:{j}"), same
    # modulo domain (max doc_id + 1), same existence/self filters.
    "q75_negative_sampling": """
        WITH a AS (
            SELECT doc_id AS anchor_id FROM documents WHERE doc_id IS NOT NULL
        ), d AS (
            SELECT MAX(doc_id) + 1 AS domain FROM documents
        ), c AS (
            SELECT anchor_id, j,
                   ('0x' || substr(md5('29:' || CAST(anchor_id AS VARCHAR)
                        || ':' || CAST(j AS VARCHAR)), 1, 15))::BIGINT
                       % domain AS negative_id
            FROM a CROSS JOIN (SELECT unnest(range(1, 5)) AS j) CROSS JOIN d
        )
        SELECT anchor_id, j, negative_id
        FROM c
        WHERE negative_id != anchor_id
          AND negative_id IN (SELECT doc_id FROM documents)
    """,
    # q77: same fixed-point sum (round(x*1e6) into BIGINT) -> the mean
    # is order-independent on both engines. Parallel unnests of equal
    # length zip in DuckDB, giving 0-based (pos, x) pairs.
    # float->double promotion is exact.
    "q77_group_centroids": """
        WITH e AS (
            SELECT label,
                   unnest(range(0, len(embedding))) AS pos,
                   unnest(embedding) AS x
            FROM embeddings
        )
        SELECT label, CAST(pos AS INTEGER) AS pos,
               SUM(CAST(ROUND(CAST(x AS DOUBLE) * 1e6) AS BIGINT))
                   / 1e6 / COUNT(x) AS centroid_val
        FROM e GROUP BY label, pos
    """,
    # q78: q62's chunk rule; repeat test on chunk strings (engine uses
    # 64-bit fingerprints — equality-equivalent); CASTs pin BIGINT.
    "q78_chunk_dup_stats": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text),
                       '[^\\p{L}\\p{N}]+'), t -> t != '') AS tk
            FROM documents
        ), st AS (
            SELECT doc_id, tk, unnest(range(0, len(tk), 16)) AS s FROM toks
        ), chunks AS (
            SELECT doc_id,
                   array_to_string(list_slice(tk, s + 1, s + 32), ' ') AS chunk_text
            FROM st
        ), spread AS (
            SELECT chunk_text, COUNT(DISTINCT doc_id) AS ndocs
            FROM chunks GROUP BY chunk_text
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_chunks,
               ROUND(CAST(SUM(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                   / COUNT(*), 6) AS dup_frac
        FROM chunks JOIN spread USING (chunk_text)
        GROUP BY doc_id
    """,
    # q76: NTILE with the same total order (score, doc_id).
    "q76_curriculum_buckets": """
        SELECT doc_id, n_chars,
               NTILE(10) OVER (ORDER BY n_chars ASC, doc_id ASC) AS bucket
        FROM documents
    """,
    # q74: LAG window; CASTs pin the SUM away from HUGEINT.
    "q74_event_gaps": """
        WITH gaps AS (
            SELECT user_id,
                   date_diff('microsecond',
                       LAG(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id),
                       ts) AS gap_us
            FROM events
        )
        SELECT user_id,
               COUNT(*) AS n_events,
               MAX(gap_us) AS max_gap_us,
               MIN(gap_us) AS min_gap_us,
               CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us
        FROM gaps GROUP BY user_id
    """,
    # q73: mirror of q57 — nearest FOLLOWING row, ties -> lowest key.
    # q72: the envelope gate (VERDICT r8 item 4). The oracle computes
    # the exact per-source distinct count and asserts est_ok = TRUE:
    # the Spark side hash-matches only if its HLL++ estimate sits
    # within the documented 3-sigma envelope for EVERY group — a
    # drifted estimator fails the hash, not just a pytest.
    "q72_cardinality_sketch": """
        SELECT source,
               COUNT(DISTINCT doc_id) AS n_distinct_exact,
               TRUE AS est_ok
        FROM documents
        GROUP BY source
    """,
    "q73_asof_forward": """
        SELECT event_id, user_id, asof_orderkey, asof_totalprice FROM (
            SELECT e.event_id, e.user_id,
                   o.o_orderkey AS asof_orderkey,
                   o.o_totalprice AS asof_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY e.event_id
                       ORDER BY o.o_orderdate ASC, o.o_orderkey ASC) AS rn
            FROM events e LEFT JOIN orders o
              ON o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
        ) WHERE rn = 1
    """,
    # q61: the tolerance lives in the ON clause here; the engine nulls
    # the nearest match post-hoc — equivalent because the backward
    # as-of match is the nearest preceding row.
    "q61_asof_tolerance": """
        SELECT event_id, user_id, asof_orderkey, asof_totalprice FROM (
            SELECT e.event_id, e.user_id,
                   o.o_orderkey AS asof_orderkey,
                   o.o_totalprice AS asof_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
            FROM events e LEFT JOIN orders o
              ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
             AND o.o_orderdate >= e.ts - INTERVAL 8400 DAY
        ) WHERE rn = 1
    """,
    # q62: same window rule as text.chunk_documents — starts 0,16,32,…
    # while < n (DuckDB range() is stop-exclusive = Spark's inclusive
    # sequence(0, n-1)), chunk = tokens[s+1 .. s+32] (list_slice is
    # end-inclusive = Spark's slice(start, length)).
    "q62_chunk_documents": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text),
                       '[^\\p{L}\\p{N}]+'), t -> t != '') AS tk
            FROM documents
        ), st AS (
            SELECT doc_id, tk, unnest(range(0, len(tk), 16)) AS s FROM toks
        )
        SELECT doc_id,
               s // 16 AS chunk_id,
               len(list_slice(tk, s + 1, s + 32)) AS n_chunk_tokens,
               array_to_string(list_slice(tk, s + 1, s + 32), ' ') AS chunk_text
        FROM st
    """,
    # q68: q62's chunk rule + identical md5 bucket hash, (doc, chunk)
    # tape order, and floor-division pack assignment.
    "q68_sequence_packing": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text),
                       '[^\\p{L}\\p{N}]+'), t -> t != '') AS tk
            FROM documents
        ), st AS (
            SELECT doc_id, tk, unnest(range(0, len(tk), 16)) AS s FROM toks
        ), chunks AS (
            SELECT doc_id, s // 16 AS chunk_id,
                   len(list_slice(tk, s + 1, s + 32)) AS n_chunk_tokens,
                   ('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS bucket
            FROM st
        ), tape AS (
            -- CASTs: DuckDB SUM() on BIGINT yields HUGEINT; Spark emits
            -- LongType. The driver hashes raw values, so the oracle must
            -- pin BIGINT or the hash mismatches on identical values
            -- (same artifact as q43, VERDICT r2/r4).
            SELECT doc_id, chunk_id, n_chunk_tokens, bucket,
                   CAST(SUM(n_chunk_tokens) OVER (PARTITION BY bucket
                       ORDER BY doc_id, chunk_id
                       ROWS UNBOUNDED PRECEDING) - n_chunk_tokens AS BIGINT)
                       AS tape_offset
            FROM chunks
        )
        SELECT doc_id, chunk_id, n_chunk_tokens, bucket, tape_offset,
               CAST(tape_offset // 128 AS BIGINT) AS pack_id
        FROM tape
    """,
    # q66: span STRINGS here vs 64-bit hashes in the engine
    # (equality-equivalent); same whole-doc fallback for docs shorter
    # than n tokens, same [2, 200] posting-list cap.
    "q66_shared_spans": """
        WITH toks AS (
            SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
            FROM documents
        ), grams AS (
            SELECT doc_id, unnest(
                CASE WHEN len(tk) < 8 THEN [array_to_string(tk, ' ')]
                     ELSE list_distinct(list_transform(range(1, len(tk) - 6),
                          i -> array_to_string(list_slice(tk, i, i + 7), ' ')))
                END) AS g
            FROM toks
        ), keep AS (
            SELECT g FROM grams GROUP BY g HAVING count(*) BETWEEN 2 AND 200
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        FROM grams a JOIN keep USING (g) JOIN grams b USING (g)
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    """,
    # q71: q66's pair derivation + a recursive-CTE reachability closure
    # (UNION dedup -> fixpoint): cluster_id = min(doc_id, min reachable
    # doc_id) — exactly the star-forest labels the Spark side's
    # large-star/small-star contraction converges to.
    "q71_dedup_clusters": """
        WITH RECURSIVE toks AS (
            SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
            FROM documents
        ), grams AS (
            SELECT doc_id, unnest(
                CASE WHEN len(tk) < 8 THEN [array_to_string(tk, ' ')]
                     ELSE list_distinct(list_transform(range(1, len(tk) - 6),
                          i -> array_to_string(list_slice(tk, i, i + 7), ' ')))
                END) AS g
            FROM toks
        ), keep AS (
            SELECT g FROM grams GROUP BY g HAVING count(*) BETWEEN 2 AND 200
        ), pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM grams a JOIN keep USING (g) JOIN grams b USING (g)
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2
        ), edges AS (
            SELECT id_a AS u, id_b AS v FROM pairs
            UNION ALL
            SELECT id_b, id_a FROM pairs
        ), reach AS (
            SELECT u, v AS x FROM edges
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.x
        )
        SELECT d.doc_id,
               CAST(LEAST(d.doc_id, COALESCE(m.mn, d.doc_id)) AS BIGINT)
                   AS cluster_id
        FROM documents d
        LEFT JOIN (SELECT u, MIN(x) AS mn FROM reach GROUP BY u) m
            ON m.u = d.doc_id
    """,
    # q65: batch formulation of the stream-static join (equal by
    # stream-static semantics once the stream drains).
    "q65_stream_enrich": """
        SELECT c.c_mktsegment AS mktsegment, e.event_type,
               COUNT(*) AS n_events
        FROM events e JOIN customer c ON c.c_custkey = e.user_id
        GROUP BY c.c_mktsegment, e.event_type
    """,
    # q64: identical md5-derived 60-bit hash + (hash, doc_id) ordering
    # on both engines; n=10 per source.
    "q64_stratified_sample": """
        SELECT doc_id, source, sample_rank FROM (
            SELECT doc_id, source,
                   ROW_NUMBER() OVER (PARTITION BY source ORDER BY
                       ('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT ASC,
                       doc_id ASC) AS sample_rank
            FROM documents WHERE doc_id IS NOT NULL
        ) WHERE sample_rank <= 10
    """,
    # q63: frequency ties break by term ASC in both engines.
    "q63_top_terms_by_lang": """
        WITH t AS (
            SELECT lang,
                   unnest(list_filter(regexp_split_to_array(lower(text),
                       '[^\\p{L}\\p{N}]+'), x -> x != '')) AS term
            FROM documents
        ), c AS (
            SELECT lang, term, count(*) AS n FROM t GROUP BY lang, term
        )
        SELECT lang, term, n, rank FROM (
            SELECT lang, term, n,
                   ROW_NUMBER() OVER (PARTITION BY lang
                       ORDER BY n DESC, term ASC) AS rank
            FROM c
        ) WHERE rank <= 20
    """,
    # q55: q35's quality composite + q27's token-set cluster key;
    # canonical member = highest rounded quality, ties -> lowest id.
    "q55_canonical_selection": """
        WITH feat AS (
            SELECT doc_id,
                   array_to_string(list_sort(list_distinct(
                       regexp_split_to_array(lower(trim(text)), '\\s+'))), ' ') AS k,
                   len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
                   length(text) AS n_chars,
                   len(regexp_extract_all(text, '[\\.,;:!\\?"''\\(\\)\\[\\]\\{}]')) AS n_punct,
                   len(regexp_extract_all(text, '[0-9]')) AS n_digits,
                   len(regexp_extract_all(lower(text), '\\b(the|and|of|to|is|in|that|with|for|was)\\b')) AS n_stop
            FROM documents
        ), ratios AS (
            SELECT doc_id, k,
                   n_punct / GREATEST(n_chars, 1)::DOUBLE AS raw_punct,
                   n_digits / GREATEST(n_chars, 1)::DOUBLE AS raw_digit,
                   n_stop / GREATEST(n_tokens, 1)::DOUBLE AS raw_stop,
                   (n_chars - (n_tokens - 1)) / GREATEST(n_tokens, 1)::DOUBLE AS raw_mtl
            FROM feat
        ), score AS (
            SELECT doc_id, k,
                   ROUND(
                       0.25 * LEAST(raw_stop * 2, 1.0)
                     + 0.25 * (1 - LEAST(raw_digit * 5, 1.0))
                     + 0.25 * (1 - LEAST(raw_punct * 5, 1.0))
                     + 0.25 * (CASE WHEN raw_mtl >= 3 AND raw_mtl <= 10 THEN 1.0 ELSE 0.0 END),
                   6) AS qs
            FROM ratios
        ), ranked AS (
            SELECT doc_id, qs,
                   ROW_NUMBER() OVER (PARTITION BY k ORDER BY qs DESC, doc_id ASC) AS rn,
                   MAX(qs) OVER (PARTITION BY k) AS best_quality,
                   COUNT(*) OVER (PARTITION BY k) AS n_members
            FROM score
        )
        SELECT doc_id AS keep_id, best_quality, n_members
        FROM ranked WHERE rn = 1
    """,
    "q26_dedup_exact_text": """
        SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_members
        FROM documents
        GROUP BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')
    """,
    "q27_dedup_token_set": """
        SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_members
        FROM documents
        GROUP BY array_to_string(list_sort(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))), ' ')
    """,
    "q28_text_token_stats": """
        SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_ws_tokens,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS n_bpe_tokens
        FROM documents
    """,
    "q30_cosine_topk": """
        WITH q AS (
            SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
            FROM embeddings WHERE vec_id = 0
        ), e AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
            FROM embeddings
        )
        SELECT vec_id,
               list_dot_product(ev, qv) /
               (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv))) AS cosine
        FROM e, q
        ORDER BY cosine DESC, vec_id ASC
        LIMIT 10
    """,
    # q109: rank-envelope gate for the GK quantile sketch — exact side
    # (n + TRUE flags) replicable by any engine; see q72's device.
    "q109_quantile_sketch_audit": """
        SELECT source,
               COUNT(n_chars) AS n,
               TRUE AS ok_p500,
               TRUE AS ok_p950
        FROM documents
        GROUP BY source
    """,
    # q110: q70's deterministic IVF replay with the BUILD restricted
    # to even vec_ids (stride init + one Lloyd step over the built
    # half) and the ASSIGNMENT over ALL ids — exactly build+append.
    "q110_ivf_append_search": """
        WITH e AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        init AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS ci, v
          FROM e WHERE vec_id % 2 = 0 ORDER BY vec_id LIMIT 8
        ),
        a0 AS (
          SELECT vec_id, v, ci FROM (
            SELECT e.vec_id, e.v, i.ci,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_dot_product(i.v, i.v)
                              - 2 * list_dot_product(e.v, i.v), i.ci
                   ) AS rn
            FROM e CROSS JOIN init i
            WHERE e.vec_id % 2 = 0
          ) WHERE rn = 1
        ),
        dims AS (
          SELECT ci, generate_subscripts(v, 1) AS pos, unnest(v) AS val
          FROM a0
        ),
        m AS (
          SELECT ci, pos, SUM(val) / COUNT(*) AS cv FROM dims GROUP BY ci, pos
        ),
        c1 AS (
          SELECT i.ci, COALESCE(mm.mv, i.v) AS v
          FROM init i LEFT JOIN (
            SELECT ci, list(cv ORDER BY pos) AS mv FROM m GROUP BY ci
          ) mm USING (ci)
        ),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        probes AS (
          SELECT ci FROM c1, q
          ORDER BY list_dot_product(c1.v, c1.v)
                   - 2 * list_dot_product(c1.v, q.qv), ci
          LIMIT 3
        ),
        a1 AS (
          SELECT vec_id, ci FROM (
            SELECT e.vec_id, c.ci,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_dot_product(c.v, c.v)
                              - 2 * list_dot_product(e.v, c.v), c.ci
                   ) AS rn
            FROM e CROSS JOIN c1 c
          ) WHERE rn = 1
        )
        SELECT vec_id, ROUND(c, 6) AS cosine FROM (
          SELECT e.vec_id,
                 list_dot_product(e.v, q.qv) /
                 (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS c
          FROM e JOIN a1 USING (vec_id), q
          WHERE a1.ci IN (SELECT ci FROM probes)
          ORDER BY c DESC, e.vec_id ASC
          LIMIT 10
        )
    """,
    # q107: identical oracle to q105 — the INDEXED probe (build +
    # write + load + append + probe off parquet postings/sets) must
    # return exactly what the from-text probe returns, which the
    # brute-force batch x corpus Jaccard pins externally.
    "q107_minhash_index_probe": """
        WITH t AS (
            SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x != '') AS toks
            FROM documents
        ), s AS (
            SELECT doc_id,
                   CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                        ELSE list_distinct(list_transform(range(1, len(toks) - 1),
                             i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
                   END AS sh
            FROM t
        ), j AS (
            SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
                   len(list_intersect(b.sh, c.sh))::DOUBLE /
                   len(list_distinct(list_concat(b.sh, c.sh))) AS jacc
            FROM s b JOIN s c
              ON b.doc_id % 4 = 0 AND c.doc_id % 4 != 0
        )
        SELECT batch_id, corpus_id, ROUND(jacc, 6) AS jaccard
        FROM j WHERE jacc >= 0.5
    """,
    # q116: admit survivors, fully brute-force — batch ids minus any
    # corpus neighbor at >= 0.5 minus any LOWER-id batch neighbor at
    # >= 0.5 (dominance is a pair property: being dominated by an
    # already-dropped row still drops).
    "q116_minhash_admit": """
        WITH t AS (
            SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x != '') AS toks
            FROM documents
        ), s AS (
            SELECT doc_id,
                   CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                        ELSE list_distinct(list_transform(range(1, len(toks) - 1),
                             i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
                   END AS sh
            FROM t
        )
        SELECT b.doc_id
        FROM s b
        WHERE b.doc_id % 4 = 0
          AND NOT EXISTS (
            SELECT 1 FROM s c
            WHERE c.doc_id % 4 != 0
              AND len(list_intersect(b.sh, c.sh))::DOUBLE /
                  len(list_distinct(list_concat(b.sh, c.sh))) >= 0.5
          )
          AND NOT EXISTS (
            SELECT 1 FROM s a
            WHERE a.doc_id % 4 = 0 AND a.doc_id < b.doc_id
              AND len(list_intersect(b.sh, a.sh))::DOUBLE /
                  len(list_distinct(list_concat(b.sh, a.sh))) >= 0.5
          )
    """,
    # q118: sequential streaming admission, fully brute-force — S1 =
    # %3==1 survivors vs the %3==0 corpus (two NOT EXISTS, q116's
    # construction), S2 = %3==2 survivors vs corpus UNION S1's
    # survivors, result = corpus + S1 + S2 (disjoint by %3).
    "q118_streaming_admit": """
        WITH t AS (
            SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x != '') AS toks
            FROM documents
        ), s AS (
            SELECT doc_id,
                   CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                        ELSE list_distinct(list_transform(range(1, len(toks) - 1),
                             i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
                   END AS sh
            FROM t
        ), s1 AS (
            SELECT b.doc_id
            FROM s b
            WHERE b.doc_id % 3 = 1
              AND NOT EXISTS (
                SELECT 1 FROM s c
                WHERE c.doc_id % 3 = 0
                  AND len(list_intersect(b.sh, c.sh))::DOUBLE /
                      len(list_distinct(list_concat(b.sh, c.sh))) >= 0.5
              )
              AND NOT EXISTS (
                SELECT 1 FROM s a
                WHERE a.doc_id % 3 = 1 AND a.doc_id < b.doc_id
                  AND len(list_intersect(b.sh, a.sh))::DOUBLE /
                      len(list_distinct(list_concat(b.sh, a.sh))) >= 0.5
              )
        ), s2 AS (
            SELECT b.doc_id
            FROM s b
            WHERE b.doc_id % 3 = 2
              AND NOT EXISTS (
                SELECT 1 FROM s c
                WHERE (c.doc_id % 3 = 0
                       OR c.doc_id IN (SELECT doc_id FROM s1))
                  AND len(list_intersect(b.sh, c.sh))::DOUBLE /
                      len(list_distinct(list_concat(b.sh, c.sh))) >= 0.5
              )
              AND NOT EXISTS (
                SELECT 1 FROM s a
                WHERE a.doc_id % 3 = 2 AND a.doc_id < b.doc_id
                  AND len(list_intersect(b.sh, a.sh))::DOUBLE /
                      len(list_distinct(list_concat(b.sh, a.sh))) >= 0.5
              )
        )
        SELECT doc_id FROM documents WHERE doc_id % 3 = 0
        UNION ALL SELECT doc_id FROM s1
        UNION ALL SELECT doc_id FROM s2
    """,
    # q123: q118's sequential-admission formulation for EMBEDDINGS —
    # the q117 k-means replay (stride-seeded init + 1 Lloyd step,
    # ties to the lower centroid id) assigns every vector once (aa);
    # S1 = %3==1 survivors vs the %3==0 corpus within the home
    # cluster, S2 = %3==2 survivors vs corpus UNION S1; both batches
    # also apply the lower-id dominated policy intra-batch.
    "q123_ivf_streaming_admit": """
        WITH e AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        corp AS (SELECT * FROM e WHERE vec_id % 3 = 0),
        init AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS ci, v
          FROM corp ORDER BY vec_id LIMIT 8
        ),
        a0 AS (
          SELECT vec_id, v, ci FROM (
            SELECT c.vec_id, c.v, i.ci,
                   row_number() OVER (
                     PARTITION BY c.vec_id
                     ORDER BY list_dot_product(i.v, i.v)
                              - 2 * list_dot_product(c.v, i.v), i.ci
                   ) AS rn
            FROM corp c CROSS JOIN init i
          ) WHERE rn = 1
        ),
        dims AS (
          SELECT ci, generate_subscripts(v, 1) AS pos, unnest(v) AS val
          FROM a0
        ),
        m AS (
          SELECT ci, pos, SUM(val) / COUNT(*) AS cv FROM dims GROUP BY ci, pos
        ),
        c1 AS (
          SELECT i.ci, COALESCE(mm.mv, i.v) AS v
          FROM init i LEFT JOIN (
            SELECT ci, list(cv ORDER BY pos) AS mv FROM m GROUP BY ci
          ) mm USING (ci)
        ),
        aa AS (
          SELECT vec_id, ci FROM (
            SELECT x.vec_id, k.ci,
                   row_number() OVER (
                     PARTITION BY x.vec_id
                     ORDER BY list_dot_product(k.v, k.v)
                              - 2 * list_dot_product(x.v, k.v), k.ci
                   ) AS rn
            FROM e x CROSS JOIN c1 k
          ) WHERE rn = 1
        ),
        s1 AS (
          SELECT b.vec_id
          FROM aa b JOIN e eb ON eb.vec_id = b.vec_id
          WHERE b.vec_id % 3 = 1
            AND NOT EXISTS (
              SELECT 1 FROM aa n JOIN e en ON en.vec_id = n.vec_id
              WHERE n.vec_id % 3 = 0 AND n.ci = b.ci
                AND list_dot_product(eb.v, en.v)
                    / (sqrt(list_dot_product(eb.v, eb.v))
                       * sqrt(list_dot_product(en.v, en.v))) >= 0.40
            )
            AND NOT EXISTS (
              SELECT 1 FROM aa a JOIN e ea ON ea.vec_id = a.vec_id
              WHERE a.vec_id % 3 = 1 AND a.ci = b.ci
                AND a.vec_id < b.vec_id
                AND list_dot_product(eb.v, ea.v)
                    / (sqrt(list_dot_product(eb.v, eb.v))
                       * sqrt(list_dot_product(ea.v, ea.v))) >= 0.40
            )
        ),
        s2 AS (
          SELECT b.vec_id
          FROM aa b JOIN e eb ON eb.vec_id = b.vec_id
          WHERE b.vec_id % 3 = 2
            AND NOT EXISTS (
              SELECT 1 FROM aa n JOIN e en ON en.vec_id = n.vec_id
              WHERE (n.vec_id % 3 = 0
                     OR n.vec_id IN (SELECT vec_id FROM s1))
                AND n.ci = b.ci
                AND list_dot_product(eb.v, en.v)
                    / (sqrt(list_dot_product(eb.v, eb.v))
                       * sqrt(list_dot_product(en.v, en.v))) >= 0.40
            )
            AND NOT EXISTS (
              SELECT 1 FROM aa a JOIN e ea ON ea.vec_id = a.vec_id
              WHERE a.vec_id % 3 = 2 AND a.ci = b.ci
                AND a.vec_id < b.vec_id
                AND list_dot_product(eb.v, ea.v)
                    / (sqrt(list_dot_product(eb.v, eb.v))
                       * sqrt(list_dot_product(ea.v, ea.v))) >= 0.40
            )
        )
        SELECT vec_id FROM e WHERE vec_id % 3 = 0
        UNION ALL SELECT vec_id FROM s1
        UNION ALL SELECT vec_id FROM s2
    """,
    # q124: both stages of the quantized search replayed — q80's
    # floor(x/scale + 0.5) int8 codes, the code-space cosine top-40
    # shortlist (per-vector scale cancels in cosine; ties to the
    # lower vec_id — the same rule the entry's orderBy pins), then
    # the exact float rerank top-10.
    "q124_int8_rerank_search": """
        WITH e AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        z AS (
          SELECT vec_id, v,
                 list_transform(v, x -> CAST(floor(
                   x / (greatest(list_max(list_transform(v, y -> abs(y))),
                                 1e-30) / 127.0) + 0.5) AS DOUBLE)) AS qz
          FROM e
        ),
        approx AS (
          SELECT z.vec_id, z.v,
                 list_dot_product(z.qz, q.qv)
                   / (sqrt(list_dot_product(z.qz, z.qz))
                      * sqrt(list_dot_product(q.qv, q.qv))) AS ac
          FROM z CROSS JOIN q
        ),
        short AS (
          SELECT vec_id, v FROM (
            SELECT vec_id, v,
                   row_number() OVER (ORDER BY ac DESC, vec_id) AS rn
            FROM approx
          ) WHERE rn <= 40
        )
        SELECT vec_id, ROUND(c, 6) AS cosine FROM (
          SELECT s.vec_id,
                 list_dot_product(s.v, q.qv)
                   / (sqrt(list_dot_product(s.v, s.v))
                      * sqrt(list_dot_product(q.qv, q.qv))) AS c,
                 row_number() OVER (
                   ORDER BY list_dot_product(s.v, q.qv)
                     / (sqrt(list_dot_product(s.v, s.v))
                        * sqrt(list_dot_product(q.qv, q.qv))) DESC,
                     s.vec_id
                 ) AS rn
          FROM short s CROSS JOIN q
        ) WHERE rn <= 10
    """,
    # q120: probe after DELETE — the q105 construction with the
    # corpus restricted to undeleted ids (%8 != 5): tombstone masking
    # must equal a rebuild without the deleted documents.
    "q120_minhash_delete_probe": """
        WITH t AS (
            SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x != '') AS toks
            FROM documents
        ), s AS (
            SELECT doc_id,
                   CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                        ELSE list_distinct(list_transform(range(1, len(toks) - 1),
                             i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
                   END AS sh
            FROM t
        ), j AS (
            SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
                   len(list_intersect(b.sh, c.sh))::DOUBLE /
                   len(list_distinct(list_concat(b.sh, c.sh))) AS jacc
            FROM s b JOIN s c
              ON b.doc_id % 4 = 0 AND c.doc_id % 4 != 0
                 AND c.doc_id % 8 != 5
        )
        SELECT batch_id, corpus_id, ROUND(jacc, 6) AS jaccard
        FROM j WHERE jacc >= 0.5
    """,
    # q105: brute-force batch x corpus shingle Jaccard — the probe
    # analogue of q31's oracle (same recall-1.0 and hash-vs-string
    # Jaccard arguments).
    "q105_minhash_probe": """
        WITH t AS (
            SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x != '') AS toks
            FROM documents
        ), s AS (
            SELECT doc_id,
                   CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                        ELSE list_distinct(list_transform(range(1, len(toks) - 1),
                             i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
                   END AS sh
            FROM t
        ), j AS (
            SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
                   len(list_intersect(b.sh, c.sh))::DOUBLE /
                   len(list_distinct(list_concat(b.sh, c.sh))) AS jacc
            FROM s b JOIN s c
              ON b.doc_id % 4 = 0 AND c.doc_id % 4 != 0
        )
        SELECT batch_id, corpus_id, ROUND(jacc, 6) AS jaccard
        FROM j WHERE jacc >= 0.5
    """,
    # q31: brute-force all-pairs string-shingle Jaccard. Valid as an
    # exact oracle because (a) the LSH band config (64 perms / 16
    # bands) has recall 1.0 on this corpus's >=0.5 pairs — verified
    # deterministically at sf0.001/0.01 — and (b) Jaccard over 32-bit
    # shingle-hash sets equals string-set Jaccard absent collisions
    # (none at these scales).
    "q31_minhash_lsh_pairs": """
        WITH t AS (
            SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x != '') AS toks
            FROM documents
        ), s AS (
            SELECT doc_id,
                   CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                        ELSE list_distinct(list_transform(range(1, len(toks) - 1),
                             i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
                   END AS sh
            FROM t
        ), j AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   len(list_intersect(a.sh, b.sh))::DOUBLE /
                   len(list_distinct(list_concat(a.sh, b.sh))) AS jacc
            FROM s a JOIN s b ON a.doc_id < b.doc_id
        )
        SELECT id_a, id_b, ROUND(jacc, 6) AS jaccard FROM j WHERE jacc >= 0.5
    """,
    # q33: identical SimHash arithmetic on both engines — the token
    # hash is the first 15 hex chars of md5 (60 bits), which DuckDB
    # parses with the same value Spark's conv(substr(md5..)) yields.
    "q33_simhash": """
        WITH tok AS (
            SELECT doc_id,
                   unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> t != '')) AS t
            FROM documents
        ), h AS (
            SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok
        ), votes AS (
            SELECT doc_id, b,
                   SUM(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS v
            FROM h CROSS JOIN (SELECT unnest(range(0, 64)) AS b) bits
            GROUP BY doc_id, b
        ), packed AS (
            SELECT doc_id,
                   CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
            FROM votes GROUP BY doc_id
        )
        SELECT d.doc_id, COALESCE(p.simhash, 0) AS simhash
        FROM documents d LEFT JOIN packed p USING (doc_id)
    """,
    # q38: the media table is DERIVED from documents (payload = UTF-8
    # text bytes), so every feature — including the fake-decode dims,
    # seeded by sha256(payload) bytes 0/1 — reproduces from parquet.
    "q38_media_features": """
        SELECT doc_id AS media_id,
               8 + (('0x' || substr(sha256(coalesce(text, '')), 3, 2))::INT % 8) AS width,
               8 + (('0x' || substr(sha256(coalesce(text, '')), 1, 2))::INT % 8) AS height,
               octet_length(encode(coalesce(text, ''))) AS payload_bytes,
               sha256(coalesce(text, '')) AS payload_sha256
        FROM documents
    """,
    # q70: full replay of the deterministic IVF build (stride-seeded
    # init, one Lloyd step, empty-cluster carryover) + the pruned
    # 3-of-8 probe + exact cosine top-10 over the probed members.
    # Distance ranking uses c.c - 2 x.c, the same algebra as
    # _assign_udf; ci tiebreak = np.argmin first-wins.
    "q70_ivf_pruned_search": """
        WITH e AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        init AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS ci, v
          FROM e ORDER BY vec_id LIMIT 8
        ),
        a0 AS (
          SELECT vec_id, v, ci FROM (
            SELECT e.vec_id, e.v, i.ci,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_dot_product(i.v, i.v)
                              - 2 * list_dot_product(e.v, i.v), i.ci
                   ) AS rn
            FROM e CROSS JOIN init i
          ) WHERE rn = 1
        ),
        dims AS (
          SELECT ci, generate_subscripts(v, 1) AS pos, unnest(v) AS val
          FROM a0
        ),
        m AS (
          SELECT ci, pos, SUM(val) / COUNT(*) AS cv FROM dims GROUP BY ci, pos
        ),
        c1 AS (
          SELECT i.ci, COALESCE(mm.mv, i.v) AS v
          FROM init i LEFT JOIN (
            SELECT ci, list(cv ORDER BY pos) AS mv FROM m GROUP BY ci
          ) mm USING (ci)
        ),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        probes AS (
          SELECT ci FROM c1, q
          ORDER BY list_dot_product(c1.v, c1.v)
                   - 2 * list_dot_product(c1.v, q.qv), ci
          LIMIT 3
        ),
        a1 AS (
          SELECT vec_id, ci FROM (
            SELECT e.vec_id, c.ci,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_dot_product(c.v, c.v)
                              - 2 * list_dot_product(e.v, c.v), c.ci
                   ) AS rn
            FROM e CROSS JOIN c1 c
          ) WHERE rn = 1
        )
        SELECT vec_id, ROUND(c, 6) AS cosine FROM (
          SELECT e.vec_id,
                 list_dot_product(e.v, q.qv) /
                 (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS c
          FROM e JOIN a1 USING (vec_id), q
          WHERE a1.ci IN (SELECT ci FROM probes)
          ORDER BY c DESC, e.vec_id ASC
          LIMIT 10
        )
    """,
    # q114: the q70 deterministic-k-means CTEs (init = 8 lowest
    # vec_ids, argmin c.c - 2 x.c with first-wins tiebreak, per-dim
    # mean refine with empty-cluster carryover, re-assign) followed by
    # SemDeDup's dominated filter: drop a vector iff a LOWER-id vector
    # in the SAME cluster has cosine >= 0.40 with it. Cosine algebra
    # is q51's (list_dot_product / norms), already pinned stable
    # cross-engine at this exact threshold on this corpus.
    "q114_semantic_dedup": """
        WITH e AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        init AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS ci, v
          FROM e ORDER BY vec_id LIMIT 8
        ),
        a0 AS (
          SELECT vec_id, v, ci FROM (
            SELECT e.vec_id, e.v, i.ci,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_dot_product(i.v, i.v)
                              - 2 * list_dot_product(e.v, i.v), i.ci
                   ) AS rn
            FROM e CROSS JOIN init i
          ) WHERE rn = 1
        ),
        dims AS (
          SELECT ci, generate_subscripts(v, 1) AS pos, unnest(v) AS val
          FROM a0
        ),
        m AS (
          SELECT ci, pos, SUM(val) / COUNT(*) AS cv FROM dims GROUP BY ci, pos
        ),
        c1 AS (
          SELECT i.ci, COALESCE(mm.mv, i.v) AS v
          FROM init i LEFT JOIN (
            SELECT ci, list(cv ORDER BY pos) AS mv FROM m GROUP BY ci
          ) mm USING (ci)
        ),
        a1 AS (
          SELECT vec_id, ci FROM (
            SELECT e.vec_id, c.ci,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_dot_product(c.v, c.v)
                              - 2 * list_dot_product(e.v, c.v), c.ci
                   ) AS rn
            FROM e CROSS JOIN c1 c
          ) WHERE rn = 1
        )
        SELECT a.vec_id, a.ci AS cluster_id
        FROM a1 a JOIN e ea ON ea.vec_id = a.vec_id
        WHERE NOT EXISTS (
          SELECT 1 FROM a1 b JOIN e eb ON eb.vec_id = b.vec_id
          WHERE b.ci = a.ci AND b.vec_id < a.vec_id
            AND list_dot_product(ea.v, eb.v)
                / (sqrt(list_dot_product(ea.v, ea.v))
                   * sqrt(list_dot_product(eb.v, eb.v))) >= 0.40
        )
    """,
    # q117: IVF admit — k-means fit on the CORPUS subset (q70's
    # deterministic build), c1 home-cluster assignment for corpus AND
    # batch, then survivors = batch minus (corpus neighbor in the home
    # cluster at cosine >= 0.40) minus (lower-id batch vector sharing
    # the home cluster at >= 0.40). Same float contracts as q70/q51.
    "q117_ivf_admit": """
        WITH e AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        corp AS (SELECT * FROM e WHERE vec_id % 4 != 0),
        init AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS ci, v
          FROM corp ORDER BY vec_id LIMIT 8
        ),
        a0 AS (
          SELECT vec_id, v, ci FROM (
            SELECT c.vec_id, c.v, i.ci,
                   row_number() OVER (
                     PARTITION BY c.vec_id
                     ORDER BY list_dot_product(i.v, i.v)
                              - 2 * list_dot_product(c.v, i.v), i.ci
                   ) AS rn
            FROM corp c CROSS JOIN init i
          ) WHERE rn = 1
        ),
        dims AS (
          SELECT ci, generate_subscripts(v, 1) AS pos, unnest(v) AS val
          FROM a0
        ),
        m AS (
          SELECT ci, pos, SUM(val) / COUNT(*) AS cv FROM dims GROUP BY ci, pos
        ),
        c1 AS (
          SELECT i.ci, COALESCE(mm.mv, i.v) AS v
          FROM init i LEFT JOIN (
            SELECT ci, list(cv ORDER BY pos) AS mv FROM m GROUP BY ci
          ) mm USING (ci)
        ),
        ca AS (
          SELECT vec_id, ci FROM (
            SELECT c.vec_id, k.ci,
                   row_number() OVER (
                     PARTITION BY c.vec_id
                     ORDER BY list_dot_product(k.v, k.v)
                              - 2 * list_dot_product(c.v, k.v), k.ci
                   ) AS rn
            FROM corp c CROSS JOIN c1 k
          ) WHERE rn = 1
        ),
        bb AS (
          SELECT vec_id, ci FROM (
            SELECT b.vec_id, k.ci,
                   row_number() OVER (
                     PARTITION BY b.vec_id
                     ORDER BY list_dot_product(k.v, k.v)
                              - 2 * list_dot_product(b.v, k.v), k.ci
                   ) AS rn
            FROM e b CROSS JOIN c1 k
            WHERE b.vec_id % 4 = 0
          ) WHERE rn = 1
        )
        SELECT b.vec_id
        FROM bb b JOIN e eb ON eb.vec_id = b.vec_id
        WHERE NOT EXISTS (
          SELECT 1 FROM ca n JOIN e en ON en.vec_id = n.vec_id
          WHERE n.ci = b.ci
            AND list_dot_product(eb.v, en.v)
                / (sqrt(list_dot_product(eb.v, eb.v))
                   * sqrt(list_dot_product(en.v, en.v))) >= 0.40
        )
        AND NOT EXISTS (
          SELECT 1 FROM bb a JOIN e ea ON ea.vec_id = a.vec_id
          WHERE a.ci = b.ci AND a.vec_id < b.vec_id
            AND list_dot_product(eb.v, ea.v)
                / (sqrt(list_dot_product(eb.v, eb.v))
                   * sqrt(list_dot_product(ea.v, ea.v))) >= 0.40
        )
    """,
    # q121: all-clusters probe after DELETE — the q42 brute-force
    # device over the UNDELETED ids: tombstone masking must equal
    # never having indexed those vectors (centroids untouched).
    "q121_ivf_delete_search": """
        WITH q AS (
            SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
            FROM embeddings WHERE vec_id = 0
        ), e AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
            FROM embeddings WHERE vec_id % 5 != 0
        )
        SELECT vec_id, ROUND(c, 6) AS cosine FROM (
            SELECT vec_id,
                   list_dot_product(ev, qv) /
                   (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv))) AS c
            FROM e, q
            ORDER BY c DESC, vec_id ASC
            LIMIT 10
        )
    """,
    # q42: probing all clusters makes IVF exactly equal brute force —
    # gates that assignment partitions without loss/duplication.
    "q42_ivf_search": """
        WITH q AS (
            SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
            FROM embeddings WHERE vec_id = 0
        ), e AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
            FROM embeddings
        )
        SELECT vec_id, ROUND(c, 6) AS cosine FROM (
            SELECT vec_id,
                   list_dot_product(ev, qv) /
                   (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv))) AS c
            FROM e, q
            ORDER BY c DESC, vec_id ASC
            LIMIT 10
        )
    """,
    "q51_embedding_pairs_exact": """
        WITH e AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings WHERE vec_id < 300
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_dot_product(a.v, b.v) /
               (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cosine
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v) /
              (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4
    """,
    "q32_ngram_jaccard": f"""
        WITH s AS (
            SELECT doc_id, {_SHINGLES_SQL} AS sh
            FROM documents WHERE doc_id < 150
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_intersect(a.sh, b.sh))::DOUBLE /
               len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
        FROM s a, s b
        WHERE a.doc_id < b.doc_id
          AND len(list_intersect(a.sh, b.sh))::DOUBLE /
              len(list_distinct(list_concat(a.sh, b.sh))) >= 0.3
    """,
    "q39_baseline_workload": """
        SELECT DISTINCT o_custkey, o_orderstatus, o_orderpriority
        FROM orders WHERE o_orderpriority = '2-HIGH'
        ORDER BY o_custkey, o_orderstatus LIMIT 50
    """,
    "q40_update_in_where": """
        SELECT c_custkey,
               CASE WHEN c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
                    THEN 'PRIORITY' ELSE c_mktsegment END AS c_mktsegment
        FROM customer
    """,
    "q41_cube": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
               SUM(CAST(ROUND(l_extendedprice * 10000) AS BIGINT)) / 10000.0 AS revenue
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "q43_json_extract": """
        SELECT event_type,
               -- DuckDB SUM(BIGINT) returns HUGEINT (int128); the outer
               -- cast pins the oracle to the engine's BIGINT so the
               -- driver's value-hash compares like types (r2's only red).
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               COUNT(DISTINCT json_extract_string(props, '$.k')) AS n_distinct_k
        FROM events GROUP BY event_type
    """,
    "q44_contains": """
        SELECT p_partkey, p_name FROM part WHERE contains(p_name, 'old')
    """,
    "q45_median_agg": """
        SELECT l_returnflag,
               MEDIAN(l_quantity) AS l_quantity,
               MIN(l_extendedprice) AS l_extendedprice
        FROM lineitem GROUP BY l_returnflag
    """,
    "q46_stateful_stream": """
        SELECT user_id,
               COUNT(value) AS n_events,
               ROUND(SUM(value), 6) AS total_value,
               MAX(value) AS max_value
        FROM events GROUP BY user_id
    """,
    "q47_union": """
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 450000
        UNION ALL
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_orderpriority = '1-URGENT' AND o_totalprice < 10000
    """,
    "q48_intersect": """
        SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    "q49_except": """
        SELECT o_custkey FROM orders
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    "q50_argmin_argmax": """
        SELECT o_custkey,
               ARG_MIN(o_orderkey, o_totalprice) AS cheapest_order,
               ARG_MAX(o_orderkey, o_totalprice) AS priciest_order,
               MIN(o_totalprice) AS min_price
        FROM orders GROUP BY o_custkey
    """,
    "q36_sessionize": """
        WITH marked AS (
            SELECT user_id, ts,
                   CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                             OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 10 MINUTE
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ), numbered AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS session_no
            FROM marked
        )
        SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
        FROM numbered GROUP BY user_id, session_no
    """,
    "q35_quality_score": """
        WITH feat AS (
            SELECT doc_id,
                   len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
                   length(text) AS n_chars,
                   len(regexp_extract_all(text, '[\\.,;:!\\?"''\\(\\)\\[\\]\\{}]')) AS n_punct,
                   len(regexp_extract_all(text, '[0-9]')) AS n_digits,
                   len(regexp_extract_all(lower(text), '\\b(the|and|of|to|is|in|that|with|for|was)\\b')) AS n_stop
            FROM documents
        ), ratios AS (
            SELECT doc_id, n_tokens,
                   n_punct / GREATEST(n_chars, 1)::DOUBLE AS raw_punct,
                   n_digits / GREATEST(n_chars, 1)::DOUBLE AS raw_digit,
                   n_stop / GREATEST(n_tokens, 1)::DOUBLE AS raw_stop,
                   (n_chars - (n_tokens - 1)) / GREATEST(n_tokens, 1)::DOUBLE AS raw_mtl
            FROM feat
        )
        SELECT doc_id, n_tokens,
               ROUND(raw_punct, 6) AS punct_ratio,
               ROUND(raw_digit, 6) AS digit_ratio,
               ROUND(raw_stop, 6) AS stopword_ratio,
               ROUND(raw_mtl, 6) AS mean_token_len,
               ROUND(
                   0.25 * LEAST(raw_stop * 2, 1.0)
                 + 0.25 * (1 - LEAST(raw_digit * 5, 1.0))
                 + 0.25 * (1 - LEAST(raw_punct * 5, 1.0))
                 + 0.25 * (CASE WHEN raw_mtl >= 3 AND raw_mtl <= 10 THEN 1.0 ELSE 0.0 END),
               6) AS quality_score
        FROM ratios
    """,
}


ORACLES: dict[str, str] = {
    # q91: brute-force canonical a<b<c closure — equals the engine's
    # degree-ordered oriented count iff orientation loses nothing
    "q91_triangle_count": """
        WITH und AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ), tri AS (
            SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM und e1
            JOIN und e2 ON e2.u = e1.v
            JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
        ), nodes AS (
            SELECT a AS id FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        )
        SELECT id, CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM nodes GROUP BY id
        ORDER BY n_triangles DESC, id
        LIMIT 20
    """,
    # q92: identical LAG (same user partition, same ts,id order)
    "q92_event_transitions": """
        WITH seq AS (
            SELECT user_id,
                   LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS from_type,
                   event_type AS to_type
            FROM events
        )
        SELECT from_type, to_type,
               CAST(COUNT(*) AS BIGINT) AS n_transitions,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM seq WHERE from_type IS NOT NULL
        GROUP BY from_type, to_type
    """,
    # q93: open/close via ROW_NUMBER (DuckDB's arg_min/arg_max take no
    # composite key); same (ts, id) order, same epoch-second buckets
    "q93_time_bucket_ohlc": """
        WITH b AS (
            -- epoch_us // 1_000_000: integer floor of the second
            -- (epoch() is a DOUBLE and CAST .. AS BIGINT ROUNDS,
            -- shifting boundary events into the next bucket)
            SELECT event_type,
                   (epoch_us(ts) // 1000000)
                     - ((epoch_us(ts) // 1000000) % 3600) AS bucket_start_s,
                   value, ts, event_id
            FROM events
        ), o AS (
            SELECT *,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type, bucket_start_s
                       ORDER BY ts, event_id
                   ) AS rn_a,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type, bucket_start_s
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn_z
            FROM b
        )
        SELECT event_type, bucket_start_s,
               CAST(COUNT(*) AS BIGINT) AS n,
               MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               MAX(CASE WHEN rn_z = 1 THEN value END) AS close,
               CAST(SUM(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
                   AS sum_value_e4
        FROM o
        GROUP BY event_type, bucket_start_s
    """,
    # q94: per-type ROW_NUMBER replica of the distributed grouped rank
    "q94_percentile_outliers": """
        WITH v AS (
            SELECT event_type AS g, value AS v, event_id AS i
            FROM events WHERE value IS NOT NULL
        ), r AS (
            SELECT g, v,
                   ROW_NUMBER() OVER (PARTITION BY g ORDER BY v, i) AS rk,
                   COUNT(*) OVER (PARTITION BY g) AS n
            FROM v
        ), cut AS (
            SELECT g, v AS p_value, n, rk AS k
            FROM r
            WHERE rk = GREATEST(1, CAST(ceil(0.99 * n) AS BIGINT))
        )
        SELECT r.g AS event_type,
               CAST(cut.n AS BIGINT) AS n,
               CAST(cut.k AS BIGINT) AS k,
               cut.p_value,
               CAST(SUM(CASE WHEN r.v > cut.p_value THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_tail,
               CAST(SUM(CAST(round(LEAST(r.v, cut.p_value) * 10000)
                             AS BIGINT)) AS BIGINT) AS win_sum_e4
        FROM r JOIN cut USING (g)
        GROUP BY r.g, cut.n, cut.k, cut.p_value
    """,
    # q95: brute-force all pairs sharing ANY shingle (no prefix
    # block), same 3-gram construction as q32, same integer threshold
    # test — equals the engine's prefix-filtered join iff the filter
    # is lossless
    "q95_prefix_jaccard_join": """
        WITH sets AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(1, greatest(len(regexp_split_to_array(
                                 lower(trim(text)), '\\s+')) - 1, 1)),
                       i -> array_to_string(list_slice(
                                regexp_split_to_array(lower(trim(text)),
                                                      '\\s+'),
                                i, i + 2), ' '))) AS sh
            FROM documents
        ), tok AS (
            SELECT doc_id, unnest(sh) AS tok FROM sets
        ), sz AS (
            SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id
        ), pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(COUNT(*) AS INTEGER) AS inter
            FROM tok a JOIN tok b
              ON a.tok = b.tok AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT id_a, id_b, inter,
               CAST(sa.n AS INTEGER) AS n_a,
               CAST(sb.n AS INTEGER) AS n_b
        FROM pairs
        JOIN sz sa ON sa.doc_id = id_a
        JOIN sz sb ON sb.doc_id = id_b
        WHERE inter * 100 >= 60 * (sa.n + sb.n - inter)
    """,
    # q96: the q80 quantization replica + integer dot (list_dot_product
    # on INT lists is integer-valued; < 2^21 so the DOUBLE carries it
    # exactly) + the same (dot DESC, cand_id) ranking
    "q96_knn_label_consistency": """
        WITH s AS (
            SELECT vec_id, label, embedding,
                   greatest(list_max(list_transform(embedding,
                                                    x -> abs(x))),
                            1e-30) / 127.0 AS scale
            FROM embeddings
        ), q AS (
            SELECT vec_id, label,
                   list_transform(embedding,
                                  x -> CAST(floor(x / scale + 0.5) AS INTEGER))
                       AS qvec
            FROM s
        ), sc AS (
            SELECT p.vec_id AS probe_id, p.label AS probe_label,
                   c.vec_id AS cand_id, c.label AS cand_label,
                   CAST(list_dot_product(c.qvec, p.qvec) AS BIGINT) AS dot
            FROM q p JOIN q c ON c.vec_id <> p.vec_id
            WHERE p.vec_id % 8 = 0
        ), r AS (
            SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY probe_id ORDER BY dot DESC, cand_id
                   ) AS rn
            FROM sc
        )
        SELECT probe_id AS vec_id, probe_label AS label,
               CAST(SUM(CASE WHEN cand_label = probe_label
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
               CAST(MAX(CASE WHEN rn = 1 THEN cand_id END) AS BIGINT)
                   AS top1_id,
               CAST(MAX(dot) AS BIGINT) AS top1_dot
        FROM r WHERE rn <= 5
        GROUP BY probe_id, probe_label
    """,
    # q97: positional self-join replica of the engine's scan-stage
    # pair zipping; the ln-sum association order matches verbatim
    "q97_token_pmi": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text),
                                                     '[^\\p{L}\\p{N}]+'),
                               x -> x <> '') AS t
            FROM documents
        ), pos AS (
            SELECT doc_id, unnest(t) AS tok,
                   generate_subscripts(t, 1) AS p
            FROM toks
        ), pair AS (
            SELECT LEAST(x.tok, y.tok) AS a, GREATEST(x.tok, y.tok) AS b
            FROM pos x JOIN pos y
              ON x.doc_id = y.doc_id AND y.p - x.p BETWEEN 1 AND 2
        ), pc AS (
            SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_ab
            FROM pair GROUP BY a, b
        ), tc AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM pos GROUP BY tok
        ), tot AS (
            SELECT CAST((SELECT SUM(n_ab) FROM pc) AS BIGINT) AS n_pairs,
                   CAST((SELECT SUM(c) FROM tc) AS BIGINT) AS n_tok
        )
        SELECT pc.a, pc.b, pc.n_ab,
               CAST(ROUND(((((ln(pc.n_ab) - ln(tot.n_pairs))
                             - ln(ca.c)) - ln(cb.c))
                           + 2.0 * ln(tot.n_tok)) * 1e6) AS BIGINT)
                   AS pmi_e6
        FROM pc
        JOIN tc ca ON ca.tok = pc.a
        JOIN tc cb ON cb.tok = pc.b
        CROSS JOIN tot
        WHERE pc.n_ab >= 5
        ORDER BY pmi_e6 DESC, pc.a, pc.b
        LIMIT 100
    """,
    # q98: identical integer epoch-day arithmetic
    "q98_cohort_retention": """
        WITH act AS (
            SELECT DISTINCT user_id AS u,
                   epoch_us(ts) // 86400000000 AS d
            FROM events
        ), first AS (
            SELECT u, MIN(d) AS d0 FROM act GROUP BY u
        )
        SELECT d0 AS cohort_day, d - d0 AS day_offset,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM act JOIN first USING (u)
        GROUP BY d0, d - d0
    """,
    # q99: the q95 brute-force pair set closed by a recursive CTE
    # (the q71 closure device), plus component sizes
    "q99_neardup_clusters": """
        WITH RECURSIVE sets AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(1, greatest(len(regexp_split_to_array(
                                 lower(trim(text)), '\\s+')) - 1, 1)),
                       i -> array_to_string(list_slice(
                                regexp_split_to_array(lower(trim(text)),
                                                      '\\s+'),
                                i, i + 2), ' '))) AS sh
            FROM documents
        ), tok AS (
            SELECT doc_id, unnest(sh) AS tok FROM sets
        ), sz AS (
            SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id
        ), prs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   COUNT(*) AS inter
            FROM tok a JOIN tok b
              ON a.tok = b.tok AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ), pairs AS (
            SELECT id_a, id_b
            FROM prs
            JOIN sz sa ON sa.doc_id = id_a
            JOIN sz sb ON sb.doc_id = id_b
            WHERE inter * 100 >= 60 * (sa.n + sb.n - inter)
        ), edges AS (
            SELECT id_a AS u, id_b AS v FROM pairs
            UNION ALL
            SELECT id_b, id_a FROM pairs
        ), reach AS (
            SELECT u, v AS x FROM edges
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.x
        ), lab AS (
            SELECT d.doc_id,
                   CAST(LEAST(d.doc_id, COALESCE(m.mn, d.doc_id)) AS BIGINT)
                       AS cluster_id
            FROM documents d
            LEFT JOIN (SELECT u, MIN(x) AS mn FROM reach GROUP BY u) m
                ON m.u = d.doc_id
        )
        SELECT doc_id, cluster_id,
               CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT)
                   AS cluster_size
        FROM lab
    """,
    # q100: the same Q3 shape verbatim; cent-unit revenue
    "q100_top_revenue_orders": """
        SELECT l_orderkey,
               CAST(o_orderdate AS VARCHAR) AS o_orderdate,
               o_orderpriority,
               CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount)
                                   * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_c
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-01'
          AND l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY l_orderkey, CAST(o_orderdate AS VARCHAR), o_orderpriority
        ORDER BY revenue_c DESC, l_orderkey
        LIMIT 10
    """,
    # q101: same mutation, same null-safe census (IS DISTINCT FROM)
    "q101_snapshot_diff": """
        WITH base AS (
            SELECT o_orderkey, o_orderstatus, o_orderpriority, o_custkey
            FROM orders
        ), today AS (
            SELECT o_orderkey, o_orderstatus,
                   CASE WHEN o_orderkey % 7 = 0 THEN '0-DIFF'
                        ELSE o_orderpriority END AS o_orderpriority,
                   o_custkey
            FROM base WHERE o_orderkey % 11 <> 0
            UNION ALL
            SELECT o_orderkey + 90000000, o_orderstatus, o_orderpriority,
                   o_custkey
            FROM base WHERE o_orderkey % 13 = 0
        ), j AS (
            SELECT b.o_orderkey AS lk, t.o_orderkey AS rk,
                   b.o_orderstatus IS DISTINCT FROM t.o_orderstatus AS c_st,
                   b.o_orderpriority IS DISTINCT FROM t.o_orderpriority AS c_pr,
                   b.o_custkey IS DISTINCT FROM t.o_custkey AS c_ck,
                   CASE
                     WHEN b.o_orderkey IS NULL THEN 'added'
                     WHEN t.o_orderkey IS NULL THEN 'removed'
                     WHEN (b.o_orderstatus IS DISTINCT FROM t.o_orderstatus)
                       OR (b.o_orderpriority IS DISTINCT FROM t.o_orderpriority)
                       OR (b.o_custkey IS DISTINCT FROM t.o_custkey)
                       THEN 'changed'
                     ELSE 'unchanged'
                   END AS status
            FROM base b FULL OUTER JOIN today t
              ON b.o_orderkey = t.o_orderkey
        ), flat AS (
            SELECT status,
                   lk IS NOT NULL AND rk IS NOT NULL AS in_both,
                   c_st, c_pr, c_ck
            FROM j
        )
        SELECT metric, CAST(n_rows AS BIGINT) AS n_rows FROM (
            SELECT 'added' AS metric,
                   SUM(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS n_rows,
                   1 AS ord FROM flat
            UNION ALL
            SELECT 'removed',
                   SUM(CASE WHEN status = 'removed' THEN 1 ELSE 0 END), 2
            FROM flat
            UNION ALL
            SELECT 'changed',
                   SUM(CASE WHEN status = 'changed' THEN 1 ELSE 0 END), 3
            FROM flat
            UNION ALL
            SELECT 'unchanged',
                   SUM(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END), 4
            FROM flat
            UNION ALL
            SELECT 'col:o_orderstatus',
                   SUM(CASE WHEN in_both AND c_st THEN 1 ELSE 0 END), 5 FROM flat
            UNION ALL
            SELECT 'col:o_orderpriority',
                   SUM(CASE WHEN in_both AND c_pr THEN 1 ELSE 0 END), 6 FROM flat
            UNION ALL
            SELECT 'col:o_custkey',
                   SUM(CASE WHEN in_both AND c_ck THEN 1 ELSE 0 END), 7 FROM flat
        )
    """,
    # q86: one SELECT per profiled column; COUNT(DISTINCT) excludes
    # nulls in both engines, min/max rendered as strings (timestamp
    # wall-time text matches under the engine's UTC sessions).
    # q87: identical blocking (lowercased last name token), identical
    # cap (row_number by id within block <= 50), identical verify
    # (levenshtein <= 2) — DuckDB ships the same edit-distance fn.
    "q87_fuzzy_match": """
        WITH base AS (
            SELECT p_partkey AS id, p_name AS t,
                   (string_split(lower(p_name), ' '))[-1] AS blk
            FROM part
        ), capped AS (
            SELECT *, row_number() OVER (PARTITION BY blk ORDER BY id)
                          AS rn
            FROM base
        )
        SELECT a.id AS id_a, b.id AS id_b,
               CAST(levenshtein(a.t, b.t) AS INTEGER) AS dist
        FROM capped a JOIN capped b ON a.blk = b.blk AND a.id < b.id
        WHERE a.rn <= 50 AND b.rn <= 50
          AND levenshtein(a.t, b.t) <= 2
    """,
    # q90: the same integer PageRank unrolled as chained CTEs
    "q90_pagerank": _pagerank_oracle_sql(3),
    "q102_pagerank_dangling": _pagerank_dangling_oracle_sql(3),
    # q103: the PLAIN group-by — equality proves the salted two-phase
    # rewrite exact; long micro-unit sums are association-order-free
    "q103_salted_aggregate": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(round(l_quantity * 10000) AS BIGINT))
                    AS BIGINT) AS sum_qty_e4,
               COUNT(l_orderkey) AS n_rows,
               MIN(l_extendedprice) AS min_price,
               MAX(l_extendedprice) AS max_price
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    # q89: the interval-join batch path in plain SQL — same key
    # equality + closed time range; gap in whole seconds.
    "q89_interval_join": """
        WITH v AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'view'
        ), p AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'
        )
        SELECT v.event_id AS view_id, p.event_id AS purchase_id,
               v.user_id,
               CAST(date_diff('second', v.ts, p.ts) AS BIGINT) AS gap_s
        FROM v JOIN p
          ON v.user_id = p.user_id
         AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 4 HOUR
    """,
    # q88: the skew-split is exact for inner joins, so the oracle is
    # the PLAIN join — the gate proves the plan surgery is semantics-
    # free. Long-sum dsum pattern for the double column.
    # q104: plain 2-key SQL join — green proves the composite-key
    # skew-split (OR-of-conjunction routing + broadcast hot branch)
    # changes nothing semantically.
    "q104_skewed_join_composite": """
        WITH p AS (
            SELECT user_id, event_type, COUNT(*) AS n_hist
            FROM events GROUP BY user_id, event_type
        )
        SELECT e.event_type,
               COUNT(*) AS n_events,
               CAST(SUM(p.n_hist) AS BIGINT) AS sum_hist
        FROM events e
        JOIN p ON p.user_id = e.user_id AND p.event_type = e.event_type
        GROUP BY e.event_type
        ORDER BY e.event_type
    """,
    "q88_skewed_join": """
        SELECT c.c_mktsegment,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(round(e.value * 10000) AS BIGINT)) AS BIGINT)
                   / 10000.0 AS sum_value
        FROM events e
        JOIN customer c ON c.c_custkey = e.user_id
        GROUP BY c.c_mktsegment
    """,
    "q86_table_profile": " UNION ALL ".join(
        f"""
        SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_null,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value
        FROM orders
        """
        for c in ["o_orderkey", "o_custkey", "o_orderstatus",
                  "o_orderpriority", "o_orderdate"]
    ),
    # q80: identical quantization arithmetic — float->double promotion,
    # floor(x/scale + 0.5) rounding (engine-independent, unlike
    # round-half-even), floor(scale*1e9) pin; sums cast away from
    # HUGEINT per the driver's raw-value hashing.
    "q80_embedding_quantize": """
        WITH s AS (
            SELECT vec_id, embedding,
                   greatest(list_max(list_transform(embedding,
                                                    x -> abs(x))),
                            1e-30) / 127.0 AS scale
            FROM embeddings
        ), q AS (
            SELECT vec_id, scale,
                   list_transform(embedding,
                                  x -> CAST(floor(x / scale + 0.5) AS INTEGER))
                       AS qvec
            FROM s
        )
        SELECT vec_id,
               CAST(floor(scale * 1e9) AS BIGINT) AS scale_e9,
               CAST(list_aggregate(qvec, 'sum') AS BIGINT) AS sum_q,
               CAST(list_aggregate(list_transform(qvec, x -> abs(x)),
                                   'sum') AS BIGINT) AS sum_abs_q,
               CAST(list_aggregate(list_transform(qvec, x -> abs(x)),
                                   'max') AS INTEGER) AS max_abs_q
        FROM q
    """,
    # q81: md5-derived 60-bit hash (q54's portable formulation); the
    # weighted comparison runs in HUGEINT so the boundary is exact.
    "q81_weighted_sample": """
        SELECT doc_id, n_chars FROM documents
        WHERE CAST(('0x' || substr(md5('3:' || CAST(doc_id AS VARCHAR)),
                                   1, 15)) AS BIGINT)::HUGEINT * 1024
              < n_chars::HUGEINT * 1152921504606846976::HUGEINT
    """,
    # q82: strict sequential funnel — each step's completion is the
    # min event time strictly after the previous step's completion.
    "q82_user_funnel": """
        WITH s1 AS (
            SELECT user_id, MIN(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ), s2 AS (
            SELECT e.user_id, MIN(e.ts) AS t
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND e.ts > s1.t
            GROUP BY e.user_id
        ), s3 AS (
            SELECT e.user_id, MIN(e.ts) AS t
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s2.t
            GROUP BY e.user_id
        )
        SELECT 1 AS step_index, 'view' AS step,
               (SELECT COUNT(*) FROM s1) AS n_users
        UNION ALL
        SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
        UNION ALL
        SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
    """,
    # q83: same tokenizer as q56/q63 (regexp split on non-letter/digit
    # runs); per-doc DISTINCT trigrams, min-doc-id attribution.
    "q83_ngram_novelty": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text),
                                                     '[^\\p{L}\\p{N}]+'),
                               t -> t <> '') AS ts
            FROM documents
        ), ng AS (
            SELECT DISTINCT doc_id,
                   ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS gram
            FROM toks, UNNEST(CASE WHEN len(ts) >= 3
                                   THEN generate_series(1, len(ts) - 2)
                                   ELSE [] END) AS g(i)
        ), first AS (
            SELECT gram, MIN(doc_id) AS first_doc FROM ng GROUP BY gram
        ), per_doc AS (
            SELECT ng.doc_id,
                   COUNT(*) AS n_ngrams,
                   CAST(SUM(CASE WHEN first_doc = ng.doc_id
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
            FROM ng JOIN first USING (gram)
            GROUP BY ng.doc_id
        )
        SELECT d.doc_id,
               COALESCE(n_ngrams, 0) AS n_ngrams,
               COALESCE(n_novel, 0) AS n_novel
        FROM documents d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
    """,
    # q84: distinct-token vocabularies per lang; total pair coverage
    # via the sizes cross join, intersection by token equi-join.
    "q84_vocab_overlap": """
        WITH vocab AS (
            SELECT DISTINCT lang AS g, t.tok
            FROM documents,
                 UNNEST(list_filter(regexp_split_to_array(lower(text),
                                                          '[^\\p{L}\\p{N}]+'),
                                    x -> x <> '')) AS t(tok)
        ), sizes AS (
            SELECT g, COUNT(*) AS n FROM vocab GROUP BY g
        ), inter AS (
            SELECT a.g AS ga, b.g AS gb, COUNT(*) AS n_common
            FROM vocab a JOIN vocab b ON a.tok = b.tok AND a.g < b.g
            GROUP BY a.g, b.g
        )
        SELECT sa.g AS lang_a, sb.g AS lang_b,
               sa.n AS n_a, sb.n AS n_b,
               COALESCE(n_common, 0) AS n_common
        FROM sizes sa JOIN sizes sb ON sa.g < sb.g
        LEFT JOIN inter ON inter.ga = sa.g AND inter.gb = sb.g
    """,
    # q85: orphan = child key with no parent row (NOT EXISTS ≡ the
    # engine's left_anti join).
    "q85_fk_orphan_audit": """
        SELECT 'lineitem->orders' AS relation,
               COUNT(*) AS n_orphans
        FROM lineitem WHERE NOT EXISTS (
            SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        UNION ALL
        SELECT 'orders->customer', COUNT(*)
        FROM orders WHERE NOT EXISTS (
            SELECT 1 FROM customer WHERE c_custkey = o_custkey)
        UNION ALL
        SELECT 'customer->nation', COUNT(*)
        FROM customer WHERE NOT EXISTS (
            SELECT 1 FROM nation WHERE n_nationkey = c_nationkey)
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS l_quantity,
               SUM(CAST(ROUND(l_extendedprice * 10000) AS BIGINT)) / 10000.0 AS l_extendedprice,
               SUM(CAST(ROUND(l_discount * 10000) AS BIGINT)) / 10000.0 / COUNT(l_discount) AS l_discount,
               COUNT(l_orderkey) AS l_orderkey
        FROM lineitem WHERE l_quantity <= 49
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q2_filter_comparisons": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.05
        ORDER BY l_orderkey, l_linenumber LIMIT 1000
    """,
    "q3_filter_disjunction_not": """
        SELECT c_custkey, c_mktsegment, c_acctbal
        FROM customer
        WHERE c_mktsegment = 'BUILDING' OR NOT (c_acctbal >= 1000)
    """,
    "q4_filter_in_list": """
        SELECT o_orderkey, o_orderpriority FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
    "q5_filter_like": """
        SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%widget%'
    """,
    "q6_filter_ilike": """
        SELECT p_partkey, p_type FROM part WHERE LOWER(p_type) = 'economy'
    """,
    "q7_filter_bits": """
        SELECT p_partkey, p_size FROM part
        WHERE (p_size & 8) > 0 AND (p_size & 3) = 3
    """,
    "q8_alias_arithmetic": """
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS revenue,
               (l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS charged
        FROM lineitem WHERE l_quantity > 48
    """,
    "q9_alias_math_fn": """
        SELECT p_partkey, SQRT(p_retailprice) AS price_sqrt
        FROM part WHERE p_partkey <= 100
    """,
    "q10_agg_global": """
        SELECT MAX(l_extendedprice) AS l_extendedprice,
               MIN(l_quantity) AS l_quantity,
               COUNT(l_orderkey) AS l_orderkey
        FROM lineitem
    """,
    "q11_count_star": """
        SELECT COUNT(*) AS count FROM orders WHERE o_orderstatus = 'F'
    """,
    "q12_distinct": """
        SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    "q13_topk_offset": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 10 OFFSET 5
    """,
    "q14_groupby_nunique": """
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS l_partkey,
               MAX(l_shipdate) AS l_shipdate
        FROM lineitem GROUP BY l_returnflag
    """,
    "q15_from_subquery": """
        SELECT o_custkey,
               o_totalprice / o_orderkey AS avg_price
        FROM (
            SELECT o_custkey,
                   SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) / 10000.0 AS o_totalprice,
                   COUNT(o_orderkey) AS o_orderkey
            FROM orders GROUP BY o_custkey
        ) WHERE o_totalprice > 1000000
    """,
    "q16_in_subquery": """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        ORDER BY o_orderkey LIMIT 1000
    """,
    "q17_not_in_subquery": """
        SELECT COUNT(*) AS count FROM orders
        WHERE o_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    """,
    "q18_update_statement": """
        SELECT p_partkey, p_size,
               CASE WHEN p_size > 30 THEN p_retailprice * 2 ELSE p_retailprice END AS p_retailprice
        FROM part
    """,
    "q19_isnull": """
        SELECT COUNT(*) AS count FROM events WHERE props IS NOT NULL
    """,
    "q20_join_broadcast": """
        SELECT c_mktsegment,
               COUNT(o_orderkey) AS n_orders,
               SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) / 10000.0 AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "q21_join_multi": """
        SELECT r_name,
               SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) / 10000.0 AS revenue,
               COUNT(o_orderkey) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "q22_window_rank": """
        SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
            FROM orders
        ) WHERE rnk <= 3
    """,
    "q23_window_running_sum": """
        SELECT user_id, event_id,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS running_value
        FROM events WHERE user_id < 50
    """,
    "q24_rollup": """
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty,
               COUNT(*) AS n_rows
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    # q69: same ROLLUP surface but driven through the JSON q-grammar;
    # grammar aggregates keep the source column name.
    "q69_rollup_qgrammar": """
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS l_quantity,
               COUNT(l_orderkey) AS l_orderkey
        FROM lineitem WHERE l_quantity <= 25
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    # q37: Spark's sliding window(1h, 15min) assigns each event to the
    # 4 slide-aligned windows covering it; replicate by expanding each
    # event into bucket-k*slide for k in 0..3 (both engines' 15-min
    # grids sit on the same epoch-aligned boundaries).
    "q37_sliding_windows": """
        SELECT window_start, event_type, COUNT(*) AS n_events
        FROM (
            SELECT time_bucket(INTERVAL '15 minutes', ts)
                       - k * INTERVAL '15 minutes' AS window_start,
                   event_type
            FROM events CROSS JOIN (SELECT unnest(range(0, 4)) AS k)
        )
        GROUP BY 1, 2
    """,
    "q25_time_bucket": """
        SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
               COUNT(*) AS n_events,
               SUM(CAST(ROUND(value * 10000) AS BIGINT)) / 10000.0 AS sum_value
        FROM events GROUP BY 1, 2
    """,
}


def _bm25_oracle_sql(k: int = 5, k1: float = 1.2, b: float = 0.75) -> str:
    """DuckDB replica of text.bm25_top_terms. Float literals are
    injected with repr() and cast ::DOUBLE so DuckDB does IEEE double
    arithmetic in the same order as Spark (bare numeric literals in
    DuckDB are DECIMALs, whose arithmetic would diverge)."""
    tokens = f"regexp_split_to_array(lower(text), '{_text.WORD_SPLIT_REGEX}')"
    k1p1 = repr(k1 + 1.0)
    one_minus_b = "1.0::DOUBLE - " + repr(b)
    return f"""
        WITH toks AS (
            SELECT doc_id, unnest({tokens}) AS term FROM documents
        ), tf AS (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM toks WHERE term <> '' GROUP BY doc_id, term
        ), dl AS (
            SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id
        ), stats AS (
            -- avgdl as an exact-integer quotient (matches the
            -- engine's total_tokens / n_docs formulation bit-for-bit)
            SELECT COUNT(*) AS n_docs,
                   SUM(dl)::DOUBLE / COUNT(*)::DOUBLE AS avgdl
            FROM dl
        ), dfreq AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        ), scored AS (
            SELECT tf.doc_id, tf.term,
                   ln(1.0::DOUBLE + (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
                     * ((tf * {k1p1}::DOUBLE)
                        / (tf + {k1!r}::DOUBLE * ({one_minus_b}::DOUBLE + {b!r}::DOUBLE * dl / avgdl)))
                       AS s
            FROM tf
            JOIN dl USING (doc_id)
            CROSS JOIN stats
            JOIN dfreq USING (term)
        ), ranked AS (
            SELECT doc_id, term, s,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY s DESC, term ASC) AS rank
            FROM scored
        )
        SELECT doc_id, term, rank, ROUND(s, 6) AS bm25
        FROM ranked WHERE rank <= {k}
    """


def _unigram_surprise_oracle_sql() -> str:
    """DuckDB replica of text.unigram_surprise: same tokenizer, same
    fixed-point snap of tf*ln(cnt/N) before the (exact, integer)
    per-doc sum."""
    tokens = f"regexp_split_to_array(lower(text), '{_text.WORD_SPLIT_REGEX}')"
    return f"""
        WITH toks AS (
            SELECT doc_id, unnest({tokens}) AS term FROM documents
        ), tf AS (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM toks WHERE term <> '' GROUP BY doc_id, term
        ), vocab AS (
            SELECT term, SUM(tf) AS cnt FROM tf GROUP BY term
        ), tot AS (
            SELECT SUM(cnt) AS n_total FROM vocab
        ), per AS (
            -- CAST: DuckDB SUM(BIGINT) -> HUGEINT vs Spark LongType;
            -- the driver hashes raw values (q43 artifact, VERDICT r2/r4)
            SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
                   SUM(tf * CAST(ROUND(ln(cnt / n_total) * 1e6) AS BIGINT)) AS s_fp
            FROM tf JOIN vocab USING (term) CROSS JOIN tot
            GROUP BY doc_id
        )
        SELECT doc_id, n_tokens, ROUND(-(s_fp / 1e6) / n_tokens, 6) AS surprise
        FROM per
    """


def _hash_split_oracle_sql() -> str:
    """DuckDB replica of q54: identical md5-derived 60-bit hashes and
    the exact integer thresholds train_test_split compares against
    (taken from sampling.split_thresholds, so the boundary arithmetic
    cannot drift between engine and oracle)."""
    sample_t = int(round(0.5 * _sampling.HASH_SCALE))
    (train_name, train_t), (valid_name, valid_t) = _sampling.split_thresholds(
        {"train": 0.8, "valid": 0.1, "test": 0.1}
    )
    return f"""
        WITH h AS (
            SELECT doc_id,
                   ('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS sample_hash,
                   ('0x' || substr(md5('11:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS split_hash
            FROM documents
        )
        SELECT doc_id, split_hash,
               CASE WHEN split_hash < {train_t} THEN '{train_name}'
                    WHEN split_hash < {valid_t} THEN '{valid_name}'
                    ELSE 'test' END AS split
        FROM h
        WHERE sample_hash < {sample_t}
    """


def _training_pipeline_oracle_sql() -> str:
    """DuckDB replica of q67: the q26 (dedup) / q60 (decontamination) /
    q35 (quality) / q29 (language, generated) / q54 (split) oracle
    formulations composed into one CTE funnel. Each piece is already
    individually gated; composing them gates the interactions (which
    rows survive to which stage)."""
    (train_name, train_t), (valid_name, valid_t) = _sampling.split_thresholds(
        {"train": 0.8, "valid": 0.1, "test": 0.1}
    )
    lang_sql = _lang_id_oracle_sql("clean")
    return f"""
        WITH corpus AS (
            SELECT * FROM documents WHERE doc_id % 97 <> 0
        ), reps AS (
            SELECT MIN(doc_id) AS doc_id FROM corpus
            GROUP BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')
        ), kept AS (
            SELECT c.* FROM corpus c JOIN reps USING (doc_id)
        ), tok AS (
            SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
            FROM documents
        ), sh AS (
            SELECT doc_id,
                   CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                        ELSE list_transform(range(1, len(toks) - 1),
                                            i -> array_to_string(toks[i:i+2], ' '))
                   END AS shs
            FROM tok
        ), ev_sh AS (
            SELECT DISTINCT s
            FROM (SELECT unnest(shs) AS s FROM sh WHERE doc_id % 97 = 0)
        ), contaminated AS (
            SELECT DISTINCT k.doc_id
            FROM (SELECT doc_id, unnest(shs) AS s FROM sh
                  WHERE doc_id IN (SELECT doc_id FROM kept)) k
            JOIN ev_sh USING (s)
        ), clean AS (
            SELECT * FROM kept
            WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
        ), feat AS (
            SELECT doc_id,
                   len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
                   length(text) AS n_chars,
                   len(regexp_extract_all(text, '[\\.,;:!\\?"''\\(\\)\\[\\]\\{{}}]')) AS n_punct,
                   len(regexp_extract_all(text, '[0-9]')) AS n_digits,
                   len(regexp_extract_all(lower(text), '\\b(the|and|of|to|is|in|that|with|for|was)\\b')) AS n_stop
            FROM clean
        ), ratios AS (
            SELECT doc_id,
                   n_punct / GREATEST(n_chars, 1)::DOUBLE AS rp,
                   n_digits / GREATEST(n_chars, 1)::DOUBLE AS rd,
                   n_stop / GREATEST(n_tokens, 1)::DOUBLE AS rs,
                   (n_chars - (n_tokens - 1)) / GREATEST(n_tokens, 1)::DOUBLE AS rm
            FROM feat
        ), quality AS (
            SELECT doc_id,
                   ROUND(0.25 * LEAST(rs * 2, 1.0)
                       + 0.25 * (1 - LEAST(rd * 5, 1.0))
                       + 0.25 * (1 - LEAST(rp * 5, 1.0))
                       + 0.25 * (CASE WHEN rm >= 3 AND rm <= 10 THEN 1.0 ELSE 0.0 END),
                   6) AS quality_score
            FROM ratios
        ), lang AS (
            {lang_sql}
        )
        SELECT q.doc_id, q.quality_score,
               CASE WHEN ('0x' || substr(md5('11:' || CAST(q.doc_id AS VARCHAR)), 1, 15))::BIGINT < {train_t} THEN '{train_name}'
                    WHEN ('0x' || substr(md5('11:' || CAST(q.doc_id AS VARCHAR)), 1, 15))::BIGINT < {valid_t} THEN '{valid_name}'
                    ELSE 'test' END AS split
        FROM quality q JOIN lang l ON l.doc_id = q.doc_id
        WHERE q.quality_score >= 0.76 AND l.lang_pred = 'en'
    """


def _embedding_dup_oracle_sql(
    threshold: float = 0.4,
    n_planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    seed: int = 42,
    max_bucket_size: int = 1000,
) -> str:
    """DuckDB replica of q34's FULL LSH pipeline: the same literal
    hyperplanes (repr'd doubles), sign bits via list_dot_product
    (bit-equal to the engine's sequential fold — the q51 contract),
    identical band packing/cap/distinct-pairs, identical verify
    cosine. Mirrors the algorithm, so the gate is exact regardless of
    LSH recall."""
    planes = _similarity._hyperplanes(dim, n_planes, seed)
    width = n_planes // bands
    bit_exprs = ",\n                   ".join(
        "(CASE WHEN list_dot_product(v, ["
        + ", ".join(f"{x!r}::DOUBLE" for x in plane)
        + f"]) >= 0 THEN 1 ELSE 0 END) AS b{i}"
        for i, plane in enumerate(planes)
    )
    band_selects = "\n            UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, "
        + " + ".join(f"{1 << k} * b{b * width + k}" for k in range(width))
        + " AS val FROM sig"
        for b in range(bands)
    )
    return f"""
        WITH e AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
        ), sig AS (
            SELECT vec_id, v,
                   {bit_exprs}
            FROM e
        ), buckets AS (
            {band_selects}
        ), capped AS (
            SELECT vec_id, band, val FROM (
                SELECT vec_id, band, val,
                       COUNT(*) OVER (PARTITION BY band, val) AS n
                FROM buckets
            ) WHERE n <= {max_bucket_size}
        ), pairs AS (
            SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
            FROM capped a JOIN capped b
              ON a.band = b.band AND a.val = b.val AND a.vec_id < b.vec_id
        )
        SELECT id_a, id_b, ROUND(c, 6) AS cosine FROM (
            SELECT id_a, id_b,
                   list_dot_product(ea.v, eb.v) /
                   (sqrt(list_dot_product(ea.v, ea.v)) *
                    sqrt(list_dot_product(eb.v, eb.v))) AS c
            FROM pairs
            JOIN e ea ON ea.vec_id = pairs.id_a
            JOIN e eb ON eb.vec_id = pairs.id_b
        ) WHERE c >= {threshold!r}::DOUBLE
    """


def oracle_sql() -> dict[str, str]:
    out = dict(ORACLES)
    out.update(OPERATOR_ORACLES)
    out["q29_lang_id"] = _lang_id_oracle_sql()
    out["q34_embedding_dup_pairs"] = _embedding_dup_oracle_sql()
    out["q53_pii_scrub"] = _pii_oracle_sql()
    out["q54_hash_split"] = _hash_split_oracle_sql()
    out["q106_token_budget_mix"] = _token_budget_mix_oracle_sql()
    out["q108_token_mix_upsampled"] = _token_mix_upsampled_oracle_sql()
    out["q111_distribution_match"] = _distribution_match_oracle_sql()
    out["q130_distribution_drift"] = _distribution_drift_oracle_sql()
    out["q133_streaming_drift"] = _streaming_drift_oracle_sql()
    out["q135_dup_source_matrix"] = _dup_source_matrix_oracle_sql()
    out["q131_dsir_selection"] = _dsir_oracle_sql()
    out["q132_quality_constraints"] = _quality_constraints_oracle_sql()
    out["q112_balanced_shards"] = _balanced_shards_oracle_sql()
    out["q113_cluster_safe_split"] = _cluster_safe_split_oracle_sql()
    # q115: identical oracle to q105/q107 — probing off a COMPACTED
    # index must return exactly what the from-text probe returns.
    out["q115_minhash_compacted_probe"] = out["q107_minhash_index_probe"]
    # q122: ditto for an index MERGED from independently-built shards.
    out["q122_minhash_merge_probe"] = out["q107_minhash_index_probe"]
    # q119: identical oracle to q110 — the pruned probe off a
    # COMPACTED index must return exactly what build+append returns.
    out["q119_ivf_compacted_search"] = out["q110_ivf_append_search"]
    # q125: identical oracle to q70 — refit(build(evens)+append(odds))
    # must equal a FRESH deterministic build on ALL vectors (same
    # stride-seeded init + Lloyd arithmetic over the same rows).
    out["q125_ivf_refit_search"] = out["q70_ivf_pruned_search"]
    # q127: the same fresh-build replay — the whole maintenance-CLI
    # chain (fsck/compact/refit/vacuum through index_tool.run) must be
    # result-invisible relative to the refit semantics q125 pins.
    out["q127_index_tool_lifecycle"] = out["q70_ivf_pruned_search"]
    # q126: the q26/q114/q35 formulations composed into one funnel
    # (the q114 chain's corpus CTE scoped to the kept documents).
    out["q126_crossmodal_curation"] = _crossmodal_oracle_sql(
        out["q114_semantic_dedup"]
    )
    # q128: the z-order rewrite must be result-invisible — the oracle
    # runs the same box aggregate directly on the source table.
    out["q128_zorder_layout_scan"] = """
        SELECT event_type,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               CAST(SUM(CAST(ROUND(CAST(value AS DOUBLE) * 1e6) AS BIGINT))
                    AS BIGINT) AS sum_value_micro
        FROM events
        WHERE user_id BETWEEN 4 AND 9
          AND value BETWEEN 50.0 AND 250.0
        GROUP BY event_type
    """
    # q136: the full incremental-maintenance chain (create + 2
    # appends + compact + vacuum) must be result-invisible too — the
    # same box aggregate on the source table.
    out["q136_zorder_incremental"] = out["q128_zorder_layout_scan"]
    # q137: so must the STREAMED ingest chain (streaming_admit into
    # the ZTable + compact + vacuum).
    out["q137_ztable_streaming_admit"] = out["q128_zorder_layout_scan"]
    # q129: full PQ pipeline replay, generated from the entry's own
    # (m, n_codes) parameterization.
    out["q129_pq_adc_search"] = _pq_oracle_sql(m=4, n_codes=16, dim=64)
    # q134: the q70 coarse chain + the q129 PQ chain composed, ADC
    # restricted to probed-cluster members — generated from the same
    # parameterization as the entry (8 coarse / 3 probes / m=4 / 16
    # codes / 40 shortlist / top-10).
    out["q134_ivfpq_search"] = _ivfpq_oracle_sql(
        m=4, n_codes=16, dim=64, n_centroids=8, n_probe=3, n_short=40, k=10
    )
    out["q56_bm25_top_terms"] = _bm25_oracle_sql()
    out["q59_unigram_surprise"] = _unigram_surprise_oracle_sql()
    out["q67_training_pipeline"] = _training_pipeline_oracle_sql()
    return out
