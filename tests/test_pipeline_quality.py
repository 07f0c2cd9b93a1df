"""Tests for the round-11 pipeline operators: drift (PSI), quality
constraints (Deequ-style), and DSIR importance selection."""
from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from qcache_spark.operators import drift, quality, selection


# ---------------------------------------------------------------- drift

@pytest.fixture(scope="module")
def snap_pair(spark):
    base = spark.createDataFrame(
        [("en", 50), ("en", 150), ("de", 250), (None, 450)],
        ["lang", "n_chars"],
    )
    curr = spark.createDataFrame(
        [("en", 50), ("fr", 150), ("fr", 250), ("de", None)],
        ["lang", "n_chars"],
    )
    return base, curr


def test_psi_validation(spark, snap_pair):
    base, curr = snap_pair
    with pytest.raises(ValueError, match="nothing to track"):
        drift.population_stability(base, curr)
    with pytest.raises(ValueError, match="sorted distinct"):
        drift.population_stability(base, curr, numeric_bins={"n_chars": [3, 1]})
    with pytest.raises(ValueError, match="sorted distinct"):
        drift.population_stability(base, curr, numeric_bins={"n_chars": [1, 1]})
    with pytest.raises(ValueError, match="integer edges"):
        drift.population_stability(base, curr, numeric_bins={"n_chars": [1.5]})
    with pytest.raises(ValueError, match="both categorical and numeric"):
        drift.population_stability(
            base, curr, ["n_chars"], {"n_chars": [100]}
        )


def test_psi_counts_and_formula(spark, snap_pair):
    base, curr = snap_pair
    out = drift.population_stability(
        base, curr, ["lang"], {"n_chars": [100, 200]}
    ).collect()
    rows = {(r["column"], r["bucket"]): r for r in out}
    # lang buckets: en, de, fr, <null> — observed union of both sides
    assert rows[("lang", "en")]["base_n"] == 2
    assert rows[("lang", "en")]["curr_n"] == 1
    assert rows[("lang", "fr")]["base_n"] == 0  # curr-only bucket
    assert rows[("lang", "fr")]["curr_n"] == 2
    assert rows[("lang", drift.NULL_BUCKET)]["base_n"] == 1
    # numeric buckets: (-inf,100), [100,200), [200,inf), <null>
    assert rows[("n_chars", "(-inf,100)")]["base_n"] == 1
    assert rows[("n_chars", "[100,200)")]["curr_n"] == 1
    assert rows[("n_chars", "[200,inf)")]["base_n"] == 2
    assert rows[("n_chars", drift.NULL_BUCKET)]["curr_n"] == 1
    # formula replay for one bucket: lang/fr, k=4 lang buckets
    p = (0 + 0.5) / (4 + 0.5 * 4)
    q = (2 + 0.5) / (4 + 0.5 * 4)
    expect = round((q - p) * math.log(q / p) * 1e6)
    assert rows[("lang", "fr")]["psi_e6"] == expect
    # PSI contributions are non-negative by construction
    assert all(r["psi_e6"] >= 0 for r in out)


def test_psi_identical_snapshots_near_zero(spark, snap_pair):
    base, _ = snap_pair
    out = drift.population_stability(base, base, ["lang"]).collect()
    assert all(r["psi_e6"] == 0 for r in out)


def test_psi_summary(spark, snap_pair):
    base, curr = snap_pair
    per_bucket = drift.population_stability(base, curr, ["lang"])
    summary = drift.psi_summary(per_bucket).collect()
    assert len(summary) == 1
    total = sum(r["psi_e6"] for r in per_bucket.collect())
    assert summary[0]["psi_e6"] == total
    assert summary[0]["n_buckets"] == 4


def test_psi_single_scan_per_snapshot(spark, sf_dir, tmp_path):
    """Each snapshot is scanned exactly ONCE: per-column totals are
    window aggregates over the counter frame — a groupBy + join-back
    formulation would recompute the counts subtree (and re-scan both
    snapshots) once per consumer. Scans a private parquet copy so
    another module's cached documents frame cannot hijack the plan
    (cache-manager substitution would zero the FileScan count)."""
    from qcache_spark.session import load_table

    load_table(spark, sf_dir, "documents").limit(80).write.parquet(
        str(tmp_path / "psi_docs")
    )
    docs = spark.read.parquet(str(tmp_path / "psi_docs"))
    base = docs.filter(F.col("doc_id") % 2 == 0)
    curr = docs.filter(F.col("doc_id") % 2 == 1)
    plan = drift.population_stability(
        base, curr, ["lang"], {"n_chars": [100, 200]}
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 2


# ------------------------------------------------------------- quality

@pytest.fixture(scope="module")
def qframe(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta", "en"),
            (2, "gamma!", "de"),
            (3, None, "xx"),
            (3, "delta epsilon", None),
        ],
        ["id", "text", "lang"],
    )


def test_constraints_metrics_exact(spark, qframe):
    out = quality.check_constraints(
        qframe,
        [
            {"name": "id_complete", "kind": "completeness", "col": "id",
             "min_rate": 1.0},
            {"name": "text_complete", "kind": "completeness", "col": "text",
             "min_rate": 0.9},
            {"name": "id_unique", "kind": "uniqueness", "col": "id",
             "min_rate": 1.0},
            {"name": "id_min", "kind": "min", "col": "id", "bound": 1},
            {"name": "id_max", "kind": "max", "col": "id", "bound": 2},
            {"name": "lang_set", "kind": "in_set", "col": "lang",
             "values": ["en", "de"], "min_rate": 0.5},
            {"name": "has_word", "kind": "matches", "col": "text",
             "pattern": r"\p{L}{4}", "min_rate": 0.7},
            {"name": "rows_ge", "kind": "row_count", "op": ">=", "bound": 4},
            {"name": "rows_le", "kind": "row_count", "op": "<=", "bound": 3},
        ],
    )
    rows = {r["check_name"]: r for r in out.collect()}
    assert rows["id_complete"]["metric_e6"] == 1_000_000
    assert rows["id_complete"]["passed"] == 1
    # 3/4 texts non-null -> floor(3e6/4) = 750000 < 900000
    assert rows["text_complete"]["metric_e6"] == 750_000
    assert rows["text_complete"]["passed"] == 0
    # 3 distinct of 4 non-null ids
    assert rows["id_unique"]["metric_e6"] == 750_000
    assert rows["id_unique"]["passed"] == 0
    assert rows["id_min"]["metric_e6"] == 1_000_000
    assert rows["id_min"]["passed"] == 1
    # max id = 3 > bound 2
    assert rows["id_max"]["metric_e6"] == 3_000_000
    assert rows["id_max"]["passed"] == 0
    # en, de members; xx and null non-members -> 2/4
    assert rows["lang_set"]["metric_e6"] == 500_000
    assert rows["lang_set"]["passed"] == 1
    # alpha/gamma/delta all carry a 4-letter run; the null text no
    assert rows["has_word"]["metric_e6"] == 750_000
    assert rows["has_word"]["passed"] == 1
    assert rows["rows_ge"]["metric_e6"] == 4_000_000
    assert rows["rows_ge"]["passed"] == 1
    assert rows["rows_le"]["passed"] == 0
    assert rows["rows_le"]["op"] == "<="


def test_constraints_empty_input_vacuous(spark, qframe):
    empty = qframe.filter(F.lit(False))
    rows = quality.check_constraints(
        empty,
        [
            {"name": "c", "kind": "completeness", "col": "id", "min_rate": 1.0},
            {"name": "n", "kind": "row_count", "op": ">=", "bound": 1},
        ],
    ).collect()
    by = {r["check_name"]: r for r in rows}
    assert by["c"]["metric_e6"] is None and by["c"]["passed"] == 1
    assert by["n"]["metric_e6"] == 0 and by["n"]["passed"] == 0


def test_constraints_null_extremum_fails(spark):
    """VERDICT r11 Wrong #1: an all-null (or empty) numeric column
    must FAIL a min/max bounds gate, not pass vacuously — that is
    the exact silent-degradation case the gate exists to catch.
    Rates keep their vacuous-pass rule (previous test)."""
    allnull = spark.createDataFrame(
        [(1, None), (2, None)], "id long, v long"
    )
    rows = quality.check_constraints(
        allnull,
        [
            {"name": "v_min", "kind": "min", "col": "v", "bound": 0},
            {"name": "v_max", "kind": "max", "col": "v", "bound": 100},
        ],
    ).collect()
    by = {r["check_name"]: r for r in rows}
    assert by["v_min"]["metric_e6"] is None and by["v_min"]["passed"] == 0
    assert by["v_max"]["metric_e6"] is None and by["v_max"]["passed"] == 0
    empty = allnull.filter(F.lit(False))
    rows = quality.check_constraints(
        empty, [{"name": "v_min", "kind": "min", "col": "v", "bound": 0}]
    ).collect()
    assert rows[0]["metric_e6"] is None and rows[0]["passed"] == 0


def test_constraints_invalid_regex_is_400(spark, qframe):
    """ADVICE r11: a malformed regex must fail at spec time as a
    ValueError (the HTTP layer's 400 contract), not at execution
    time as a Spark exception (a 500)."""
    with pytest.raises(ValueError, match="invalid regex"):
        quality.check_constraints(
            qframe,
            [{"name": "x", "kind": "matches", "col": "text",
              "pattern": "(unclosed", "min_rate": 0.5}],
        )


def test_constraints_single_scan(spark, qframe):
    plan = quality.check_constraints(
        qframe, [
            {"name": "a", "kind": "completeness", "col": "id", "min_rate": 1.0},
            {"name": "b", "kind": "matches", "col": "text", "pattern": "a",
             "min_rate": 0.1},
            {"name": "c", "kind": "row_count", "op": ">=", "bound": 1},
        ],
    )._jdf.queryExecution().executedPlan().toString()
    # the whole suite is one scan + one 1-row aggregation: the plan
    # must not contain a Union (which would replay the scan)
    assert "Union" not in plan


def test_constraints_validation(spark, qframe):
    with pytest.raises(ValueError, match="no constraints"):
        quality.check_constraints(qframe, [])
    with pytest.raises(ValueError, match="unknown kind"):
        quality.check_constraints(qframe, [{"name": "x", "kind": "nope"}])
    with pytest.raises(ValueError, match="duplicate name"):
        quality.check_constraints(
            qframe,
            [{"name": "x", "kind": "row_count", "op": ">=", "bound": 1},
             {"name": "x", "kind": "row_count", "op": "<=", "bound": 9}],
        )
    with pytest.raises(ValueError, match="missing col"):
        quality.check_constraints(
            qframe, [{"name": "x", "kind": "completeness", "min_rate": 1.0}]
        )
    with pytest.raises(ValueError, match="op must be"):
        quality.check_constraints(
            qframe, [{"name": "x", "kind": "row_count", "op": "==", "bound": 1}]
        )
    with pytest.raises(ValueError, match="min_rate not in"):
        quality.check_constraints(
            qframe,
            [{"name": "x", "kind": "completeness", "col": "id",
              "min_rate": 1.5}],
        )


# ------------------------------------------------------------ selection

@pytest.fixture(scope="module")
def corpora(spark):
    raw = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "stock market prices fall sharply"),
            (3, "the lazy dog sleeps"),
            (4, "market prices rise on stock news"),
            (5, "singleword"),
            (6, None),
        ],
        ["doc_id", "text"],
    )
    target = spark.createDataFrame(
        [(101, "stock market prices"), (102, "market news prices stock")],
        ["doc_id", "text"],
    )
    return raw, target


def test_dsir_feature_counts(spark, corpora):
    raw, target = corpora
    w = selection.importance_weights(raw, target, n_buckets=64)
    rows = {r["doc_id"]: r for r in w.collect()}
    # n tokens -> n unigrams + (n-1) bigrams = 2n - 1 occurrences
    assert rows[1]["n_features"] == 9
    assert rows[5]["n_features"] == 1  # no bigram from one token
    assert 6 not in rows  # null text contributes nothing
    assert len(rows) == 5


def test_dsir_ranks_target_like_docs_first(spark, corpora):
    raw, target = corpora
    top = selection.importance_select(raw, target, k=5, n_buckets=64).collect()
    # the most target-like doc wins outright; among the comparable-
    # length docs, each market/stock doc outranks each fox/dog doc
    # (the classic DSIR weight is length-biased — doc 5's single
    # feature keeps its |score| small, so no cross-length assert)
    assert top[0]["doc_id"] == 2
    assert [r["sel_rank"] for r in top] == [1, 2, 3, 4, 5]
    ranks = {r["doc_id"]: r["sel_rank"] for r in top}
    assert ranks[2] < ranks[1] and ranks[2] < ranks[3]
    assert ranks[4] < ranks[1] and ranks[4] < ranks[3]


def test_dsir_deterministic(spark, corpora):
    raw, target = corpora
    a = selection.importance_select(raw, target, k=3, n_buckets=64).collect()
    b = selection.importance_select(raw, target, k=3, n_buckets=64).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_dsir_ratio_table_broadcast(spark, corpora):
    raw, target = corpora
    plan = (
        selection.importance_weights(raw, target, n_buckets=64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the bucket log-ratio table joins the exploded features via
    # broadcast — the only doc-data shuffle is the per-doc sum
    assert "BroadcastHashJoin" in plan


def test_dsir_validation(spark, corpora):
    raw, target = corpora
    with pytest.raises(ValueError, match="k must be positive"):
        selection.importance_select(raw, target, k=0)


def test_dsir_xxhash_fast_path(spark, corpora):
    """The xxhash64 production path: same feature counts (hashing
    can't change how many features a doc has), valid scores, and an
    unknown hash_fn refuses loudly."""
    raw, target = corpora
    md5 = {r["doc_id"]: r["n_features"]
           for r in selection.importance_weights(raw, target, n_buckets=64).collect()}
    fast = {r["doc_id"]: r["n_features"]
            for r in selection.importance_weights(
                raw, target, n_buckets=64, hash_fn="xxhash64").collect()}
    assert md5 == fast
    with pytest.raises(ValueError, match="unknown hash_fn"):
        selection.importance_weights(raw, target, hash_fn="fnv").collect()


def test_constraints_scan_prunes_columns(spark, sf_dir, tmp_path):
    """The suite's single scan reads ONLY the constrained columns —
    at 100 TB the quality gate must not pay for unreferenced
    columns (documents has text/lang/source/n_chars; the suite
    references three). Scans a private parquet copy: another test
    module's .cache() of the shared documents frame would otherwise
    hijack this plan (the cache manager matches by logical plan) and
    replace the FileScan being pinned."""
    from qcache_spark.session import load_table

    load_table(spark, sf_dir, "documents").limit(50).write.parquet(
        str(tmp_path / "docs_pq")
    )
    docs = spark.read.parquet(str(tmp_path / "docs_pq"))
    plan = quality.check_constraints(
        docs,
        [
            {"name": "id_c", "kind": "completeness", "col": "doc_id",
             "min_rate": 1.0},
            {"name": "lang_s", "kind": "in_set", "col": "lang",
             "values": ["en"], "min_rate": 0.1},
            {"name": "len_min", "kind": "min", "col": "n_chars", "bound": 1},
        ],
    )._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m, plan
    schema = m.group(1)
    assert "doc_id" in schema and "lang" in schema and "n_chars" in schema
    assert "text" not in schema and "source" not in schema


def test_dsir_two_raw_scans(spark, sf_dir, tmp_path):
    """The raw corpus's tokenize+explode runs exactly twice (bucket
    counts + per-doc scoring) and the target once: the counter frames
    are lineage-cut, so the totals/ratio branches cannot re-trigger
    the heavy scans. Private parquet copy for the same cache-hijack
    reason as the pruning pin."""
    from qcache_spark.session import load_table

    load_table(spark, sf_dir, "documents").limit(80).write.parquet(
        str(tmp_path / "dsir_docs")
    )
    docs = spark.read.parquet(str(tmp_path / "dsir_docs"))
    target = docs.filter(
        (F.col("lang") == "en") & F.col("source").isin(["src0", "src1"])
    )
    plan = (
        selection.importance_weights(docs, target, n_buckets=256)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FileScan parquet") == 1  # scoring scan only
    assert plan.count("Scan ExistingRDD") >= 1  # checkpointed counters


# ------------------------------------------- review-findings regressions

def test_minmax_fractional_violation_fails(spark):
    """A fractional extremum must keep its decimals in the fixed
    point: min=-9.7 vs bound=-9 is a violation (cast-then-scale would
    truncate -9.7 to -9 and pass)."""
    df = spark.createDataFrame([(-9.7,), (2.0,)], ["v"])
    rows = quality.check_constraints(
        df, [{"name": "m", "kind": "min", "col": "v", "bound": -9}]
    ).collect()
    assert rows[0]["metric_e6"] == -9_700_000
    assert rows[0]["passed"] == 0


def test_minmax_rejects_non_numeric(spark, qframe):
    with pytest.raises(ValueError, match="require a numeric column"):
        quality.check_constraints(
            qframe, [{"name": "m", "kind": "min", "col": "text", "bound": 0}]
        )


def test_constraint_param_types_raise_valueerror(spark, qframe):
    """Malformed parameter TYPES must raise ValueError (the HTTP
    layer's 400 contract), never TypeError."""
    bad = [
        {"name": "a", "kind": "min", "col": "id", "bound": None},
        {"name": "b", "kind": "completeness", "col": "id", "min_rate": "x"},
        {"name": "c", "kind": "in_set", "col": "id", "values": 42,
         "min_rate": 0.5},
        {"name": "d", "kind": "matches", "col": "text", "pattern": 7,
         "min_rate": 0.5},
    ]
    for spec in bad:
        with pytest.raises(ValueError):
            quality.check_constraints(qframe, [spec])


def test_drift_bins_type_errors_are_valueerror(spark, snap_pair):
    base, curr = snap_pair
    with pytest.raises(ValueError, match="list of integer edges"):
        drift.population_stability(base, curr, numeric_bins={"n_chars": 5})
    with pytest.raises(ValueError, match="integer edges"):
        drift.population_stability(
            base, curr, numeric_bins={"n_chars": [1, "2"]}
        )


def test_dsir_empty_target_refuses(spark, corpora):
    raw, target = corpora
    with pytest.raises(ValueError, match="target corpus has no non-null"):
        selection.importance_weights(raw, target.filter(F.lit(False)))
    with pytest.raises(ValueError, match="raw corpus has no non-null"):
        selection.importance_weights(raw.filter(F.lit(False)), target)


def test_dsir_reserved_column_names_refuse(spark, corpora):
    raw, target = corpora
    with pytest.raises(ValueError, match="collide with internal names"):
        selection.importance_weights(
            raw.withColumnRenamed("doc_id", "bucket"), target,
            id_col="bucket",
        )


def test_dsir_extra_columns_no_collision(spark, corpora):
    """A raw corpus with unrelated extra columns must not break the
    explode (bucket_log_ratios narrows to the text column)."""
    raw, target = corpora
    wide = raw.withColumn("extra", F.lit(1)).withColumn("more", F.lit("x"))
    out = selection.importance_weights(wide, target, n_buckets=64).collect()
    assert len(out) == 5
