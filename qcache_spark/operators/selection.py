"""Data selection via hashed n-gram importance weights (DSIR-style).

The public model is Xie et al., "Data Selection for Language Models
via Importance Resampling" (NeurIPS 2023): score every raw document
by how much more likely its hashed n-gram features are under a small
TARGET corpus (the distribution you want more of) than under the RAW
corpus itself, then keep the top-weighted documents. This is the
third selection primitive next to `sampling.distribution_matched_
sample` (categorical mixture reshaping, q111) and `text.quality
score` heuristics: it reshapes toward a *corpus by example* rather
than a label distribution or a hand rule.

Model: features are lower-cased word unigrams + bigrams hashed into
`n_buckets` buckets; both distributions are bucket-level unigram bags
with Laplace add-1 smoothing. A document's log-importance is the sum
over its feature OCCURRENCES of log(p_target(b) / p_raw(b)) — the
classic length-biased DSIR weight (no length normalization, as in
the paper's resampling formulation).

Spark-first shape: tokenize + explode once per corpus, partial-agg
to bucket counts (the shuffles carry at most `n_buckets` rows);
scalar totals ride a broadcast 1-row cross join, never a collect;
the per-bucket log-ratio table (<= n_buckets rows) is BROADCAST onto
the exploded raw features, so scoring is map-side + ONE shuffle
keyed on the doc id for the per-document sum; top-k is
TakeOrderedAndProject. At 100 TB: two column-pruned scans (target is
usually tiny), one doc-keyed exchange, no UDFs.

Determinism: each bucket's log-ratio is snapped to fixed-point 1e-6
with a fixed parenthesization — per-document scores are exact long
sums of those units (order-independent; bit-equal in the DuckDB
oracle, which replays the same md5 bucket hash and ln shape).

Reference: no selection surface exists in /root/reference;
north-star pipeline surface.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import word_tokens

E6 = 1_000_000


def _bucket_expr(feature: Column, n_buckets: int, hash_fn: str) -> Column:
    """Feature -> bucket id. hash_fn "md5" (default): first 60 bits
    of md5, bit-reproducible in DuckDB/Postgres — what makes the
    cross-engine gate possible. hash_fn "xxhash64": one JVM hash,
    several times cheaper per feature occurrence — the production
    fast path at the 100 TB tier (same design as sampling.hash60);
    weights from the two hashes differ only by bucket aliasing."""
    if hash_fn == "md5":
        h = F.conv(F.substring(F.md5(feature), 1, 15), 16, 10).cast("long")
    elif hash_fn == "xxhash64":
        h = F.xxhash64(feature)
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")
    return F.pmod(h, F.lit(n_buckets))


#: column names _feature_buckets adds internally — a corpus column
#: with one of these names would make the select ambiguous.
_RESERVED = ("__toks", "feature", "bucket")


def _check_reserved(*cols: str) -> None:
    clash = [c for c in cols if c in _RESERVED]
    if clash:
        raise ValueError(
            f"column name(s) {clash} collide with internal names "
            f"{_RESERVED}; rename the column(s)"
        )


def _feature_buckets(
    df: DataFrame, text_col: str, n_buckets: int, hash_fn: str = "md5"
) -> DataFrame:
    """Explode a corpus to one row per hashed feature occurrence:
    (id columns dropped) -> (bucket). Features are non-empty
    lower-cased word unigrams plus adjacent-pair bigrams ('a b');
    bucket = `_bucket_expr` of the feature string."""
    toks = F.filter(word_tokens(F.col(text_col)), lambda t: t != F.lit(""))
    # sequence(2, n) with n < 2 would generate a DESCENDING sequence
    # in Spark — guard short token lists to an empty bigram array.
    bigrams = F.when(
        F.size("__toks") >= 2,
        F.expr(
            "transform(sequence(2, size(__toks)), i -> "
            "concat(__toks[i - 2], ' ', __toks[i - 1]))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(F.col("__toks"), bigrams)
    bucket = _bucket_expr(F.col("feature"), n_buckets, hash_fn)
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col("*"), toks.alias("__toks"))
        .select(F.col("*"), F.explode(feats).alias("feature"))
        .select(F.col("*"), bucket.alias("bucket"))
        .drop("__toks", "feature")
    )


def _bucket_counts(feats: DataFrame, alias: str) -> DataFrame:
    return feats.groupBy("bucket").agg(F.count(F.lit(1)).alias(alias))


def bucket_log_ratios(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-bucket snapped log importance ratios over the RAW bucket
    universe: (bucket, raw_n, tgt_n, unit_e6) with

        unit_e6 = round(1e6 * ((ln(tgt_n + 1) - ln(T + B))
                              - (ln(raw_n + 1) - ln(R + B))))

    — add-1 smoothed log(p_target / p_raw), parenthesized exactly as
    written (the oracle replays the same shape). Buckets never seen
    in raw are omitted: raw documents cannot reference them.

    Raises ValueError if either corpus has no non-null text: an empty
    target would make every ratio NULL and turn the downstream top-k
    into valid-looking garbage (first k ids with NULL scores).
    """
    _check_reserved(text_col)
    raw = raw.select(text_col)
    target = target.select(text_col)
    for side, frame in (("raw", raw), ("target", target)):
        if frame.filter(F.col(text_col).isNotNull()).limit(1).count() == 0:
            raise ValueError(f"{side} corpus has no non-null {text_col!r}")
    # localCheckpoint the two counter frames (<= B rows, eager): each
    # feeds BOTH its totals aggregate and the ratio join, and without
    # the lineage cut Catalyst re-runs the full tokenize+explode scan
    # of its corpus once per consumer — 3 heavy scans of the raw
    # corpus instead of 2 (plan-pinned in pytest).
    raw_b = _bucket_counts(
        _feature_buckets(raw, text_col, n_buckets, hash_fn), "raw_n"
    ).localCheckpoint(eager=True)
    tgt_b = _bucket_counts(
        _feature_buckets(target, text_col, n_buckets, hash_fn), "tgt_n"
    ).localCheckpoint(eager=True)
    totals = raw_b.agg(F.sum("raw_n").alias("raw_total")).crossJoin(
        tgt_b.agg(F.sum("tgt_n").alias("tgt_total"))
    )
    joined = (
        raw_b.join(tgt_b, "bucket", "left_outer")
        .select("bucket", "raw_n", F.coalesce("tgt_n", F.lit(0)).alias("tgt_n"))
        .crossJoin(F.broadcast(totals))
    )
    b = F.lit(float(n_buckets))
    unit = F.round(
        (
            (F.log(F.col("tgt_n") + F.lit(1.0)) - F.log(F.col("tgt_total") + b))
            - (F.log(F.col("raw_n") + F.lit(1.0)) - F.log(F.col("raw_total") + b))
        )
        * F.lit(1e6)
    ).cast("long")
    return joined.select("bucket", "raw_n", "tgt_n", unit.alias("unit_e6"))


def importance_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-document DSIR log-importance: (id_col, n_features,
    score_units) where score_units is the exact long sum of the
    document's per-feature-occurrence snapped log ratios (e6 units).
    Higher = more target-like."""
    _check_reserved(text_col, id_col)
    ratios = bucket_log_ratios(raw, target, text_col, n_buckets, hash_fn)
    feats = _feature_buckets(
        raw.select(id_col, text_col), text_col, n_buckets, hash_fn
    )
    return (
        feats.join(F.broadcast(ratios.select("bucket", "unit_e6")), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sum("unit_e6").alias("score_units"),
        )
    )


def importance_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    hash_fn: str = "md5",
) -> DataFrame:
    """Top-k most target-like raw documents by DSIR importance:
    (id_col, n_features, score_units, sel_rank), ordered and ranked
    by (score_units desc, id asc) — a deterministic total order, so
    the cut is reproducible run-to-run and engine-to-engine."""
    if k <= 0:
        raise ValueError("k must be positive")
    w = importance_weights(raw, target, text_col, id_col, n_buckets, hash_fn)
    top = w.orderBy(F.desc("score_units"), F.asc(id_col)).limit(k)
    # rank the k survivors: a window over an already-k-row frame.
    from pyspark.sql import Window

    rank = F.row_number().over(
        Window.orderBy(F.desc("score_units"), F.asc(id_col))
    )
    return top.select(
        id_col, "n_features", "score_units", rank.alias("sel_rank")
    ).orderBy("sel_rank")
