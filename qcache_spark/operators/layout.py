"""Write-time data layout: multi-dimensional clustering (z-order /
Morton interleaving) for stats-based scan pruning.

At 100 TB the cost of a selective multi-predicate scan is decided at
WRITE time, not query time: a table laid out in arrival order gives
every file/row-group a min/max envelope that spans the full domain of
every non-sort column, so engine-side stats pruning (parquet row-group
filters, file pruning in table formats) eliminates nothing. Z-ordering
interleaves the bits of several columns into one sort key, so a range-
partitioned, sorted write produces files whose envelopes are tight on
ALL interleaved columns at once — a box predicate then skips most of
the table. This is the layout discipline behind Delta Lake
``OPTIMIZE ... ZORDER BY`` and Iceberg sort orders, re-expressed as a
plain DataFrame transform: the z-value is a static JVM expression tree
(shift/and/or — whole-stage codegen, no UDF), the clustering is one
``repartitionByRange`` exchange plus a partition-local sort, and the
skipping itself is done by the engine's existing parquet stats
machinery — this module adds no reader path at all.

No reference analogue: the reference engine is an in-memory cache
(``/root/reference/qcache/app.py``) with no persisted-layout concept;
this is a 100 TB storage-layout component.
"""
from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

# Bumped when the z-value expression or the write layout changes
# incompatibly (cached rewritten copies key their path on it).
LAYOUT_FORMAT_VERSION = 1


def column_bounds(df: DataFrame, cols: Sequence[str]) -> dict[str, tuple[float, float]]:
    """(min, max) per column, as doubles — one aggregate scan.

    Timestamps cast to epoch seconds; nulls are ignored here and land
    in the lowest z-bucket at quantization time.
    """
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"_lo_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"_hi_{c}"))
    row = df.agg(*aggs).first()
    out = {}
    for c in cols:
        lo, hi = row[f"_lo_{c}"], row[f"_hi_{c}"]
        out[c] = (float(lo) if lo is not None else 0.0,
                  float(hi) if hi is not None else 0.0)
    return out


def _quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Fixed-point rank of ``col`` in [0, 2**bits): linear scaling
    against the (lo, hi) bounds, clamped, null -> 0 (the lowest
    bucket — a deterministic home, and stats envelopes stay correct
    because pruning only ever consults the real column min/max)."""
    top = (1 << bits) - 1
    span = hi - lo
    if span <= 0:
        return F.lit(0).cast("long")
    scaled = F.floor((col.cast("double") - F.lit(lo)) / F.lit(span) * F.lit(float(top)))
    clamped = F.least(F.greatest(scaled, F.lit(0)), F.lit(top))
    return F.coalesce(clamped, F.lit(0)).cast("long")


def zvalue_expr(
    cols: Sequence[str],
    bounds: dict[str, tuple[float, float]],
    bits: int = 10,
) -> Column:
    """Morton (z-order) key over ``cols`` as a pure JVM expression.

    Each column is fixed-point quantized to ``bits`` bits against its
    ``bounds``, then bit-interleaved (column i contributes bit b to
    output position ``b * len(cols) + i``). The expression tree is
    ``bits * len(cols)`` shift/and/or terms — static, null-safe, and
    fully inside whole-stage codegen; no Python executes per row.
    ``bits * len(cols)`` must stay <= 63 (signed long)."""
    n = len(cols)
    if n == 0:
        raise ValueError("zvalue_expr needs at least one column")
    if bits * n > 63:
        raise ValueError(f"bits*ncols = {bits * n} exceeds 63 (signed long)")
    quantized = [_quantize(F.col(c), *bounds[c], bits) for c in cols]
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, q in enumerate(quantized):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def zorder_write(
    df: DataFrame,
    cols: Sequence[str],
    path: str,
    bits: int = 10,
    partitions: int | None = None,
    bounds: dict[str, tuple[float, float]] | None = None,
    mode: str = "overwrite",
) -> dict[str, tuple[float, float]]:
    """Write ``df`` as parquet clustered on the z-order of ``cols``.

    One range exchange on the z-value (``repartitionByRange`` — range
    boundaries from Spark's sampled range partitioner, so output files
    are balanced even under value skew) plus a partition-local sort,
    then the key is dropped before the write: the layout changes, the
    data does not. Returns the bounds used (pass them back in to keep
    a key-space stable across incremental writes of the same table).

    At 100 TB this is the compaction-job shape: the z-expression is
    codegen, the only shuffle is the range exchange, and downstream
    scans prune with the engine's ordinary parquet stats filters — no
    custom reader."""
    bounds = bounds or column_bounds(df, cols)
    z = zvalue_expr(cols, bounds, bits)
    clustered = df.withColumn("_zval", z)
    n = partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    (
        clustered.repartitionByRange(n, "_zval")
        .sortWithinPartitions("_zval")
        .drop("_zval")
        .write.mode(mode)
        .parquet(path)
    )
    return bounds


def file_envelopes(path: str, cols: Sequence[str]) -> list[dict]:
    """Per-file (min, max) stats envelopes from the parquet footers —
    the audit view of what the engine's stats pruning will see.

    Local-filesystem audit/test helper (pyarrow footer reads); at
    scale the pruning itself is done by the engine's parquet reader /
    table-format manifests, never by this function."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        meta = pq.ParquetFile(os.path.join(path, name)).metadata
        env: dict = {"file": name, "rows": meta.num_rows}
        schema_names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        for c in cols:
            idx = schema_names[c]
            lo = hi = None
            for rg in range(meta.num_row_groups):
                stats = meta.row_group(rg).column(idx).statistics
                if stats is None or not stats.has_min_max:
                    lo, hi = None, None
                    break
                lo = stats.min if lo is None else min(lo, stats.min)
                hi = stats.max if hi is None else max(hi, stats.max)
            env[c] = (lo, hi)
        out.append(env)
    return out


def pruned_fraction(path: str, box: dict[str, tuple]) -> float:
    """Fraction of files a stats-pruning reader SKIPS for a box
    predicate (``col -> (lo, hi)`` conjunction): a file survives only
    if every column's footer envelope intersects its box range. The
    number parquet row-group filtering / file pruning achieves on this
    layout — the figure of merit for ``zorder_write``."""
    envs = file_envelopes(path, list(box))
    if not envs:
        return 0.0
    kept = 0
    for env in envs:
        hit = True
        for c, (lo, hi) in box.items():
            flo, fhi = env[c]
            if flo is None:  # no stats -> cannot skip
                continue
            if fhi < lo or flo > hi:
                hit = False
                break
        kept += 1 if hit else 0
    return 1.0 - kept / len(envs)
