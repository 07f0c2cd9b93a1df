"""Z-order layout writer: interleaving math, round-trip parity, and
the thing the layout exists for — file-stats pruning on box
predicates (the plan-level assert that complements q128's
result-invisibility gate)."""
from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from qcache_spark.operators import layout

SF01 = "/root/testdata/sf0.01"


def _py_zvalue(vals: list[int], bits: int) -> int:
    """Reference Morton interleave (driver-side, for spot checks)."""
    z = 0
    n = len(vals)
    for b in range(bits):
        for i, v in enumerate(vals):
            z |= ((v >> b) & 1) << (b * n + i)
    return z


def test_zvalue_matches_reference_interleave(spark):
    # Quantization is identity when bounds = [0, 2^bits - 1].
    bits = 4
    top = (1 << bits) - 1
    rows = [(a, b) for a in range(0, top + 1, 3) for b in range(0, top + 1, 5)]
    df = spark.createDataFrame(rows, ["x", "y"])
    bounds = {"x": (0.0, float(top)), "y": (0.0, float(top))}
    got = (
        df.withColumn("z", layout.zvalue_expr(["x", "y"], bounds, bits))
        .orderBy("x", "y")
        .collect()
    )
    for r in got:
        assert r["z"] == _py_zvalue([r["x"], r["y"]], bits), (r["x"], r["y"])


def test_zvalue_null_and_constant_column(spark):
    df = spark.createDataFrame(
        [(None, 5.0), (3, 5.0), (7, 5.0)], ["x", "y"]
    )
    bounds = {"x": (0.0, 7.0), "y": (5.0, 5.0)}  # y: degenerate span
    rows = df.withColumn(
        "z", layout.zvalue_expr(["x", "y"], bounds, 4)
    ).collect()
    by_x = {r["x"]: r["z"] for r in rows}
    assert by_x[None] == 0  # null -> lowest bucket
    assert by_x[3] < by_x[7]  # monotone when only x varies


def test_zvalue_rejects_long_overflow(spark):
    with pytest.raises(ValueError):
        layout.zvalue_expr(["a", "b"], {"a": (0, 1), "b": (0, 1)}, bits=32)


@pytest.fixture(scope="module")
def zorder_paths(spark):
    events = spark.read.parquet(os.path.join(SF01, "events.parquet"))
    base = tempfile.mkdtemp(prefix="qcache_spark_layout_test_")
    zpath = os.path.join(base, "zorder")
    npath = os.path.join(base, "natural")
    layout.zorder_write(events, ["user_id", "value"], zpath, bits=10, partitions=16)
    events.repartition(16).write.mode("overwrite").parquet(npath)
    yield events, zpath, npath
    shutil.rmtree(base, ignore_errors=True)


def test_zorder_roundtrip_parity(spark, zorder_paths):
    events, zpath, _ = zorder_paths
    back = spark.read.parquet(zpath)
    assert back.count() == events.count()
    # exact multiset parity on the id column
    assert (
        back.select("event_id").exceptAll(events.select("event_id")).count() == 0
    )
    assert [f.name for f in back.schema.fields] == [
        f.name for f in events.schema.fields
    ]


def test_zorder_prunes_box_natural_does_not(zorder_paths):
    _, zpath, npath = zorder_paths
    box = {"user_id": (40, 80), "value": (100.0, 200.0)}
    pz = layout.pruned_fraction(zpath, box)
    pn = layout.pruned_fraction(npath, box)
    # Arrival order: every file spans the full domain of both columns,
    # nothing can be skipped. Z-order: most files' envelopes miss the
    # box on at least one dimension (0.69 measured at 16 files; 0.5
    # leaves headroom for range-boundary sampling jitter).
    assert pn <= 0.1, pn
    assert pz >= 0.5, pz
    assert pz > pn


def test_zorder_box_filters_are_pushed_down(spark, zorder_paths):
    _, zpath, _ = zorder_paths
    back = spark.read.parquet(zpath)
    plan = (
        back.filter(
            F.col("user_id").between(40, 80) & F.col("value").between(100.0, 200.0)
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # toString truncates long filter lists, so assert the pushdown on
    # the first bound and the presence of every bound in DataFilters
    # (same predicates, untruncated section of the scan node).
    assert "PushedFilters: [IsNotNull(user_id)" in plan, plan[:2000]
    assert "GreaterThanOrEqual(user_id,40)" in plan, plan[:2000]
    for want in (
        "(user_id", ">= 40)", "<= 80)",
        "(value", ">= 100.0)", "<= 200.0)",
    ):
        assert want in plan, plan[:2000]
