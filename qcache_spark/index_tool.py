"""Index maintenance CLI: ``python -m qcache_spark.index_tool``.

The persisted-index lifecycle (MinHashIndex / IVFIndex) is maintained
OUT-OF-BAND from the jobs that probe it — compaction runs on a
schedule, a dead admitter's lease needs an operator override, a
deliberate checkpoint migration needs a watermark reset. This module
is that operator surface, one command per maintenance verb:

    python -m qcache_spark.index_tool stats          /path/to/index
    python -m qcache_spark.index_tool compact        /path/to/index
    python -m qcache_spark.index_tool refit          /path/to/index
    python -m qcache_spark.index_tool break-lease    /path/to/index
    python -m qcache_spark.index_tool reset-progress /path/to/index

Paths may be any Hadoop-FS URI (``file:``, ``hdfs://``, ``s3a://``) —
every filesystem touch goes through qcache_spark/hadoopfs.py. The
index family is auto-detected from the ``_meta`` sidecar (MinHash
metas carry ``num_perm``/``bands``; IVF metas carry ``centroids``).
Output is one JSON line per command, machine-consumable.

The reference engine has no index artifacts and hence no such tool;
this is operability surface for the engine's own 100 TB ingestion
story (SCALING §17a/§18).
"""
from __future__ import annotations

import argparse
import json
import sys


def detect_family(spark, path: str) -> str:
    """'minhash' or 'ivf', from the _meta sidecar's key set."""
    meta = json.loads(spark.read.parquet(path + "_meta").collect()[0][0])
    if "num_perm" in meta and "bands" in meta:
        return "minhash"
    if "centroids" in meta:
        return "ivf"
    raise ValueError(
        f"unrecognized index meta at {path + '_meta'!r}: "
        f"keys {sorted(meta)}"
    )


def load_index(spark, path: str):
    family = detect_family(spark, path)
    if family == "minhash":
        from qcache_spark.operators.dedup import MinHashIndex

        return family, MinHashIndex.load(spark, path)
    from qcache_spark.operators.similarity import IVFIndex

    return family, IVFIndex.load(spark, path)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="qcache_spark.index_tool",
        description="Maintain persisted MinHash/IVF indexes",
    )
    p.add_argument(
        "command",
        choices=["stats", "compact", "refit", "break-lease",
                 "reset-progress"],
    )
    p.add_argument("path", help="index root (any Hadoop-FS URI)")
    p.add_argument("--cpus", type=int, default=None,
                   help="local[N] Spark parallelism (default: all cores)")
    return p


def run(spark, command: str, path: str) -> dict:
    """Execute one maintenance verb; returns the JSON-able report.
    Split from main() so tests and schedulers can call it on an
    existing session."""
    if command == "break-lease":
        from qcache_spark.lease import IndexLease

        return {
            "index": path,
            "lease_removed": IndexLease.break_lease(spark, path),
        }
    if command == "reset-progress":
        from qcache_spark.streaming.admission import reset_progress

        return {
            "index": path,
            "progress_reset": reset_progress(spark, path),
        }
    family, idx = load_index(spark, path)
    if command == "stats":
        return {"index": path, "family": family, **idx.stats()}
    if command == "refit":
        if family != "ivf":
            raise ValueError(
                "refit applies to IVF indexes only (a MinHash index "
                "has no fitted geometry — rebuild it instead)"
            )
        return {"index": path, "family": family, **idx.refit()}
    # compact
    report = idx.compact()
    return {"index": path, "family": family, **report}


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from qcache_spark.session import get_spark

    spark = get_spark(cpus=args.cpus) if args.cpus else get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    try:
        report = run(spark, args.command, args.path)
    except Exception as e:
        print(json.dumps({"error": f"{type(e).__name__}: {e}"}))
        return 1
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
