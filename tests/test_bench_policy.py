"""Unit tests for bench.py's contention-gating policy (VERDICT r11
Wrong #3): a record taken on a busy box must grade DIRTY and divert
away from the committed BENCH_local.json. Pure-Python — no Spark."""
from __future__ import annotations

import importlib.util
import os
import sys

_BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")


def _verdict():
    """Load contention_verdict without executing main() (bench.py only
    runs under __main__) and without importing pyspark session state."""
    spec = importlib.util.spec_from_file_location("_bench_policy", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("_bench_policy", mod)
    spec.loader.exec_module(mod)
    return mod.contention_verdict


def test_clean_run_passes():
    verdict, reasons = _verdict()(1.1, 1.05, 8.0, 32)
    assert verdict == "PASS" and reasons == []


def test_moderate_jitter_is_caution_not_dirty():
    # the r11 driver-run shape: worst 1.69 under multi-tenant load
    verdict, reasons = _verdict()(1.9, 1.4, 12.0, 32)
    assert verdict == "CAUTION"
    assert len(reasons) == 2


def test_core_theft_is_dirty():
    # the r4 artifact shape: heavy-query medians 2-10x inflated
    verdict, reasons = _verdict()(5.2, 2.1, 20.0, 32)
    assert verdict == "DIRTY"
    assert any("3.0" in r for r in reasons)


def test_foreign_load_is_dirty():
    verdict, reasons = _verdict()(1.2, 1.1, 60.0, 32)
    assert verdict == "DIRTY"
    assert any("loadavg" in r for r in reasons)


def test_default_bench_out_is_not_the_committed_record():
    """VERDICT r12 Wrong #5: a driver/CI re-run must not overwrite the
    committed BENCH_local.json — the default durable copy lands in the
    uncommitted `.latest` sidecar; writing the record is an explicit
    SPARK_GRAFT_BENCH_OUT opt-in (and `.latest` is gitignored)."""
    src = open(_BENCH).read()
    assert '"BENCH_local.json.latest"' in src
    # the bare record name must not appear as a code literal anywhere
    # in bench.py (comments may mention it without quotes)
    assert '"BENCH_local.json"' not in src
    gi = open(os.path.join(os.path.dirname(_BENCH), ".gitignore")).read()
    assert "BENCH_local.json.latest" in gi
