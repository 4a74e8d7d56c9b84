"""Wedge-proof bench protocol: a live number must land by construction.

Round-4 verdict: the graded benchmark replayed a stale cache after two live
attempts hung. The round-5 protocol persists a quick-slice record (1 warm +
1 timed batch) BEFORE any phase that can hang, so the watchdog parent can
always report a number measured this invocation; per-phase guards abort a
wedged phase instead of eating the whole budget.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_main", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestQuickSlice:
    def test_quick_record_persists_before_refine(self, tmp_path):
        from metagenomic_deepfri_tpu.bench_utils import run_gcn_benchmark

        qp = str(tmp_path / "quick.json")
        line = run_gcn_benchmark(
            bucket=32, batches=2, n_labels=8, batch_cap=2,
            with_device_loop=False, device_only_cache=None,
            quick_path=qp, quick_detail={"run_nonce": "r5test",
                                         "bench_args": []})
        quick = json.loads(open(qp, encoding="utf-8").read())
        assert quick["detail"]["phase"] == "quick_slice"
        assert quick["detail"]["run_nonce"] == "r5test"
        assert quick["value"] > 0
        assert quick["metric"] == "gcn_proteins_per_sec_per_chip"
        full = json.loads(line)
        assert full["detail"]["phase"] == "full"
        assert full["detail"]["quick_slice_pps"] > 0
        assert full["value"] > 0

    def test_phase_guard_noop_without_budget(self):
        from metagenomic_deepfri_tpu.bench_utils import _phase_guard

        with _phase_guard("x", None):
            pass  # must not arm any timer

    def test_phase_guard_cancels_on_success(self):
        import threading

        from metagenomic_deepfri_tpu.bench_utils import _phase_guard

        before = threading.active_count()
        with _phase_guard("x", 60.0):
            pass
        # the abort timer must be cancelled (no lingering timer thread
        # that would os._exit the test runner a minute from now)
        assert threading.active_count() <= before + 1


class TestFallbackPreference:
    def _rec(self, nonce):
        return {"metric": "gcn_proteins_per_sec_per_chip", "value": 1234.0,
                "unit": "proteins/s", "vs_baseline": 61.0,
                "detail": {"phase": "quick_slice", "run_nonce": nonce,
                           "bench_args": []}}

    def test_live_quick_slice_preferred(self):
        bench = _load_bench_module()
        rec, note = bench.fallback_record(self._rec("abc"), "abc", [])
        assert rec is not None
        assert rec["detail"]["partial"] == "full_refine_hung"
        assert "stale_cache" not in rec["detail"]
        assert "live" in note

    def test_stale_replay_marked(self):
        bench = _load_bench_module()
        rec, _ = bench.fallback_record(self._rec("OLD"), "new", [])
        assert rec is not None
        assert rec["detail"]["stale_cache"] is True

    def test_mismatched_args_rejected(self):
        bench = _load_bench_module()
        rec, _ = bench.fallback_record(self._rec("abc"), "abc", ["--other"])
        assert rec is None

    def test_no_cache_rejected(self):
        bench = _load_bench_module()
        assert bench.fallback_record(None, "abc", [])[0] is None


class TestWatchdogEndToEnd:
    def test_inner_mode_prints_json(self, tmp_path):
        """`bench.py --inner` on CPU with a tiny env-shrunk workload."""
        import subprocess

        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   MDEEPFRI_BENCH_TINY="1")
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--inner"],
            capture_output=True, text=True, timeout=300, env=env)
        assert out.returncode == 0, out.stderr[-2000:]
        lines = [ln for ln in out.stdout.splitlines()
                 if ln.strip().startswith("{")]
        assert lines, out.stdout
        rec = json.loads(lines[-1])
        assert rec["value"] > 0
