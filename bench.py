#!/usr/bin/env python
"""Headline benchmark: GCN MF-branch inference throughput on one chip.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline = reference ONNX per-protein GCN inference (20.2 proteins/s median
on 200-400 aa proteins, 1 CPU core; see BASELINE.md and
metagenomic_deepfri_tpu/bench_utils.py).

The default mode is budgeted AND wedge-proof by construction: the
measurement runs in a watchdog child process (a remote-backend RPC can
hang a process forever — observed repeatedly on the tunneled dev chip —
while fresh processes work fine), is retried once in a new process on
timeout, and as a last resort replays the last successful measurement from
BENCH_LAST.json with a "stale_cache" marker so the driver always captures
a parseable number.

Modes (each still prints one JSON line; sidecar files carry the detail):
  (default)        headline GCN point with MFU + device-only/link split
  --matrix         per-(bucket, dtype, spmm) device-only matrix
                   → BENCH_MATRIX.json (drives batching/spmm_table.py)
  --realvocab      real vocabulary sizes (MF 489 / BP 3992) + CNN lines
                   → BENCH_REALVOCAB.json
  --multimode      3-mode shared-LM trunk pass vs per-mode dispatch
                   → BENCH_MULTIMODE.json
  --mesh           virtual 8-device CPU mesh batch-scaling efficiency
                   → BENCH_MESH.json (collective structure proxy, not perf)
  --device-loop    force a fresh device-only measurement (refreshes cache)
  --no-device-loop never run the device-only loop (cache still consulted)
  --inner          (internal) run the measurement in THIS process
"""

import json
import os
import subprocess
import sys

REPO = __file__.rsplit("/", 1)[0]
sys.path.insert(0, REPO)

LAST_GOOD = os.path.join(REPO, "BENCH_LAST.json")
# Per-attempt budgets: the FIRST attempt is generous (a cold run under
# service load legitimately takes 2-4 min of first-executions — killing
# it at 3 min wastes the work); the RETRY is short because it exists for
# the wedged-connection case, where a fresh process either works quickly
# or is wedged too. Worst case 300+120 + overhead < 8 min.
ATTEMPT_TIMEOUTS_S = (300, 120)


def run_measurement(args):
    from metagenomic_deepfri_tpu.utils import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    if "--matrix" in args:
        from metagenomic_deepfri_tpu.bench_utils import run_spmm_matrix
        return run_spmm_matrix()
    if "--multimode" in args:
        from metagenomic_deepfri_tpu.bench_utils import \
            run_multimode_benchmark
        return run_multimode_benchmark()
    if "--realvocab" in args:
        from metagenomic_deepfri_tpu.bench_utils import \
            run_realvocab_benchmark
        return run_realvocab_benchmark()
    if "--mesh" in args:
        from metagenomic_deepfri_tpu.bench_utils import run_mesh_benchmark
        return run_mesh_benchmark()
    from metagenomic_deepfri_tpu.bench_utils import run_gcn_benchmark
    if "--device-loop" in args:
        with_device_loop = True
    elif "--no-device-loop" in args:
        with_device_loop = False
    else:
        with_device_loop = "auto"
    return run_gcn_benchmark(bucket=512, batches=4, n_labels=512,
                             with_device_loop=with_device_loop)


def _watchdog_attempt(args, timeout_s):
    """One measurement attempt in a fresh child process; None on failure.

    The child is its own process group and the WHOLE group is killed on
    timeout (by exact pgid, never by pattern), so any helper process
    holding the remote device connection dies with it and the retry
    starts against a released device.
    """
    import signal

    cmd = [sys.executable, __file__, "--inner", *sorted(args)]
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True,
                            start_new_session=True)
    try:
        out, err = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        proc.wait()
        return None
    if proc.returncode != 0:
        print(err[-2000:], file=sys.stderr)
        return None
    for line in out.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return line
    return None


def main():
    args = set(sys.argv[1:])
    if "--inner" in args or "--no-watchdog" in args:
        print(run_measurement(args - {"--inner", "--no-watchdog"}))
        return
    non_default = {"--matrix", "--multimode", "--realvocab", "--mesh"}
    if args & non_default:
        # specialty modes are interactive/diagnostic — no watchdog
        print(run_measurement(args))
        return
    line = _watchdog_attempt(args, ATTEMPT_TIMEOUTS_S[0])
    if line is None:
        print("first attempt hung/failed; retrying in a fresh process",
              file=sys.stderr)
        line = _watchdog_attempt(args, ATTEMPT_TIMEOUTS_S[1])
    if line is not None:
        record = json.loads(line)
        record["detail"]["bench_args"] = sorted(args)
        with open(LAST_GOOD, "w", encoding="utf-8") as f:
            f.write(json.dumps(record) + "\n")
        print(json.dumps(record))
        return
    if os.path.exists(LAST_GOOD):
        with open(LAST_GOOD, "r", encoding="utf-8") as f:
            cached = json.loads(f.read())
        # replay only a measurement of the SAME benchmark (args recorded
        # at save time); its detail already names the device it came from
        if cached.get("detail", {}).get("bench_args") == sorted(args):
            cached["detail"]["stale_cache"] = True
            print("both attempts hung — replaying last successful "
                  "measurement (marked stale_cache, device in detail)",
                  file=sys.stderr)
            print(json.dumps(cached))
            return
    raise SystemExit("benchmark attempts hung and no matching cached "
                     "measurement exists")


if __name__ == "__main__":
    main()
