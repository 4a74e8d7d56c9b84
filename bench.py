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
while fresh processes work fine) and lands a LIVE number before anything
that can hang: the child compiles + warms ONE batch, times one pass over
it, and persists that quick-slice record to BENCH_LAST.json immediately;
only then does it refine with the full best-of-4 measurement, under
per-phase abort guards (a wedged phase exits the child, it does not eat
the budget). If the refinement hangs, the parent reports the quick slice
— measured THIS run, marked detail.phase="quick_slice". Only if BOTH
attempts die before even the quick slice does it replay the last
successful measurement with a "stale_cache" marker, so the driver always
captures a parseable number.

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
  --roofline       per-stage device-only split (adjacency | LSTM-LM |
                   GraphConv | FC/head) → BENCH_ROOFLINE.json
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
# it at 3 min wastes the work; the inner process's own phase guards abort
# a wedged phase well before this backstop); the RETRY is short because
# it exists for the wedged-connection case, where a fresh process either
# works quickly or is wedged too. Worst case 420+120 + overhead < 10 min.
# Either way a LIVE number exists the moment the inner quick-slice lands
# (~1 warm + 1 timed batch), persisted to BENCH_LAST before any phase
# that can hang — the stale-replay path only triggers if BOTH attempts
# die before even that.
ATTEMPT_TIMEOUTS_S = (420, 120)


def run_measurement(args):
    if os.environ.get("MDEEPFRI_BENCH_TINY"):
        # CPU protocol tests: pin the backend BEFORE anything can touch
        # it — enable_persistent_compile_cache() queries the default
        # backend, which would otherwise initialise the tunneled device
        # (and hang the test when the service is stalled).
        import jax

        jax.config.update("jax_platforms", "cpu")
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
    if "--roofline" in args:
        from metagenomic_deepfri_tpu.bench_utils import \
            run_roofline_benchmark
        return run_roofline_benchmark()
    from metagenomic_deepfri_tpu.bench_utils import run_gcn_benchmark
    if "--device-loop" in args:
        with_device_loop = True
    elif "--no-device-loop" in args:
        with_device_loop = False
    else:
        with_device_loop = "auto"
    # Watchdog mode (env set by the parent): persist a live quick-slice
    # record + arm per-phase abort guards inside the measurement.
    quick_path = os.environ.get("MDEEPFRI_BENCH_QUICK")
    nonce = os.environ.get("MDEEPFRI_BENCH_NONCE")
    quick_detail = ({"run_nonce": nonce, "bench_args": sorted(args)}
                    if quick_path else None)
    if os.environ.get("MDEEPFRI_BENCH_TINY"):  # CPU protocol tests only
        return run_gcn_benchmark(bucket=32, batches=2, n_labels=8,
                                 batch_cap=2, with_device_loop=False,
                                 device_only_cache=None,
                                 quick_path=quick_path,
                                 quick_detail=quick_detail)
    return run_gcn_benchmark(bucket=512, batches=4, n_labels=512,
                             with_device_loop=with_device_loop,
                             quick_path=quick_path,
                             quick_detail=quick_detail)


def _watchdog_attempt(args, timeout_s, env=None):
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
                            start_new_session=True, env=env)
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
    non_default = {"--matrix", "--multimode", "--realvocab", "--mesh",
                   "--roofline"}
    if args & non_default:
        # specialty modes are interactive/diagnostic — no watchdog
        print(run_measurement(args))
        return
    # The same nonce marks BOTH attempts: any quick-slice record carrying
    # it in BENCH_LAST was measured by THIS invocation (live, this round)
    # — strictly better than a stale replay if the full refinement hangs.
    import uuid

    nonce = uuid.uuid4().hex
    env = dict(os.environ, MDEEPFRI_BENCH_QUICK=LAST_GOOD,
               MDEEPFRI_BENCH_NONCE=nonce)
    line = _watchdog_attempt(args, ATTEMPT_TIMEOUTS_S[0], env)
    if line is None:
        print("first attempt hung/failed; retrying in a fresh process",
              file=sys.stderr)
        line = _watchdog_attempt(args, ATTEMPT_TIMEOUTS_S[1], env)
    if line is not None:
        record = json.loads(line)
        record["detail"]["bench_args"] = sorted(args)
        with open(LAST_GOOD, "w", encoding="utf-8") as f:
            f.write(json.dumps(record) + "\n")
        print(json.dumps(record))
        return
    cached = None
    if os.path.exists(LAST_GOOD):
        with open(LAST_GOOD, "r", encoding="utf-8") as f:
            cached = json.loads(f.read())
    record, note = fallback_record(cached, nonce, sorted(args))
    if record is None:
        raise SystemExit("benchmark attempts hung and no matching cached "
                         "measurement exists")
    print(note, file=sys.stderr)
    print(json.dumps(record))


def fallback_record(cached, nonce, bench_args):
    """(record, stderr-note) when no full measurement landed, else (None, _).

    Preference order: a LIVE quick-slice persisted by THIS invocation
    (matching run nonce — the refinement hung but this number was measured
    moments ago on this device) → a stale replay of the last successful
    measurement of the SAME benchmark, marked ``stale_cache``.
    """
    if not cached:
        return None, ""
    detail = cached.get("detail", {})
    if detail.get("bench_args") != bench_args:
        return None, ""
    if detail.get("run_nonce") == nonce:
        detail["partial"] = "full_refine_hung"
        return cached, ("full refinement hung — reporting the live "
                        "quick-slice measurement from this run "
                        "(detail.phase=quick_slice)")
    detail["stale_cache"] = True
    return cached, ("both attempts hung before even the quick slice — "
                    "replaying last successful measurement (marked "
                    "stale_cache)")


if __name__ == "__main__":
    main()
