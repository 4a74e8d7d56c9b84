#!/usr/bin/env python
"""Headline benchmark: GCN MF-branch inference throughput on one chip.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline = reference ONNX per-protein GCN inference (20.2 proteins/s median
on 200-400 aa proteins, 1 CPU core; see BASELINE.md and
metagenomic_deepfri_tpu/bench_utils.py).

The default mode is budgeted to finish well inside the driver's timeout by
construction: a small number of full engine passes (the per-protein
throughput estimate barely moves with more), plus a device-only (link-free)
companion number that is cached in BENCH_DEVICE_ONLY.json — measured fresh
only when no valid cache exists and the headline has wall-clock budget left.

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
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])


def main():
    args = set(sys.argv[1:])
    from metagenomic_deepfri_tpu.utils import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    if "--matrix" in args:
        from metagenomic_deepfri_tpu.bench_utils import run_spmm_matrix
        print(run_spmm_matrix())
        return
    if "--multimode" in args:
        from metagenomic_deepfri_tpu.bench_utils import \
            run_multimode_benchmark
        print(run_multimode_benchmark())
        return
    if "--realvocab" in args:
        from metagenomic_deepfri_tpu.bench_utils import \
            run_realvocab_benchmark
        print(run_realvocab_benchmark())
        return
    if "--mesh" in args:
        from metagenomic_deepfri_tpu.bench_utils import run_mesh_benchmark
        print(run_mesh_benchmark())
        return
    from metagenomic_deepfri_tpu.bench_utils import run_gcn_benchmark
    if "--device-loop" in args:
        with_device_loop = True
    elif "--no-device-loop" in args:
        with_device_loop = False
    else:
        with_device_loop = "auto"
    print(run_gcn_benchmark(bucket=512, batches=4, n_labels=512,
                            with_device_loop=with_device_loop))


if __name__ == "__main__":
    main()
