#!/usr/bin/env python
"""Headline benchmark: GCN MF-branch inference throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline = reference ONNX per-protein GCN inference (20.2 proteins/s median
on 200-400 aa proteins, 1 CPU core; see BASELINE.md and
metagenomic_deepfri_tpu/bench_utils.py).

Modes (each still prints one JSON line; sidecar files carry the detail):
  (default)     headline GCN point with MFU + device-only split
  --matrix      per-(bucket, dtype, spmm) device-only matrix
                → BENCH_MATRIX.json (drives batching/spmm_table.py)
  --realvocab   real vocabulary sizes (MF 489 / BP 3992) + CNN lines
                → BENCH_REALVOCAB.json
  --multimode   3-mode shared-LM trunk pass vs per-mode dispatch
                → BENCH_MULTIMODE.json
  --no-device-loop   skip the device-only loop in the default mode
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])


def main():
    args = set(sys.argv[1:])
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
    from metagenomic_deepfri_tpu.bench_utils import run_gcn_benchmark
    print(run_gcn_benchmark(bucket=512, batches=16, n_labels=512,
                            with_device_loop="--no-device-loop" not in args))


if __name__ == "__main__":
    main()
