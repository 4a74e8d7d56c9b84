#!/usr/bin/env python
"""Headline benchmark: GCN MF-branch inference throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline = reference ONNX per-protein GCN inference (20.2 proteins/s median
on 200-400 aa proteins, 1 CPU core; see BASELINE.md and
metagenomic_deepfri_tpu/bench_utils.py).
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from metagenomic_deepfri_tpu.bench_utils import run_gcn_benchmark


def main():
    print(run_gcn_benchmark(bucket=512, batches=16, n_labels=512))


if __name__ == "__main__":
    main()
