"""Measured per-bucket GraphConv aggregation strategy ('auto' spmm policy).

The engine has two implementations of the A·X aggregation at the heart of
the GCN (reference's dense per-protein matmul, ``predict.pyx:83-95``):

* ``'xla'`` — materialise the masked dense (B, L, L) adjacency in HBM once
  per batch and let XLA fuse the three GraphConv contractions;
* ``'pallas'`` — the fused kernel in :mod:`..ops.graphconv_pallas` that
  recomputes adjacency tiles in VMEM from O(L) projected coordinates and
  contracts them immediately (no HBM adjacency traffic).

Which wins depends on the bucket length (the B·L² adjacency footprint) and
compute dtype. This table records the *measured* winner per
(bucket, dtype) on real TPU hardware — produced by ``python bench.py
--matrix`` (see BENCH_MATRIX.json at the repo root for the raw numbers and
the device they were recorded on). ``spmm='auto'`` (the engine default)
resolves through it; unknown buckets fall back to the nearest measured one.
"""

from __future__ import annotations

# (bucket, compute_dtype) -> 'xla' | 'pallas'.
# Measured on TPU v5 lite (v5e), 2026-08-20, `python bench.py --matrix`
# (device-only fori_loop timing, best-of-3; raw cells in BENCH_MATRIX.json).
# XLA wins every cell at the measured-optimal batch sizes (37-45% MFU).
# The fused kernel only ever led under the old starved batch rule (B=8 at
# bucket 2048, where the XLA path idled the MXU at 6% MFU); with
# B·L² ≤ 512M batches the dense path's HBM adjacency traffic is hidden
# behind the batch-parallel matmuls and recomputing tiles in VMEM only
# costs extra FLOPs. Memory-pressure probes went further
# (BENCH_MATRIX_LONG.json: buckets 4096/8192 at 2 GB adjacency;
# BENCH_LONGPROTEIN.json: single proteins of 65,536 and 131,072 residues,
# the latter a 34 GB adjacency that cannot exist in HBM) — XLA wins every
# one of those too, because its fusion streams the coordinate-threshold
# compare into the contraction without materialising the matrix. On v5e
# there is no reachable regime where the kernel wins; it remains behind an
# explicit spmm='pallas' for other TPU generations. Re-run the matrix
# after kernel or batch-rule changes.
AUTO_SPMM_TABLE: dict = {
    (128, "bfloat16"): "xla",
    (256, "bfloat16"): "xla",
    (512, "bfloat16"): "xla",
    (1024, "bfloat16"): "xla",
    (2048, "bfloat16"): "xla",
    (128, "float32"): "xla",
    (256, "float32"): "xla",
    (512, "float32"): "xla",
    (1024, "float32"): "xla",
    (2048, "float32"): "xla",
}


def resolve_spmm(policy: str, bucket: int, compute_dtype: str) -> str:
    """Resolve an engine spmm policy to a concrete strategy for one bucket.

    'xla'/'pallas' pass through; 'auto' looks up the measured table,
    snapping to the nearest recorded bucket for the dtype.
    """
    if policy != "auto":
        return policy
    import jax

    # The fused kernel is TPU-only (tiled pallas_call); off-TPU 'auto'
    # always means the portable XLA path. An explicit 'pallas' request
    # off-TPU is honoured (and fails loudly) rather than silently rewritten.
    if jax.default_backend() != "tpu":
        return "xla"
    key = (int(bucket), str(compute_dtype))
    if key in AUTO_SPMM_TABLE:
        return AUTO_SPMM_TABLE[key]
    candidates = [b for (b, d) in AUTO_SPMM_TABLE if d == compute_dtype]
    if not candidates:
        return "xla"
    nearest = min(candidates, key=lambda b: abs(b - int(bucket)))
    return AUTO_SPMM_TABLE[(nearest, str(compute_dtype))]
