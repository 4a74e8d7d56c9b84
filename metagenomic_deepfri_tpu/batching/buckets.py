"""Length bucketing for variable-size protein batches under XLA static shapes.

The reference mitigates variable length only by sorting proteins by length
for locality (reference ``pipeline.py:528-533``); every forward is still its
own dynamically-shaped ONNX call. Under XLA we need a small, fixed set of
compiled shapes: sequences are padded up to bucket boundaries, and the batch
size per bucket is chosen so the dominant O(B·L²) adjacency footprint stays
roughly constant (constant device memory, near-constant step time per batch).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Iterable, Sequence

# Bucket boundaries: MXU-aligned (multiples of 128 beyond the smallest).
DEFAULT_BUCKETS = (128, 256, 512, 1024, 2048)

# Target adjacency elements per GCN batch (B·L²): 512M f32 ≈ 2 GB per
# adjacency buffer. Measured on v5e (BENCH_MATRIX.json + device-only batch
# sweeps): throughput at long buckets is limited by BATCH size, not by
# adjacency HBM traffic — the old 32M target starved the LSTM scan's
# per-step matmul (batch 8 at bucket 2048 ran the MXU at 6% MFU; batch 128
# at the same bucket runs at ~37%, batch 256 at ~42%). 512M keeps every
# bucket ≥ 40% MFU while two adjacency temporaries + params + LM
# activations still fit a 16 GB chip with >2× headroom.
_TARGET_ADJ_ELEMS = 512 * 1024 * 1024
# Batch ceiling: past ~2k the remaining gain is <5% (measured at buckets
# 128/256) while host packing latency and partial-batch padding waste grow.
_MAX_GCN_BATCH = 2048
# Target token elements per CNN batch (B·L) — CNN has no O(L²) term.
_TARGET_TOK_ELEMS = 512 * 1024


def assign_bucket(length: int,
                  buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    """Smallest bucket that fits ``length``.

    Lengths beyond the configured ceiling get an ad-hoc 256-aligned bucket
    (one extra compile, tiny batch) instead of an error — the reference
    imposes no length limit (its per-protein ONNX calls are dynamically
    shaped), so neither do we.
    """
    for b in buckets:
        if length <= b:
            return b
    return -(-length // 256) * 256


def gcn_batch_size(bucket: int) -> int:
    """Batch size keeping B·L² ≈ constant (capped), multiple-of-8."""
    b = max(1, min(_MAX_GCN_BATCH, _TARGET_ADJ_ELEMS // (bucket * bucket)))
    if b >= 8:
        b -= b % 8
    return b


def cnn_batch_size(bucket: int) -> int:
    b = max(1, _TARGET_TOK_ELEMS // bucket)
    if b >= 8:
        b -= b % 8
    return b


def bucket_plan(lengths: Iterable[int],
                buckets: Sequence[int] = DEFAULT_BUCKETS) -> dict:
    """Group item indices by bucket: {bucket_len: [indices]}."""
    plan = defaultdict(list)
    for idx, length in enumerate(lengths):
        plan[assign_bucket(length, buckets)].append(idx)
    return dict(plan)
