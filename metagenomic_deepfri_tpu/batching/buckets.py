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

# Target adjacency elements per GCN batch (B·L²). 32M f32 ≈ 128 MB activations
# headroom on a 16 GB v5e chip once weights and LM activations are counted.
_TARGET_ADJ_ELEMS = 32 * 1024 * 1024
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
    """Batch size keeping B·L² ≈ constant, min 1, multiple-of-8 where possible."""
    b = max(1, _TARGET_ADJ_ELEMS // (bucket * bucket))
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
