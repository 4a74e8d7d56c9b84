"""Pallas fused GraphConv aggregation: coords → masked adjacency → Â·X.

The reference's GraphConv executes inside ONNX Runtime as a dense (1, L, L)
float32 matmul, with the adjacency built on host, copied over PCIe, and
re-materialised per protein per mode (reference ``predict.pyx:83-95``). The
XLA path in :mod:`..models.deepfri` already batches this; the kernel here goes
one step further, per the BASELINE north star ("Pallas SpMM/SDDMM kernels for
the sparse adjacency gather/scatter and neighborhood aggregation"):

**The adjacency never exists in HBM.** Each (T×T) tile of the aligned contact
map is *recomputed in VMEM* from the projected CA coordinates (Gram-matrix
distance + threshold + identity/insertion-band/padding masks — the exact
semantics of :func:`..ops.cmap_align.aligned_contacts_from_coords`) and
immediately contracted with the matching X tile on the MXU. Per GraphConv
layer the HBM traffic is O(L·D) for X plus O(L) for coordinates, instead of
O(L²) for a materialised adjacency — for a 512-residue protein that is ~100×
less adjacency traffic, and the recompute is ~8 VPU flops per entry against
2·D MXU flops of useful work.

**Measured verdict (v5e, 2026-08-20, BENCH_MATRIX.json)**: at the
measured-optimal batch sizes (B·L² ≤ 512M, ``batching/buckets.py``) the
plain XLA dense path wins every (bucket, dtype) cell by 25-35% — batching
hides the adjacency HBM traffic behind the MXU matmuls, so the VMEM
recompute only adds work. The kernel's earlier long-bucket win (+70% at
bucket 2048) existed only under the old B=8 starved-batch rule. It remains
available via ``spmm='pallas'`` and matters where big batches are NOT
available (memory-constrained co-tenancy, very long ad-hoc buckets whose
batch would not fill); the ``'auto'`` policy resolves through the measured
table in :mod:`..batching.spmm_table`.

Contact maps at 6 Å are ~1-2% dense but strongly banded; on the MXU a masked
dense tile contraction beats gather-based sparse SpMM for all protein-scale L
(the gather path is HBM-latency-bound, the dense path rides the systolic
array — see the analysis in docs/PERFORMANCE.md). Density is exploited where
it pays: in HBM traffic (this kernel) and in multi-chip edge partitioning
(:mod:`..parallel.graph_shard`).

Two kernels:
- :func:`contact_degrees` — row degrees of the masked adjacency (for
  symmetric/row normalisation), one pass over tiles.
- :func:`graphconv_aggregate` — out[b, i, :] = Σ_j Â[b, i, j] · xs[b, j, :]
  with Â recomputed per tile.

Normalisation identity used by the caller (``gcn_forward_fused``):
``D^{-1/2} A D^{-1/2} X = D^{-1/2} · aggregate(coords, D^{-1/2} ⊙ X)``.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metagenomic_deepfri_tpu.ops.cmap_align import _SENTINEL_BASE

_LANE = 128


def _choose_tile(L: int) -> int:
    for t in (256, 128):
        if L % t == 0:
            return t
    raise ValueError(f"L={L} must be a multiple of 128 for the fused kernel")


def _pad_axis(x, axis: int, size: int):
    """Zero-pad one axis up to ``size`` (no-op when already there)."""
    if x.shape[axis] == size:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, size - x.shape[axis])
    return jnp.pad(x, widths)


def _round_up(n: int, mult: int) -> int:
    return -(-n // mult) * mult


# Channel layout of the kernel-internal packed coords buffer:
# [0:3] = CA coords, [3] = insertion flag, [4:8] = zero padding.
_INS_CHANNEL = 3


def _pack_coords_ins(coords, ins_mask):
    """(B, L, 8) float32: coords in [0:3], insertion flag in [3].

    One VMEM-resident buffer instead of a separate (B, L) mask input, whose
    (1, L) block shape the Mosaic lowering rejects (sublane dim 1 < 8).
    """
    B, L, C = coords.shape
    return jnp.concatenate(
        [coords.astype(jnp.float32),
         ins_mask.astype(jnp.float32)[..., None],
         jnp.zeros((B, L, 8 - C - 1), jnp.float32)], axis=-1)


def _adjacency_tile(rows, cols, row_ids, col_ids, n,
                    threshold: float, generated_contacts: int):
    """(T, T) float32 tile of the aligned contact map, computed in VMEM.

    ``rows``/``cols`` are (T, 8) packed coords+insertion-flag tiles. Mask
    semantics mirror ``aligned_contacts_from_coords`` exactly: contacts among
    real (non-sentinel) positions, OR identity, OR insertion band, AND valid
    (< length) rows/cols. The distance uses only channels 0:3 (the insertion
    flag lives in channel 3 and never enters the geometry).
    """
    T = rows.shape[0]
    # Exact f32 difference form per axis — matches the reference kernel's
    # accumulation bit-for-bit; the Gram/MXU identity would run at reduced
    # f32 matmul precision on TPU and flip near-threshold contacts.
    dist = jnp.zeros((T, T), jnp.float32)
    for k in range(3):
        d = rows[:, k][:, None] - cols[:, k][None, :]
        dist = dist + d * d
    contact = dist < threshold * threshold

    real_r = (rows[:, 0] < _SENTINEL_BASE * 0.5)[:, None]
    real_c = (cols[:, 0] < _SENTINEL_BASE * 0.5)[None, :]
    contact = contact & real_r & real_c

    eye = row_ids == col_ids
    offset = jnp.abs(row_ids - col_ids)
    band = (offset > 0) & (offset <= generated_contacts)
    ins_r = rows[:, _INS_CHANNEL] > 0.5
    ins_c = cols[:, _INS_CHANNEL] > 0.5
    ins_pairs = band & (ins_r[:, None] | ins_c[None, :])

    valid = (row_ids < n) & (col_ids < n)
    return jnp.where((contact | eye | ins_pairs) & valid, 1.0, 0.0)


def _make_ids(i, j, T):
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0) + i * T
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1) + j * T
    return row_ids, col_ids


@partial(jax.jit,
         static_argnames=("threshold", "generated_contacts", "interpret"))
def contact_degrees(coords: jnp.ndarray, ins_mask: jnp.ndarray,
                    lengths: jnp.ndarray, threshold: float = 6.0,
                    generated_contacts: int = 2,
                    interpret: bool = False) -> jnp.ndarray:
    """Row degrees of the masked aligned adjacency: (B, L) float32.

    Any L is accepted: non-128-multiples are zero-padded internally (padded
    rows are invalidated by the length prefetch, so their degree is 0) and
    the result sliced back.
    """
    B, L, C = coords.shape
    Lp = _round_up(L, _LANE)
    coords = _pad_axis(coords.astype(jnp.float32), 1, Lp)
    ins_mask = _pad_axis(ins_mask.astype(jnp.float32), 1, Lp)
    T = _choose_tile(Lp)
    packed = _pack_coords_ins(coords, ins_mask)

    def kernel(len_sref, coords_ref, deg_ref):
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        n = len_sref[b]
        rows = coords_ref[0, pl.ds(i * T, T), :]
        cols = coords_ref[0, pl.ds(j * T, T), :]
        row_ids, col_ids = _make_ids(i, j, T)
        adj = _adjacency_tile(rows, cols, row_ids, col_ids, n,
                              threshold, generated_contacts)
        partial_deg = jnp.sum(adj, axis=1, keepdims=True)

        @pl.when(j == 0)
        def _():
            deg_ref[0] = jnp.zeros((T, 1), jnp.float32)

        deg_ref[0] += partial_deg

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Lp // T, Lp // T),
        in_specs=[
            pl.BlockSpec((1, Lp, 8), lambda b, i, j, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, 1), lambda b, i, j, *_: (b, i, 0),
                               memory_space=pltpu.VMEM),
    )
    deg = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Lp, 1), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(lengths.astype(jnp.int32), packed)
    return deg[:, :L, 0]


@partial(jax.jit,
         static_argnames=("threshold", "generated_contacts", "interpret",
                          "compute_dtype"))
def graphconv_aggregate(coords: jnp.ndarray, ins_mask: jnp.ndarray,
                        lengths: jnp.ndarray, xs: jnp.ndarray,
                        threshold: float = 6.0,
                        generated_contacts: int = 2,
                        interpret: bool = False,
                        compute_dtype: str = "float32") -> jnp.ndarray:
    """out[b, i, :] = Σ_j Â[b, i, j] · xs[b, j, :], Â recomputed per tile.

    Args:
        coords: (B, L, 3) projected CA coords (sentinels for unmapped).
        ins_mask: (B, L) bool/float insertion positions.
        lengths: (B,) int32.
        xs: (B, L, D) node features (already degree-scaled by the caller for
            symmetric normalisation). Any D/L — non-lane-aligned shapes are
            zero-padded internally and sliced back.

    Returns:
        (B, L, D) float32 aggregated features.
    """
    B, L, C = coords.shape
    D = xs.shape[-1]
    # Mosaic needs lane-aligned feature blocks and 128-multiple node tiles;
    # pad both internally (zero feature columns / invalid rows contribute
    # exactly zero) and slice back — no silent XLA fallback.
    Dp = _round_up(D, _LANE)
    Lp = _round_up(L, _LANE)
    xs = _pad_axis(_pad_axis(xs, 2, Dp), 1, Lp)
    coords = _pad_axis(coords.astype(jnp.float32), 1, Lp)
    ins_mask = _pad_axis(ins_mask.astype(jnp.float32), 1, Lp)
    T = _choose_tile(Lp)
    packed = _pack_coords_ins(coords, ins_mask)

    def kernel(len_sref, coords_ref, xs_ref, out_ref):
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        n = len_sref[b]
        rows = coords_ref[0, pl.ds(i * T, T), :]
        cols = coords_ref[0, pl.ds(j * T, T), :]
        row_ids, col_ids = _make_ids(i, j, T)
        adj = _adjacency_tile(rows, cols, row_ids, col_ids, n,
                              threshold, generated_contacts)
        # {0,1} adjacency is exact in bfloat16; the dot accumulates in f32,
        # so bf16 compute here costs only the rounding of xs itself — the
        # same rounding the XLA bf16 path applies (MXU runs bf16 at 4× f32).
        cdt = jnp.dtype(compute_dtype)
        contrib = jnp.dot(adj.astype(cdt), xs_ref[0].astype(cdt),
                          preferred_element_type=jnp.float32)

        @pl.when(j == 0)
        def _():
            out_ref[0] = jnp.zeros((T, Dp), jnp.float32)

        out_ref[0] += contrib

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Lp // T, Lp // T),
        in_specs=[
            pl.BlockSpec((1, Lp, 8), lambda b, i, j, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, Dp), lambda b, i, j, *_: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, Dp), lambda b, i, j, *_: (b, i, 0),
                               memory_space=pltpu.VMEM),
    )
    cost = pl.CostEstimate(
        flops=2 * B * Lp * Lp * (Dp + 8),
        bytes_accessed=B * (Lp * 8 * 4 + (Lp // T) * Lp * Dp * 4
                            + Lp * Dp * 4),
        transcendentals=0,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Lp, Dp), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=cost,
        interpret=interpret,
    )(lengths.astype(jnp.int32), packed, xs)
    return out[:, :L, :D]


def normalized_aggregate(coords, ins_mask, lengths, x,
                         threshold: float = 6.0, generated_contacts: int = 2,
                         adj_norm: str = "sym", interpret: bool = False,
                         degrees: jnp.ndarray | None = None,
                         compute_dtype: str = "float32"):
    """Â·x with degree normalisation, fused (no HBM adjacency).

    ``degrees`` may be passed in to amortise the degree pass across the
    GraphConv stack (the adjacency is layer-invariant). Semantics match
    ``normalize_adjacency(aligned_contacts_from_coords(...)) @ x``.
    """
    if degrees is None:
        degrees = contact_degrees(coords, ins_mask, lengths,
                                  threshold=threshold,
                                  generated_contacts=generated_contacts,
                                  interpret=interpret)
    if adj_norm == "none":
        return graphconv_aggregate(coords, ins_mask, lengths, x,
                                   threshold=threshold,
                                   generated_contacts=generated_contacts,
                                   interpret=interpret,
                                   compute_dtype=compute_dtype), degrees
    inv_sqrt = jnp.where(degrees > 0,
                         jax.lax.rsqrt(jnp.maximum(degrees, 1e-12)), 0.0)
    if adj_norm == "sym":
        y = graphconv_aggregate(coords, ins_mask, lengths,
                                x * inv_sqrt[:, :, None],
                                threshold=threshold,
                                generated_contacts=generated_contacts,
                                interpret=interpret,
                                compute_dtype=compute_dtype)
        return y * inv_sqrt[:, :, None], degrees
    if adj_norm == "row":
        inv = jnp.where(degrees > 0, 1.0 / jnp.maximum(degrees, 1e-12), 0.0)
        y = graphconv_aggregate(coords, ins_mask, lengths, x,
                                threshold=threshold,
                                generated_contacts=generated_contacts,
                                interpret=interpret,
                                compute_dtype=compute_dtype)
        return y * inv[:, :, None], degrees
    raise ValueError(f"Unknown adjacency normalisation: {adj_norm}")
