"""Edge-partitioned GraphConv aggregation across a device mesh.

The BASELINE north star's graph analogue of sequence parallelism: partition
the packed protein-graph batch's NODE dimension across chips, and compute
each chip's rows of ``Â·X`` while the node features ride a ring of
``ppermute`` exchanges over ICI — local tile contraction overlaps with the
next shard's transfer (XLA schedules the collective-permute asynchronously
against the matmul).

Key design choice: the adjacency is NEVER communicated. Each chip recomputes
its (rows_own × cols_visiting) adjacency block from the *replicated* O(L)
projected CA coordinates (same trick as :mod:`..ops.graphconv_pallas` uses
for HBM) — coordinates are ~3 floats/residue, so replication costs nothing,
while the O(L²) adjacency would dominate ICI traffic. Per ring step a chip
sends/receives only its (B, L/n, D) feature shard: total bytes moved equal a
standard all-gather of X, the minimum any edge partition needs.

The reference has no multi-device execution at all (SURVEY.md §2.3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from metagenomic_deepfri_tpu.ops.cmap_align import _SENTINEL_BASE
from metagenomic_deepfri_tpu.parallel.mesh import MODEL_AXIS


def _contact_block(coords, ins_mask, lengths, r0, c0, Ls: int,
                   threshold: float, generated_contacts: int):
    """(B, Ls, Ls) aligned-adjacency block A[:, r0:r0+Ls, c0:c0+Ls].

    Same semantics as ``aligned_contacts_from_coords`` restricted to a block;
    ``r0``/``c0`` may be traced (shard/ring indices).
    """
    B = coords.shape[0]
    rows = jax.lax.dynamic_slice_in_dim(coords, r0, Ls, axis=1)
    cols = jax.lax.dynamic_slice_in_dim(coords, c0, Ls, axis=1)
    ins_r = jax.lax.dynamic_slice_in_dim(ins_mask, r0, Ls, axis=1)
    ins_c = jax.lax.dynamic_slice_in_dim(ins_mask, c0, Ls, axis=1)

    sq_r = jnp.einsum("blk,blk->bl", rows, rows)
    sq_c = jnp.einsum("blk,blk->bl", cols, cols)
    gram = jnp.einsum("bik,bjk->bij", rows, cols,
                      preferred_element_type=jnp.float32)
    dist = sq_r[:, :, None] + sq_c[:, None, :] - 2.0 * gram
    contact = dist < threshold ** 2

    real_r = rows[:, :, 0] < _SENTINEL_BASE * 0.5
    real_c = cols[:, :, 0] < _SENTINEL_BASE * 0.5
    contact = contact & real_r[:, :, None] & real_c[:, None, :]

    pos = jnp.arange(Ls, dtype=jnp.int32)
    row_ids = (r0 + pos)[None, :, None]
    col_ids = (c0 + pos)[None, None, :]
    eye = row_ids == col_ids
    offset = jnp.abs(row_ids - col_ids)
    band = (offset > 0) & (offset <= generated_contacts)
    ins_pairs = band & (ins_r[:, :, None].astype(bool)
                        | ins_c[:, None, :].astype(bool))

    valid = (row_ids < lengths[:, None, None]) & (
        col_ids < lengths[:, None, None])
    return ((contact | eye | ins_pairs) & valid).astype(jnp.float32)


def make_edge_partitioned_aggregate(mesh: Mesh, L: int, D: int,
                                    threshold: float = 6.0,
                                    generated_contacts: int = 2,
                                    axis: str = MODEL_AXIS):
    """Build a jitted node-sharded aggregation: out = Â(coords)·x.

    Args:
        mesh: device mesh with a named ``axis`` of size n; L % n == 0.
        L, D: full node dimension and feature dimension (static).

    Returns:
        fn(coords (B, L, 3) replicated, ins_mask (B, L) f32 replicated,
           lengths (B,) replicated, x (B, L, D) sharded over ``axis``)
        -> (B, L, D) sharded over ``axis``.
    """
    n = mesh.shape[axis]
    if L % n:
        raise ValueError(f"L={L} not divisible by axis size {n}")
    Ls = L // n

    def local_fn(coords, ins_mask, lengths, x_shard):
        k = jax.lax.axis_index(axis)
        r0 = k * Ls

        def ring_step(step, carry):
            acc, cur = carry
            # whose shard are we holding? ring rotates shards downward:
            # after s steps we hold shard (k + s) mod n.
            src = (k + step) % n
            block = _contact_block(coords, ins_mask, lengths, r0, src * Ls,
                                   Ls, threshold, generated_contacts)
            acc = acc + jnp.einsum("bij,bjd->bid", block, cur,
                                   preferred_element_type=jnp.float32)
            nxt = jax.lax.ppermute(
                cur, axis, perm=[(i, (i - 1) % n) for i in range(n)])
            return acc, nxt

        B = x_shard.shape[0]
        acc = jnp.zeros((B, Ls, D), jnp.float32)
        # mark the carry as device-varying over the ring axis so the scan
        # carry type matches the ppermute-produced output
        acc = jax.lax.pcast(acc, (axis,), to="varying")
        acc, _ = jax.lax.fori_loop(0, n, ring_step, (acc, x_shard))
        return acc

    mapped = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(None, axis, None)),
        out_specs=P(None, axis, None))
    return jax.jit(
        mapped,
        in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P()),
                      NamedSharding(mesh, P()),
                      NamedSharding(mesh, P(None, axis, None))),
        out_shardings=NamedSharding(mesh, P(None, axis, None)))
