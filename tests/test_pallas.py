"""Pallas fused GraphConv kernels vs the XLA dense reference (interpret mode).

The kernels recompute adjacency tiles in VMEM from projected coordinates;
these tests pin them to the dense path:
``normalize_adjacency(aligned_contacts_from_coords(...)) @ x``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from metagenomic_deepfri_tpu.models.deepfri import (GCNConfig,
                                                    gcn_forward,
                                                    gcn_forward_fused,
                                                    init_gcn,
                                                    normalize_adjacency)
from metagenomic_deepfri_tpu.ops.cmap_align import \
    aligned_contacts_from_coords
from metagenomic_deepfri_tpu.ops.graphconv_pallas import (contact_degrees,
                                                          graphconv_aggregate)


def _mk_batch(B=2, L=128, seed=0, n_ins=3):
    rng = np.random.default_rng(seed)
    coords = np.zeros((B, L, 3), np.float32)
    ins = np.zeros((B, L), bool)
    lengths = rng.integers(L // 2, L + 1, size=B).astype(np.int32)
    for b in range(B):
        n = lengths[b]
        steps = rng.normal(size=(n, 3)).astype(np.float32)
        steps /= np.linalg.norm(steps, axis=1, keepdims=True) + 1e-9
        coords[b, :n] = np.cumsum(3.8 * steps, axis=0)
        # a few unmapped positions get sentinel coords
        unmapped = rng.choice(n, size=2, replace=False)
        coords[b, unmapped] = 0.0
        coords[b, unmapped, 0] = 1.0e6 + 1.0e3 * unmapped
        ins[b, rng.choice(n, size=n_ins, replace=False)] = True
    return (jnp.asarray(coords), jnp.asarray(ins),
            jnp.asarray(lengths))


class TestDegrees:
    def test_matches_dense(self):
        coords, ins, lengths = _mk_batch()
        adj = aligned_contacts_from_coords(coords, ins, lengths)
        ref = jnp.sum(adj, axis=-1)
        deg = contact_degrees(coords, ins, lengths, interpret=True)
        np.testing.assert_allclose(np.asarray(deg), np.asarray(ref),
                                   rtol=0, atol=0)


class TestAggregate:
    def test_matches_dense_matmul(self):
        coords, ins, lengths = _mk_batch(seed=1)
        B, L, _ = coords.shape
        D = 128
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
        adj = aligned_contacts_from_coords(coords, ins, lengths)
        ref = jnp.einsum("bij,bjd->bid", adj, x,
                         preferred_element_type=jnp.float32)
        out = graphconv_aggregate(coords, ins, lengths, x, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)

    def test_tile_256(self):
        coords, ins, lengths = _mk_batch(B=1, L=256, seed=2)
        D = 128
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.normal(size=(1, 256, D)).astype(np.float32))
        adj = aligned_contacts_from_coords(coords, ins, lengths)
        ref = jnp.einsum("bij,bjd->bid", adj, x)
        out = graphconv_aggregate(coords, ins, lengths, x, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)


class TestInternalPadding:
    """Non-lane-aligned L and D must pad internally, not fall back or raise
    (the old behavior silently abandoned the kernel for L%256!=0 / D%128!=0)."""

    def test_unaligned_length(self):
        coords, ins, lengths = _mk_batch(B=2, L=130, seed=4)
        adj = aligned_contacts_from_coords(coords, ins, lengths)
        ref = jnp.sum(adj, axis=-1)
        deg = contact_degrees(coords, ins, lengths, interpret=True)
        assert deg.shape == (2, 130)
        np.testing.assert_allclose(np.asarray(deg), np.asarray(ref),
                                   rtol=0, atol=0)

    def test_unaligned_length_and_features(self):
        coords, ins, lengths = _mk_batch(B=2, L=96, seed=5)
        D = 48
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.normal(size=(2, 96, D)).astype(np.float32))
        adj = aligned_contacts_from_coords(coords, ins, lengths)
        ref = jnp.einsum("bij,bjd->bid", adj, x,
                         preferred_element_type=jnp.float32)
        out = graphconv_aggregate(coords, ins, lengths, x, interpret=True)
        assert out.shape == (2, 96, 48)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)

    def test_contact_map_fused_bucket128(self):
        from metagenomic_deepfri_tpu.ops.contact import (batched_contact_maps,
                                                         contact_map_fused)
        rng = np.random.default_rng(9)
        for L in (128, 130):
            coords = jnp.asarray(
                np.cumsum(rng.normal(size=(2, L, 3)), axis=1)
                .astype(np.float32))
            lengths = jnp.asarray(np.asarray([L, L - 7], np.int32))
            ref = batched_contact_maps(coords, lengths)
            out = contact_map_fused(coords, lengths, interpret=True)
            assert out.shape == ref.shape
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=0, atol=0)


class TestFusedForward:
    def test_matches_dense_forward(self):
        cfg = GCNConfig(n_labels=8, lm_hidden=16, lm_layers=1, embed_dim=128,
                        gc_dims=(128, 128), fc_dims=(32,),
                        compute_dtype="float32")
        params = init_gcn(jax.random.PRNGKey(0), cfg)
        coords, ins, lengths = _mk_batch(seed=3)
        B, L, _ = coords.shape
        rng = np.random.default_rng(7)
        tokens = jnp.asarray(rng.integers(1, 20, (B, L)), dtype=jnp.uint8)

        adj = aligned_contacts_from_coords(coords, ins, lengths)
        ref = gcn_forward(params, cfg, tokens, adj, lengths)
        out = gcn_forward_fused(params, cfg, tokens, coords, ins, lengths,
                                interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
