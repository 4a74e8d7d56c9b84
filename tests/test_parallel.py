"""Multi-chip sharding tests on a virtual 8-device CPU mesh.

The reference has no distributed execution and therefore no distributed tests
(SURVEY.md §2.3, §4); these are new. conftest.py forces
``--xla_force_host_platform_device_count=8`` on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from metagenomic_deepfri_tpu.models.deepfri import (GCNConfig, gcn_forward,
                                                    init_gcn)
from metagenomic_deepfri_tpu.parallel import (init_train_state, make_mesh,
                                              make_sharded_gcn_forward,
                                              make_train_step)
from metagenomic_deepfri_tpu.parallel.shard import shard_params

TINY = GCNConfig(n_labels=8, lm_hidden=16, lm_layers=1, embed_dim=32,
                 gc_dims=(16, 16), fc_dims=(32,))


def _batch(B=8, L=16, seed=0):
    rng = np.random.default_rng(seed)
    tokens = jnp.asarray(rng.integers(1, 20, (B, L)), dtype=jnp.uint8)
    adj = jnp.tile(jnp.eye(L, dtype=jnp.float32)[None], (B, 1, 1))
    lengths = jnp.full((B,), L, dtype=jnp.int32)
    return tokens, adj, lengths


def test_mesh_shapes():
    mesh = make_mesh(n_devices=8, model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(n_devices=8, model_parallel=3)


def test_sharded_forward_matches_single_device():
    params = init_gcn(jax.random.PRNGKey(0), TINY)
    tokens, adj, lengths = _batch()
    ref = gcn_forward(params, TINY, tokens, adj, lengths)

    mesh = make_mesh(n_devices=8, model_parallel=2)
    sharded_params = shard_params(params, mesh)
    fwd = make_sharded_gcn_forward(mesh, TINY, params)
    out = fwd(sharded_params, tokens, adj, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_train_step_runs_and_descends():
    import optax

    mesh = make_mesh(n_devices=8, model_parallel=2)
    optimizer = optax.adam(1e-2)
    state = init_train_state(jax.random.PRNGKey(0), TINY, optimizer,
                             mesh=mesh)
    step = make_train_step(mesh, TINY, optimizer)

    tokens, adj, lengths = _batch()
    rng = np.random.default_rng(1)
    labels = jnp.asarray(rng.integers(0, 2, (8, TINY.n_labels)),
                         dtype=jnp.int32)
    losses = []
    for _ in range(5):
        state, loss = step(state, tokens, adj, lengths, labels)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert int(state.step) == 5


def test_dryrun_multichip_entry():
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


class TestEdgePartitionedAggregate:
    def test_matches_dense(self):
        from metagenomic_deepfri_tpu.ops.cmap_align import \
            aligned_contacts_from_coords
        from metagenomic_deepfri_tpu.parallel.graph_shard import \
            make_edge_partitioned_aggregate

        B, L, D = 2, 64, 16
        rng = np.random.default_rng(9)
        coords = np.zeros((B, L, 3), np.float32)
        lengths = np.array([L, L - 10], np.int32)
        for b in range(B):
            n = lengths[b]
            steps = rng.normal(size=(n, 3)).astype(np.float32)
            steps /= np.linalg.norm(steps, axis=1, keepdims=True) + 1e-9
            coords[b, :n] = np.cumsum(3.8 * steps, axis=0)
        ins = np.zeros((B, L), np.float32)
        ins[0, 5] = 1.0
        x = rng.normal(size=(B, L, D)).astype(np.float32)

        cd, insd = jnp.asarray(coords), jnp.asarray(ins)
        ld, xd = jnp.asarray(lengths), jnp.asarray(x)
        adj = aligned_contacts_from_coords(cd, insd > 0.5, ld)
        ref = jnp.einsum("bij,bjd->bid", adj, xd,
                         preferred_element_type=jnp.float32)

        mesh = make_mesh(n_devices=8, model_parallel=8,
                         axis_names=("data", "model"))
        fn = make_edge_partitioned_aggregate(mesh, L, D)
        out = fn(cd, insd, ld, xd)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)


def test_pod_mesh_single_host():
    from metagenomic_deepfri_tpu.parallel.mesh import make_pod_mesh

    mesh = make_pod_mesh(model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_pod_mesh(model_parallel=1)
    assert mesh.shape == {"data": 8, "model": 1}


class TestGraphShardedForward:
    def test_matches_single_device_forward(self):
        """Full node-sharded GCN forward == replicated gcn_forward."""
        import jax
        import jax.numpy as jnp

        from metagenomic_deepfri_tpu.models.deepfri import (GCNConfig,
                                                            gcn_forward,
                                                            init_gcn)
        from metagenomic_deepfri_tpu.ops.cmap_align import \
            aligned_contacts_from_coords
        from metagenomic_deepfri_tpu.parallel import make_mesh
        from metagenomic_deepfri_tpu.parallel.graph_shard import \
            make_graph_sharded_gcn_forward

        n = jax.device_count()
        mesh = make_mesh(model_parallel=n)
        B, L = 2, 8 * n
        config = GCNConfig(n_labels=6, lm_hidden=8, lm_layers=1,
                           embed_dim=16, gc_dims=(8, 8), fc_dims=(16,),
                           adj_norm="sym")
        params = init_gcn(jax.random.PRNGKey(0), config)
        rng = np.random.default_rng(0)
        tokens = jnp.asarray(rng.integers(1, 20, (B, L)), jnp.uint8)
        coords = jnp.asarray(
            np.cumsum(rng.normal(size=(B, L, 3)) * 2.0, axis=1),
            jnp.float32)
        ins = jnp.asarray(rng.random((B, L)) < 0.2)
        lengths = jnp.asarray([L, L - 5], jnp.int32)

        fwd = make_graph_sharded_gcn_forward(mesh, config, L)
        sharded = np.asarray(fwd(params, tokens, coords, ins, lengths))

        adj = aligned_contacts_from_coords(coords, ins, lengths)
        ref = np.asarray(gcn_forward(params, config, tokens, adj, lengths))
        np.testing.assert_allclose(sharded, ref, atol=1e-5)

    def test_row_norm_variant(self):
        import jax
        import jax.numpy as jnp

        from metagenomic_deepfri_tpu.models.deepfri import (GCNConfig,
                                                            gcn_forward,
                                                            init_gcn)
        from metagenomic_deepfri_tpu.ops.cmap_align import \
            aligned_contacts_from_coords
        from metagenomic_deepfri_tpu.parallel import make_mesh
        from metagenomic_deepfri_tpu.parallel.graph_shard import \
            make_graph_sharded_gcn_forward

        n = jax.device_count()
        mesh = make_mesh(model_parallel=n)
        B, L = 1, 4 * n
        config = GCNConfig(n_labels=4, lm_hidden=8, lm_layers=1,
                           embed_dim=8, gc_dims=(8,), fc_dims=(8,),
                           adj_norm="row")
        params = init_gcn(jax.random.PRNGKey(1), config)
        rng = np.random.default_rng(2)
        tokens = jnp.asarray(rng.integers(1, 20, (B, L)), jnp.uint8)
        coords = jnp.asarray(
            np.cumsum(rng.normal(size=(B, L, 3)) * 2.0, axis=1), jnp.float32)
        ins = jnp.zeros((B, L), bool)
        lengths = jnp.asarray([L], jnp.int32)

        fwd = make_graph_sharded_gcn_forward(mesh, config, L)
        sharded = np.asarray(fwd(params, tokens, coords, ins, lengths))
        adj = aligned_contacts_from_coords(coords, ins, lengths)
        ref = np.asarray(gcn_forward(params, config, tokens, adj, lengths))
        np.testing.assert_allclose(sharded, ref, atol=1e-5)
