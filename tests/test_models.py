"""Model-core tests: forwards, masking invariance, ONNX round-trip parity.

The ONNX round trip (export our params → parse with our reader → execute
with the oracle → compare to the JAX forward) is the parity harness standing
in for the reference's onnxruntime-vs-TF2 check (reference
``weight_convert/README.md:5-6``) until real weight files are present.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from metagenomic_deepfri_tpu.models.deepfri import (CNNConfig, GCNConfig,
                                                    cnn_forward,
                                                    forward_pass_single,
                                                    gcn_forward, init_cnn,
                                                    init_gcn,
                                                    normalize_adjacency)
from metagenomic_deepfri_tpu.models.onnx_import import (OnnxExecutor,
                                                        export_cnn_to_onnx,
                                                        export_gcn_to_onnx,
                                                        import_cnn_params,
                                                        import_gcn_params,
                                                        infer_n_labels)
from metagenomic_deepfri_tpu.models.onnx_reader import load_onnx
from metagenomic_deepfri_tpu.ops.contact import batched_contact_maps
from metagenomic_deepfri_tpu.ops.one_hot import batch_tokens, seq2onehot

SMALL_GCN = GCNConfig(n_labels=5, lm_hidden=8, lm_layers=2, embed_dim=16,
                      gc_dims=(8, 8), fc_dims=(16,), adj_norm="none")
SMALL_CNN = CNNConfig(n_labels=5, conv_filters=8, conv_kernels=(3, 5),
                      fc_dims=(16,))

SEQS = ["MKVLAT", "MKVLATQRWE", "GGHHEE"]


def _random_cmap(rng, L):
    coords = (rng.normal(size=(L, 3)) * 4).astype(np.float32)
    from metagenomic_deepfri_tpu.ops.contact import calculate_contact_map
    return calculate_contact_map(coords, threshold=6.0).astype(np.float32)


class TestForwards:
    def test_gcn_shapes_and_range(self):
        rng = np.random.default_rng(0)
        params = init_gcn(jax.random.PRNGKey(0), SMALL_GCN)
        tokens, lengths = batch_tokens(SEQS, pad_to=12)
        adj = np.zeros((3, 12, 12), np.float32)
        for i, s in enumerate(SEQS):
            adj[i, :len(s), :len(s)] = _random_cmap(rng, len(s))
        scores = gcn_forward(params, SMALL_GCN, jnp.asarray(tokens),
                             jnp.asarray(adj), jnp.asarray(lengths))
        assert scores.shape == (3, 5)
        s = np.asarray(scores)
        assert (s >= 0).all() and (s <= 1).all()

    def test_cnn_shapes_and_range(self):
        params = init_cnn(jax.random.PRNGKey(1), SMALL_CNN)
        tokens, lengths = batch_tokens(SEQS, pad_to=12)
        scores = cnn_forward(params, SMALL_CNN, jnp.asarray(tokens),
                             jnp.asarray(lengths))
        assert scores.shape == (3, 5)

    def test_gcn_padding_invariance(self):
        """Scores must not depend on how much a protein is padded."""
        rng = np.random.default_rng(3)
        params = init_gcn(jax.random.PRNGKey(2), SMALL_GCN)
        seq = SEQS[0]
        cmap = _random_cmap(rng, len(seq))
        exact = forward_pass_single(params, SMALL_GCN, seq, cmap)

        tokens, lengths = batch_tokens([seq], pad_to=32)
        adj = np.zeros((1, 32, 32), np.float32)
        adj[0, :len(seq), :len(seq)] = cmap
        padded = gcn_forward(params, SMALL_GCN, jnp.asarray(tokens),
                             jnp.asarray(adj), jnp.asarray(lengths))
        np.testing.assert_allclose(np.asarray(padded)[0], np.asarray(exact),
                                   rtol=1e-5, atol=1e-6)

    def test_cnn_padding_invariance(self):
        params = init_cnn(jax.random.PRNGKey(4), SMALL_CNN)
        seq = SEQS[1]
        exact = forward_pass_single(params, SMALL_CNN, seq)
        tokens, lengths = batch_tokens([seq], pad_to=40)
        padded = cnn_forward(params, SMALL_CNN, jnp.asarray(tokens),
                             jnp.asarray(lengths))
        np.testing.assert_allclose(np.asarray(padded)[0], np.asarray(exact),
                                   rtol=1e-5, atol=1e-6)

    def test_adjacency_normalization_safe_on_padding(self):
        adj = np.zeros((1, 4, 4), np.float32)
        adj[0, :2, :2] = np.eye(2)
        out = np.asarray(normalize_adjacency(jnp.asarray(adj), "sym"))
        assert np.isfinite(out).all()
        np.testing.assert_allclose(out[0, :2, :2], np.eye(2), atol=1e-6)


class TestOnnxRoundTrip:
    def test_gcn_export_execute_matches_jax(self, tmp_path):
        rng = np.random.default_rng(5)
        params = init_gcn(jax.random.PRNGKey(5), SMALL_GCN)
        path = str(tmp_path / "gcn.onnx")
        export_gcn_to_onnx(params, SMALL_GCN, path)

        graph = load_onnx(path)
        assert [vi.name for vi in graph.inputs] == ["A", "S"]
        assert infer_n_labels(graph) == 5

        seq = "MKVLATQRWEAD"
        cmap = _random_cmap(rng, len(seq))
        S = seq2onehot(seq)[None]
        A = cmap[None]
        (out,) = OnnxExecutor(graph).run({"A": A, "S": S})
        onnx_scores = out[:, :, 0].reshape(-1)

        jax_scores = np.asarray(
            forward_pass_single(params, SMALL_GCN, seq, cmap))
        np.testing.assert_allclose(onnx_scores, jax_scores, rtol=1e-4,
                                   atol=1e-5)

    def test_gcn_import_roundtrip(self, tmp_path):
        rng = np.random.default_rng(6)
        params = init_gcn(jax.random.PRNGKey(6), SMALL_GCN)
        path = str(tmp_path / "gcn.onnx")
        export_gcn_to_onnx(params, SMALL_GCN, path)
        imported = import_gcn_params(load_onnx(path), SMALL_GCN)

        seq = "MKVLATQRWE"
        cmap = _random_cmap(rng, len(seq))
        orig = np.asarray(forward_pass_single(params, SMALL_GCN, seq, cmap))
        rt = np.asarray(forward_pass_single(imported, SMALL_GCN, seq, cmap))
        np.testing.assert_allclose(rt, orig, rtol=1e-5, atol=1e-6)

    def test_cnn_export_execute_matches_jax(self, tmp_path):
        params = init_cnn(jax.random.PRNGKey(7), SMALL_CNN)
        path = str(tmp_path / "cnn.onnx")
        export_cnn_to_onnx(params, SMALL_CNN, path)
        graph = load_onnx(path)
        assert [vi.name for vi in graph.inputs] == ["S"]

        seq = "MKVLATQRWEADGG"
        S = seq2onehot(seq)[None]
        (out,) = OnnxExecutor(graph).run({"S": S})
        onnx_scores = out[:, :, 0].reshape(-1)
        jax_scores = np.asarray(forward_pass_single(params, SMALL_CNN, seq))
        np.testing.assert_allclose(onnx_scores, jax_scores, rtol=1e-4,
                                   atol=1e-5)

    def test_cnn_import_roundtrip(self, tmp_path):
        params = init_cnn(jax.random.PRNGKey(8), SMALL_CNN)
        path = str(tmp_path / "cnn.onnx")
        export_cnn_to_onnx(params, SMALL_CNN, path)
        imported = import_cnn_params(load_onnx(path), SMALL_CNN)
        seq = "MKVLATQRWE"
        orig = np.asarray(forward_pass_single(params, SMALL_CNN, seq))
        rt = np.asarray(forward_pass_single(imported, SMALL_CNN, seq))
        np.testing.assert_allclose(rt, orig, rtol=1e-5, atol=1e-6)

    def test_gcn_config_inference_ambiguous_chain(self, tmp_path):
        """infer_gcn_config must recover gc/fc dims even when a layer's
        in_dim collides with the concat width (greedy chain-following used
        to stop after gc1 and mis-import gc2 as the head)."""
        from metagenomic_deepfri_tpu.models.registry import infer_gcn_config

        cfg = GCNConfig(n_labels=5, lm_hidden=8, lm_layers=1, embed_dim=16,
                        gc_dims=(8, 12), fc_dims=(16,), adj_norm="none")
        rng = np.random.default_rng(9)
        params = init_gcn(jax.random.PRNGKey(9), cfg)
        path = str(tmp_path / "gcn.onnx")
        export_gcn_to_onnx(params, cfg, path)
        graph = load_onnx(path)
        inferred = infer_gcn_config(graph, n_labels=5)
        assert inferred.gc_dims == (8, 12)
        assert inferred.fc_dims == (16,)

        imported = import_gcn_params(graph, inferred)
        seq = "MKVLATQRWE"
        cmap = _random_cmap(rng, len(seq))
        orig = np.asarray(forward_pass_single(params, cfg, seq, cmap))
        rt = np.asarray(forward_pass_single(imported, inferred, seq, cmap))
        np.testing.assert_allclose(rt, orig, rtol=1e-5, atol=1e-6)

    def test_gcn_config_inference_published_topology(self, tmp_path):
        """The published 512-512-512 + fcd-1024 shape chain must resolve."""
        from metagenomic_deepfri_tpu.models.registry import infer_gcn_config

        cfg = GCNConfig(n_labels=7, lm_hidden=16, lm_layers=2, embed_dim=32,
                        gc_dims=(24, 24, 24), fc_dims=(40,), adj_norm="none")
        params = init_gcn(jax.random.PRNGKey(10), cfg)
        path = str(tmp_path / "gcn512.onnx")
        export_gcn_to_onnx(params, cfg, path)
        inferred = infer_gcn_config(load_onnx(path), n_labels=7)
        assert inferred.gc_dims == (24, 24, 24)
        assert inferred.fc_dims == (40,)
        assert inferred.lm_layers == 2
        assert inferred.lm_hidden == 16


class TestBidirectionalLSTM:
    """JAX bidirectional layer vs the ONNX executor's LSTM evaluation
    (per-protein unpadded runs, the reference execution model)."""

    def _onnx_lstm_ref(self, W, R, B, x_single):
        """Evaluate a bidirectional ONNX LSTM node on one (L, D) input."""
        from metagenomic_deepfri_tpu.models.onnx_import import OnnxExecutor
        from metagenomic_deepfri_tpu.models.onnx_reader import (OnnxGraph,
                                                                OnnxNode,
                                                                OnnxValueInfo)

        L, D = x_single.shape
        H = R.shape[-1]
        node = OnnxNode("LSTM", ["X", "W", "R", "B"], ["Y", "Yh", "Yc"],
                        "lstm", {"hidden_size": H,
                                 "direction": b"bidirectional"})
        graph = OnnxGraph(
            nodes=[node],
            initializers={"W": W, "R": R, "B": B},
            inputs=[OnnxValueInfo("X", 1, [L, 1, D])],
            outputs=[OnnxValueInfo("Y", 1, [L, 2, 1, H])])
        (Y,) = OnnxExecutor(graph).run(
            {"X": x_single[:, None, :].astype(np.float32)})
        # (L, 2, 1, H) → (L, 2H) with [fwd ‖ bwd]
        return np.concatenate([Y[:, 0, 0, :], Y[:, 1, 0, :]], axis=-1)

    def test_padded_batch_matches_unpadded_onnx(self):
        from metagenomic_deepfri_tpu.models.lstm import (
            lstm_bidirectional_forward)
        from metagenomic_deepfri_tpu.models.onnx_import import (
            lstm_params_from_onnx)

        rng = np.random.default_rng(17)
        D, H, Lmax = 6, 5, 12
        W = rng.normal(size=(2, 4 * H, D)).astype(np.float32) * 0.3
        R = rng.normal(size=(2, 4 * H, H)).astype(np.float32) * 0.3
        B = rng.normal(size=(2, 8 * H)).astype(np.float32) * 0.1
        params = lstm_params_from_onnx(W, R, B)
        assert "fwd" in params and "bwd" in params

        lengths = np.array([Lmax, 7], np.int32)
        x = np.zeros((2, Lmax, D), np.float32)
        for b, n in enumerate(lengths):
            x[b, :n] = rng.normal(size=(n, D)).astype(np.float32)

        out = np.asarray(lstm_bidirectional_forward(
            params, jnp.asarray(x), jnp.asarray(lengths)))
        for b, n in enumerate(lengths):
            ref = self._onnx_lstm_ref(W, R, B, x[b, :n])
            np.testing.assert_allclose(out[b, :n], ref, rtol=1e-5, atol=1e-5)

    def test_gcn_with_bidirectional_lm(self):
        """End-to-end GCN forward with a bi-LSTM LM config."""
        cfg = GCNConfig(n_labels=3, lm_hidden=4, lm_layers=2,
                        lm_bidirectional=True, embed_dim=8, gc_dims=(4,),
                        fc_dims=(8,), adj_norm="none")
        params = init_gcn(jax.random.PRNGKey(2), cfg)
        assert "fwd" in params["lm"][0]
        assert params["lm_embed"]["kernel"].shape[0] == 8  # 2H
        L = 10
        tokens = jnp.asarray(
            np.random.default_rng(0).integers(1, 20, (2, L)), dtype=jnp.uint8)
        adj = jnp.tile(jnp.eye(L)[None], (2, 1, 1))
        lengths = jnp.asarray(np.array([10, 6], np.int32))
        out = gcn_forward(params, cfg, tokens, adj, lengths)
        assert out.shape == (2, 3)
        assert np.isfinite(np.asarray(out)).all()
