"""Import robustness against tf2onnx-style graph topology.

The published DeepFRI weights are tf2onnx opset-15 exports (reference
``weight_convert/convert_models2onnx.py:41-45``); these tests drive the full
import pipeline (normalize_graph → infer config → import params) and the
OnnxExecutor oracle on fixture graphs replicating that exporter's pattern —
Keras input names, symbolic dims, Constant/Identity/Cast/Transpose weight
noise, 7-input LSTMs with computed sequence_lens and initial states,
Gemm(transB=1) dense layers, dynamic Reshape targets, and in-graph adjacency
normalisation variants.
"""

import json

import numpy as np
import pytest

import jax

from metagenomic_deepfri_tpu.models.deepfri import (CNNConfig, GCNConfig,
                                                    forward_pass_single,
                                                    init_cnn, init_gcn)
from metagenomic_deepfri_tpu.models.onnx_import import (OnnxExecutor,
                                                        collect_lstm_layers,
                                                        graph_input_roles,
                                                        import_cnn_params,
                                                        import_gcn_params,
                                                        normalize_graph)
from metagenomic_deepfri_tpu.models.onnx_reader import load_onnx
from metagenomic_deepfri_tpu.models.registry import (detect_adj_norm,
                                                     infer_cnn_config,
                                                     infer_gcn_config,
                                                     load_model_handle)
from metagenomic_deepfri_tpu.models.tf2onnx_fixture import (
    export_cnn_tf2onnx_style, export_gcn_tf2onnx_style)
from metagenomic_deepfri_tpu.ops.one_hot import seq2onehot

GCN_CFG = GCNConfig(n_labels=5, lm_hidden=8, lm_layers=2, embed_dim=16,
                    gc_dims=(8, 12), fc_dims=(16,), adj_norm="none",
                    lm_bidirectional=True)
CNN_CFG = CNNConfig(n_labels=4, conv_filters=6, conv_kernels=(3, 5),
                    fc_dims=(10,))


def _random_protein(seed, L=18):
    rng = np.random.default_rng(seed)
    seq = "".join(rng.choice(list("ACDEFGHIKLMNPQRSTVWY"), size=L))
    cmap = (rng.random((L, L)) < 0.25).astype(np.float32)
    cmap = np.maximum(cmap, cmap.T)
    np.fill_diagonal(cmap, 1.0)
    return seq, cmap


def _gcn_parity(params, config, path, adj_norm="none", n=3):
    """Executor on the RAW graph vs JAX forward of the IMPORTED params."""
    raw = load_onnx(path)
    executor = OnnxExecutor(raw)
    roles = graph_input_roles(raw)
    graph = normalize_graph(load_onnx(path))
    inferred = infer_gcn_config(graph, n_labels=config.n_labels)
    assert inferred.gc_dims == config.gc_dims
    assert inferred.fc_dims == config.fc_dims
    assert inferred.lm_layers == config.lm_layers
    assert inferred.lm_bidirectional == config.lm_bidirectional
    assert inferred.adj_norm == adj_norm
    imported = import_gcn_params(graph, inferred)

    with jax.default_matmul_precision("highest"):
        for seed in range(n):
            seq, cmap = _random_protein(seed)
            (out,) = executor.run({roles["A"]: cmap[None],
                                   roles["S"]: seq2onehot(seq)[None]})
            onnx_scores = out[:, :, 0].reshape(-1)
            jax_scores = np.asarray(
                forward_pass_single(imported, inferred, seq, cmap))
            np.testing.assert_allclose(onnx_scores, jax_scores,
                                       rtol=1e-4, atol=1e-5)
    return imported, inferred


class TestGcnTf2onnxStyle:
    def test_noisy_bidirectional_single_node(self, tmp_path):
        params = init_gcn(jax.random.PRNGKey(0), GCN_CFG)
        path = str(tmp_path / "gcn_mf.onnx")
        export_gcn_tf2onnx_style(params, GCN_CFG, path)

        raw = load_onnx(path)
        # Exporter noise really is present in the fixture.
        ops = {n.op_type for n in raw.nodes}
        assert {"Identity", "Constant", "Cast", "ConstantOfShape",
                "Expand", "Gemm", "Shape"} <= ops
        lstm = [n for n in raw.nodes if n.op_type == "LSTM"]
        assert all(len(n.inputs) == 7 for n in lstm)
        roles = graph_input_roles(raw)
        assert roles["S"] == "input_2"
        assert roles["A"] == "input_1"

        _gcn_parity(params, GCN_CFG, path)

    def test_bidirectional_as_lstm_pair(self, tmp_path):
        """Keras Bidirectional exported as forward+reverse node pairs must
        import identically to the single bidirectional-node form."""
        params = init_gcn(jax.random.PRNGKey(1), GCN_CFG)
        path = str(tmp_path / "gcn_pair.onnx")
        export_gcn_tf2onnx_style(params, GCN_CFG, path, bidir_as_pair=True)

        raw = load_onnx(path)
        lstm = [n for n in raw.nodes if n.op_type == "LSTM"]
        assert len(lstm) == 2 * GCN_CFG.lm_layers  # pair form on disk
        graph = normalize_graph(load_onnx(path))
        assert len(collect_lstm_layers(graph)) == GCN_CFG.lm_layers

        imported, inferred = _gcn_parity(params, GCN_CFG, path)
        # And the merged import reproduces the source params bit-exactly.
        seq, cmap = _random_protein(7)
        orig = np.asarray(forward_pass_single(params, GCN_CFG, seq, cmap))
        rt = np.asarray(forward_pass_single(imported, inferred, seq, cmap))
        np.testing.assert_allclose(rt, orig, rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("norm", ["sym", "row"])
    def test_in_graph_adjacency_normalisation(self, tmp_path, norm):
        params = init_gcn(jax.random.PRNGKey(2), GCN_CFG)
        path = str(tmp_path / f"gcn_{norm}.onnx")
        export_gcn_tf2onnx_style(params, GCN_CFG, path, adj_norm=norm)
        graph = normalize_graph(load_onnx(path))
        assert detect_adj_norm(graph) == norm
        _gcn_parity(params, GCN_CFG, path, adj_norm=norm)

    def test_plain_graph_detects_no_normalisation(self, tmp_path):
        params = init_gcn(jax.random.PRNGKey(3), GCN_CFG)
        path = str(tmp_path / "gcn_plain.onnx")
        export_gcn_tf2onnx_style(params, GCN_CFG, path)
        assert detect_adj_norm(normalize_graph(load_onnx(path))) == "none"


class TestCnnTf2onnxStyle:
    def test_noisy_cnn(self, tmp_path):
        params = init_cnn(jax.random.PRNGKey(4), CNN_CFG)
        path = str(tmp_path / "cnn_mf.onnx")
        export_cnn_tf2onnx_style(params, CNN_CFG, path)

        raw = load_onnx(path)
        executor = OnnxExecutor(raw)
        roles = graph_input_roles(raw)
        assert roles["S"] == "input_1" and roles["A"] is None

        graph = normalize_graph(load_onnx(path))
        inferred = infer_cnn_config(graph, n_labels=CNN_CFG.n_labels)
        assert inferred.conv_kernels == CNN_CFG.conv_kernels
        assert inferred.fc_dims == CNN_CFG.fc_dims
        imported = import_cnn_params(graph, inferred)

        with jax.default_matmul_precision("highest"):
            for seed in range(3):
                seq, _ = _random_protein(seed, L=21)
                (out,) = executor.run({roles["S"]: seq2onehot(seq)[None]})
                onnx_scores = out[:, :, 0].reshape(-1)
                jax_scores = np.asarray(
                    forward_pass_single(imported, inferred, seq))
                np.testing.assert_allclose(onnx_scores, jax_scores,
                                           rtol=1e-4, atol=1e-5)


class TestVerifyWeightsOnFixtureCorpus:
    def test_weights_dir_end_to_end(self, tmp_path):
        """verify-weights (the parity oracle) passes on a weights folder of
        tf2onnx-style graphs — the full load_models surface, not just the
        import helpers."""
        from metagenomic_deepfri_tpu.parity import verify_weights

        gcn_params = init_gcn(jax.random.PRNGKey(5), GCN_CFG)
        cnn_params = init_cnn(jax.random.PRNGKey(6), CNN_CFG)
        export_gcn_tf2onnx_style(gcn_params, GCN_CFG,
                                 str(tmp_path / "gcn_mf.onnx"),
                                 adj_norm="sym")
        export_cnn_tf2onnx_style(cnn_params, CNN_CFG,
                                 str(tmp_path / "cnn_mf.onnx"))
        for stem, n in (("gcn_mf", GCN_CFG.n_labels),
                        ("cnn_mf", CNN_CFG.n_labels)):
            with open(tmp_path / f"{stem}_model_params.json", "w") as f:
                json.dump({"goterms": [f"GO:{i:07d}" for i in range(n)],
                           "gonames": [f"term {i}" for i in range(n)]}, f)
        with open(tmp_path / "model_config.json", "w") as f:
            json.dump({"gcn": {"mf": "gcn_mf.onnx"},
                       "cnn": {"mf": "cnn_mf.onnx"}}, f)

        results = verify_weights(tmp_path, n_proteins=3, tolerance=1e-4)
        assert len(results) == 2
        for res in results:
            assert res.ok, (res.net, res.mode, res.max_abs_diff)

    def test_load_model_handle_normalizes(self, tmp_path):
        """load_model_handle itself must survive the raw noisy graph."""
        params = init_gcn(jax.random.PRNGKey(8), GCN_CFG)
        path = tmp_path / "gcn_bp.onnx"
        export_gcn_tf2onnx_style(params, GCN_CFG, str(path),
                                 bidir_as_pair=True)
        pj = tmp_path / "gcn_bp_model_params.json"
        with open(pj, "w") as f:
            json.dump({"goterms": [f"GO:{i}" for i in range(5)],
                       "gonames": [f"t{i}" for i in range(5)]}, f)
        handle = load_model_handle("gcn", "bp", path, pj)
        assert handle.config.lm_bidirectional
        assert handle.config.gc_dims == GCN_CFG.gc_dims
