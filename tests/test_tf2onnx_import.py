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

    def test_weights_shadowed_into_graph_inputs(self, tmp_path):
        """Initializers ALSO listed in graph.input (keras2onnx-lineage
        exports) must be filtered to the true runtime inputs — an importer
        that maps every graph input to a runtime input mis-infers roles."""
        params = init_gcn(jax.random.PRNGKey(6), GCN_CFG)
        path = str(tmp_path / "gcn_winputs.onnx")
        export_gcn_tf2onnx_style(params, GCN_CFG, path,
                                 weights_as_inputs=True)
        raw = load_onnx(path)
        # the loader must present exactly the two runtime inputs
        assert [vi.name for vi in raw.inputs] == ["input_1", "input_2"]
        roles = graph_input_roles(raw)
        assert roles == {"A": "input_1", "S": "input_2"}
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


def _randomize_biases(params, seed=11):
    """Replace zero-initialised biases with random values so a discarded
    bias cannot silently pass parity."""
    rng = np.random.default_rng(seed)
    import jax.numpy as jnp

    def walk(node):
        if isinstance(node, dict):
            return {k: (jnp.asarray(rng.normal(size=v.shape)
                                    .astype(np.float32))
                        if k == "bias" else walk(v))
                    for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)


class TestBiasCompleteImport:
    def test_gc_and_lm_embed_biases_consumed(self, tmp_path):
        """GraphConv + LM-embedding biases (non-zero!) must be imported, not
        discarded — score/logit parity is the proof."""
        params = _randomize_biases(init_gcn(jax.random.PRNGKey(9), GCN_CFG,
                                            gc_bias=True,
                                            lm_embed_bias=True))
        path = str(tmp_path / "gcn_bias.onnx")
        export_gcn_tf2onnx_style(params, GCN_CFG, path)

        imported, inferred = _gcn_parity(params, GCN_CFG, path)
        assert all("bias" in layer for layer in imported["gc"])
        assert "bias" in imported["lm_embed"]
        # bit-exact round trip against the source tree
        seq, cmap = _random_protein(13)
        orig = np.asarray(forward_pass_single(params, GCN_CFG, seq, cmap))
        rt = np.asarray(forward_pass_single(imported, inferred, seq, cmap))
        np.testing.assert_allclose(rt, orig, rtol=1e-5, atol=1e-6)

    def test_biasless_layers_get_no_zero_fill(self, tmp_path):
        """A graph without GraphConv/LM biases imports WITHOUT bias keys
        (never a silent zero-fill)."""
        params = init_gcn(jax.random.PRNGKey(10), GCN_CFG)
        path = str(tmp_path / "gcn_nobias.onnx")
        export_gcn_tf2onnx_style(params, GCN_CFG, path)
        imported, _ = _gcn_parity(params, GCN_CFG, path)
        assert all("bias" not in layer for layer in imported["gc"])
        assert "bias" not in imported["lm_embed"]
        assert all("bias" in layer for layer in imported["fc"])

    def test_concat_embedding_merge_rejected(self, tmp_path):
        """The unsupported concatenation embedding merge must fail loudly at
        config inference, not import garbage."""
        params = init_gcn(jax.random.PRNGKey(11), GCN_CFG)
        path = str(tmp_path / "gcn_concat.onnx")
        export_gcn_tf2onnx_style(params, GCN_CFG, path,
                                 embed_merge="concat")
        graph = normalize_graph(load_onnx(path))
        with pytest.raises(ValueError, match="[Cc]oncat"):
            infer_gcn_config(graph, n_labels=GCN_CFG.n_labels)

    def test_mean_pool_detected_and_imported(self, tmp_path):
        """A ReduceMean-pooled variant is detected (config.pool='mean') and
        achieves parity (batched mean uses true lengths, not padded L)."""
        from dataclasses import replace

        cfg = replace(GCN_CFG, pool="mean")
        params = init_gcn(jax.random.PRNGKey(12), cfg)
        path = str(tmp_path / "gcn_mean.onnx")
        export_gcn_tf2onnx_style(params, cfg, path)
        graph = normalize_graph(load_onnx(path))
        inferred = infer_gcn_config(graph, n_labels=cfg.n_labels)
        assert inferred.pool == "mean"
        _gcn_parity(params, cfg, path)

    def test_unconsumed_bias_raises(self, tmp_path):
        """An initializer-backed Add bias the importer cannot map (here:
        added to the pooled vector) must abort the import."""
        from metagenomic_deepfri_tpu.models.onnx_reader import OnnxNode

        params = init_gcn(jax.random.PRNGKey(14), GCN_CFG)
        path = str(tmp_path / "gcn_rogue.onnx")
        export_gcn_tf2onnx_style(params, GCN_CFG, path)
        graph = normalize_graph(load_onnx(path))
        inferred = infer_gcn_config(graph, n_labels=GCN_CFG.n_labels)

        # the only ReduceSum in the adj_norm='none' fixture is the pooling
        pool_node = next(n for n in graph.nodes
                         if n.op_type == "ReduceSum")
        pooled = pool_node.outputs[0]
        rogue = f"{pooled}_rogue"
        graph.initializers["rogue_bias"] = np.ones(
            sum(GCN_CFG.gc_dims), np.float32)
        for node in graph.nodes:
            node.inputs = [rogue if i == pooled else i
                           for i in node.inputs]
        idx = graph.nodes.index(pool_node)
        graph.nodes.insert(idx + 1, OnnxNode(
            "Add", [pooled, "rogue_bias"], [rogue], "rogue_add"))
        with pytest.raises(ValueError, match="bias"):
            import_gcn_params(graph, inferred)

    def test_bidirectional_as_reversed_pair(self, tmp_path):
        """tf2onnx's third Bidirectional lowering — backward branch as a
        forward LSTM over ReverseSequence'd input — must merge into one
        bidirectional layer and import bit-exactly."""
        params = init_gcn(jax.random.PRNGKey(15), GCN_CFG)
        path = str(tmp_path / "gcn_revseq.onnx")
        export_gcn_tf2onnx_style(params, GCN_CFG, path,
                                 bidir_as_revseq=True)
        raw = load_onnx(path)
        lstm = [n for n in raw.nodes if n.op_type == "LSTM"]
        assert len(lstm) == 2 * GCN_CFG.lm_layers
        assert all(n.attributes.get("direction", b"forward") == b"forward"
                   for n in lstm)
        graph = normalize_graph(load_onnx(path))
        assert len(collect_lstm_layers(graph)) == GCN_CFG.lm_layers

        imported, inferred = _gcn_parity(params, GCN_CFG, path)
        seq, cmap = _random_protein(16)
        orig = np.asarray(forward_pass_single(params, GCN_CFG, seq, cmap))
        rt = np.asarray(forward_pass_single(imported, inferred, seq, cmap))
        np.testing.assert_allclose(rt, orig, rtol=1e-5, atol=1e-6)


class TestGemmOrientation:
    def test_square_kernel_as_gemm_input_a(self):
        """A square 2-D initializer fed as Gemm input A (y = W @ x) must be
        stored transposed to read (in, out) relative to the data operand."""
        from metagenomic_deepfri_tpu.models.onnx_import import \
            _topo_matmul_weights
        from metagenomic_deepfri_tpu.models.onnx_reader import (OnnxGraph,
                                                                OnnxNode,
                                                                OnnxValueInfo)

        W = np.arange(9, dtype=np.float32).reshape(3, 3)
        for transA, expect in ((0, W.T), (1, W)):
            graph = OnnxGraph(
                nodes=[OnnxNode("Gemm", ["W", "x"], ["y"], "g",
                                {"transA": transA} if transA else {})],
                initializers={"W": W},
                inputs=[OnnxValueInfo("x", 1, [3, 2])],
                outputs=[OnnxValueInfo("y", 1, [3, 2])])
            entries = _topo_matmul_weights(graph)
            assert len(entries) == 1
            np.testing.assert_array_equal(entries[0][1], expect)


class TestStageLocalisation:
    def test_divergence_pinned_to_first_bad_stage(self, tmp_path):
        """Corrupting the second GraphConv kernel after import must show
        clean embed/gc0 stages and divergence from gc1 onward."""
        import jax.numpy as jnp

        from metagenomic_deepfri_tpu.models.registry import load_model_handle
        from metagenomic_deepfri_tpu.parity import localize_divergence

        params = init_gcn(jax.random.PRNGKey(17), GCN_CFG)
        path = tmp_path / "gcn_mf.onnx"
        export_gcn_tf2onnx_style(params, GCN_CFG, str(path))
        pj = tmp_path / "gcn_mf_model_params.json"
        with open(pj, "w") as f:
            json.dump({"goterms": [f"GO:{i}" for i in range(5)],
                       "gonames": [f"t{i}" for i in range(5)]}, f)
        handle = load_model_handle("gcn", "mf", path, pj)
        handle.params["gc"][1]["kernel"] = \
            handle.params["gc"][1]["kernel"] + jnp.float32(0.5)

        seq, cmap = _random_protein(21, L=24)
        report = dict(localize_divergence("gcn", handle, path, seq, cmap,
                                          tolerance=1e-4))
        assert report["embed"] < 1e-4
        assert report["gc0"] < 1e-4
        assert report["gc1"] > 1e-2
        assert report["logits"] > 1e-2


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
            # the sharp oracle: scaled pre-softmax logit agreement, immune
            # to the 0/1 score saturation of random weights
            assert res.max_logit_diff <= 1e-5, (res.net, res.max_logit_diff)

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
