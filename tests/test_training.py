"""Fine-tuning surface tests: labels, dataset, training loop, re-export."""

import json

import numpy as np
import pytest

import jax

from metagenomic_deepfri_tpu.data.structures import write_ca_pdb
from metagenomic_deepfri_tpu.models.deepfri import GCNConfig, init_gcn
from metagenomic_deepfri_tpu.models.onnx_import import export_gcn_to_onnx
from metagenomic_deepfri_tpu.training import (FineTuneDataset, finetune,
                                              load_labels)

N_LABELS = 4
GOTERMS = [f"GO:000000{i}" for i in range(N_LABELS)]
CFG = GCNConfig(n_labels=N_LABELS, lm_hidden=8, lm_layers=1, embed_dim=16,
                gc_dims=(8,), fc_dims=(16,), adj_norm="none")

RNG = np.random.default_rng(9)
AAS = list("ACDEFGHIKLMNPQRSTVWY")


def _walk(n):
    steps = RNG.normal(size=(n, 3)).astype(np.float32)
    steps /= np.linalg.norm(steps, axis=1, keepdims=True) + 1e-9
    return np.cumsum(3.8 * steps, axis=0).astype(np.float32)


@pytest.fixture()
def corpus(tmp_path):
    structures = tmp_path / "structs"
    structures.mkdir()
    lines = []
    for i in range(6):
        sid = f"p{i}"
        seq = "".join(RNG.choice(AAS, size=30 + 5 * i))
        write_ca_pdb(structures / f"{sid}.pdb", seq, _walk(len(seq)))
        terms = ";".join(RNG.choice(GOTERMS, size=2, replace=False))
        lines.append(f"{sid}\t{terms}")
    labels = tmp_path / "labels.tsv"
    labels.write_text("# comment\n" + "\n".join(lines) + "\n")
    return structures, labels


class TestLabels:
    def test_load_and_unknown_term_drops(self, tmp_path):
        p = tmp_path / "l.tsv"
        p.write_text("a\tGO:0000001;GO:9999999\nb\tGO:0000000,GO:0000002\n")
        with pytest.warns(UserWarning, match="GO:9999999"):
            rows = load_labels(p, GOTERMS)
        assert rows["a"].tolist() == [0, 1, 0, 0]
        assert rows["b"].tolist() == [1, 0, 1, 0]


class TestDataset:
    def test_batches_shapes(self, corpus):
        structures, labels_path = corpus
        labels = load_labels(labels_path, GOTERMS)
        ds = FineTuneDataset(structures, labels)
        assert len(ds.items) == 6
        batches = list(ds.iter_batches(4, np.random.default_rng(0)))
        assert batches
        for tokens, adj, lengths, lab in batches:
            B, L = tokens.shape
            assert B == 4
            assert adj.shape == (B, L, L)
            assert lab.shape == (B, N_LABELS)
            assert (lengths > 0).all()
            # diagonal self-contacts present within lengths
            for j in range(B):
                assert adj[j, 0, 0] == 1.0


class TestFinetune:
    def test_loss_decreases_and_reexports(self, corpus, tmp_path):
        structures, labels_path = corpus
        weights = tmp_path / "weights"
        weights.mkdir()
        name = "DeepFRI-MERGED_GraphConv_gcd_8_fcd_16_ca_10.0_mf.onnx"
        export_gcn_to_onnx(init_gcn(jax.random.PRNGKey(0), CFG), CFG,
                           str(weights / name))
        with open(weights / (name[:-5] + "_model_params.json"), "w") as f:
            json.dump({"goterms": GOTERMS, "gonames": ["t"] * N_LABELS}, f)
        # minimal single-mode config (bypasses generate_config_json's
        # all-modes requirement)
        with open(weights / "model_config.json", "w") as f:
            json.dump({"gcn": {"mf": str(weights / name)}, "cnn": {},
                       "version": "1.0"}, f)

        from metagenomic_deepfri_tpu.parallel.train import (gcn_loss,
                                                            init_train_state)
        from metagenomic_deepfri_tpu.models.registry import load_models

        out = tmp_path / "out"
        ckpt = finetune(weights, "mf", structures, labels_path, out,
                        epochs=12, learning_rate=3e-3, batch_size=4)
        assert ckpt.exists()

        # the exported ONNX + params JSON load back through the registry
        exported = list(out.glob("*.onnx"))
        assert len(exported) == 1
        with open(out / "model_config.json", "w") as f:
            json.dump({"gcn": {"mf": str(exported[0])}, "cnn": {},
                       "version": "1.0"}, f)
        gcn_ft, _, _ = load_models(out, ["mf"])
        assert gcn_ft["mf"].goterms == GOTERMS

        # fine-tuning moved the loss: compare base vs tuned on the data
        labels = load_labels(labels_path, GOTERMS)
        ds = FineTuneDataset(structures, labels)
        tokens, adj, lengths, lab = next(
            ds.iter_batches(6, np.random.default_rng(1)))
        base_gcn, _, _ = load_models(weights, ["mf"])
        base_loss = float(gcn_loss(base_gcn["mf"].params, CFG, tokens, adj,
                                   lengths, lab))
        tuned_loss = float(gcn_loss(gcn_ft["mf"].params, CFG, tokens, adj,
                                    lengths, lab))
        assert tuned_loss < base_loss
