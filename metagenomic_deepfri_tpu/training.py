"""Fine-tuning driver: labelled structures → updated DeepFRI GCN weights.

New capability relative to the reference (inference-only; its models arrive
pre-trained as ONNX, reference ``mDeepFRI/__init__.py:47``). This module is
the user-facing surface over :mod:`.parallel.train`'s mesh-sharded step:

- **data**: a directory of structure files (.pdb/.cif[.gz], one per protein
  — sequence AND contact map both come from the structure) plus a labels TSV
  (``protein<TAB>GO:...;GO:...``). Labels are indexed against the base
  model's ``goterms`` vocabulary; unknown terms warn and drop.
- **batching**: the same length buckets as inference; contact maps built
  once at load with the inference-path kernel (`ops.contact`), so train and
  serve see bit-identical adjacencies.
- **distribution**: any `jax.sharding.Mesh` from :func:`..parallel.make_mesh`
  (DP×TP); defaults to all local devices data-parallel.
- **output**: a native ``.npz`` checkpoint plus an ONNX re-export with the
  model-params JSON, so the fine-tuned model drops straight back into
  ``model_config.json`` / the inference registry.
"""

from __future__ import annotations

import logging
import warnings
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import optax

from metagenomic_deepfri_tpu.batching.buckets import (DEFAULT_BUCKETS,
                                                      bucket_plan)
from metagenomic_deepfri_tpu.ops.contact import calculate_contact_map
from metagenomic_deepfri_tpu.ops.one_hot import seq2tokens

logger = logging.getLogger(__name__)


def load_labels(labels_path, goterms: List[str]) -> Dict[str, np.ndarray]:
    """Parse a ``protein<TAB>term[;term...]`` TSV into multi-hot rows.

    Terms outside the model vocabulary warn once each and are dropped —
    fine-tuning cannot grow the head (the reference's per-model
    ``goterms`` list is fixed at export, reference ``utils.py:371-389``).
    """
    index = {t: i for i, t in enumerate(goterms)}
    unknown = set()
    out: Dict[str, np.ndarray] = {}
    with open(labels_path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split("\t")
            if len(parts) < 2:
                continue
            pid, terms = parts[0], parts[1]
            row = out.setdefault(pid, np.zeros(len(goterms), np.int32))
            for term in terms.replace(",", ";").split(";"):
                term = term.strip()
                if not term:
                    continue
                if term in index:
                    row[index[term]] = 1
                elif term not in unknown:
                    unknown.add(term)
                    warnings.warn(f"Label term {term} not in the model "
                                  "vocabulary; dropped.")
    return out


class FineTuneDataset:
    """Structures + labels → shuffled, bucketed, padded training batches."""

    def __init__(self, structures_dir, labels: Dict[str, np.ndarray],
                 contact_threshold: float = 6.0,
                 buckets=DEFAULT_BUCKETS):
        from metagenomic_deepfri_tpu.data.structures import (
            get_residues_coordinates, load_structure, read_structure_file,
            structure_id_and_type)

        self.buckets = tuple(buckets)
        self.items: List[Tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        structures_dir = Path(structures_dir)
        for f in sorted(structures_dir.iterdir()):
            sid, _ = structure_id_and_type(f.name)
            if sid is None or sid not in labels:
                continue
            try:
                text, ftype = read_structure_file(f)
                table = load_structure(text, filetype=ftype)
                seq, coords = get_residues_coordinates(
                    table, chain=table.chains()[0])
            except (KeyError, ValueError, IndexError) as e:
                warnings.warn(f"Skipping training structure {f.name}: {e}")
                continue
            if not seq:
                continue
            cmap = calculate_contact_map(
                coords, threshold=contact_threshold).astype(np.float32)
            self.items.append((seq2tokens(seq), cmap, labels[sid]))
        if not self.items:
            raise ValueError(
                f"No labelled structures found in {structures_dir}")
        logger.info("Fine-tune dataset: %d labelled structures.",
                    len(self.items))

    def iter_batches(self, batch_size: int, rng: np.random.Generator):
        """Yield (tokens, adjacency, lengths, labels) padded batches.

        Items are shuffled, grouped per length bucket, and partial batches
        repeat earlier items to fill the static shape (standard
        drop-nothing padding for tiny fine-tuning sets).
        """
        order = rng.permutation(len(self.items))
        plan = bucket_plan([self.items[i][0].shape[0] for i in order],
                           self.buckets)
        for bucket in sorted(plan):
            idxs = [order[i] for i in plan[bucket]]
            for start in range(0, len(idxs), batch_size):
                chunk = idxs[start:start + batch_size]
                while len(chunk) < batch_size:  # repeat-fill partial batch
                    chunk = list(chunk) + list(
                        chunk[: batch_size - len(chunk)])
                n = len(chunk)
                n_labels = self.items[0][2].shape[0]
                tokens = np.zeros((n, bucket), np.uint8)
                adj = np.zeros((n, bucket, bucket), np.float32)
                lengths = np.zeros((n,), np.int32)
                labels = np.zeros((n, n_labels), np.int32)
                for j, idx in enumerate(chunk):
                    t, cmap, lab = self.items[idx]
                    L = t.shape[0]
                    tokens[j, :L] = t
                    adj[j, :L, :L] = cmap
                    lengths[j] = L
                    labels[j] = lab
                yield tokens, adj, lengths, labels


def finetune(weights,
             mode: str,
             structures_dir,
             labels_path,
             output_dir,
             epochs: int = 5,
             learning_rate: float = 1e-4,
             batch_size: int = 8,
             contact_threshold: float = 6.0,
             model_parallel: int = 1,
             seed: int = 0,
             log_every: int = 10) -> Path:
    """Fine-tune one mode's GCN; returns the output checkpoint path.

    Loads the base weights through the ONNX registry, trains with the
    mesh-sharded step (:mod:`.parallel.train`), and writes both a native
    ``.npz`` checkpoint and an ONNX re-export + params JSON compatible with
    the inference pipeline's ``model_config.json`` layout.
    """
    from metagenomic_deepfri_tpu.models.onnx_import import export_gcn_to_onnx
    from metagenomic_deepfri_tpu.models.registry import (load_models,
                                                         save_checkpoint)
    from metagenomic_deepfri_tpu.parallel import (init_train_state,
                                                  make_mesh, make_train_step)
    from metagenomic_deepfri_tpu.utils import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    gcn, _, _ = load_models(weights, [mode])
    if mode not in gcn:
        raise ValueError(f"No GCN weights for mode {mode!r} in {weights}")
    handle = gcn[mode]
    config = handle.config
    goterms = handle.goterms or [str(i) for i in range(config.n_labels)]

    labels = load_labels(labels_path, goterms)
    dataset = FineTuneDataset(structures_dir, labels,
                              contact_threshold=contact_threshold)

    mesh = make_mesh(model_parallel=model_parallel)
    dp = mesh.shape["data"]
    if batch_size % dp:
        batch_size += dp - batch_size % dp
    optimizer = optax.adam(learning_rate)
    state = init_train_state(jax.random.PRNGKey(seed), config, optimizer,
                             mesh=mesh, params=handle.params)
    step = make_train_step(mesh, config, optimizer)

    rng = np.random.default_rng(seed)
    step_idx = 0
    last_loss = float("nan")
    for epoch in range(epochs):
        losses = []
        for tokens, adj, lengths, lab in dataset.iter_batches(batch_size,
                                                              rng):
            state, loss = step(state, tokens, adj, lengths, lab)
            losses.append(loss)
            step_idx += 1
            if step_idx % log_every == 0:
                logger.info("step %d: loss %.4f", step_idx, float(loss))
        last_loss = float(np.mean([float(l) for l in losses]))
        logger.info("epoch %d/%d: mean loss %.4f",
                    epoch + 1, epochs, last_loss)

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    params = jax.device_get(state.params)
    ckpt_path = output_dir / f"gcn_{mode}_finetuned.npz"
    save_checkpoint(ckpt_path, config, params)
    onnx_name = (f"DeepFRI-FINETUNED_GraphConv_"
                 f"gcd_{'-'.join(map(str, config.gc_dims))}_"
                 f"fcd_{'-'.join(map(str, config.fc_dims))}_ca_"
                 f"{contact_threshold}_{mode}.onnx")
    onnx_path = output_dir / onnx_name
    export_gcn_to_onnx(params, config, str(onnx_path))
    import json as _json
    with open(output_dir / (onnx_name[:-5] + "_model_params.json"), "w",
              encoding="utf-8") as f:
        _json.dump({"goterms": goterms,
                    "gonames": handle.gonames or [""] * len(goterms)}, f)
    logger.info("Fine-tuned %s: final mean loss %.4f → %s",
                mode, last_loss, ckpt_path)
    return ckpt_path
