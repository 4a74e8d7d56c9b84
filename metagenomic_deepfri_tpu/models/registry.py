"""Model registry: weights folder → device-resident model handles.

Consumes the same artifact layout as the reference (``model_config.json``
naming per-mode ``.onnx`` files plus ``*_model_params.json`` carrying
``goterms``/``gonames`` vocabularies — reference ``utils.py:154-276``,
``pipeline.py:549-552``), but instead of opening ONNX Runtime sessions it
imports the weights into JAX parameter trees (:mod:`.onnx_import`) with
architecture hyperparameters inferred from the graph itself.

Also defines a native checkpoint format (``.npz`` + config JSON) so
fine-tuned models trained with :mod:`metagenomic_deepfri_tpu.parallel.train`
round-trip without ONNX.
"""

from __future__ import annotations

import json
import logging
from dataclasses import asdict
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from metagenomic_deepfri_tpu.batching.engine import ModelHandle
from metagenomic_deepfri_tpu.models.deepfri import CNNConfig, GCNConfig
from metagenomic_deepfri_tpu.models.onnx_import import (import_cnn_params,
                                                        import_gcn_params)
from metagenomic_deepfri_tpu.models.onnx_reader import OnnxGraph, load_onnx
from metagenomic_deepfri_tpu.utils import get_json_values, load_deepfri_config

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Architecture inference from an ONNX graph
# ---------------------------------------------------------------------------

def _matmul_weight_shapes(graph: OnnxGraph) -> List[Tuple[int, int]]:
    shapes = []
    for node in graph.nodes:
        if node.op_type not in ("MatMul", "Gemm"):
            continue
        for i in node.inputs[:2]:
            if i in graph.initializers and graph.initializers[i].ndim == 2:
                shapes.append(tuple(graph.initializers[i].shape))
    return shapes


def infer_gcn_config(graph: OnnxGraph, n_labels: int,
                     vocab: int = 26) -> GCNConfig:
    """Derive GCNConfig hyperparameters from graph structure.

    LM depth/width come from the LSTM nodes; embed_dim from the (vocab, E)
    residue-embedding weight; the GraphConv chain is followed shape-by-shape
    from E; fc dims from the concat width; the head is pinned by
    2·n_labels.
    """
    lstm_nodes = [n for n in graph.nodes if n.op_type == "LSTM"]
    if not lstm_nodes:
        raise ValueError("No LSTM nodes found — not a DeepFRI GCN graph?")
    hidden = graph.initializers[lstm_nodes[0].inputs[2]].shape[-1]
    num_dir = graph.initializers[lstm_nodes[0].inputs[1]].shape[0]
    lm_out = hidden * num_dir
    shapes = _matmul_weight_shapes(graph)

    embed_candidates = [s for s in shapes if s[0] == vocab]
    if not embed_candidates:
        raise ValueError("No residue-embedding weight (26, E) found")
    embed_dim = embed_candidates[0][1]

    pool = [s for s in shapes if s[0] != vocab]
    # remove the LM embedding (lm_out, embed_dim) once
    if (lm_out, embed_dim) in pool:
        pool.remove((lm_out, embed_dim))

    # The weight pool must decompose EXACTLY into
    #   gc chain:  embed → g1 → … → gk          (k ≥ 1)
    #   fc chain:  sum(g1..gk) → f1 → … → fm    (m ≥ 0)
    #   head:      (fm or sum(gc), 2·n_labels)
    # Greedy chain-following is ambiguous (a layer's in_dim can match both
    # "next gc" and "fc entry" — e.g. gc=(8,12): after g1 the cursor 8
    # equals sum so far), so do an exhaustive backtracking search; the pool
    # has ≤ ~8 entries.
    # A chain layer's width may legitimately equal 2·n_labels, so no shape
    # is excluded a priori; the terminal condition (exactly the head left)
    # disambiguates, with backtracking over consumption order.
    def search_fc(pool, cur, fc):
        if len(pool) == 1 and pool[0] == (cur, 2 * n_labels):
            return list(fc)
        for s in list(dict.fromkeys(pool)):
            if s[0] == cur:
                rest = list(pool)
                rest.remove(s)
                r = search_fc(rest, s[1], fc + [s[1]])
                if r is not None:
                    return r
        return None

    def search_gc(pool, cur, gc):
        if gc:
            fc = search_fc(pool, sum(gc), [])
            if fc is not None:
                return list(gc), fc
        for s in list(dict.fromkeys(pool)):
            if s[0] == cur:
                rest = list(pool)
                rest.remove(s)
                r = search_gc(rest, s[1], gc + [s[1]])
                if r is not None:
                    return r
        return None

    resolved = search_gc(pool, embed_dim, [])
    if resolved is None:
        raise ValueError(
            f"Could not decompose GCN weight shapes {pool} into "
            f"gc/fc/head chains from embed_dim={embed_dim}, "
            f"n_labels={n_labels}")
    gc_dims, fc_dims = resolved
    return GCNConfig(n_labels=n_labels, vocab=vocab, lm_hidden=hidden,
                     lm_layers=len(lstm_nodes), embed_dim=embed_dim,
                     lm_bidirectional=num_dir == 2,
                     gc_dims=tuple(gc_dims), fc_dims=tuple(fc_dims),
                     adj_norm=detect_adj_norm(graph))


def detect_adj_norm(graph: OnnxGraph) -> str:
    """Sniff in-graph adjacency normalisation.

    Our exporter (and the published DeepFRI graphs, whose GraphConv consumes
    the cmap as fed) leave A unnormalised; a ReduceSum→(R)Sqrt chain on the
    adjacency input marks symmetric normalisation.
    """
    adj_input = None
    for vi in graph.inputs:
        if len(vi.shape) == 3 and vi.shape[1] == vi.shape[2]:
            adj_input = vi.name
    if adj_input is None:
        return "none"
    consumers = [n for n in graph.nodes if adj_input in n.inputs]
    for node in consumers:
        if node.op_type == "ReduceSum":
            ops = {n.op_type for n in graph.nodes}
            if "Sqrt" in ops or "Rsqrt" in ops:
                return "sym"
            return "row"
    return "none"


def infer_cnn_config(graph: OnnxGraph, n_labels: int,
                     vocab: int = 26) -> CNNConfig:
    conv_nodes = [n for n in graph.nodes if n.op_type == "Conv"]
    if not conv_nodes:
        raise ValueError("No Conv nodes found — not a DeepFRI CNN graph?")
    kernels = []
    filters = None
    for node in conv_nodes:
        w = graph.initializers[node.inputs[1]]
        kernels.append(int(w.shape[-1]))
        filters = int(w.shape[0])
    pool = list(_matmul_weight_shapes(graph))

    def search_fc(pool, cur, fc):
        if len(pool) == 1 and pool[0] == (cur, 2 * n_labels):
            return list(fc)
        for s in list(dict.fromkeys(pool)):
            if s[0] == cur:
                rest = list(pool)
                rest.remove(s)
                r = search_fc(rest, s[1], fc + [s[1]])
                if r is not None:
                    return r
        return None

    fc_dims = search_fc(pool, filters * len(kernels), [])
    if fc_dims is None:
        raise ValueError(
            f"Could not decompose CNN weight shapes {pool} into fc/head "
            f"chains from {filters * len(kernels)}, n_labels={n_labels}")
    return CNNConfig(n_labels=n_labels, vocab=vocab, conv_filters=filters,
                     conv_kernels=tuple(kernels), fc_dims=tuple(fc_dims))


# ---------------------------------------------------------------------------
# Loading
# ---------------------------------------------------------------------------

def load_model_handle(net_type: str, mode: str, model_path,
                      params_json) -> ModelHandle:
    """Load one network (ONNX or native checkpoint) into a ModelHandle."""
    goterms = get_json_values(params_json, "goterms")
    gonames = get_json_values(params_json, "gonames")
    n_labels = len(goterms)
    model_path = str(model_path)
    if model_path.endswith(".npz"):
        config, params = load_checkpoint(model_path)
    else:
        graph = load_onnx(model_path)
        if net_type == "gcn":
            config = infer_gcn_config(graph, n_labels)
            params = import_gcn_params(graph, config)
        else:
            config = infer_cnn_config(graph, n_labels)
            params = import_cnn_params(graph, config)
    return ModelHandle(net_type=net_type, mode=mode, config=config,
                       params=params, goterms=goterms, gonames=gonames)


def load_models(weights_dir,
                modes: List[str]) -> Tuple[Dict[str, ModelHandle],
                                           Dict[str, ModelHandle], dict]:
    """Load every requested mode's GCN + CNN from a weights folder.

    Returns (gcn_handles, cnn_handles, models_config).
    """
    models_config = load_deepfri_config(weights_dir)
    gcn, cnn = {}, {}
    for mode in modes:
        for net, bag in (("gcn", gcn), ("cnn", cnn)):
            if mode not in models_config[net]:
                continue
            model_path = models_config[net][mode]
            params_json = str(Path(model_path).with_suffix("")) + \
                "_model_params.json"
            logger.info("Loading %s/%s from %s", net, mode, model_path)
            bag[mode] = load_model_handle(net, mode, model_path, params_json)
    return gcn, cnn, models_config


# ---------------------------------------------------------------------------
# Native checkpoint format
# ---------------------------------------------------------------------------

def _flatten(params, prefix=""):
    flat = {}
    if isinstance(params, dict):
        for k, v in params.items():
            flat.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            flat.update(_flatten(v, f"{prefix}{i}/"))
    else:
        flat[prefix[:-1]] = np.asarray(params)
    return flat


def _unflatten(flat: dict):
    root: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[k]) for k in sorted(keys, key=int)]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_checkpoint(path, config, params):
    """Save params (+config) as .npz / .json sidecar."""
    flat = _flatten(params)
    np.savez_compressed(path, **flat)
    cfg = dict(asdict(config))
    cfg["__class__"] = type(config).__name__
    with open(str(Path(path).with_suffix("")) + "_config.json", "w",
              encoding="utf-8") as f:
        json.dump(cfg, f, indent=2)


def load_checkpoint(path):
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    params = _unflatten(flat)
    cfg_path = str(Path(path).with_suffix("")) + "_config.json"
    with open(cfg_path, "r", encoding="utf-8") as f:
        cfg = json.load(f)
    cls = {"GCNConfig": GCNConfig, "CNNConfig": CNNConfig}[cfg.pop("__class__")]
    for key in ("gc_dims", "fc_dims", "conv_kernels"):
        if key in cfg:
            cfg[key] = tuple(cfg[key])
    return cls(**cfg), params
