"""DeepFRI GCN and CNN architectures — functional JAX, batched and masked.

The reference runs these as opaque ONNX graphs, one protein at a time
(reference ``mDeepFRI/predict.pyx:75-102``; I/O contract: GCN takes
``A:(1,L,L) f32`` + ``S:(1,L,26) f32``, CNN takes ``S`` only; output sliced
``[:, :, 0]`` into a flat per-term score vector). Here both networks are
explicit parameter-tree + pure-function pairs operating on padded batches with
length masks, so the whole hot path is one jitted XLA program per length
bucket.

Architecture (from the model-name encoding ``gcd_512-512-512_fcd_1024``,
reference ``mDeepFRI/__init__.py:70-80``, and the DeepFRI publication cited at
reference ``README.md:320-322``):

GCN:   one-hot(26) ─┬─ LSTM-LM stack ── Dense(no bias) ──┐
                    └─ Dense(bias) ──────────────────────┴─ add → ReLU
       → 3 × GraphConv(512, ReLU):  Hₗ₊₁ = relu(Â · Hₗ · Wₗ)
       → concat(H₁‖H₂‖H₃) → masked sum-pool over L
       → Dense(1024, ReLU) → Dense(2·n_labels) → reshape (n_labels, 2)
       → softmax(last) → score = [..., 0]

CNN ("DeepCNN-MERGED"): parallel Conv1D branches (per kernel size) → concat →
       ReLU → masked global max-pool → Dense stack → same two-way-softmax head.

Exact hyperparameters of the published weights (LM depth/width, conv filter
sizes, adjacency normalisation) are config fields resolved by the ONNX
importer when real weights are loaded; the defaults below mirror the model
names and paper. The output contract (per-term softmax, score at class 0) is
fixed by the reference's ``prediction[:, :, 0]`` slice.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp

from metagenomic_deepfri_tpu.models.lstm import (init_lstm_stack,
                                                 lstm_stack_forward)
from metagenomic_deepfri_tpu.ops.one_hot import VOCAB_SIZE, tokens2onehot


# ---------------------------------------------------------------------------
# Configs
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class GCNConfig:
    n_labels: int
    vocab: int = VOCAB_SIZE
    lm_hidden: int = 512
    lm_layers: int = 2
    lm_bidirectional: bool = False
    embed_dim: int = 1024
    gc_dims: Tuple[int, ...] = (512, 512, 512)
    fc_dims: Tuple[int, ...] = (1024,)
    adj_norm: str = "sym"          # 'sym' | 'row' | 'none'
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16'


@dataclass(frozen=True)
class CNNConfig:
    n_labels: int
    vocab: int = VOCAB_SIZE
    conv_filters: int = 512
    conv_kernels: Tuple[int, ...] = (8, 16)
    fc_dims: Tuple[int, ...] = (1024,)
    compute_dtype: str = "float32"


# ---------------------------------------------------------------------------
# Initialisers
# ---------------------------------------------------------------------------

def _dense_init(key, in_dim, out_dim, bias=True, dtype=jnp.float32):
    scale = (6.0 / (in_dim + out_dim)) ** 0.5
    p = {"kernel": jax.random.uniform(key, (in_dim, out_dim), dtype,
                                      -scale, scale)}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def _dense(p, x):
    y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def init_gcn(key, config: GCNConfig) -> dict:
    keys = jax.random.split(key, 8 + len(config.gc_dims) + len(config.fc_dims))
    ki = iter(keys)
    lm_out = config.lm_hidden * (2 if config.lm_bidirectional else 1)
    params = {
        "lm": init_lstm_stack(next(ki), config.vocab, config.lm_hidden,
                              config.lm_layers,
                              bidirectional=config.lm_bidirectional),
        "lm_embed": _dense_init(next(ki), lm_out, config.embed_dim,
                                bias=False),
        "aa_embed": _dense_init(next(ki), config.vocab, config.embed_dim,
                                bias=True),
        "gc": [],
        "fc": [],
    }
    in_dim = config.embed_dim
    for d in config.gc_dims:
        params["gc"].append(_dense_init(next(ki), in_dim, d, bias=False))
        in_dim = d
    concat_dim = sum(config.gc_dims)
    in_dim = concat_dim
    for d in config.fc_dims:
        params["fc"].append(_dense_init(next(ki), in_dim, d, bias=True))
        in_dim = d
    params["head"] = _dense_init(next(ki), in_dim, 2 * config.n_labels,
                                 bias=True)
    return params


def init_cnn(key, config: CNNConfig) -> dict:
    keys = jax.random.split(key, 4 + len(config.conv_kernels)
                            + len(config.fc_dims))
    ki = iter(keys)
    params = {"conv": [], "fc": []}
    for ksize in config.conv_kernels:
        k = next(ki)
        scale = (6.0 / (ksize * config.vocab + config.conv_filters)) ** 0.5
        params["conv"].append({
            # (width, in_channels, out_channels) — lax.conv_general_dilated
            "kernel": jax.random.uniform(
                k, (ksize, config.vocab, config.conv_filters),
                jnp.float32, -scale, scale),
            "bias": jnp.zeros((config.conv_filters,), jnp.float32),
        })
    in_dim = config.conv_filters * len(config.conv_kernels)
    for d in config.fc_dims:
        params["fc"].append(_dense_init(next(ki), in_dim, d, bias=True))
        in_dim = d
    params["head"] = _dense_init(next(ki), in_dim, 2 * config.n_labels,
                                 bias=True)
    return params


# ---------------------------------------------------------------------------
# Forwards
# ---------------------------------------------------------------------------

def normalize_adjacency(adj: jnp.ndarray, mode: str = "sym") -> jnp.ndarray:
    """Degree-normalise a (B, L, L) adjacency; safe on zero (padded) rows."""
    if mode == "none":
        return adj
    deg = jnp.sum(adj, axis=-1)
    if mode == "sym":
        inv_sqrt = jax.lax.rsqrt(jnp.maximum(deg, 1e-12))
        inv_sqrt = jnp.where(deg > 0, inv_sqrt, 0.0)
        return adj * inv_sqrt[:, :, None] * inv_sqrt[:, None, :]
    if mode == "row":
        inv = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1e-12), 0.0)
        return adj * inv[:, :, None]
    raise ValueError(f"Unknown adjacency normalisation: {mode}")


def _head_scores(head_params, x, n_labels: int) -> jnp.ndarray:
    """Per-term 2-way softmax; score = class-0 probability.

    Matches the reference output contract ``prediction[:, :, 0].reshape(-1)``
    (reference predict.pyx:98-102).
    """
    logits = _dense(head_params, x)
    logits = logits.reshape(*logits.shape[:-1], n_labels, 2)
    probs = jax.nn.softmax(logits, axis=-1)
    return probs[..., 0]


def _gcn_trunk(params: dict, config: GCNConfig, tokens: jnp.ndarray,
               adjacency: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Shared GCN trunk: one-hot → LM branch → GraphConv stack → pooled FC.

    Returns the (B, fc_dims[-1]) feature tensor fed to the per-term head.
    """
    dtype = jnp.dtype(config.compute_dtype)
    onehot = tokens2onehot(tokens, dtype=jnp.float32)
    L = tokens.shape[1]
    valid = (jnp.arange(L, dtype=jnp.int32)[None, :]
             < lengths[:, None]).astype(jnp.float32)
    onehot = onehot * valid[:, :, None]

    # Sequence branch: LSTM-LM + residue embedding (frozen-LM design of the
    # reference models; see module docstring).
    lm_out = lstm_stack_forward(params["lm"], onehot, lengths,
                                compute_dtype=dtype)
    x = _dense(params["lm_embed"], lm_out) + _dense(params["aa_embed"], onehot)
    x = jax.nn.relu(x).astype(dtype)

    adj = normalize_adjacency(adjacency.astype(jnp.float32),
                              config.adj_norm).astype(dtype)

    # GraphConv stack; every layer's output contributes to the concat
    # (DeepFRI's GCNN_concatenate pattern).
    gc_outputs = []
    for layer in params["gc"]:
        agg = jnp.einsum("bij,bjd->bid", adj, x,
                         preferred_element_type=jnp.float32)
        x = jax.nn.relu(agg @ layer["kernel"].astype(dtype))
        gc_outputs.append(x)
    concat = jnp.concatenate(gc_outputs, axis=-1).astype(jnp.float32)

    # Padded rows are exactly zero (zero adjacency rows → relu(0) = 0), so a
    # plain sum-pool over L is already mask-correct; multiply anyway for
    # numerical hygiene under bf16.
    pooled = jnp.sum(concat * valid[:, :, None], axis=1)

    for layer in params["fc"]:
        pooled = jax.nn.relu(_dense(layer, pooled))
    return pooled


def gcn_forward(params: dict, config: GCNConfig, tokens: jnp.ndarray,
                adjacency: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Batched GCN forward.

    Args:
        tokens: (B, L) uint8 token ids (padded with PAD_TOKEN).
        adjacency: (B, L, L) float 0/1 contact maps, padded rows/cols zeroed,
            identity on valid diagonal (the contract produced by
            ``ops.cmap_align`` / ``ops.contact``).
        lengths: (B,) int32 true lengths.

    Returns:
        (B, n_labels) float32 per-term scores in [0, 1].
    """
    pooled = _gcn_trunk(params, config, tokens, adjacency, lengths)
    return _head_scores(params["head"], pooled, config.n_labels)


def gcn_forward_logits(params: dict, config: GCNConfig, tokens: jnp.ndarray,
                       adjacency: jnp.ndarray,
                       lengths: jnp.ndarray) -> jnp.ndarray:
    """Batched GCN forward returning (B, n_labels, 2) pre-softmax logits.

    Training entry point: the fine-tuning loss needs raw logits, not the
    class-0 probabilities of the inference contract.
    """
    pooled = _gcn_trunk(params, config, tokens, adjacency, lengths)
    logits = _dense(params["head"], pooled)
    return logits.reshape(*logits.shape[:-1], config.n_labels, 2)


def gcn_forward_fused(params: dict, config: GCNConfig, tokens: jnp.ndarray,
                      proj_coords: jnp.ndarray, ins_mask: jnp.ndarray,
                      lengths: jnp.ndarray,
                      interpret: bool = False,
                      threshold: float = 6.0,
                      generated_contacts: int = 2) -> jnp.ndarray:
    """GCN forward with the Pallas fused-adjacency GraphConv.

    Identical math to ``gcn_forward(…, aligned_contacts_from_coords(...))``
    but the (B, L, L) adjacency never materialises in HBM — each tile is
    recomputed in VMEM from ``proj_coords`` and contracted immediately
    (:mod:`..ops.graphconv_pallas`). The degree pass is shared across the
    GraphConv stack.
    """
    from metagenomic_deepfri_tpu.ops.graphconv_pallas import \
        normalized_aggregate

    dtype = jnp.dtype(config.compute_dtype)
    onehot = tokens2onehot(tokens, dtype=jnp.float32)
    L = tokens.shape[1]
    valid = (jnp.arange(L, dtype=jnp.int32)[None, :]
             < lengths[:, None]).astype(jnp.float32)
    onehot = onehot * valid[:, :, None]

    lm_out = lstm_stack_forward(params["lm"], onehot, lengths,
                                compute_dtype=dtype)
    x = _dense(params["lm_embed"], lm_out) + _dense(params["aa_embed"], onehot)
    x = jax.nn.relu(x).astype(dtype)

    degrees = None
    gc_outputs = []
    for layer in params["gc"]:
        agg, degrees = normalized_aggregate(
            proj_coords, ins_mask, lengths, x.astype(jnp.float32),
            threshold=threshold, generated_contacts=generated_contacts,
            adj_norm=config.adj_norm, interpret=interpret, degrees=degrees,
            compute_dtype=config.compute_dtype)
        x = jax.nn.relu(agg.astype(dtype) @ layer["kernel"].astype(dtype))
        gc_outputs.append(x)
    concat = jnp.concatenate(gc_outputs, axis=-1).astype(jnp.float32)
    pooled = jnp.sum(concat * valid[:, :, None], axis=1)

    for layer in params["fc"]:
        pooled = jax.nn.relu(_dense(layer, pooled))
    return _head_scores(params["head"], pooled, config.n_labels)


def cnn_forward(params: dict, config: CNNConfig, tokens: jnp.ndarray,
                lengths: jnp.ndarray) -> jnp.ndarray:
    """Batched sequence-only CNN forward → (B, n_labels) scores.

    Zeroing padded one-hot rows makes 'SAME' convolution over a padded batch
    bit-identical (on valid positions) to the reference's unpadded per-protein
    execution; the global max-pool is masked to valid positions.
    """
    onehot = tokens2onehot(tokens, dtype=jnp.float32)
    L = tokens.shape[1]
    valid = jnp.arange(L, dtype=jnp.int32)[None, :] < lengths[:, None]
    onehot = onehot * valid[:, :, None].astype(jnp.float32)

    branches = []
    for conv in params["conv"]:
        y = jax.lax.conv_general_dilated(
            onehot, conv["kernel"],
            window_strides=(1,), padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32)
        branches.append(y + conv["bias"])
    x = jax.nn.relu(jnp.concatenate(branches, axis=-1))

    neg_inf = jnp.asarray(-jnp.inf, x.dtype)
    x = jnp.where(valid[:, :, None], x, neg_inf)
    pooled = jnp.max(x, axis=1)
    pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)

    for layer in params["fc"]:
        pooled = jax.nn.relu(_dense(layer, pooled))
    return _head_scores(params["head"], pooled, config.n_labels)


# ---------------------------------------------------------------------------
# Single-protein convenience API (reference Predictor.forward_pass parity)
# ---------------------------------------------------------------------------

def forward_pass_single(params: dict, config, seqres: str,
                        cmap=None) -> jnp.ndarray:
    """Per-protein forward mirroring reference ``predict.pyx:75-102``.

    GCN when a contact map is provided, CNN otherwise; returns the flat
    per-term score vector. Intended for parity tests and small one-off use —
    the production path is the batched engine.
    """
    import numpy as np

    from metagenomic_deepfri_tpu.ops.one_hot import seq2tokens

    tokens = jnp.asarray(seq2tokens(seqres)[None, :])
    lengths = jnp.asarray(np.array([len(seqres)], np.int32))
    if cmap is not None:
        adj = jnp.asarray(np.asarray(cmap, np.float32)[None])
        scores = gcn_forward(params, config, tokens, adj, lengths)
    else:
        scores = cnn_forward(params, config, tokens, lengths)
    return scores.reshape(-1)
