"""PartitionSpec trees and sharded forwards for the DeepFRI model family.

Sharding layout (Megatron-style pairs; XLA GSPMD inserts the collectives):

- **data axis**: every per-protein batch array (tokens, adjacency, lengths,
  labels) is sharded on its leading batch dimension.
- **model axis**: the embedding projections are column-parallel
  (output-feature sharded), the first GraphConv contracts over the sharded
  embedding (row-parallel → psum over ``model``), the FC stack is
  column-parallel, and the per-term head is row-parallel, so per-term scores
  materialise replicated after one reduce over the model axis.
- The LSTM-LM branch is replicated: its (B, H) scan state is latency-bound,
  not FLOP-bound, and sharding H across chips would put an all-gather inside
  every scan step.

The reference has no analogue (single-protein, single-device ONNX sessions —
reference ``predict.pyx:50-102``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from metagenomic_deepfri_tpu.models.deepfri import GCNConfig, gcn_forward
from metagenomic_deepfri_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _with_bias(layer: dict, kernel_spec, bias_spec) -> dict:
    """Layer pspec dict mirroring the layer's optional-bias structure."""
    spec = {"kernel": kernel_spec}
    if "bias" in layer:
        spec["bias"] = bias_spec
    return spec


def gcn_param_pspecs(params: dict) -> dict:
    """PartitionSpec pytree matching an ``init_gcn``/imported parameter tree.

    Bias entries are emitted only where the parameter tree has them
    (GraphConv / LM-embedding biases are optional — present only when an
    imported ONNX graph carried them).
    """
    specs = {
        "lm": jax.tree.map(lambda _: P(), params["lm"]),
        # column-parallel into the embedding space
        "lm_embed": _with_bias(params["lm_embed"], P(None, MODEL_AXIS),
                               P(MODEL_AXIS)),
        "aa_embed": _with_bias(params["aa_embed"], P(None, MODEL_AXIS),
                               P(MODEL_AXIS)),
        # first GraphConv contracts the sharded embedding (row-parallel;
        # its bias is added after the psum, so replicated);
        # deeper GraphConv layers stay replicated so the concat is local
        "gc": [_with_bias(params["gc"][0], P(MODEL_AXIS, None), P())]
        + [_with_bias(layer, P(), P()) for layer in params["gc"][1:]],
        # FC column-parallel, head row-parallel → one psum at the output
        "fc": [_with_bias(layer, P(None, MODEL_AXIS), P(MODEL_AXIS))
               for layer in params["fc"]],
        "head": _with_bias(params["head"], P(MODEL_AXIS, None), P()),
    }
    return specs


def batch_pspecs(with_adj: bool = True) -> tuple:
    """(tokens, adjacency?, lengths) PartitionSpecs — batch-dim data parallel."""
    toks = P(DATA_AXIS, None)
    lens = P(DATA_AXIS)
    if with_adj:
        return toks, P(DATA_AXIS, None, None), lens
    return toks, lens


def shard_params(params: dict, mesh: Mesh, pspecs: Optional[dict] = None):
    """Place a parameter pytree onto the mesh per ``gcn_param_pspecs``."""
    pspecs = pspecs if pspecs is not None else gcn_param_pspecs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(jnp.asarray(x), NamedSharding(mesh, s)),
        params, pspecs)


def make_sharded_gcn_forward(mesh: Mesh, config: GCNConfig, params: dict):
    """Jit the batched GCN forward with explicit mesh shardings.

    Returns ``fn(params, tokens, adjacency, lengths) -> (B, n_labels)`` with
    inputs data-parallel over ``data`` and parameters tensor-parallel over
    ``model``; outputs are replicated per data shard.
    """
    pspec = gcn_param_pspecs(params)
    t_s, a_s, l_s = batch_pspecs(with_adj=True)

    def fwd(p, tokens, adj, lengths):
        return gcn_forward(p, config, tokens, adj, lengths)

    return jax.jit(
        fwd,
        in_shardings=(
            jax.tree.map(lambda s: NamedSharding(mesh, s), pspec),
            NamedSharding(mesh, t_s),
            NamedSharding(mesh, a_s),
            NamedSharding(mesh, l_s),
        ),
        out_shardings=NamedSharding(mesh, P(DATA_AXIS, None)),
    )
