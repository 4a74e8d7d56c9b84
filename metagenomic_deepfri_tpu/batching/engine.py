"""Device-resident batched inference engine for the DeepFRI model family.

The reference's hot loop is one synchronous ``session.run`` per protein per
mode per network, with models loaded and destroyed per mode (reference
``pipeline.py:292-319`` and ``:584-648``). This engine:

- keeps every mode's parameters resident on device simultaneously,
- packs proteins into length-bucketed mega-batches (one compiled XLA program
  per (bucket, batch-size) shape),
- evaluates ALL requested modes for a batch while its inputs are on device
  (amortising the O(B·L²) adjacency transfer across modes),
- ships adjacency as uint8 and expands to compute dtype on device (4× less
  PCIe/DMA traffic than the reference's float32 dense A per call),
- relies on JAX async dispatch for host/device overlap: batch k+1 is being
  packed on host while batch k executes.

Optionally shards batches over a device mesh (data-parallel) via
``jax.sharding``; see :mod:`metagenomic_deepfri_tpu.parallel`.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from metagenomic_deepfri_tpu.batching.buckets import (DEFAULT_BUCKETS,
                                                      bucket_plan,
                                                      cnn_batch_size,
                                                      gcn_batch_size)
from metagenomic_deepfri_tpu.models.deepfri import (CNNConfig, GCNConfig,
                                                    cnn_forward, gcn_forward)
from metagenomic_deepfri_tpu.ops.one_hot import seq2tokens

logger = logging.getLogger(__name__)


@dataclass
class ModelHandle:
    """One loaded network: config + device-resident params + vocabulary."""
    net_type: str          # "gcn" | "cnn"
    mode: str              # "bp" | "cc" | "mf" | "ec"
    config: object         # GCNConfig | CNNConfig
    params: dict
    goterms: Optional[list] = None
    gonames: Optional[list] = None


def _pad_batch(items: List[tuple], bucket: int, batch: int, with_adj: bool):
    """Pack (id, seq, cmap?) tuples into padded arrays."""
    tokens = np.zeros((batch, bucket), dtype=np.uint8)
    lengths = np.zeros((batch,), dtype=np.int32)
    adj = np.zeros((batch, bucket, bucket), dtype=np.uint8) if with_adj else None
    for i, item in enumerate(items):
        seq = item[1]
        t = seq2tokens(seq)
        tokens[i, : t.shape[0]] = t
        lengths[i] = t.shape[0]
        if with_adj:
            cmap = np.asarray(item[2])
            L = cmap.shape[0]
            adj[i, :L, :L] = cmap.astype(np.uint8)
    return tokens, lengths, adj


class BatchedPredictor:
    """Executes GCN/CNN forwards for many proteins across all modes at once.

    Args:
        gcn_models: {mode: ModelHandle} for the structure (GCN) networks.
        cnn_models: {mode: ModelHandle} for the sequence-only (CNN) networks.
        buckets: length-bucket boundaries.
        donate_inputs: reserved for future in-place input reuse.
    """

    def __init__(self,
                 gcn_models: Optional[Dict[str, ModelHandle]] = None,
                 cnn_models: Optional[Dict[str, ModelHandle]] = None,
                 buckets: Sequence[int] = DEFAULT_BUCKETS,
                 matmul_precision: Optional[str] = None,
                 batch_cap: Optional[int] = None):
        self.gcn_models = gcn_models or {}
        self.cnn_models = cnn_models or {}
        self.buckets = tuple(buckets)
        self.matmul_precision = matmul_precision
        self.batch_cap = batch_cap
        self._gcn_jit = {}
        self._cnn_jit = {}

    # -- compiled forwards ---------------------------------------------------

    def _gcn_step(self, mode: str):
        if mode not in self._gcn_jit:
            handle = self.gcn_models[mode]

            @partial(jax.jit, static_argnums=())
            def step(params, tokens, adj_u8, lengths):
                adj = adj_u8.astype(jnp.float32)
                return gcn_forward(params, handle.config, tokens, adj, lengths)

            self._gcn_jit[mode] = step
        return self._gcn_jit[mode]

    def _cnn_step(self, mode: str):
        if mode not in self._cnn_jit:
            handle = self.cnn_models[mode]

            @partial(jax.jit, static_argnums=())
            def step(params, tokens, lengths):
                return cnn_forward(params, handle.config, tokens, lengths)

            self._cnn_jit[mode] = step
        return self._cnn_jit[mode]

    # -- public API ------------------------------------------------------------

    def predict_gcn(self, items: List[Tuple[str, str, np.ndarray]],
                    modes: Optional[Iterable[str]] = None,
                    progress_cb=None) -> Dict[str, Dict[str, np.ndarray]]:
        """Run GCN forwards for (query_id, sequence, dense_cmap) items.

        Returns {mode: {query_id: scores (n_labels,)}}. All requested modes
        are evaluated per device-resident batch.
        """
        modes = list(modes) if modes is not None else list(self.gcn_models)
        return self._run(items, modes, net="gcn", progress_cb=progress_cb)

    def predict_cnn(self, items: List[Tuple[str, str]],
                    modes: Optional[Iterable[str]] = None,
                    progress_cb=None) -> Dict[str, Dict[str, np.ndarray]]:
        """Run CNN forwards for (query_id, sequence) items."""
        modes = list(modes) if modes is not None else list(self.cnn_models)
        return self._run(items, modes, net="cnn", progress_cb=progress_cb)

    def _run(self, items, modes, net: str, progress_cb=None):
        out: Dict[str, Dict[str, np.ndarray]] = {m: {} for m in modes}
        if not items:
            return out
        with_adj = net == "gcn"
        plan = bucket_plan([len(it[1]) for it in items], self.buckets)
        models = self.gcn_models if with_adj else self.cnn_models

        ctx = (jax.default_matmul_precision(self.matmul_precision)
               if self.matmul_precision else _nullcontext())
        with ctx:
            for bucket in sorted(plan):
                idxs = plan[bucket]
                batch = (gcn_batch_size(bucket) if with_adj
                         else cnn_batch_size(bucket))
                if self.batch_cap:
                    batch = min(batch, self.batch_cap)
                for start in range(0, len(idxs), batch):
                    chunk = [items[i] for i in idxs[start:start + batch]]
                    tokens, lengths, adj = _pad_batch(chunk, bucket, batch,
                                                      with_adj)
                    tokens_d = jnp.asarray(tokens)
                    lengths_d = jnp.asarray(lengths)
                    adj_d = jnp.asarray(adj) if with_adj else None
                    # async dispatch: all modes queued before any fetch
                    pending = []
                    for mode in modes:
                        params = models[mode].params
                        if with_adj:
                            scores = self._gcn_step(mode)(params, tokens_d,
                                                          adj_d, lengths_d)
                        else:
                            scores = self._cnn_step(mode)(params, tokens_d,
                                                          lengths_d)
                        pending.append((mode, scores))
                    for mode, scores in pending:
                        host = np.asarray(scores)
                        for i, item in enumerate(chunk):
                            out[mode][item[0]] = host[i]
                    if progress_cb:
                        progress_cb(len(chunk))
        return out


class _nullcontext:
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False
