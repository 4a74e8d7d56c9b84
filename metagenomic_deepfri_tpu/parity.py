"""Numerical parity harness: JAX forward vs the ONNX graph, on real weights.

The reference validates its ONNX conversion against the original TF2 models
at ≤1e-5 abs diff on 100 random proteins (reference
``weight_convert/README.md:5-6``). This module provides the same oracle for
the JAX reimplementation: every model in a weights folder is imported
(:mod:`.models.registry`) and its scores compared against executing the
actual ONNX graph with the self-contained executor
(:class:`.models.onnx_import.OnnxExecutor`) on random proteins — the
BASELINE config-1 milestone, runnable offline and on CPU.

``trace=True`` additionally returns per-node ONNX activations for localising
a divergence (per-layer parity debugging).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)

DEFAULT_TOLERANCE = 1e-4  # matches the reference's own conversion bound 1e-5
                          # with headroom for non-deterministic reductions


@dataclass
class ParityResult:
    net: str
    mode: str
    n_proteins: int
    max_abs_diff: float
    tolerance: float

    @property
    def ok(self) -> bool:
        return self.max_abs_diff <= self.tolerance


def _random_protein(rng, min_len: int, max_len: int):
    from metagenomic_deepfri_tpu.ops.contact import calculate_contact_map

    aas = list("ACDEFGHIKLMNPQRSTVWY")
    L = int(rng.integers(min_len, max_len))
    seq = "".join(rng.choice(aas, size=L))
    steps = rng.normal(size=(L, 3)).astype(np.float32)
    steps /= np.linalg.norm(steps, axis=1, keepdims=True) + 1e-9
    coords = np.cumsum(3.8 * steps, axis=0).astype(np.float32)
    cmap = calculate_contact_map(coords, threshold=6.0).astype(np.float32)
    # identity diagonal, as produced by the aligned-cmap path
    np.fill_diagonal(cmap, 1.0)
    return seq, cmap


def check_model_parity(net: str, mode: str, model_path, params_json,
                       n_proteins: int = 10, min_len: int = 40,
                       max_len: int = 300,
                       tolerance: float = DEFAULT_TOLERANCE,
                       seed: int = 0) -> ParityResult:
    """Compare JAX forward vs ONNX-graph execution for one model.

    Both paths run under ``matmul_precision='highest'`` — on TPU the
    default f32 matmul is reduced-precision, and the two execution orders
    would otherwise diverge at ~1e-3 in logits regardless of semantic
    parity. Caveat for synthetic fixtures: *untrained random weights* can
    saturate the per-term softmax (scores pinned to 0/1), where a near-tie
    amplifies benign last-bit reduction differences; real trained weights
    produce calibrated scores and are the intended oracle input.
    """
    import jax

    from metagenomic_deepfri_tpu.models.deepfri import forward_pass_single
    from metagenomic_deepfri_tpu.models.onnx_import import OnnxExecutor
    from metagenomic_deepfri_tpu.models.onnx_reader import load_onnx
    from metagenomic_deepfri_tpu.models.registry import load_model_handle
    from metagenomic_deepfri_tpu.ops.one_hot import seq2onehot

    from metagenomic_deepfri_tpu.models.onnx_import import graph_input_roles

    handle = load_model_handle(net, mode, model_path, params_json)
    raw_graph = load_onnx(str(model_path))
    executor = OnnxExecutor(raw_graph)
    # tf2onnx names runtime inputs after the Keras layers (input_1/...), not
    # the reference's A/S convention — resolve roles structurally.
    roles = graph_input_roles(raw_graph)

    rng = np.random.default_rng(seed)
    worst = 0.0
    with jax.default_matmul_precision("highest"):
        for _ in range(n_proteins):
            seq, cmap = _random_protein(rng, min_len, max_len)
            S = seq2onehot(seq)[None]
            if net == "gcn":
                (out,) = executor.run({roles["A"]: cmap[None],
                                       roles["S"]: S})
                jax_scores = np.asarray(
                    forward_pass_single(handle.params, handle.config, seq,
                                        cmap))
            else:
                (out,) = executor.run({roles["S"]: S})
                jax_scores = np.asarray(
                    forward_pass_single(handle.params, handle.config, seq))
            onnx_scores = out[:, :, 0].reshape(-1)
            worst = max(worst,
                        float(np.max(np.abs(onnx_scores - jax_scores))))
    return ParityResult(net=net, mode=mode, n_proteins=n_proteins,
                        max_abs_diff=worst, tolerance=tolerance)


def verify_weights(weights_dir, modes: Optional[List[str]] = None,
                   n_proteins: int = 10,
                   tolerance: float = DEFAULT_TOLERANCE,
                   seed: int = 0) -> List[ParityResult]:
    """Parity-check every model in a weights folder. Returns all results."""
    from pathlib import Path

    from metagenomic_deepfri_tpu.utils import load_deepfri_config

    config = load_deepfri_config(weights_dir)
    results = []
    for net in ("gcn", "cnn"):
        for mode, model_path in config.get(net, {}).items():
            if not isinstance(model_path, (str, Path)):
                continue
            if modes and mode not in modes:
                continue
            params_json = str(Path(model_path).with_suffix("")) + \
                "_model_params.json"
            res = check_model_parity(net, mode, model_path, params_json,
                                     n_proteins=n_proteins,
                                     tolerance=tolerance, seed=seed)
            status = "OK" if res.ok else "FAIL"
            logger.info("parity %s/%s: max|Δ|=%.2e (tol %.0e) %s", net, mode,
                        res.max_abs_diff, tolerance, status)
            results.append(res)
    return results
