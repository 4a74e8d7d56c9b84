"""DeepFRI model family, reimplemented functionally in JAX.

Replaces the reference's ONNX-Runtime execution core (reference
``mDeepFRI/predict.pyx:50-102``) with jittable, batched, maskable forwards:

- :mod:`.lstm` — LSTM layers via ``lax.scan`` (the DeepFRI language-model
  sequence branch)
- :mod:`.deepfri` — GCN (GraphConv over contact maps) and CNN (sequence-only)
  architectures, config-driven, with per-term two-way-softmax heads matching
  the reference output contract (``prediction[:, :, 0]``,
  reference ``predict.pyx:98-102``)
- :mod:`.onnx_reader` — minimal self-contained ONNX protobuf parser (no
  ``onnx``/``onnxruntime`` dependency) used to import the published DeepFRI
  weights
- :mod:`.onnx_import` — maps imported ONNX graphs onto our parameter trees
- :mod:`.registry` — model_config.json handling (reference
  ``utils.py:154-276``)
"""

from metagenomic_deepfri_tpu.models.deepfri import (CNNConfig, GCNConfig,
                                                    cnn_forward, gcn_forward,
                                                    init_cnn, init_gcn)

__all__ = [
    "CNNConfig",
    "GCNConfig",
    "cnn_forward",
    "gcn_forward",
    "init_cnn",
    "init_gcn",
]
