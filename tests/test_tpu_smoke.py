"""Real-TPU smoke test (NOT run by default — the suite pins the CPU
backend in conftest.py because eager dispatch over a tunneled chip is too
slow for unit tests).

Run manually on a machine with a real TPU attached:

    MDEEPFRI_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -q

It exercises the paths whose Mosaic/XLA-TPU lowering the CPU suite cannot
see: the flat-wire round-trip (uint8 bitcasts), one fused
coords→adjacency→GCN batch, one forced spmm='pallas' batch (the Pallas
kernel compiled by the real Mosaic pipeline, not interpret mode), and one
device top-k batch — catching lowering breakage before the benchmark does.
"""

import sys
from pathlib import Path

import numpy as np

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _on_tpu() -> bool:
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _on_tpu(), reason="requires a real TPU backend (tunneled or local)")


BUCKET = 128
BATCH = 8


def _engine(compute_dtype="bfloat16", **kw):
    import jax

    from metagenomic_deepfri_tpu.batching.engine import (BatchedPredictor,
                                                         ModelHandle)
    from metagenomic_deepfri_tpu.models.deepfri import GCNConfig, init_gcn

    cfg = GCNConfig(n_labels=64, lm_hidden=16, lm_layers=1, embed_dim=32,
                    gc_dims=(16, 16), fc_dims=(32,), adj_norm="none",
                    compute_dtype=compute_dtype)
    params = init_gcn(jax.random.PRNGKey(0), cfg)
    handle = ModelHandle("gcn", "mf", cfg, params)
    return BatchedPredictor(gcn_models={"mf": handle}, buckets=(BUCKET,),
                            batch_cap=BATCH, **kw)


def _items(n, seed=0):
    from metagenomic_deepfri_tpu.ops.cmap_align import \
        project_alignment_coords

    rng = np.random.default_rng(seed)
    aas = "ACDEFGHIKLMNPQRSTVWY"
    items = []
    for i in range(n):
        L = int(rng.integers(20, BUCKET))
        seq = "".join(rng.choice(list(aas), size=L))
        steps = rng.normal(size=(L, 3)).astype(np.float32)
        steps /= np.linalg.norm(steps, axis=1, keepdims=True) + 1e-9
        coords = np.cumsum(3.8 * steps, axis=0).astype(np.float32)
        proj, ins, _ = project_alignment_coords(seq, seq, coords)
        items.append((f"q{i}", seq, proj, ins))
    return items


@pytest.mark.tpu
def test_flat_wire_roundtrip_on_device():
    """uint8→f32 bitcast wire format must be bit-exact on the real chip."""
    import jax

    from metagenomic_deepfri_tpu.batching.engine import (_flat_capacity,
                                                         _pack_coords_flat,
                                                         _unpack_coords_flat)
    from metagenomic_deepfri_tpu.ops.one_hot import seq2tokens

    items = [(qid, seq, proj, ins) for qid, seq, proj, ins in _items(4)]
    total = sum(len(it[1]) for it in items)
    cap = _flat_capacity(total, BUCKET, BATCH)
    flat = _pack_coords_flat(items, BATCH, cap)
    coords, tokens, ins_mask, lengths = jax.jit(
        _unpack_coords_flat, static_argnames=("batch", "bucket"))(
            jax.device_put(flat), batch=BATCH, bucket=BUCKET)
    coords, tokens, lengths = map(np.asarray, (coords, tokens, lengths))
    for i, (_, seq, proj, _) in enumerate(items):
        L = len(seq)
        assert lengths[i] == L
        assert np.array_equal(coords[i, :L], proj)  # bit-exact
        assert np.array_equal(tokens[i, :L], seq2tokens(seq))


@pytest.mark.tpu
def test_fused_gcn_forward_finite():
    """One fused coords→adjacency→GCN batch through the XLA-TPU pipeline."""
    out = _engine().predict_gcn_from_coords(_items(5, seed=1))
    rows = list(out["mf"].values())
    assert len(rows) == 5
    assert all(np.isfinite(r).all() for r in rows)
    assert all(((r >= 0) & (r <= 1)).all() for r in rows)


@pytest.mark.tpu
def test_pallas_kernel_mosaic_lowering():
    """spmm='pallas' forces the fused Pallas GraphConv kernel through the
    REAL Mosaic compiler (the unit suite only runs it in interpret mode)
    and must agree with the dense XLA path.

    Parity is checked in float32 compute, where both paths are numerically
    tight; in bfloat16 the two contraction orders legitimately diverge by
    up to ~0.06 on sigmoid scores of a random-weight model (logits near 0
    are maximally sensitive), so bf16 gets only a finiteness check.
    """
    items = _items(4, seed=2)
    ref = _engine("float32", spmm="xla").predict_gcn_from_coords(items)
    got = _engine("float32", spmm="pallas").predict_gcn_from_coords(items)
    for q in ref["mf"]:
        np.testing.assert_allclose(got["mf"][q], ref["mf"][q],
                                   rtol=1e-3, atol=1e-4)
    bf16 = _engine("bfloat16", spmm="pallas").predict_gcn_from_coords(items)
    assert all(np.isfinite(r).all() for r in bf16["mf"].values())


@pytest.mark.tpu
def test_device_topk_scores():
    """Device top-k compaction returns exact values at kept positions."""
    items = _items(4, seed=3)
    dense = _engine().predict_gcn_from_coords(items)
    topk = _engine(score_topk=8).predict_gcn_from_coords(items)
    for q, row in dense["mf"].items():
        kept = topk["mf"][q]
        nz = kept != 0
        assert nz.any()
        np.testing.assert_array_equal(kept[nz], row[nz])


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q", "-m", "tpu"]))
