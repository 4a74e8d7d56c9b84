"""Sensitivity measurement for the built-in search engine.

Builds a database where homology is known *by construction* (queries are
point-mutated copies of targets at controlled identity levels) and
measures recall/precision of ``builtin_search`` against the exact NW
oracle at the pipeline's operating thresholds (coverage ≥ 0.9,
identity ≥ 0.5 — reference ``cli.py:141-161``). This backs the
sensitivity claim in ``search/engine.py`` with data instead of assertion.
"""

import numpy as np
import pytest

from metagenomic_deepfri_tpu.align.matrices import ScoringMatrix
from metagenomic_deepfri_tpu.ops.nw import alignment_stats, nw_align
from metagenomic_deepfri_tpu.search.engine import builtin_search

AAS = list("ACDEFGHIKLMNPQRSTVWY")
MIN_COV = 0.9
MIN_IDENT = 0.5


def _random_seq(rng, n):
    return "".join(rng.choice(AAS, size=n))


def _mutate(rng, seq, rate):
    """Point-substitute a fraction ``rate`` of positions (always to a
    *different* residue, so realised identity ≈ 1 - rate exactly)."""
    out = list(seq)
    k = int(round(rate * len(seq)))
    for pos in rng.choice(len(seq), size=k, replace=False):
        choices = [a for a in AAS if a != out[pos]]
        out[pos] = rng.choice(choices)
    return "".join(out)


@pytest.fixture(scope="module")
def homology_benchmark():
    """200-target DB; queries at 5/15/25/35/45/55/65% mutation + decoys."""
    rng = np.random.default_rng(42)
    targets = {f"t{i}": _random_seq(rng, int(rng.integers(80, 300)))
               for i in range(200)}
    queries = {}
    truth = {}  # qid -> source target id (None for decoys)
    qn = 0
    t_ids = list(targets)
    for rate in (0.05, 0.15, 0.25, 0.35, 0.45, 0.55, 0.65):
        for _ in range(10):
            tid = t_ids[int(rng.integers(len(t_ids)))]
            qid = f"q{qn}"
            qn += 1
            queries[qid] = _mutate(rng, targets[tid], rate)
            truth[qid] = tid
    for _ in range(20):
        qid = f"q{qn}"
        qn += 1
        queries[qid] = _random_seq(rng, int(rng.integers(80, 300)))
        truth[qid] = None
    return targets, queries, truth


def _oracle_positive(query, target):
    """NW-oracle ground truth at the pipeline thresholds."""
    sm = ScoringMatrix.from_name("BLOSUM62")
    _, aln = nw_align(query, target, sm, 11, 1)
    ident, qcov, tcov = alignment_stats(query, target, aln)
    return ident >= MIN_IDENT and qcov >= MIN_COV and tcov >= MIN_COV


def test_builtin_search_recall_and_precision(homology_benchmark):
    targets, queries, truth = homology_benchmark
    results = builtin_search(queries, targets, threads=4)
    filtered = results.apply_filters(min_cov=MIN_COV, min_ident=MIN_IDENT)

    reported = set(zip(filtered["query"].tolist(),
                       filtered["target"].tolist()))

    # Recall over planted pairs the NW oracle accepts. Substitution-only
    # mutations keep coverage at 1.0, so the oracle boundary is identity.
    oracle_pos = [(q, t) for q, t in truth.items()
                  if t is not None and _oracle_positive(queries[q],
                                                        targets[t])]
    assert len(oracle_pos) >= 50  # the planted ≤50%-mutation pairs
    found = sum((q, t) in reported for q, t in oracle_pos)
    recall = found / len(oracle_pos)

    # Precision: every reported, filter-passing hit must satisfy the NW
    # oracle. (The engine *rescored* with exact NW, so this checks the
    # stats wiring end to end, including hits onto non-planted targets.)
    correct = sum(_oracle_positive(queries[q], targets[t])
                  for q, t in reported)
    precision = correct / max(len(reported), 1)

    print(f"\nbuiltin_search @ cov>={MIN_COV}, ident>={MIN_IDENT}: "
          f"recall={recall:.3f} ({found}/{len(oracle_pos)}), "
          f"precision={precision:.3f} ({correct}/{len(reported)})")
    assert recall >= 0.95, f"recall {recall:.3f} below 0.95"
    assert precision >= 0.99, f"precision {precision:.3f} below 0.99"

    # Decoys: no filter-passing hits for unrelated sequences.
    decoy_hits = [q for q, t in reported if truth.get(q) is None]
    assert not decoy_hits, f"decoy queries got hits: {decoy_hits}"


def test_boundary_identity_band(homology_benchmark):
    """Queries mutated past the identity threshold are rejected by the
    pipeline filters even when the prefilter surfaces them."""
    targets, queries, truth = homology_benchmark
    results = builtin_search(queries, targets, threads=4)
    filtered = results.apply_filters(min_cov=MIN_COV, min_ident=MIN_IDENT)
    reported = set(zip(filtered["query"].tolist(),
                       filtered["target"].tolist()))
    for q, t in truth.items():
        if t is None:
            continue
        if not _oracle_positive(queries[q], targets[t]):
            assert (q, t) not in reported
