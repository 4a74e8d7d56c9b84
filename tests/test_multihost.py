"""Multi-host input sharding + result merge tests."""

import numpy as np
import pytest

from metagenomic_deepfri_tpu.data.fasta import iter_fasta, write_fasta
from metagenomic_deepfri_tpu.parallel.multihost import (merge_shard_results,
                                                        shard_fasta,
                                                        shard_of)


def test_shard_of_stable_partition():
    ids = [f"protein_{i}" for i in range(200)]
    n = 4
    shards = [shard_of(q, n) for q in ids]
    assert set(shards) <= set(range(n))
    # deterministic
    assert shards == [shard_of(q, n) for q in ids]
    # reasonably balanced (crc32 is uniform-ish)
    counts = np.bincount(shards, minlength=n)
    assert counts.min() > 0


def test_shard_fasta_partitions_exactly(tmp_path):
    rng = np.random.default_rng(0)
    aas = list("ACDEFGHIKLMNPQRSTVWY")
    seqs = {f"q{i}": "".join(rng.choice(aas, size=20)) for i in range(30)}
    src = tmp_path / "all.faa"
    write_fasta(src, seqs)

    n = 3
    seen = {}
    for i in range(n):
        out, count = shard_fasta(src, tmp_path / f"shard{i}.faa", i, n)
        part = dict(iter_fasta(out))
        assert len(part) == count
        for qid, seq in part.items():
            assert qid not in seen
            seen[qid] = seq
    assert seen == seqs  # exact partition, nothing lost or duplicated


def test_shard_fasta_bad_index(tmp_path):
    src = tmp_path / "x.faa"
    write_fasta(src, {"a": "ACD"})
    with pytest.raises(ValueError):
        shard_fasta(src, tmp_path / "s.faa", 3, 3)


def test_load_query_file_shard(tmp_path):
    from metagenomic_deepfri_tpu.pipeline import load_query_file

    rng = np.random.default_rng(1)
    aas = list("ACDEFGHIKLMNPQRSTVWY")
    seqs = {f"q{i}": "".join(rng.choice(aas, size=25)) for i in range(20)}
    src = tmp_path / "all.faa"
    write_fasta(src, seqs)

    got = set()
    for i in range(2):
        qf = load_query_file(src, shard=f"{i}/2")
        assert got.isdisjoint(qf.sequences)
        got.update(qf.sequences)
    assert got == set(seqs)

    with pytest.raises(ValueError):
        load_query_file(src, shard="2of3")
    with pytest.raises(ValueError):
        load_query_file(src, shard="5/3")


def test_merge_shard_results(tmp_path):
    header = "protein\tscore\n"
    d0, d1 = tmp_path / "s0", tmp_path / "s1"
    d0.mkdir(), d1.mkdir()
    (d0 / "results.tsv").write_text(header + "a\t0.9\nb\t0.5\n")
    (d1 / "results.tsv").write_text(header + "c\t0.7\n")
    (d0 / "alignment_summary.tsv").write_text("query_id\taligned\na\tTrue\n")
    (d1 / "alignment_summary.tsv").write_text("query_id\taligned\nc\tFalse\n")
    (d0 / "prediction_matrix_mf.tsv").write_text("p\tnet\tGO:1\na\tgcn\t0.9\n")
    (d1 / "prediction_matrix_mf.tsv").write_text("p\tnet\tGO:1\nc\tcnn\t0.2\n")

    out = tmp_path / "merged"
    merged = merge_shard_results([d0, d1], out)
    names = {p.name for p in merged}
    assert names == {"results.tsv", "alignment_summary.tsv",
                     "prediction_matrix_mf.tsv"}
    body = (out / "results.tsv").read_text().splitlines()
    assert body[0] == "protein\tscore"
    assert sorted(body[1:]) == ["a\t0.9", "b\t0.5", "c\t0.7"]

    # mismatched headers fail loudly
    (d1 / "results.tsv").write_text("WRONG\tHEADER\nc\t0.7\n")
    with pytest.raises(ValueError, match="different"):
        merge_shard_results([d0, d1], tmp_path / "merged2")
