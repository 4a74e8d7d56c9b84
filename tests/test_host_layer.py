"""Host-layer tests: FASTA IO, structure parsing, NW alignment, search
results, built-in search engine, GO propagation."""

import gzip
import textwrap

import numpy as np
import pytest

from metagenomic_deepfri_tpu.align.matrices import ScoringMatrix
from metagenomic_deepfri_tpu.align.pairwise import (AlignmentResult,
                                                    align_pairwise,
                                                    best_hit_database,
                                                    insert_gaps,
                                                    pairwise_against_database)
from metagenomic_deepfri_tpu.data.fasta import (FastaIndex, load_fasta_as_dict,
                                                retrieve_fasta_entries_as_dict,
                                                write_fasta)
from metagenomic_deepfri_tpu.data.structures import (
    extract_residues_coordinates, get_residues_coordinates, load_structure)
from metagenomic_deepfri_tpu.ops.nw import (alignment_stats, nw_align,
                                            nw_score_many)
from metagenomic_deepfri_tpu.search.engine import builtin_search
from metagenomic_deepfri_tpu.search.results import SearchResults


# ---------------------------------------------------------------------------
# FASTA
# ---------------------------------------------------------------------------

FASTA = """>seq1 some description
MKVLAT
QRWE
>sp|P12345|TEST
GGHHEE
>seq3
MM
"""


class TestFasta:
    def test_load_dict(self, tmp_path):
        path = tmp_path / "test.fa"
        path.write_text(FASTA)
        d = load_fasta_as_dict(path)
        assert d == {"seq1": "MKVLATQRWE", "sp|P12345|TEST": "GGHHEE",
                     "seq3": "MM"}

    def test_gzip_roundtrip(self, tmp_path):
        path = tmp_path / "test.fa.gz"
        with gzip.open(path, "wt") as f:
            f.write(FASTA)
        d = load_fasta_as_dict(path)
        assert d["seq1"] == "MKVLATQRWE"

    def test_index_fetch(self, tmp_path):
        path = tmp_path / "test.fa"
        path.write_text(FASTA)
        idx = FastaIndex(path)
        assert idx.fetch("seq1") == "MKVLATQRWE"
        assert idx.fetch("seq3") == "MM"
        with pytest.raises(KeyError):
            idx.fetch("nope")

    def test_retrieve_entries_missing_raises(self, tmp_path):
        path = tmp_path / "test.fa"
        path.write_text(FASTA)
        with pytest.raises(ValueError, match="not found"):
            retrieve_fasta_entries_as_dict(path, ["seq1", "missing"])

    def test_write_roundtrip(self, tmp_path):
        path = tmp_path / "out.fa"
        write_fasta(path, {"a": "MKV", "b": "GG"})
        assert load_fasta_as_dict(path) == {"a": "MKV", "b": "GG"}


# ---------------------------------------------------------------------------
# Structures
# ---------------------------------------------------------------------------

PDB_SNIPPET = textwrap.dedent("""\
    ATOM      1  N   MET A   1      11.104   6.134  -6.504  1.00  0.00           N
    ATOM      2  CA  MET A   1      11.639   6.071  -5.147  1.00  0.00           C
    ATOM      3  CA  LYS A   2      12.685   9.140  -4.392  1.00  0.00           C
    ATOM      4  CA  MSE A   3      15.125   8.370  -1.512  1.00  0.00           C
    HETATM    5  CA  HOH A   4      20.000  20.000  20.000  1.00  0.00           C
    ATOM      6  CA  GLY B   1       1.000   2.000   3.000  1.00  0.00           C
    END
    """)

CIF_SNIPPET = textwrap.dedent("""\
    data_test
    #
    loop_
    _atom_site.group_PDB
    _atom_site.id
    _atom_site.label_atom_id
    _atom_site.label_comp_id
    _atom_site.label_asym_id
    _atom_site.auth_asym_id
    _atom_site.Cartn_x
    _atom_site.Cartn_y
    _atom_site.Cartn_z
    _atom_site.pdbx_PDB_model_num
    ATOM 1 N MET A A 11.104 6.134 -6.504 1
    ATOM 2 CA MET A A 11.639 6.071 -5.147 1
    ATOM 3 CA LYS A A 12.685 9.140 -4.392 1
    ATOM 4 CA GLY B B 1.000 2.000 3.000 1
    #
    """)


class TestStructures:
    def test_pdb_chain_extraction(self):
        residues, coords = extract_residues_coordinates(PDB_SNIPPET,
                                                        chain="A",
                                                        filetype="pdb")
        # MSE substituted to MET → M; HETATM water excluded
        assert residues == "MKM"
        assert coords.shape == (3, 3)
        np.testing.assert_allclose(coords[0], [11.639, 6.071, -5.147])

    def test_pdb_missing_chain_raises(self):
        with pytest.raises(ValueError, match="Chain C"):
            extract_residues_coordinates(PDB_SNIPPET, chain="C",
                                         filetype="pdb")

    def test_mmcif_extraction(self):
        residues, coords = extract_residues_coordinates(CIF_SNIPPET,
                                                        chain="A",
                                                        filetype="mmcif")
        assert residues == "MK"
        assert coords.shape == (2, 3)
        residues_b, _ = extract_residues_coordinates(CIF_SNIPPET, chain="B",
                                                     filetype="mmcif")
        assert residues_b == "G"


# ---------------------------------------------------------------------------
# NW alignment
# ---------------------------------------------------------------------------

class TestNW:
    def setup_method(self):
        self.scoring = ScoringMatrix.from_name("BLOSUM62")

    def test_identical_sequences(self):
        score, aln = nw_align("MKVLAT", "MKVLAT", self.scoring)
        assert aln == "MMMMMM"
        expected = sum(self.scoring.score(c, c) for c in "MKVLAT")
        assert score == expected

    def test_native_matches_python(self):
        rng = np.random.default_rng(3)
        aas = list("ACDEFGHIKLMNPQRSTVWY")
        for _ in range(5):
            q = "".join(rng.choice(aas, size=int(rng.integers(10, 60))))
            t = "".join(rng.choice(aas, size=int(rng.integers(10, 60))))
            s_native, a_native = nw_align(q, t, self.scoring)
            s_py, a_py = nw_align(q, t, self.scoring, force_python=True)
            assert s_native == s_py
            # alignment strings may differ between equal-scoring paths;
            # both must reproduce the score via stats consistency
            assert len(a_native) >= max(len(q), len(t))
            assert len(a_py) >= max(len(q), len(t))

    def test_gap_in_target(self):
        # deletion in target → 'D' → gap inserted into target by insert_gaps
        score, aln = nw_align("MKVAT", "MKAT", self.scoring)
        gapped_q, gapped_t = insert_gaps("MKVAT", "MKAT", aln)
        assert len(gapped_q) == len(gapped_t)
        assert gapped_q.replace("-", "") == "MKVAT"
        assert gapped_t.replace("-", "") == "MKAT"
        assert "-" in gapped_t

    def test_score_many_matches_single(self):
        targets = ["MKVLAT", "MKVLAA", "GGGGGG"]
        scores = nw_score_many("MKVLAT", targets, self.scoring)
        for t, s in zip(targets, scores):
            single, _ = nw_align("MKVLAT", t, self.scoring)
            assert s == single

    def test_alignment_stats(self):
        ident, qcov, tcov = alignment_stats("MKVT", "MKAT", "MMMM")
        assert ident == 0.75
        assert qcov == 1.0 and tcov == 1.0


# ---------------------------------------------------------------------------
# Pairwise drivers
# ---------------------------------------------------------------------------

class TestPairwise:
    def test_insert_gaps_reference_semantics(self):
        # mirrors reference tests: deletion and insertion cases
        seq, ref = insert_gaps("MKVAT", "MKAT", "MMDMM")
        assert seq == "MKVAT"
        assert ref == "MK-AT"
        seq, ref = insert_gaps("MKAT", "MKVAT", "MMIMM")
        assert seq == "MK-AT"
        assert ref == "MKVAT"

    def test_best_hit(self):
        targets = {"t1": "MKVLAT", "t2": "MKVLAA", "t3": "GGGGGG"}
        best_id, best_seq = best_hit_database("MKVLAT", targets,
                                              scoring_matrix="BLOSUM62")
        assert best_id == "t1"

    def test_pairwise_against_database(self):
        targets = {"t1": "MKVLATQRWE", "t2": "GGGGGGGGGG"}
        result = pairwise_against_database("q1", "MKVLATQRWE", targets,
                                           scoring_matrix="BLOSUM62")
        assert isinstance(result, AlignmentResult)
        assert result.target_name == "t1"
        assert result.query_identity == 1.0
        assert result.gapped_sequence == "MKVLATQRWE"

    def test_align_pairwise_identity(self):
        aln, ident, qcov, tcov = align_pairwise("MKVLAT", "MKVLAT",
                                                scoring_matrix="BLOSUM62")
        assert ident == 1.0 and qcov == 1.0 and tcov == 1.0


# ---------------------------------------------------------------------------
# Search results table
# ---------------------------------------------------------------------------

def _mk_rows():
    rows = []
    for i, (q, t, fid, qc, tc, bits) in enumerate([
            ("q1", "t1", 0.9, 0.95, 0.95, 200.0),
            ("q1", "t2", 0.6, 0.92, 0.91, 150.0),
            ("q1", "t3", 0.4, 0.5, 0.5, 50.0),
            ("q2", "t1", 0.95, 0.99, 0.99, 300.0),
    ]):
        rows.append({"query": q, "target": t, "fident": fid, "alnlen": 100,
                     "mismatch": 5, "gapopen": 1, "qstart": 1, "qend": 100,
                     "tstart": 1, "tend": 100, "qcov": qc, "tcov": tc,
                     "evalue": 1e-30, "bits": bits})
    return rows


class TestSearchResults:
    def test_filters(self):
        res = SearchResults(_mk_rows())
        filtered = res.apply_filters(min_cov=0.9, min_ident=0.5)
        assert len(filtered) == 3
        assert "q1" in filtered.get_queries()

    def test_top_k(self):
        res = SearchResults(_mk_rows())
        top1 = res.find_best_matches(k=1)
        assert len(top1) == 2  # one per query
        q1 = top1.table[top1.table["query"] == "q1"]
        assert q1["target"][0] == "t1"  # highest bits

    def test_save_load_tsv(self, tmp_path):
        res = SearchResults(_mk_rows(), query_fasta="/tmp/q.fa",
                            database="/tmp/db.fa")
        path = tmp_path / "res.tsv"
        res.save(path)
        loaded = SearchResults.load(path)
        assert len(loaded) == 4
        assert loaded.query_fasta == "/tmp/q.fa"
        assert loaded.database == "/tmp/db.fa"
        np.testing.assert_allclose(loaded["bits"], res["bits"])

    def test_empty(self):
        res = SearchResults([])
        assert len(res.find_best_matches(5)) == 0
        assert len(res.apply_filters(min_cov=0.9)) == 0


# ---------------------------------------------------------------------------
# Built-in search engine
# ---------------------------------------------------------------------------

class TestBuiltinSearch:
    def test_finds_near_identical(self):
        rng = np.random.default_rng(5)
        aas = list("ACDEFGHIKLMNPQRSTVWY")
        base = "".join(rng.choice(aas, size=120))
        # target = base with 5 point mutations
        target = list(base)
        for pos in rng.choice(len(base), size=5, replace=False):
            target[pos] = rng.choice(aas)
        target = "".join(target)
        decoys = {f"d{i}": "".join(rng.choice(aas, size=120))
                  for i in range(20)}
        targets = {"hit": target, **decoys}
        res = builtin_search({"q": base}, targets, max_eval=1e-3)
        assert len(res) >= 1
        best = res.find_best_matches(k=1)
        assert best["target"][0] == "hit"
        assert best["fident"][0] > 0.9
        assert best["qcov"][0] == 1.0

    def test_no_hits_for_unrelated(self):
        res = builtin_search({"q": "MKVLATQRWEMKVLATQRWE"},
                             {"t": "PPPPPPPPPPPPPPPPPPPP"})
        assert len(res) == 0


# ---------------------------------------------------------------------------
# GO propagation
# ---------------------------------------------------------------------------

OBO = """format-version: 1.2

[Term]
id: GO:0000001
name: child term
is_a: GO:0000002 ! mid term

[Term]
id: GO:0000002
name: mid term
is_a: GO:0008150 ! biological_process
relationship: part_of GO:0000003 ! side term

[Term]
id: GO:0000003
name: side term
is_a: GO:0008150 ! biological_process

[Term]
id: GO:0008150
name: biological_process

[Term]
id: GO:0000009
name: obsolete term
is_obsolete: true
"""


class TestGoPropagation:
    def test_dag_ancestors(self, tmp_path):
        from metagenomic_deepfri_tpu.ontology.go import GoDag

        obo = tmp_path / "go.obo"
        obo.write_text(OBO)
        dag = GoDag.from_obo(obo)
        anc = dag.ancestors("GO:0000001")
        assert anc == frozenset({"GO:0000002", "GO:0000003"})  # root excluded
        assert dag.ancestors("GO:0000009") == frozenset()

    def test_propagate_results(self, tmp_path):
        from metagenomic_deepfri_tpu.ontology.go import propagate_results
        from metagenomic_deepfri_tpu.pipeline import FINAL_OUTPUT_HEADER

        obo = tmp_path / "go.obo"
        obo.write_text(OBO)
        results = tmp_path / "results.tsv"
        with open(results, "w") as f:
            f.write("\t".join(FINAL_OUTPUT_HEADER) + "\n")
            f.write("p1\tgcn\tGO Biological Process\tGO:0000001\t0.9000\t"
                    "child term\tTrue\tt1\tdb\t0.9\t0.95\t0.95\n")
            f.write("p1\tgcn\tGO Biological Process\t1.1.1.1\t0.8000\t"
                    "EC name\tTrue\tt1\tdb\t0.9\t0.95\t0.95\n")
        out = tmp_path / "propagated.tsv"
        propagate_results(results, out, obo)
        lines = out.read_text().strip().split("\n")
        header = lines[0].split("\t")
        assert header[-1] == "propagated"
        rows = [line.split("\t") for line in lines[1:]]
        terms = {r[3]: r for r in rows}
        # ancestors GO:0000002 and GO:0000003 added with inherited score
        assert "GO:0000002" in terms and terms["GO:0000002"][4] == "0.9000"
        assert terms["GO:0000002"][-1] == "True"
        assert terms["GO:0000001"][-1] == "False"
        # EC passes through unpropagated
        assert terms["1.1.1.1"][-1] == "False"
        # root excluded
        assert "GO:0008150" not in terms


class TestDeviceNW:
    """Batched wavefront NW on device: bit-exact vs the host scorer."""

    def test_scores_match_python_exactly(self):
        from metagenomic_deepfri_tpu.ops.nw import (nw_score_many,
                                                    nw_score_many_device)

        rng = np.random.default_rng(7)
        aas = list("ACDEFGHIKLMNPQRSTVWY")
        sm = ScoringMatrix.from_name("BLOSUM62")
        for _ in range(3):
            q = "".join(rng.choice(aas, size=int(rng.integers(4, 50))))
            targets = ["".join(rng.choice(aas,
                                          size=int(rng.integers(2, 60))))
                       for _ in range(9)]
            ref = nw_score_many(q, targets, sm, 10, 1, force_python=True)
            dev = nw_score_many_device(q, targets, sm, 10, 1)
            assert np.array_equal(ref, dev)

    def test_gap_params_and_auto_matrix(self):
        from metagenomic_deepfri_tpu.align.matrices import \
            resolve_scoring_matrix
        from metagenomic_deepfri_tpu.ops.nw import (nw_score_many,
                                                    nw_score_many_device)

        rng = np.random.default_rng(8)
        aas = list("ACDEFGHIKLMNPQRSTVWY")
        sm = resolve_scoring_matrix("auto")
        q = "".join(rng.choice(aas, size=25))
        targets = ["".join(rng.choice(aas, size=n)) for n in (5, 25, 40)]
        for go, ge in ((10, 1), (11, 2), (5, 4)):
            ref = nw_score_many(q, targets, sm, go, ge, force_python=True)
            dev = nw_score_many_device(q, targets, sm, go, ge)
            assert np.array_equal(ref, dev)

    def test_empty_targets(self):
        from metagenomic_deepfri_tpu.ops.nw import nw_score_many_device

        sm = ScoringMatrix.from_name("BLOSUM62")
        assert nw_score_many_device("ACDE", [], sm).shape == (0,)


class TestMatrixResolution:
    """Strict named-matrix resolution + the 'auto' default policy
    (reference default VTML80, alignment.py:271)."""

    def test_unknown_name_is_hard_error(self):
        import pytest

        with pytest.raises(ValueError, match="scoring-matrices"):
            ScoringMatrix.from_name("NOSUCHMATRIX99")

    def test_auto_policy(self, caplog):
        import logging

        from metagenomic_deepfri_tpu.align import matrices

        # In this environment VTML80 data may or may not be resolvable;
        # 'auto' must return *something usable* either way and only warn
        # when degrading.
        matrices._AUTO_WARNED = False
        with caplog.at_level(logging.WARNING):
            sm = matrices.resolve_scoring_matrix("auto")
        assert sm.name in ("VTML80", "BLOSUM62")
        degraded = sm.name == "BLOSUM62"
        assert any("VTML80" in r.message for r in caplog.records) == degraded

    def test_explicit_blosum62_never_warns(self, caplog):
        import logging

        with caplog.at_level(logging.WARNING):
            sm = ScoringMatrix.from_name("blosum62")
        assert sm.name == "BLOSUM62"
        assert not caplog.records

    def test_matrix_dir_env_and_file_roundtrip(self, tmp_path, monkeypatch):
        # Write a tiny NCBI-format matrix, resolve via $MDEEPFRI_MATRIX_DIR.
        content = ("# toy matrix\n"
                   "   A  C  X\n"
                   "A  4 -2 -1\n"
                   "C -2  9 -1\n"
                   "X -1 -1 -1\n")
        (tmp_path / "TOY3.out").write_text(content)
        monkeypatch.setenv("MDEEPFRI_MATRIX_DIR", str(tmp_path))
        sm = ScoringMatrix.from_name("toy3")
        assert sm.score("A", "A") == 4
        assert sm.score("a", "c") == -2
        assert sm.score("A", "Z") == -1  # unknown chars score as X

    def test_bundled_data_dir_pickup(self, monkeypatch, tmp_path):
        import shutil
        from pathlib import Path

        from metagenomic_deepfri_tpu.align import matrices

        data_dir = Path(matrices.__file__).parent / "data"
        data_dir.mkdir(exist_ok=True)
        target = data_dir / "TOY4.out"
        target.write_text("   A  R\nA  5 -1\nR -1  6\n")
        try:
            sm = ScoringMatrix.from_name("TOY4")
            assert sm.score("R", "R") == 6
        finally:
            target.unlink()

    def test_scoring_matrices_pkg_passthrough(self):
        import pytest

        pytest.importorskip("scoring_matrices")
        sm = ScoringMatrix.from_name("VTML80")
        assert sm.name == "VTML80"
        assert sm.matrix.shape[0] == len(sm.alphabet)
        # VTML family invariants: symmetric, positive diagonal.
        assert np.array_equal(sm.matrix, sm.matrix.T)
        assert all(sm.score(c, c) > 0 for c in "ARNDCQEGHILKMFPSTWYV")


def test_targets_by_query_matches_per_query_scan():
    """The one-pass query→targets mapping must equal per-query
    get_query_targets (same sorted-unique order — best-hit tie-breaking
    depends on it)."""
    import numpy as np

    from metagenomic_deepfri_tpu.search.results import SearchResults, _dtype

    rng = np.random.default_rng(3)
    tbl = np.zeros(500, dtype=_dtype())
    tbl["query"] = [f"q{rng.integers(40)}" for _ in range(500)]
    tbl["target"] = [f"t{rng.integers(60)}" for _ in range(500)]
    sr = SearchResults(tbl)
    mapping = sr.targets_by_query()
    assert set(mapping) == set(sr.get_queries())
    for q in sr.get_queries():
        assert np.array_equal(mapping[q], sr.get_query_targets(q))
    assert SearchResults(np.zeros(0, dtype=_dtype())).targets_by_query() == {}
