"""Contract tests for the external-binary integrations, driven by stub
executables — no real MMseqs2/FoldComp needed.

The stubs record every invocation and emit canned outputs, so these tests
pin the *subprocess contract*: verb order, flag spelling, and output
parsing (reference ``mmseqs.py:72-205`` for the mmseqs verbs,
``mmseqs.py:748-776`` for foldcomp extract + the ESM-header fix,
``pdb.py:149-161`` + ``bio_utils.py:305-345`` for FoldComp structure
decompression and suffix sniffing).
"""

import gzip
import stat
import sys
import types
from contextlib import contextmanager
from pathlib import Path

import numpy as np
import pytest

from metagenomic_deepfri_tpu.search.results import SEARCH_COLUMNS

QUERY_FASTA = ">q1\nMKVLATGGHHEE\n"
TARGET_FASTA = ">t1\nMKVLATGGHHEA\n>t2\nGGGGGG\n"

# One canned convertalis hit row, matching the 14-column contract.
HIT_ROW = ["q1", "t1", "0.92", "12", "1", "0", "1", "12", "1", "12",
           "1.0", "1.0", "1e-09", "55.0"]


def _write_script(path: Path, body: str):
    path.write_text(f"#!{sys.executable}\n" + body)
    path.chmod(path.stat().st_mode | stat.S_IEXEC)


@pytest.fixture
def fake_mmseqs(tmp_path, monkeypatch):
    """A stub `mmseqs` executable implementing the four verbs the wrapper
    issues, logging each full command line to cmd.log."""
    log = tmp_path / "cmd.log"
    script = tmp_path / "mmseqs"
    hit = "\\t".join(HIT_ROW)
    header = "\\t".join(SEARCH_COLUMNS)
    _write_script(script, f"""
import sys
from pathlib import Path

args = sys.argv[1:]
with open({str(log)!r}, "a") as f:
    f.write(" ".join(args) + "\\n")
verb = args[0]
positional = [a for a in args[1:] if not a.startswith("-")]
# strip flag values: walk and drop the token following a known value-flag
vals = []
skip = False
flag_with_value = {{"-e", "--threads", "-s", "--format-mode",
                    "--format-output", "--dbtype"}}
for i, a in enumerate(args[1:]):
    if skip:
        skip = False
        continue
    if a in flag_with_value:
        skip = True
        continue
    if a.startswith("-"):
        continue
    vals.append(a)
if verb == "createdb":
    Path(vals[1]).write_text("stub mmseqsDB for " + vals[0])
elif verb == "createindex":
    Path(vals[0] + ".idx").write_text("stub index")
elif verb == "search":
    Path(vals[2]).write_text("stub resultDB")
elif verb == "convertalis":
    Path(vals[3]).write_text("{header}\\n{hit}\\n")
else:
    sys.exit("unknown verb: " + verb)
""")
    monkeypatch.setenv("MDEEPFRI_MMSEQS_PATH", str(script))
    return log


@pytest.fixture
def fake_foldcomp_bin(tmp_path, monkeypatch):
    """A stub `foldcomp` executable handling `extract --fasta`, emitting a
    FASTA with ESMFold-style headers."""
    log = tmp_path / "foldcomp_cmd.log"
    script = tmp_path / "foldcomp"
    _write_script(script, f"""
import sys
from pathlib import Path

args = sys.argv[1:]
with open({str(log)!r}, "a") as f:
    f.write(" ".join(args) + "\\n")
assert args[0] == "extract" and "--fasta" in args, args
out = Path(args[-1])
out.write_text(
    ">ESMFOLD V0 PREDICTION FOR MGYP000111\\nMKVLAT\\n"
    ">ESMFOLD V0 PREDICTION FOR MGYP000222\\nGGHHEE\\n")
""")
    monkeypatch.setenv("MDEEPFRI_FOLDCOMP_PATH", str(script))
    return log


class TestMMseqsContract:
    def test_search_verb_sequence_and_parsing(self, tmp_path, fake_mmseqs):
        from metagenomic_deepfri_tpu.search.mmseqs import mmseqs_search

        query = tmp_path / "query.faa"
        query.write_text(QUERY_FASTA)
        target = tmp_path / "targets.faa"
        target.write_text(TARGET_FASTA)

        results = mmseqs_search(query, target, sensitivity=5.7,
                                max_eval=1e-4, threads=2)

        # Parsed canned hit comes back through SearchResults.
        assert len(results) == 1
        assert results["query"][0] == "q1"
        assert results["target"][0] == "t1"
        assert results["fident"][0] == pytest.approx(0.92)
        assert results["bits"][0] == pytest.approx(55.0)

        lines = fake_mmseqs.read_text().strip().splitlines()
        verbs = [ln.split()[0] for ln in lines]
        # query createdb, target createdb, search, convertalis — in order.
        assert verbs == ["createdb", "createdb", "search", "convertalis"]
        assert "--dbtype 1" in lines[0]
        assert str(query) in lines[0]
        assert str(target) in lines[1]
        assert "-e 0.0001" in lines[2]
        assert "-s 5.7" in lines[2]
        assert "--threads 2" in lines[2]
        assert "--format-mode 4" in lines[3]
        assert "--format-output " + ",".join(SEARCH_COLUMNS) in lines[3]

    def test_target_db_cached_between_searches(self, tmp_path, fake_mmseqs):
        from metagenomic_deepfri_tpu.search.mmseqs import mmseqs_search

        query = tmp_path / "query.faa"
        query.write_text(QUERY_FASTA)
        target = tmp_path / "targets.faa"
        target.write_text(TARGET_FASTA)

        mmseqs_search(query, target)
        mmseqs_search(query, target)
        verbs = [ln.split()[0]
                 for ln in fake_mmseqs.read_text().strip().splitlines()]
        # The target .mmseqsDB exists after run 1 → run 2 only creates the
        # query DB (reference caching semantics, database.py:139-159).
        assert verbs.count("createdb") == 3

    def test_index_target(self, tmp_path, fake_mmseqs):
        from metagenomic_deepfri_tpu.search.mmseqs import mmseqs_search

        query = tmp_path / "query.faa"
        query.write_text(QUERY_FASTA)
        target = tmp_path / "targets.faa"
        target.write_text(TARGET_FASTA)

        mmseqs_search(query, target, index_target=True, threads=3)
        lines = fake_mmseqs.read_text().strip().splitlines()
        verbs = [ln.split()[0] for ln in lines]
        assert "createindex" in verbs
        idx_line = lines[verbs.index("createindex")]
        assert "--threads 3" in idx_line


class TestFoldCompBinaryContract:
    def test_extract_fasta_with_esm_header_fix(self, tmp_path,
                                               fake_foldcomp_bin):
        from metagenomic_deepfri_tpu.search.database import \
            extract_fasta_foldcomp

        db = tmp_path / "highquality_clust30"
        db.write_bytes(b"\x00\x01fake fcz")
        out = tmp_path / "extracted.fasta"

        gz = extract_fasta_foldcomp(db, out, threads=4)

        cmd = fake_foldcomp_bin.read_text().strip()
        assert cmd.startswith("extract --fasta -t 4")
        assert str(db) in cmd
        # plain file replaced by the gzipped one
        assert not out.exists()
        assert gz == Path(str(out) + ".gz")
        with gzip.open(gz, "rt") as f:
            text = f.read()
        # ESM prefix stripped (reference mmseqs.py:772-776 sed fix)
        assert ">MGYP000111\n" in text
        assert ">MGYP000222\n" in text
        assert "ESMFOLD" not in text

    def test_non_esm_database_headers_untouched(self, tmp_path,
                                                fake_foldcomp_bin):
        from metagenomic_deepfri_tpu.search.database import \
            extract_fasta_foldcomp

        db = tmp_path / "my_afdb_subset"
        db.write_bytes(b"\x00\x01fake fcz")
        out = tmp_path / "extracted.fasta"
        gz = extract_fasta_foldcomp(db, out)
        with gzip.open(gz, "rt") as f:
            text = f.read()
        assert ">ESMFOLD V0 PREDICTION FOR MGYP000111\n" in text

    def test_build_database_from_fcz(self, tmp_path, fake_foldcomp_bin,
                                     monkeypatch):
        from metagenomic_deepfri_tpu.search.database import build_database

        monkeypatch.delenv("MDEEPFRI_MMSEQS_PATH", raising=False)
        monkeypatch.setenv("PATH", str(tmp_path / "nowhere"))
        db_file = tmp_path / "esmatlas.fcz"
        db_file.write_bytes(b"\x00\x01fake fcz")
        outdir = tmp_path / "dbout"

        db = build_database(db_file, outdir)

        assert db.name == "esmatlas"
        assert db.sequence_db.exists()
        with gzip.open(db.sequence_db, "rt") as f:
            text = f.read()
        # esmatlas is an ESM database → header fix applied during build
        assert ">MGYP000111\n" in text


@contextmanager
def _fake_foldcomp_module(entries):
    """Install a fake `foldcomp` python-bindings module whose open() yields
    (name, pdb) for requested ids, KeyError on unknown ids."""
    mod = types.ModuleType("foldcomp")

    class _Db:
        def __init__(self, ids):
            self.ids = ids

        def __enter__(self):
            missing = [i for i in self.ids if i not in entries]
            if missing:
                raise KeyError(missing[0])
            return iter([(i, entries[i]) for i in self.ids])

        def __exit__(self, *exc):
            return False

    mod.open = lambda path, ids: _Db(ids)
    saved = sys.modules.get("foldcomp")
    sys.modules["foldcomp"] = mod
    try:
        yield
    finally:
        if saved is None:
            del sys.modules["foldcomp"]
        else:
            sys.modules["foldcomp"] = saved


FAKE_PDB = (
    "ATOM      1  CA  MET A   1      11.639   6.071  -5.147  1.00  0.00"
    "           C\n"
    "ATOM      2  CA  LYS A   2      12.685   9.140  -4.392  1.00  0.00"
    "           C\n"
    "END\n")


class TestFoldCompBindingsDispatch:
    def test_get_structures_and_sniff_suffix(self):
        from metagenomic_deepfri_tpu.search.pdb import (
            foldcomp_sniff_suffix, get_foldcomp_structures)

        with _fake_foldcomp_module({"AF-X1.pdb": FAKE_PDB}):
            # bare id missing, '.pdb'-suffixed id present → suffix detected
            assert foldcomp_sniff_suffix("AF-X1", "db.fcz") == ".pdb"
            structs = get_foldcomp_structures(["AF-X1.pdb"], "db.fcz")
            assert structs == [FAKE_PDB]

        with _fake_foldcomp_module({"AF-X1": FAKE_PDB}):
            assert foldcomp_sniff_suffix("AF-X1", "db.fcz") is None

    def test_extract_calpha_coords_fcz_dispatch(self, tmp_path):
        from metagenomic_deepfri_tpu.search.database import Database
        from metagenomic_deepfri_tpu.search.pdb import extract_calpha_coords

        fcz = tmp_path / "esm_subset.fcz"
        fcz.write_bytes(b"\x00fake")
        db = Database(foldcomp_db=fcz, sequence_db=tmp_path / "esm_subset.fa",
                      mmseqs_db=tmp_path / "esm_subset.mmseqsDB")

        with _fake_foldcomp_module({"T1.pdb": FAKE_PDB}):
            coords = extract_calpha_coords(db, ["T1"], ["q1"],
                                           save_directory=tmp_path)
        assert len(coords) == 1
        np.testing.assert_allclose(coords[0][0], [11.639, 6.071, -5.147])
        # decompressed structure persisted for debugging/rescue
        assert (tmp_path / "T1.pdb.pdb").exists() or \
            (tmp_path / "T1.pdb").exists()

    def test_missing_bindings_is_actionable(self, monkeypatch):
        from metagenomic_deepfri_tpu.search.pdb import \
            get_foldcomp_structures

        monkeypatch.setitem(sys.modules, "foldcomp", None)
        with pytest.raises((RuntimeError, ImportError),
                           match="[Ff]old[Cc]omp"):
            get_foldcomp_structures(["x"], "db.fcz")
