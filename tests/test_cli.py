"""CLI wiring tests (reference ``tests/test_cli.py`` scope: version + help),
plus a real make-cmaps run."""

import numpy as np
from click.testing import CliRunner

from metagenomic_deepfri_tpu import __version__
from metagenomic_deepfri_tpu.cli import main

PDB = """ATOM      2  CA  MET A   1      11.639   6.071  -5.147  1.00  0.00           C
ATOM      3  CA  LYS A   2      12.685   9.140  -4.392  1.00  0.00           C
ATOM      4  CA  GLY A   3      15.125   8.370  -1.512  1.00  0.00           C
END
"""


def test_version():
    result = CliRunner().invoke(main, ["--version"])
    assert result.exit_code == 0
    assert __version__ in result.output


def test_help_lists_commands():
    result = CliRunner().invoke(main, ["--help"])
    assert result.exit_code == 0
    for cmd in ("get-models", "generate-config", "search-databases",
                "predict-function", "make-cmaps", "benchmark"):
        assert cmd in result.output


def test_subcommand_help():
    for cmd in ("predict-function", "search-databases"):
        result = CliRunner().invoke(main, [cmd, "--help"])
        assert result.exit_code == 0
        assert "--mmseqs-min-coverage" in result.output


def test_make_cmaps(tmp_path):
    (tmp_path / "in").mkdir()
    (tmp_path / "in" / "test.pdb").write_text(PDB)
    result = CliRunner().invoke(main, [
        "make-cmaps", "-i", str(tmp_path / "in"),
        "-o", str(tmp_path / "out"), "-t", "6.0"])
    assert result.exit_code == 0, result.output
    cmap = np.load(tmp_path / "out" / "test_cmap.npy")
    assert cmap.shape == (3, 3)
    assert cmap[0, 1] == 1  # consecutive CAs ~3.8 Å apart
