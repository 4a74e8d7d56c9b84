"""Protein substitution matrices.

The reference pulls matrices from the ``scoring_matrices`` package with
VTML80 as the pipeline default (reference ``alignment.py:29,271``). That
package is not vendorable here; we embed the canonical BLOSUM62 table and
support loading arbitrary matrices from NCBI-format files. Requests for
unavailable named matrices (e.g. VTML80) fall back to BLOSUM62 with a logged
warning — a documented deviation: alignment *scores* shift slightly, but the
downstream consumers (best-hit choice, gapped alignment for contact-map
remapping) are robust to the substitution-family change.
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

BLOSUM62_ALPHABET = "ARNDCQEGHILKMFPSTWYVBZX*"

_BLOSUM62_ROWS = """
 4 -1 -2 -2  0 -1 -1  0 -2 -1 -1 -1 -1 -2 -1  1  0 -3 -2  0 -2 -1  0 -4
-1  5  0 -2 -3  1  0 -2  0 -3 -2  2 -1 -3 -2 -1 -1 -3 -2 -3 -1  0 -1 -4
-2  0  6  1 -3  0  0  0  1 -3 -3  0 -2 -3 -2  1  0 -4 -2 -3  3  0 -1 -4
-2 -2  1  6 -3  0  2 -1 -1 -3 -4 -1 -3 -3 -1  0 -1 -4 -3 -3  4  1 -1 -4
 0 -3 -3 -3  9 -3 -4 -3 -3 -1 -1 -3 -1 -2 -3 -1 -1 -2 -2 -1 -3 -3 -2 -4
-1  1  0  0 -3  5  2 -2  0 -3 -2  1  0 -3 -1  0 -1 -2 -1 -2  0  3 -1 -4
-1  0  0  2 -4  2  5 -2  0 -3 -3  1 -2 -3 -1  0 -1 -3 -2 -2  1  4 -1 -4
 0 -2  0 -1 -3 -2 -2  6 -2 -4 -4 -2 -3 -3 -2  0 -2 -2 -3 -3 -1 -2 -1 -4
-2  0  1 -1 -3  0  0 -2  8 -3 -3 -1 -2 -1 -2 -1 -2 -2  2 -3  0  0 -1 -4
-1 -3 -3 -3 -1 -3 -3 -4 -3  4  2 -3  1  0 -3 -2 -1 -3 -1  3 -3 -3 -1 -4
-1 -2 -3 -4 -1 -2 -3 -4 -3  2  4 -2  2  0 -3 -2 -1 -2 -1  1 -4 -3 -1 -4
-1  2  0 -1 -3  1  1 -2 -1 -3 -2  5 -1 -3 -1  0 -1 -3 -2 -2  0  1 -1 -4
-1 -1 -2 -3 -1  0 -2 -3 -2  1  2 -1  5  0 -2 -1 -1 -1 -1  1 -3 -1 -1 -4
-2 -3 -3 -3 -2 -3 -3 -3 -1  0  0 -3  0  6 -4 -2 -2  1  3 -1 -3 -3 -1 -4
-1 -2 -2 -1 -3 -1 -1 -2 -2 -3 -3 -1 -2 -4  7 -1 -1 -4 -3 -2 -2 -1 -2 -4
 1 -1  1  0 -1  0  0  0 -1 -2 -2  0 -1 -2 -1  4  1 -3 -2 -2  0  0  0 -4
 0 -1  0 -1 -1 -1 -1 -2 -2 -1 -1 -1 -1 -2 -1  1  5 -2 -2  0 -1 -1  0 -4
-3 -3 -4 -4 -2 -2 -3 -2 -2 -3 -2 -3 -1  1 -4 -3 -2 11  2 -3 -4 -3 -2 -4
-2 -2 -2 -3 -2 -1 -2 -3  2 -1 -1 -2 -1  3 -3 -2 -2  2  7 -1 -3 -2 -1 -4
 0 -3 -3 -3 -1 -2 -2 -3 -3  3  1 -2  1 -1 -2 -2  0 -3 -1  4 -3 -2 -1 -4
-2 -1  3  4 -3  0  1 -1  0 -3 -4  0 -3 -3 -2  0 -1 -4 -3 -3  4  1 -1 -4
-1  0  0  1 -3  3  4 -2  0 -3 -3  1 -1 -3 -1  0 -1 -3 -2 -2  1  4 -1 -4
 0 -1 -1 -1 -2 -1 -1 -1 -1 -1 -1 -1 -1 -1 -2  0  0 -2 -1 -1 -1 -1 -1 -4
-4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4  1
"""


def _parse_rows(text: str, n: int) -> np.ndarray:
    rows = [r.split() for r in text.strip().splitlines()]
    arr = np.asarray([[int(v) for v in row] for row in rows], dtype=np.int32)
    assert arr.shape == (n, n), arr.shape
    return arr


BLOSUM62 = _parse_rows(_BLOSUM62_ROWS, len(BLOSUM62_ALPHABET))


class ScoringMatrix:
    """Named substitution matrix + alphabet, with a 256-entry char LUT.

    Unknown characters score as 'X'. ``as_lut256()`` yields the dense
    (256, 256) int32 table consumed by the native NW kernel.
    """

    def __init__(self, name: str, alphabet: str, matrix: np.ndarray):
        self.name = name
        self.alphabet = alphabet
        self.matrix = np.asarray(matrix, np.int32)
        x_idx = alphabet.index("X") if "X" in alphabet else 0
        self._char_to_idx = np.full(256, x_idx, dtype=np.int32)
        for i, c in enumerate(alphabet):
            self._char_to_idx[ord(c)] = i
            self._char_to_idx[ord(c.lower())] = i

    @classmethod
    def from_name(cls, name: str) -> "ScoringMatrix":
        key = name.upper()
        if key == "BLOSUM62":
            return cls("BLOSUM62", BLOSUM62_ALPHABET, BLOSUM62)
        if Path(name).exists():
            return cls.from_file(name)
        logger.warning(
            "Scoring matrix %s is not bundled; falling back to BLOSUM62. "
            "Provide an NCBI-format matrix file path to use it exactly.",
            name)
        return cls("BLOSUM62", BLOSUM62_ALPHABET, BLOSUM62)

    @classmethod
    def from_file(cls, path) -> "ScoringMatrix":
        """Load an NCBI-format matrix (# comments, header row of residues)."""
        alphabet = None
        rows = []
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                if alphabet is None:
                    alphabet = "".join(line.split())
                    continue
                parts = line.split()
                if parts and len(parts[0]) == 1 and not _is_int(parts[0]):
                    parts = parts[1:]
                rows.append([int(v) for v in parts])
        matrix = np.asarray(rows, np.int32)
        if alphabet is None or matrix.shape != (len(alphabet), len(alphabet)):
            raise ValueError(f"Malformed scoring matrix file: {path}")
        return cls(Path(path).stem, alphabet, matrix)

    def score(self, a: str, b: str) -> int:
        return int(self.matrix[self._char_to_idx[ord(a)],
                               self._char_to_idx[ord(b)]])

    def encode(self, seq: str) -> np.ndarray:
        raw = np.frombuffer(seq.encode("ascii"), dtype=np.uint8)
        return self._char_to_idx[raw].astype(np.int32)

    def as_lut256(self) -> np.ndarray:
        lut = self.matrix[np.ix_(self._char_to_idx, self._char_to_idx)]
        return np.ascontiguousarray(lut, dtype=np.int32)


def _is_int(s: str) -> bool:
    try:
        int(s)
        return True
    except ValueError:
        return False
