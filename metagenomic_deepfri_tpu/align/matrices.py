"""Protein substitution matrices.

The reference pulls matrices from the ``scoring_matrices`` package with
VTML80 as the pipeline default (reference ``alignment.py:29,271``).
Resolution order here, for exact reference-default semantics wherever the
data is obtainable:

1. bundled tables (BLOSUM62 below; any ``<NAME>.out`` NCBI-format file
   dropped into ``align/data/`` is picked up as a bundled matrix);
2. the ``scoring_matrices`` package itself, if importable — this is the
   reference's own data source, so VTML80 resolved through it is
   byte-identical to reference behaviour;
3. an NCBI-format matrix file: a direct path, or ``<NAME>.out`` under
   ``$MDEEPFRI_MATRIX_DIR``.

An unresolvable name is a **hard error** with remediation instructions —
never a silent substitution: swapping the matrix family shifts alignment
scores and can flip borderline best-hit choices, which must be an explicit
user decision (``--scoring-matrix blosum62``). VTML80's numeric table is
deliberately NOT transcribed inline: this build environment has no copy of
it and no network egress, and a from-memory reconstruction of 276 integers
in a scoring path would be unverifiable fabricated data.
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

# (name, matrix-dir env) → resolved ScoringMatrix (see from_name)
_MATRIX_CACHE: dict = {}


def _cache_key(name: str) -> tuple:
    """Cache key including the env-dir the resolution depends on, so
    changing MDEEPFRI_MATRIX_DIR (tests, long-lived processes) is not
    frozen by an earlier resolution."""
    import os

    return (name, os.environ.get("MDEEPFRI_MATRIX_DIR", ""))


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
        # Resolution walks bundled files / optional package / env dirs —
        # tens of stat() calls. Callers resolve once per ALIGNMENT TASK
        # (pipeline fan-out), so cache per (name, env dir); instances are
        # treated as read-only by every consumer.
        key = _cache_key(name.upper())
        cached = _MATRIX_CACHE.get(key)
        if cached is not None:
            return cached
        matrix = cls._from_name_uncached(name)
        _MATRIX_CACHE[key] = matrix
        return matrix

    @classmethod
    def _from_name_uncached(cls, name: str) -> "ScoringMatrix":
        key = name.upper()
        if key == "BLOSUM62":
            return cls("BLOSUM62", BLOSUM62_ALPHABET, BLOSUM62)
        bundled = Path(__file__).parent / "data" / f"{key}.out"
        if bundled.exists():
            return cls.from_file(bundled)
        pkg = cls._from_scoring_matrices_pkg(key)
        if pkg is not None:
            return pkg
        if Path(name).exists():
            return cls.from_file(name)
        import os

        matrix_dir = os.environ.get("MDEEPFRI_MATRIX_DIR")
        if matrix_dir:
            candidate = Path(matrix_dir) / f"{key}.out"
            if candidate.exists():
                return cls.from_file(candidate)
        raise ValueError(
            f"Scoring matrix {name!r} is not available in this "
            f"installation. Options: (a) `pip install scoring-matrices` "
            f"(the package the reference uses — gives the exact {key} "
            f"data); (b) place an NCBI-format {key}.out next to this "
            f"module under align/data/ or in $MDEEPFRI_MATRIX_DIR; "
            f"(c) pass a matrix file path directly; or (d) explicitly "
            f"choose a bundled matrix, e.g. --scoring-matrix blosum62.")

    @classmethod
    def _from_scoring_matrices_pkg(cls, key: str):
        """Resolve via the ``scoring_matrices`` package (the reference's
        data source, reference ``alignment.py:29``) when it is installed."""
        try:
            from scoring_matrices import ScoringMatrix as _SM
        except ImportError:
            return None
        try:
            sm = _SM.from_name(key)
        except Exception:
            return None
        alphabet = "".join(sm.alphabet)
        matrix = np.asarray(sm, dtype=np.float64)
        return cls(key, alphabet, np.rint(matrix).astype(np.int32))

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


_AUTO_WARNED = False


def resolve_scoring_matrix(name: str = "auto") -> ScoringMatrix:
    """Resolve the pipeline's scoring-matrix choice.

    ``'auto'`` (the default) means: the reference's default VTML80
    (reference ``alignment.py:271``) when its data is resolvable in this
    installation, otherwise BLOSUM62 with a prominent one-time warning —
    the *default* degrades visibly rather than refusing to run. Any
    explicit name goes through :meth:`ScoringMatrix.from_name` strictly
    and unresolvable names raise.
    """
    global _AUTO_WARNED
    if name.lower() != "auto":
        return ScoringMatrix.from_name(name)
    key = _cache_key("auto")
    cached = _MATRIX_CACHE.get(key)
    if cached is not None:
        if cached.name == "BLOSUM62":
            _warn_degraded_auto()
        return cached
    try:
        resolved = ScoringMatrix.from_name("VTML80")
    except ValueError:
        _warn_degraded_auto()
        resolved = ScoringMatrix.from_name("BLOSUM62")
    _MATRIX_CACHE[key] = resolved
    return resolved


def _warn_degraded_auto() -> None:
    global _AUTO_WARNED
    if _AUTO_WARNED:
        return
    logger.warning(
        "VTML80 (the reference default scoring matrix) is not "
        "available in this installation — aligning with BLOSUM62 "
        "instead. Best-hit choices may differ from the reference "
        "on borderline cases. Install `scoring-matrices` or drop "
        "a VTML80.out file into align/data/ for exact parity.")
    _AUTO_WARNED = True
