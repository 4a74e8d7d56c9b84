"""Needleman–Wunsch alignment: ctypes binding to the native engine + fallback.

API mirrors what the pipeline needs from pyOpal (reference
``alignment.py:163-220``): score-mode one-vs-many ranking and full-mode
alignment returning an M/I/D string with identity/coverage statistics.

The native path (``native/nw.cpp``, OpenMP) is used when g++ is available;
``force_python=True`` or build failure falls back to a numpy Gotoh
implementation with identical semantics (used as the parity oracle in tests).
"""

from __future__ import annotations

import ctypes
import logging
from typing import List, Optional, Tuple

import numpy as np

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover — runtime import would be circular
    # (align.__init__ imports align.pairwise which imports this module)
    from metagenomic_deepfri_tpu.align.matrices import ScoringMatrix

logger = logging.getLogger(__name__)

_NEG_INF = np.int32(-(2 ** 29))

_lib = None
_lib_failed = False


def _load_library():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        from metagenomic_deepfri_tpu.native.build import ensure_built
        path = ensure_built("nw")
        lib = ctypes.CDLL(str(path))
        lib.nw_align.restype = ctypes.c_int32
        lib.nw_align.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
        ]
        lib.nw_score_batch.restype = None
        lib.nw_score_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
    except Exception as exc:  # pragma: no cover - depends on toolchain
        logger.warning("Native NW unavailable (%s); using Python fallback.",
                       exc)
        _lib_failed = True
    return _lib


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


# ---------------------------------------------------------------------------
# Python (numpy) reference implementation
# ---------------------------------------------------------------------------

def _nw_align_python(q: np.ndarray, t: np.ndarray, matrix: np.ndarray,
                     gap_open: int, gap_extend: int) -> Tuple[int, str]:
    m, n = len(q), len(t)
    H = np.full((m + 1, n + 1), _NEG_INF, np.int32)
    E = np.full((m + 1, n + 1), _NEG_INF, np.int32)
    F = np.full((m + 1, n + 1), _NEG_INF, np.int32)
    tb = np.zeros((m + 1, n + 1), np.uint8)
    H[0, 0] = 0
    for j in range(1, n + 1):
        E[0, j] = -gap_open - (j - 1) * gap_extend
        H[0, j] = E[0, j]
        tb[0, j] = 1 | (4 if j > 1 else 0)
    for i in range(1, m + 1):
        H[i, 0] = -gap_open - (i - 1) * gap_extend
        F[i, 0] = H[i, 0]
        tb[i, 0] = 2 | (8 if i > 1 else 0)
        srow = matrix[q[i - 1]]
        for j in range(1, n + 1):
            e_open = H[i, j - 1] - gap_open
            e_ext = E[i, j - 1] - gap_extend
            E[i, j] = max(e_open, e_ext)
            f_open = H[i - 1, j] - gap_open
            f_ext = F[i - 1, j] - gap_extend
            F[i, j] = max(f_open, f_ext)
            diag = H[i - 1, j - 1] + srow[t[j - 1]]
            best, flags = diag, 0
            if E[i, j] > best:
                best, flags = E[i, j], 1
            if F[i, j] > best:
                best, flags = F[i, j], 2
            if e_ext > e_open:
                flags |= 4
            if f_ext > f_open:
                flags |= 8
            H[i, j] = best
            tb[i, j] = flags
    # traceback
    i, j = m, n
    state = 0
    out = []
    while i > 0 or j > 0:
        flags = tb[i, j]
        if state == 0:
            if i == 0:
                state = 1
            elif j == 0:
                state = 2
            else:
                state = flags & 3
            if state == 0:
                out.append("M")
                i -= 1
                j -= 1
                continue
        if state == 1:
            out.append("I")
            if not flags & 4:
                state = 0
            j -= 1
        else:
            out.append("D")
            if not flags & 8:
                state = 0
            i -= 1
    return int(H[m, n]), "".join(reversed(out))


def _nw_score_python(q, t, matrix, gap_open, gap_extend) -> int:
    score, _ = _nw_align_python(q, t, matrix, gap_open, gap_extend)
    return score


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def nw_align(query: str, target: str, scoring: ScoringMatrix,
             gap_open: int = 10, gap_extend: int = 1,
             force_python: bool = False) -> Tuple[int, str]:
    """Global alignment; returns (score, alignment string of M/I/D).

    'I' = gap in query, 'D' = gap in target — the convention consumed by
    :func:`metagenomic_deepfri_tpu.align.pairwise.insert_gaps`.
    """
    q = scoring.encode(query)
    t = scoring.encode(target)
    lib = None if force_python else _load_library()
    if lib is None:
        return _nw_align_python(q, t, scoring.matrix, gap_open, gap_extend)
    out_buf = ctypes.create_string_buffer(len(q) + len(t) + 1)
    out_len = ctypes.c_int32(0)
    matrix = np.ascontiguousarray(scoring.matrix, np.int32)
    score = lib.nw_align(
        _ptr(q, ctypes.c_int32), len(q),
        _ptr(t, ctypes.c_int32), len(t),
        _ptr(matrix, ctypes.c_int32), matrix.shape[0],
        gap_open, gap_extend, out_buf, ctypes.byref(out_len))
    return int(score), out_buf.raw[: out_len.value].decode("ascii")


def nw_score_many(query: str, targets: List[str], scoring: ScoringMatrix,
                  gap_open: int = 10, gap_extend: int = 1,
                  threads: int = 1,
                  force_python: bool = False) -> np.ndarray:
    """Scores of the query against each target (one-vs-many 'score' mode)."""
    q = scoring.encode(query)
    matrix = np.ascontiguousarray(scoring.matrix, np.int32)
    lib = None if force_python else _load_library()
    if lib is None:
        return np.asarray([
            _nw_score_python(q, scoring.encode(t), matrix, gap_open,
                             gap_extend) for t in targets], np.int32)
    encoded = [scoring.encode(t) for t in targets]
    offsets = np.zeros(len(targets) + 1, np.int64)
    offsets[1:] = np.cumsum([len(e) for e in encoded])
    concat = (np.concatenate(encoded) if encoded
              else np.zeros(0, np.int32)).astype(np.int32)
    scores = np.zeros(len(targets), np.int32)
    lib.nw_score_batch(
        _ptr(q, ctypes.c_int32), len(q),
        _ptr(concat, ctypes.c_int32), _ptr(offsets, ctypes.c_int64),
        len(targets),
        _ptr(matrix, ctypes.c_int32), matrix.shape[0],
        gap_open, gap_extend, threads, _ptr(scores, ctypes.c_int32))
    return scores


def alignment_stats(query: str, target: str,
                    alignment: str) -> Tuple[float, float, float]:
    """(identity, query_coverage, target_coverage) for an M/I/D alignment.

    identity = exact residue matches / alignment length (pyOpal
    ``identity()`` semantics); coverages = consumed residues / sequence
    length (1.0 for global alignment).
    """
    qi = ti = matches = q_cons = t_cons = 0
    for a in alignment:
        if a == "I":
            ti += 1
            t_cons += 1
        elif a == "D":
            qi += 1
            q_cons += 1
        else:
            if qi < len(query) and ti < len(target) and \
                    query[qi].upper() == target[ti].upper():
                matches += 1
            qi += 1
            ti += 1
            q_cons += 1
            t_cons += 1
    length = len(alignment) if alignment else 1
    return (matches / length,
            q_cons / max(len(query), 1),
            t_cons / max(len(target), 1))


# ---------------------------------------------------------------------------
# Device (TPU) score-mode NW: batched anti-diagonal wavefront scan.
# ---------------------------------------------------------------------------

def _shift_right(x, fill):
    """Shift (B, W) one step along the last axis, filling column 0."""
    import jax.numpy as jnp

    return jnp.concatenate(
        [jnp.full((x.shape[0], 1), fill, x.dtype), x[:, :-1]], axis=1)


def nw_scores_device(query_tokens: np.ndarray,
                     target_tokens: np.ndarray,
                     target_lengths: np.ndarray,
                     matrix: np.ndarray,
                     gap_open: int = 10,
                     gap_extend: int = 1):
    """Batched global affine-gap NW scores on device (one query vs B targets).

    The DP is reformulated as a ``lax.scan`` over anti-diagonals: every cell
    on a diagonal depends only on the two previous diagonals, so each scan
    step is a fully vectorised (B, m+1) VPU update with no within-step
    dependency (the classic wavefront trick; the substitution scores are
    pre-skewed into diagonal layout outside the scan so the loop body does
    no gathers). Exact int32 arithmetic — bit-identical scores to the
    C++/numpy host path (`_nw_score_python`), verified by tests.

    Args:
        query_tokens: (m,) int32 encoded query.
        target_tokens: (B, N) int32 encoded targets, padded arbitrarily.
        target_lengths: (B,) int32 true lengths (≥ 1).
        matrix: (A, A) int32 substitution matrix.

    Returns:
        (B,) int32 device array of global alignment scores.
    """
    import jax
    import jax.numpy as jnp

    return _ensure_device_jit()(
        jnp.asarray(query_tokens, jnp.int32),
        jnp.asarray(target_tokens, jnp.int32),
        jnp.asarray(target_lengths, jnp.int32),
        jnp.asarray(matrix, jnp.int32),
        int(gap_open), int(gap_extend))


def _nw_scores_device_impl(q, t, lengths, matrix, gap_open, gap_extend):
    import jax
    import jax.numpy as jnp

    m = q.shape[0]
    B, N = t.shape
    NEG = jnp.int32(_NEG_INF)
    go = jnp.int32(gap_open)
    ge = jnp.int32(gap_extend)

    # Substitution scores skewed to diagonal layout outside the scan:
    # S_diag[k-1, b, i] = matrix[q[i-1], t[b, k-i-1]] for cell (i, j=k-i).
    prof = matrix[q]                                   # (m, A)
    S = jnp.moveaxis(jnp.take(prof, t, axis=1), 1, 0)  # (B, m, N)
    K = m + N
    k_idx = jnp.arange(1, K + 1)[:, None]              # (K, 1)
    i_idx = jnp.arange(m + 1)[None, :]                 # (1, m+1)
    j_idx = k_idx - i_idx
    interior = (i_idx >= 1) & (j_idx >= 1) & (i_idx <= m) & (j_idx <= N)
    gi = jnp.clip(i_idx - 1, 0, m - 1)
    gj = jnp.clip(j_idx - 1, 0, N - 1)
    S_diag = jnp.where(interior[None], S[:, gi, gj], 0)  # (B, K, m+1)
    S_diag = jnp.moveaxis(S_diag, 1, 0)                  # (K, B, m+1)

    i_row = jnp.arange(m + 1)[None, :]                   # (1, m+1)

    H0 = jnp.full((B, m + 1), NEG, jnp.int32).at[:, 0].set(0)
    Hm1 = jnp.full((B, m + 1), NEG, jnp.int32)
    E0 = jnp.full((B, m + 1), NEG, jnp.int32)
    F0 = jnp.full((B, m + 1), NEG, jnp.int32)

    def step(carry, xs):
        H1, H2, E1, F1 = carry               # diag k-1, k-2, E/F at k-1
        k, s_k = xs
        j_row = k - i_row
        on_grid = (j_row >= 0) & (i_row <= k) & (j_row <= N)
        bval = -go - (k - 1) * ge
        # E: gap consuming target — cell (i, j-1) is diag k-1, index i.
        E_new = jnp.maximum(H1 - go, E1 - ge)
        # F: gap consuming query — cell (i-1, j) is diag k-1, index i-1.
        F_new = jnp.maximum(_shift_right(H1, NEG) - go,
                            _shift_right(F1, NEG) - ge)
        # Match: cell (i-1, j-1) is diag k-2, index i-1.
        diag = _shift_right(H2, NEG) + s_k
        H_new = jnp.maximum(diag, jnp.maximum(E_new, F_new))
        # Boundaries: first row (i=0) and first column (j=0).
        H_new = jnp.where(i_row == 0, bval, H_new)
        E_new = jnp.where(i_row == 0, bval, E_new)
        H_new = jnp.where(j_row == 0, bval, H_new)
        F_new = jnp.where(j_row == 0, bval, F_new)
        H_new = jnp.where(on_grid, H_new, NEG)
        E_new = jnp.where(on_grid, E_new, NEG)
        F_new = jnp.where(on_grid, F_new, NEG)
        return (H_new, H1, E_new, F_new), H_new[:, m]

    ks = jnp.arange(1, K + 1, dtype=jnp.int32)
    (_, _, _, _), ys = jax.lax.scan(step, (H0, Hm1, E0, F0), (ks, S_diag))
    # score[b] = H[m, n_b], which lives on diagonal k = m + n_b → ys row
    # (m + n_b - 1); ys is (K, B).
    rows = m + lengths - 1
    return jnp.take_along_axis(ys, rows[None, :], axis=0)[0]


from functools import partial as _partial  # noqa: E402

_nw_scores_device_jit = None


def _ensure_device_jit():
    global _nw_scores_device_jit
    if _nw_scores_device_jit is None:
        import jax

        _nw_scores_device_jit = jax.jit(
            _nw_scores_device_impl, static_argnums=(4, 5))
    return _nw_scores_device_jit


def nw_score_many_device(query: str, targets: List[str],
                         scoring: ScoringMatrix,
                         gap_open: int = 10,
                         gap_extend: int = 1) -> np.ndarray:
    """Device wavefront counterpart of :func:`nw_score_many`.

    Pads targets to the max length (round up to 32 to bound compiled
    shapes) and runs one batched wavefront scan. Useful when ranking a
    query against MANY candidates with the accelerator otherwise idle; the
    OpenMP host path remains the default inside the pipeline, where the
    device is busy with inference.
    """
    if not targets:
        return np.zeros(0, np.int32)
    q = scoring.encode(query)
    encoded = [scoring.encode(t) for t in targets]
    N = max(len(e) for e in encoded)
    N = -(-N // 32) * 32
    batch = np.zeros((len(encoded), N), np.int32)
    lengths = np.zeros(len(encoded), np.int32)
    for i, e in enumerate(encoded):
        batch[i, : len(e)] = e
        lengths[i] = len(e)
    fn = _ensure_device_jit()
    import jax.numpy as jnp

    scores = fn(jnp.asarray(q, jnp.int32), jnp.asarray(batch),
                jnp.asarray(lengths),
                jnp.asarray(np.ascontiguousarray(scoring.matrix, np.int32)),
                int(gap_open), int(gap_extend))
    return np.asarray(scores, np.int32)
