"""Native (C++) runtime components.

The reference ships Cython extensions plus vendored C++ binaries (SURVEY.md
§2.2). Here the native layer is plain C++ built with g++ into shared
libraries loaded via ctypes:

- ``nw.cpp`` — Gotoh affine Needleman–Wunsch (score-batch + full traceback)
- ``kmersearch.cpp`` — k-mer prefilter homology search engine (built-in
  fallback for environments without an ``mmseqs`` binary)

Build all: ``python -m metagenomic_deepfri_tpu.native.build``.
"""

from metagenomic_deepfri_tpu.native.build import ensure_built, library_path

__all__ = ["ensure_built", "library_path"]
