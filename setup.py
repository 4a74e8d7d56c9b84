"""Build hooks: compile the native C++ helpers into the wheel.

The reference ships Cython extensions + vendored binaries via a large
custom setup.py (reference ``setup.py:141-292``). Here the native surface
is two small ctypes libraries (``native/nw.cpp`` — OpenMP Gotoh aligner,
``native/kmersearch.cpp`` — built-in k-mer prefilter); this hook compiles
them at wheel-build time so an installed package works without a
toolchain. Both have pure fallbacks (numpy NW oracle; mmseqs subprocess
path), so a build host without g++ still produces a functional wheel —
the libraries then compile lazily on first use where a compiler exists.
"""

import logging

from setuptools import setup
from setuptools.command.build_py import build_py

logger = logging.getLogger(__name__)


class build_py_with_native(build_py):
    def run(self):
        import os
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).parent))
        try:
            from metagenomic_deepfri_tpu.native.build import build_all

            build_all(verbose=True)
        except Exception as err:  # toolchain-less build host
            logger.warning(
                "Native helpers not compiled (%s); the installed package "
                "falls back to pure-Python/numpy paths and lazy "
                "compilation.", err)
        # Optional build-time vendoring (MDEEPFRI_VENDOR_BINARIES=1):
        # download the per-arch mmseqs/foldcomp release binaries into the
        # package's _vendor/ so the wheel ships working engines, exactly
        # like the reference's build does (reference setup.py:66-135).
        # Off by default — it needs network egress at build time; without
        # it, the `get-binaries` verb installs the same binaries at
        # runtime and discovery falls through to PATH.
        if os.environ.get("MDEEPFRI_VENDOR_BINARIES") == "1":
            from metagenomic_deepfri_tpu.search.binaries import \
                fetch_binaries

            vendor = (Path(__file__).parent / "metagenomic_deepfri_tpu"
                      / "_vendor")
            fetch_binaries(output_dir=vendor)
            logger.info("Vendored engine binaries into %s", vendor)
        super().run()


setup(cmdclass={"build_py": build_py_with_native})
