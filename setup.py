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
        try:
            import sys
            from pathlib import Path

            sys.path.insert(0, str(Path(__file__).parent))
            from metagenomic_deepfri_tpu.native.build import build_all

            build_all(verbose=True)
        except Exception as err:  # toolchain-less build host
            logger.warning(
                "Native helpers not compiled (%s); the installed package "
                "falls back to pure-Python/numpy paths and lazy "
                "compilation.", err)
        super().run()


setup(cmdclass={"build_py": build_py_with_native})
