"""Build driver for the native C++ components.

Compiles each ``<name>.cpp`` in this directory into ``lib<name>.so`` next to
the source (g++, -O3, OpenMP, native arch). Idempotent: recompiles only when
the source is newer than the library. Usable as a module
(``python -m metagenomic_deepfri_tpu.native.build``) or via
:func:`ensure_built` at import time of the ctypes wrappers.
"""

from __future__ import annotations

import logging
import subprocess
import sys
from pathlib import Path

logger = logging.getLogger(__name__)

NATIVE_DIR = Path(__file__).parent

CXX = "g++"
CXXFLAGS = ["-O3", "-std=c++17", "-fPIC", "-shared", "-fopenmp",
            "-march=native", "-funroll-loops"]


def library_path(name: str) -> Path:
    return NATIVE_DIR / f"lib{name}.so"


def build(name: str, verbose: bool = False) -> Path:
    src = NATIVE_DIR / f"{name}.cpp"
    out = library_path(name)
    if not src.exists():
        raise FileNotFoundError(src)
    cmd = [CXX, *CXXFLAGS, str(src), "-o", str(out)]
    if verbose:
        logger.info("Building %s: %s", name, " ".join(cmd))
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"Native build of {name} failed:\n{proc.stderr}")
    return out


def ensure_built(name: str) -> Path:
    """Compile lib<name>.so if missing or stale; return its path."""
    src = NATIVE_DIR / f"{name}.cpp"
    out = library_path(name)
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    return build(name)


def build_all(verbose: bool = False) -> list:
    """Compile every ``*.cpp`` in this directory (used by setup.py's
    wheel-build hook and the module entry point)."""
    return [ensure_built(p.stem) for p in sorted(NATIVE_DIR.glob("*.cpp"))]


def main():
    for path in build_all(verbose=True):
        print(f"built {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
