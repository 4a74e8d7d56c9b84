"""Homology search services.

Mirrors the reference's search layer (reference ``mDeepFRI/mmseqs.py``,
``database.py``, ``pdb.py``) with one structural upgrade: the external
``mmseqs`` binary is optional. When absent, a built-in native C++ k-mer
prefilter + gapped-rescoring engine (``native/kmersearch.cpp``) provides the
same result-table contract, so the full pipeline runs self-contained.
"""

from metagenomic_deepfri_tpu.search.results import (SEARCH_COLUMNS,
                                                    SearchResults)
from metagenomic_deepfri_tpu.search.query import QueryFile
from metagenomic_deepfri_tpu.search.database import Database, build_database

__all__ = ["SEARCH_COLUMNS", "SearchResults", "QueryFile", "Database",
           "build_database"]
