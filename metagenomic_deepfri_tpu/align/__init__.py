"""Pairwise sequence alignment services.

Replaces the reference's pyOpal dependency (reference
``mDeepFRI/alignment.py:163-220``) with an in-repo Needleman–Wunsch engine:
a native C++/OpenMP Gotoh implementation (``native/nw.cpp``) driven through
ctypes, with a numpy fallback, plus the alignment-result containers and batch
drivers the pipeline consumes.
"""

from metagenomic_deepfri_tpu.align.pairwise import (AlignmentResult,
                                                    align_mmseqs_results,
                                                    align_pairwise,
                                                    best_hit_database,
                                                    insert_gaps,
                                                    pairwise_against_database)

__all__ = [
    "AlignmentResult", "align_mmseqs_results", "align_pairwise",
    "best_hit_database", "insert_gaps", "pairwise_against_database",
]
