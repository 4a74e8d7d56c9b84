"""Gene Ontology post-processing (OBO parsing + true-path propagation).

Replaces the reference's obonet/networkx stack (reference
``mDeepFRI/go_propagation.py``) with a self-contained OBO parser and DAG
traversal.
"""

from metagenomic_deepfri_tpu.ontology.go import (GoDag, download_obo,
                                                 propagate_results)

__all__ = ["GoDag", "download_obo", "propagate_results"]
