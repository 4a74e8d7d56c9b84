"""Host-side data ingestion: FASTA, protein structures, FoldComp.

Replaces the reference's pysam/biotite/foldcomp dependency stack (reference
``utils.py:279-340``, ``bio_utils.py:230-302``, ``pdb.py:130-162``) with
self-contained readers; FoldComp remains an external binary wrapped by
subprocess, gated on availability.
"""

from metagenomic_deepfri_tpu.data.fasta import (FastaIndex, load_fasta_as_dict,
                                                retrieve_fasta_entries_as_dict,
                                                write_fasta)

__all__ = ["FastaIndex", "load_fasta_as_dict",
           "retrieve_fasta_entries_as_dict", "write_fasta"]
