"""Length-bucketed batching and the device-resident inference engine.

Replaces the reference's serial, batch-size-1 prediction loop (reference
``mDeepFRI/pipeline.py:292-319``, ``predict.pyx:75-102``) with packed
mega-batches per length bucket, all ontology modes evaluated per batch, and
asynchronous host→device pipelining.
"""

from metagenomic_deepfri_tpu.batching.buckets import (assign_bucket,
                                                      bucket_plan,
                                                      DEFAULT_BUCKETS)
from metagenomic_deepfri_tpu.batching.engine import (BatchedPredictor,
                                                     ModelHandle)

__all__ = ["assign_bucket", "bucket_plan", "DEFAULT_BUCKETS",
           "BatchedPredictor", "ModelHandle"]
