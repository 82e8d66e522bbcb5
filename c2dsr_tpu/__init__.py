"""c2dsr_tpu — a TPU-native cross-domain sequential recommendation framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of C2DSR
(CIKM'22; reference: crystal22/C2DSR, PyTorch, single GPU), built TPU-first:
packed-array data pipeline, COO graph propagation as segment-sum / Pallas
SpMM, fused attention towers, jitted train/eval steps, sharded embedding
tables and vocab-sharded ranking over a device mesh.
"""

__version__ = "0.1.0"

from c2dsr_tpu.config import Config, DataSpec  # noqa: F401
