"""Kernel backend resolution: Pallas TPU kernels vs portable XLA paths."""

from __future__ import annotations

import jax

from c2dsr_tpu.config import Config


def resolve(cfg: Config) -> str:
    """'pallas' on TPU (unless overridden), 'xla' elsewhere.

    The Pallas fast paths currently assume a replicated classifier
    (mesh_model == 1); the vocab-sharded regime routes through the shard_map
    ops in parallel/ instead.
    """
    if cfg.kernel_backend != "auto":
        return cfg.kernel_backend
    if jax.default_backend() == "tpu" and cfg.mesh_model == 1:
        return "pallas"
    return "xla"
