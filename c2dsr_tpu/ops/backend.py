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


def use_fused_encoder(cfg: Config) -> bool:
    """Route the attention towers through the fused Pallas kernel
    (ops/encoder_pallas.py) when the backend is Pallas and the tower shape
    fits its constraints (post-norm, head dim a multiple of 8)."""
    from c2dsr_tpu.ops import encoder_pallas
    return (resolve(cfg) == "pallas"
            and encoder_pallas.supported(cfg.n_head, cfg.d_latent,
                                         cfg.norm_first))
