"""Kernel backend resolution: Pallas TPU kernels vs portable XLA paths."""

from __future__ import annotations

import jax

from c2dsr_tpu.config import Config


def resolve(cfg: Config) -> str:
    """'pallas' on TPU (unless overridden), 'xla' elsewhere.

    Gates the GSPMD-visible Pallas paths (fused encoder, blocked SpMM,
    LocalOps CE): those assume a replicated classifier (mesh_model == 1)
    because XLA cannot auto-partition custom calls.  The model-sharded
    regime's CE keeps its Pallas kernel anyway — it runs inside an explicit
    shard_map on shard-local shapes (see use_sharded_pallas_ce).
    """
    if cfg.kernel_backend != "auto":
        return cfg.kernel_backend
    if jax.default_backend() == "tpu" and cfg.mesh_model == 1:
        return "pallas"
    return "xla"


def use_sharded_pallas_ce(cfg: Config):
    """(use, interpret) for the Pallas fused CE inside the vocab-sharded
    shard_map (parallel/sharded_loss.sharded_rec_ce_rows_pallas).

    Unlike the GSPMD-visible ops gated by :func:`resolve`, this kernel runs
    INSIDE an explicit shard_map on shard-local shapes, so it stays engaged
    in the model-sharded regime.  On TPU it is the default; elsewhere
    cfg.pallas_interpret opts in via the interpreter (the fake-pod tests
    and dryrun)."""
    if cfg.kernel_backend == "xla":
        return False, False
    if jax.default_backend() == "tpu":
        return True, False
    return cfg.pallas_interpret, True


def use_fused_encoder(cfg: Config) -> bool:
    """Route the attention towers through the fused Pallas kernel
    (ops/encoder_pallas.py) when the backend is Pallas and the tower shape
    fits its constraints (post-norm, head dim a multiple of 8)."""
    from c2dsr_tpu.ops import encoder_pallas
    return (resolve(cfg) == "pallas"
            and encoder_pallas.supported(cfg.n_head, cfg.d_latent,
                                         cfg.norm_first))
