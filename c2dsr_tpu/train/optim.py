"""Optimizer and LR schedule.

Matches the reference's AdamW(amsgrad=True, lr=1e-3, weight_decay=5e-4)
(trainer.py:21-22) and StepLR(step_size=10, gamma=0.5) stepped once per epoch
(main.py:103,115).  Decoupled weight decay applies to every parameter
(torch AdamW default — including embeddings, biases, layernorms).

Optional gradient clipping: the reference declares ``--max_grad_norm`` but
never applies it (main.py:54, SURVEY.md quirk 7); ``apply_grad_clip`` turns
it on.

Quirk 11 (``bug_epoch_grad_accum``): the reference zeroes grads once per
EPOCH (trainer.py:42) but steps the optimizer every batch (trainer.py:157-158)
— each step therefore consumes the running SUM of all batch gradients so far
this epoch.  ``epoch_grad_accum`` reproduces those dynamics as an optax
transform; the train loop resets its accumulator at epoch boundaries via
``reset_grad_accum``.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from c2dsr_tpu.config import Config


class EpochAccumState(NamedTuple):
    """Running gradient sum (the reference's never-cleared ``.grad``)."""
    g_sum: Any


class AmsgradState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any
    nu_max: Any


def scale_by_amsgrad_torch(b1: float = 0.9, b2: float = 0.999,
                           eps: float = 1e-8) -> optax.GradientTransformation:
    """AMSGrad with exact torch.optim.AdamW(amsgrad=True) semantics.

    torch maxes the RAW second moment across steps and bias-corrects with the
    CURRENT step's correction (torch/optim/adamw.py); optax's
    ``scale_by_amsgrad`` maxes the per-step bias-corrected moment instead —
    a real dynamics difference in early steps where corrections are large.
    The reference trains with torch (trainer.py:21-22), so parity needs this:

        m_t   = b1 m + (1-b1) g
        v_t   = b2 v + (1-b2) g^2
        vmax  = max(vmax, v_t)                       # raw, torch-style
        upd   = (m_t / (1-b1^t)) / (sqrt(vmax / (1-b2^t)) + eps)
    """

    def init(params):
        z = lambda: jax.tree.map(jnp.zeros_like, params)
        return AmsgradState(count=jnp.zeros([], jnp.int32),
                            mu=z(), nu=z(), nu_max=z())

    def update(updates, state, params=None):
        del params
        t = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, updates)
        nu_max = jax.tree.map(jnp.maximum, state.nu_max, nu)
        bc1 = 1 - b1 ** t.astype(jnp.float32)
        bc2 = 1 - b2 ** t.astype(jnp.float32)
        out = jax.tree.map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu, nu_max)
        return out, AmsgradState(count=t, mu=mu, nu=nu, nu_max=nu_max)

    return optax.GradientTransformation(init, update)


def epoch_grad_accum() -> optax.GradientTransformation:
    """Replace each gradient with the running sum since the last reset.

    Mirrors torch's ``.grad`` accumulation when ``zero_grad`` is skipped
    between batches (reference trainer.py:42,157-158)."""

    def init(params):
        return EpochAccumState(jax.tree.map(jnp.zeros_like, params))

    def update(updates, state, params=None):
        del params
        g = jax.tree.map(jnp.add, state.g_sum, updates)
        return g, EpochAccumState(g)

    return optax.GradientTransformation(init, update)


def reset_grad_accum(opt_state):
    """Zero every EpochAccumState in the chain (epoch boundary =
    the reference's per-epoch ``optimizer.zero_grad()``, trainer.py:42).
    Zeroing by multiplication keeps shardings/donation intact under jit."""

    def fix(s):
        if isinstance(s, EpochAccumState):
            return EpochAccumState(jax.tree.map(lambda x: x * 0, s.g_sum))
        return s

    return jax.tree.map(fix, opt_state,
                        is_leaf=lambda s: isinstance(s, EpochAccumState))


def step_lr_schedule(base_lr: float, gamma: float, step_epochs: int,
                     steps_per_epoch: int) -> optax.Schedule:
    """torch StepLR semantics: lr = base * gamma^(epoch // step_epochs),
    where epoch advances every ``steps_per_epoch`` optimizer steps."""

    def schedule(count):
        epoch = count // steps_per_epoch
        return base_lr * (gamma ** (epoch // step_epochs))

    return schedule


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    sched = step_lr_schedule(cfg.lr, cfg.lr_gamma, cfg.lr_step, steps_per_epoch)
    parts = []
    if cfg.bug_epoch_grad_accum:
        parts.append(epoch_grad_accum())
    if cfg.apply_grad_clip and cfg.max_grad_norm > 0:
        parts.append(optax.clip_by_global_norm(cfg.max_grad_norm))
    parts += [
        scale_by_amsgrad_torch(b1=0.9, b2=0.999, eps=1e-8),
        optax.add_decayed_weights(cfg.l2),
        optax.scale_by_learning_rate(sched),
    ]
    return optax.chain(*parts)
