"""Optimizer and LR schedule.

Matches the reference's AdamW(amsgrad=True, lr=1e-3, weight_decay=5e-4)
(trainer.py:21-22) and StepLR(step_size=10, gamma=0.5) stepped once per epoch
(main.py:103,115).  Decoupled weight decay applies to every parameter
(torch AdamW default — including embeddings, biases, layernorms).

Optional gradient clipping: the reference declares ``--max_grad_norm`` but
never applies it (main.py:54, SURVEY.md quirk 7); ``apply_grad_clip`` turns
it on.
"""

from __future__ import annotations

import optax

from c2dsr_tpu.config import Config


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
    if cfg.apply_grad_clip and cfg.max_grad_norm > 0:
        parts.append(optax.clip_by_global_norm(cfg.max_grad_norm))
    parts += [
        optax.scale_by_amsgrad(b1=0.9, b2=0.999, eps=1e-8),
        optax.add_decayed_weights(cfg.l2),
        optax.scale_by_learning_rate(sched),
    ]
    return optax.chain(*parts)
