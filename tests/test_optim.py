"""Optimizer parity vs torch.optim.AdamW(amsgrad=True).

The reference trains with AdamW(amsgrad=True, lr=1e-3, weight_decay=5e-4)
(trainer.py:21-22) AND zeroes grads only once per epoch (trainer.py:42), so
each optimizer step consumes the running sum of all batch grads so far that
epoch (SURVEY.md quirk 11).  These tests pin both behaviors against torch:

* ``scale_by_amsgrad_torch`` must reproduce torch's amsgrad exactly —
  including torch's max-over-RAW-second-moment (optax's built-in maxes the
  bias-corrected moment instead, which genuinely diverges in early steps).
* ``epoch_grad_accum`` + ``reset_grad_accum`` must reproduce the missing
  per-batch ``zero_grad``.

Torch is a CPU test oracle only; the framework never imports it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from c2dsr_tpu.config import Config
from c2dsr_tpu.train import optim

torch = pytest.importorskip("torch")

LR, WD = 1e-3, 5e-4
SHAPE = (4, 3)


def _grads(n, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.normal(size=SHAPE).astype(np.float32) * 10 ** rng.uniform(-2, 1)
            for _ in range(n)]


def _torch_run(p0, grad_seq):
    """One torch AdamW step per entry of grad_seq; grads set directly."""
    p = torch.tensor(p0.copy(), requires_grad=True)
    opt = torch.optim.AdamW([p], lr=LR, weight_decay=WD, amsgrad=True)
    outs = []
    for g in grad_seq:
        opt.zero_grad()
        p.grad = torch.tensor(g)
        opt.step()
        outs.append(p.detach().numpy().copy())
    return outs


def _ours(cfg=None, accum=False):
    parts = []
    if accum:
        parts.append(optim.epoch_grad_accum())
    parts += [optim.scale_by_amsgrad_torch(),
              optax.add_decayed_weights(WD),
              optax.scale_by_learning_rate(LR)]
    return optax.chain(*parts)


def test_amsgrad_matches_torch_multistep():
    """Fresh grads each step: our transform == torch AdamW(amsgrad) exactly.

    Includes a large->small gradient swing so the amsgrad max matters (the
    regime where optax's bias-corrected max diverges from torch)."""
    p0 = np.random.default_rng(1).normal(size=SHAPE).astype(np.float32)
    gs = _grads(6, seed=2)
    gs[1] = gs[1] * 100.0      # spike so nu_max binds on later steps
    want = _torch_run(p0, gs)

    tx = _ours()
    params = jnp.asarray(p0)
    state = tx.init(params)
    for g, w in zip(gs, want):
        upd, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, upd)
        np.testing.assert_allclose(np.asarray(params), w, rtol=2e-6, atol=2e-7)


def test_epoch_grad_accum_matches_torch_no_zero_grad():
    """The reference's epoch-scope zero_grad (trainer.py:42): torch's .grad
    accumulates across batches; steps t use g_1 + ... + g_t."""
    p0 = np.random.default_rng(3).normal(size=SHAPE).astype(np.float32)
    gs = _grads(3, seed=4)

    # torch: never zero_grad between batches -> grads pile up in .grad
    p = torch.tensor(p0.copy(), requires_grad=True)
    opt = torch.optim.AdamW([p], lr=LR, weight_decay=WD, amsgrad=True)
    opt.zero_grad()            # the single per-epoch zero (trainer.py:42)
    want = []
    for g in gs:
        if p.grad is None:
            p.grad = torch.tensor(g)
        else:
            p.grad = p.grad + torch.tensor(g)
        opt.step()
        want.append(p.detach().numpy().copy())

    tx = _ours(accum=True)
    params = jnp.asarray(p0)
    state = tx.init(params)
    for g, w in zip(gs, want):
        upd, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, upd)
        np.testing.assert_allclose(np.asarray(params), w, rtol=2e-6, atol=2e-7)

    # epoch boundary: reference zero_grad fires -> next step sees only g_new
    state = optim.reset_grad_accum(state)
    g_new = _grads(1, seed=5)[0]
    opt.zero_grad()
    p.grad = torch.tensor(g_new)
    opt.step()
    upd, state = tx.update(jnp.asarray(g_new), state, params)
    params = optax.apply_updates(params, upd)
    np.testing.assert_allclose(np.asarray(params), p.detach().numpy(),
                               rtol=2e-6, atol=2e-7)


def test_make_optimizer_wires_accum_flag():
    cfg = Config(bug_epoch_grad_accum=True)
    tx = optim.make_optimizer(cfg, steps_per_epoch=10)
    params = {"w": jnp.ones((2, 2))}
    state = tx.init(params)
    leaves = jax.tree.leaves(
        state, is_leaf=lambda s: isinstance(s, optim.EpochAccumState))
    assert any(isinstance(s, optim.EpochAccumState) for s in leaves)

    # two identical grads: with accumulation the second step's effective
    # grad doubles -> different params than the no-accum optimizer
    g = {"w": jnp.ones((2, 2))}
    p_acc = params
    for _ in range(2):
        upd, state = tx.update(g, state, p_acc)
        p_acc = optax.apply_updates(p_acc, upd)

    tx2 = optim.make_optimizer(Config(), steps_per_epoch=10)
    state2 = tx2.init(params)
    p_fresh = params
    for _ in range(2):
        upd, state2 = tx2.update(g, state2, p_fresh)
        p_fresh = optax.apply_updates(p_fresh, upd)
    assert not np.allclose(np.asarray(p_acc["w"]), np.asarray(p_fresh["w"]))
