"""SpMM / loss-primitive tests (vs dense numpy and torch oracles)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from c2dsr_tpu.config import DataSpec
from c2dsr_tpu.graph import build
from c2dsr_tpu.ops import losses, spmm

SPEC = DataSpec(n_item_a=20, n_item_b=30, len_max=8)


def _random_graph(seed=0):
    rng = np.random.default_rng(seed)
    seqs = [rng.integers(0, 50, size=rng.integers(3, 8)).tolist()
            for _ in range(40)]
    share, specific = build.build_graphs(seqs, SPEC)
    return share


def test_spmm_matches_dense():
    g = _random_graph()
    dev = spmm.device_graph(g)
    h = np.random.default_rng(1).normal(size=(SPEC.n_item, 16)).astype(np.float32)
    got = np.array(spmm.spmm(dev, jnp.asarray(h)))
    want = g.to_dense() @ h
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gcn_propagate_eval_matches_reference_formula():
    # eval mode: mean of [h, adj h, adj^2 h, ...] (models/encoders.py:42-48)
    g = _random_graph(2)
    dev = spmm.device_graph(g)
    h = np.random.default_rng(2).normal(size=(SPEC.n_item, 8)).astype(np.float32)
    got = np.array(spmm.gcn_propagate(dev, jnp.asarray(h), 2, 0.5, rng=None))
    d = g.to_dense()
    want = (h + d @ h + d @ (d @ h)) / 3.0
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gcn_dropout_is_unbiased_scaling():
    g = _random_graph(3)
    dev = spmm.device_graph(g)
    h = jnp.ones((SPEC.n_item, 4), jnp.float32)
    out = spmm.gcn_propagate(dev, h, 1, 0.2, rng=jax.random.PRNGKey(0))
    assert np.isfinite(np.array(out)).all()


def test_blocked_spmm_matches_dense_interpret():
    # Pallas kernel (interpret mode on CPU) vs dense oracle, d lane-aligned.
    from c2dsr_tpu.ops import spmm_pallas
    g = _random_graph(4)
    bk = spmm_pallas.prep(g.rows, g.cols, g.vals, int(g.n))
    h = np.random.default_rng(4).normal(size=(g.n, 128)).astype(np.float32)
    got = np.array(spmm_pallas.blocked_spmm_impl(bk, jnp.asarray(h),
                                                 interpret=True))
    want = g.to_dense() @ h
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_blocked_spmm_bf16_gather_tolerance():
    """gather_dtype=bfloat16 halves the intermediate's HBM traffic; error
    must stay within bf16 rounding of the inputs (selection + accumulation
    are exact)."""
    from c2dsr_tpu.ops import spmm_pallas
    g = _random_graph(7)
    bk = spmm_pallas.prep(g.rows, g.cols, g.vals, int(g.n))
    h = np.random.default_rng(7).normal(size=(g.n, 128)).astype(np.float32)
    got = np.array(spmm_pallas.blocked_spmm_impl(
        bk, jnp.asarray(h), interpret=True, gather_dtype=jnp.bfloat16))
    want = g.to_dense() @ h
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-2 * max(scale, 1.0))
    assert got.dtype == np.float32


def test_blocked_spmm_grad_matches_xla_path():
    from c2dsr_tpu.ops import spmm_pallas
    g = _random_graph(5)
    dev = spmm.device_graph(g, blocked=True)
    f = spmm_pallas.make_blocked_spmm(dev.bk_fwd, dev.bk_bwd, interpret=True)
    # table carries 3 extra pad rows beyond the graph dim
    n_pad = int(g.n) + 3
    h = jnp.asarray(np.random.default_rng(5).normal(
        size=(n_pad, 128)).astype(np.float32))

    def loss_pallas(x):
        return jnp.sum(jnp.sin(f(x)))

    def loss_xla(x):
        out = spmm.spmm(dev, x[:g.n])
        out = jnp.concatenate([out, jnp.zeros((3, x.shape[1]), out.dtype)])
        return jnp.sum(jnp.sin(out))

    gp = np.array(jax.grad(loss_pallas)(h))
    gx = np.array(jax.grad(loss_xla)(h))
    np.testing.assert_allclose(gp, gx, atol=1e-4)
    # pad rows have no edges: zero output and zero grad
    np.testing.assert_array_equal(gp[g.n:], 0.0)


def test_blocked_spmm_flagged_exact_on_marked_rows():
    """Batch-sparse SpMM (make_blocked_spmm_flagged): on every MARKED row
    the value is bit-identical to the dense kernel, and the FULL gradient
    matches exactly when the downstream loss reads only marked rows (the
    training contract, train/step.py)."""
    from c2dsr_tpu.ops import spmm_pallas
    g = _random_graph(7)
    dev = spmm.device_graph(g, blocked=True)
    dense = spmm_pallas.make_blocked_spmm(dev.bk_fwd, dev.bk_bwd,
                                          interpret=True)
    flagged = spmm_pallas.make_blocked_spmm_flagged(dev.bk_fwd, dev.bk_bwd,
                                                    interpret=True)
    rng = np.random.default_rng(7)
    h = jnp.asarray(rng.normal(size=(g.n, 128)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, g.n, size=17), jnp.int32)
    flag = jnp.zeros(g.n, jnp.float32).at[ids].set(1.0)

    out_d = np.array(dense(h))
    out_f = np.array(flagged(h, flag))
    sel = np.array(flag) > 0
    np.testing.assert_array_equal(out_f[sel], out_d[sel])

    # downstream reads ONLY flagged rows -> grads must match exactly
    def loss(f):
        def inner(x):
            return jnp.sum(jnp.sin(f(x)[ids]))
        return inner

    gd = np.array(jax.grad(loss(dense))(h))
    gf = np.array(jax.grad(loss(lambda x: flagged(x, flag)))(h))
    np.testing.assert_array_equal(gf, gd)
    assert np.abs(gd).sum() > 0


def test_gcn_propagate_flagged_matches_dense_on_batch_rows():
    """gcn_propagate(out_flag=...) through the train-step seam: marked rows
    of the propagated mean equal the dense propagation bit-for-bit."""
    g = _random_graph(8)
    dev = spmm.device_graph(g, blocked=True)
    rng = np.random.default_rng(8)
    h = jnp.asarray(rng.normal(size=(g.n, 128)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, g.n, size=11), jnp.int32)
    flag = jnp.zeros(g.n, jnp.float32).at[ids].set(1.0)
    want = np.array(spmm.gcn_propagate(dev, h, 1, 0.0, rng=None,
                                       backend="pallas", interpret=True))
    got = np.array(spmm.gcn_propagate(dev, h, 1, 0.0, rng=None,
                                      backend="pallas", interpret=True,
                                      out_flag=flag))
    np.testing.assert_array_equal(got[np.asarray(ids)], want[np.asarray(ids)])


def test_gcn_propagate_pallas_backend_matches_xla():
    from c2dsr_tpu.ops import spmm_pallas  # noqa: F401
    g = _random_graph(6)
    dev = spmm.device_graph(g, blocked=True)
    h = jnp.asarray(np.random.default_rng(6).normal(
        size=(g.n, 128)).astype(np.float32))
    want = np.array(spmm.gcn_propagate(dev, h, 2, 0.0, rng=None,
                                       backend="xla"))
    got = np.array(spmm.gcn_propagate(dev, h, 2, 0.0, rng=None,
                                      backend="pallas", interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_masked_cross_entropy_vs_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.default_rng(0)
    C, IGN = 11, 10
    logits = rng.normal(size=(6, 4, C)).astype(np.float32)
    targets = rng.integers(0, C, size=(6, 4)).astype(np.int32)
    targets[0, :] = IGN          # some ignored rows
    mean, n_valid = losses.masked_cross_entropy(
        jnp.asarray(logits), jnp.asarray(targets), IGN)
    want = F.cross_entropy(torch.tensor(logits).reshape(-1, C),
                           torch.tensor(targets, dtype=torch.long).reshape(-1),
                           ignore_index=IGN)
    np.testing.assert_allclose(float(mean), float(want), rtol=1e-5)
    assert int(n_valid) == int((targets != IGN).sum())


def test_bce_with_logits_vs_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    x = np.random.default_rng(1).normal(size=(8, 1)).astype(np.float32)
    got_pos = float(losses.bce_with_logits(jnp.asarray(x), True))
    got_neg = float(losses.bce_with_logits(jnp.asarray(x), False))
    t = torch.tensor(x)
    want_pos = float(F.binary_cross_entropy_with_logits(t, torch.ones_like(t)))
    want_neg = float(F.binary_cross_entropy_with_logits(t, torch.zeros_like(t)))
    np.testing.assert_allclose(got_pos, want_pos, rtol=1e-4)
    np.testing.assert_allclose(got_neg, want_neg, rtol=1e-4)
