"""Integration tests: end-to-end training + eval on a tiny synthetic corpus."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from c2dsr_tpu.config import Config, DataSpec
from c2dsr_tpu.data import preprocess, synthetic
from c2dsr_tpu.evaluate import ranker
from c2dsr_tpu.graph import build
from c2dsr_tpu.model import c2dsr, params as params_mod
from c2dsr_tpu.ops import spmm
from c2dsr_tpu.train import optim, step as step_mod
from c2dsr_tpu.train.loop import Experiment


@pytest.fixture(scope="module")
def setup(tiny_cfg, tiny_spec, tiny_sequences):
    cfg, spec = tiny_cfg, tiny_spec
    train = preprocess.preprocess_train(tiny_sequences, spec, seed=1)
    eval_seqs = synthetic.generate_sequences(spec, 80, seed=2)
    val = preprocess.preprocess_evaluate(eval_seqs, spec, n_neg_sample=20,
                                         seed=2)
    gs, gp = build.build_graphs(tiny_sequences, spec)
    graphs = c2dsr.Graphs(share=spmm.device_graph(gs),
                          specific=spmm.device_graph(gp))
    return cfg, spec, train, val, graphs


def test_loss_decreases(setup):
    cfg, spec, train, val, graphs = setup
    exp = Experiment(cfg.with_(n_epoch=3), spec, graphs, train, val, val)
    first = exp.run_train_epoch()[0]
    for _ in range(4):
        last = exp.run_train_epoch()[0]
    assert last < first, (first, last)


def test_loss_composition(setup):
    """total = lambda*rec + (1-lambda)*mi (trainer.py:156)."""
    cfg, spec, train, val, graphs = setup
    params = params_mod.init_params(jax.random.PRNGKey(0), cfg, spec)
    batch = {k: jnp.asarray(v[:16]) for k, v in train.items()}
    loss, aux = step_mod.loss_fn(params, graphs, batch,
                                 jax.random.PRNGKey(1), cfg, spec)
    np.testing.assert_allclose(
        float(loss),
        cfg.lambda_loss * float(aux["loss_rec"])
        + (1 - cfg.lambda_loss) * float(aux["loss_mi"]), rtol=1e-6)
    assert np.isfinite(float(loss))


def test_batch_sparse_gnn_step_equality(setup):
    """batch_sparse_gnn=True must give the SAME loss and the SAME gradients
    as the dense propagation — the masking is exact on every row the step
    reads (train/step.py flag plumbing + spmm_pallas flagged kernel).
    d=128 so the Pallas SpMM path (the only one that applies the flag)
    engages; interpret mode on CPU."""
    _, spec, train, val, graphs = setup
    cfg = Config(data="fk", d_latent=128, batch_size=16, len_rec=5,
                 n_neg_sample=20, kernel_backend="pallas",
                 pallas_interpret=True, dropout_gnn=0.0, dropout_attn=0.0)
    params = params_mod.init_params(jax.random.PRNGKey(3), cfg, spec)
    batch = {k: jnp.asarray(v[:16]) for k, v in train.items()}

    def run(sparse):
        c = cfg.with_(batch_sparse_gnn=sparse)
        (loss, aux), grads = jax.value_and_grad(
            step_mod.loss_fn, has_aux=True)(params, graphs, batch,
                                            jax.random.PRNGKey(4), c, spec)
        return float(loss), grads

    from c2dsr_tpu.ops import encoder_pallas
    encoder_pallas.st_interpret.set(True)
    try:
        loss_d, g_dense = run(False)
        loss_s, g_sparse = run(True)
    finally:
        encoder_pallas.st_interpret.set(False)
    assert loss_s == loss_d
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g_dense),
                            jax.tree_util.tree_leaves(g_sparse)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a),
                                      err_msg=str(path))


def test_bf16_compute_path_tolerance(setup):
    """compute_dtype=bfloat16 (tower activations; bf16 SpMM gather on the
    Pallas path) must track the f32 loss closely."""
    cfg, spec, train, val, graphs = setup
    params = params_mod.init_params(jax.random.PRNGKey(0), cfg, spec)
    batch = {k: jnp.asarray(v[:16]) for k, v in train.items()}
    rng = jax.random.PRNGKey(2)
    l32, aux32 = step_mod.loss_fn(params, graphs, batch, rng, cfg, spec)
    l16, aux16 = step_mod.loss_fn(params, graphs, batch, rng,
                                  cfg.with_(compute_dtype="bfloat16"), spec)
    np.testing.assert_allclose(float(l16), float(l32), rtol=2e-2)
    np.testing.assert_allclose(float(aux16["loss_rec"]),
                               float(aux32["loss_rec"]), rtol=2e-2)


def test_grads_respect_pad_row(setup):
    """padding_idx semantics: no gradient into the pad embedding row."""
    cfg, spec, train, _, graphs = setup
    params = params_mod.init_params(jax.random.PRNGKey(0), cfg, spec)
    batch = {k: jnp.asarray(v[:8]) for k, v in train.items()}
    grads = jax.grad(lambda p: step_mod.loss_fn(
        p, graphs, batch, jax.random.PRNGKey(1), cfg, spec)[0])(params)
    for name in ("embed_share", "embed_a", "embed_b"):
        g = np.array(grads[name])
        np.testing.assert_array_equal(g[spec.idx_pad], 0.0)
        assert np.abs(g).sum() > 0     # but real rows do get gradient


def test_eval_rank_matches_bruteforce(setup):
    cfg, spec, train, val, graphs = setup
    params = params_mod.init_params(jax.random.PRNGKey(0), cfg, spec)
    convolve_eval, rank_step = ranker.make_eval_fns(cfg, spec, graphs)
    hi = convolve_eval(params)
    groups = ranker.partition_by_domain(val)
    ga = {k: jnp.asarray(v[:8]) for k, v in groups["a"].items()}
    ranks = np.array(rank_step(params, hi, ga, "a", "sampled"))

    # brute-force oracle per example (slice off vocab-padding columns)
    h_share, hx, hy = c2dsr.forward(
        params, hi, ga["seq_share"], ga["seq_share_a"], ga["seq_share_b"],
        ga["pos"], ga["pos_a"], ga["pos_b"], cfg, spec, rng=None)
    na = spec.n_item_a
    for i in range(8):
        h = np.array(h_share[i, -1] + hx[i, int(ga["idx_last_a"][i]) %
                                         spec.len_max])
        scores = (h @ np.array(params["cls_a_w"])
                  + np.array(params["cls_a_b"]))[:na]
        gt = int(ga["gt_last"][i])
        neg = np.array(ga["list_neg"][i])
        want = int((scores[neg] > scores[gt]).sum()) + 1
        assert ranks[i] == want

    # full-rank mode oracle
    ranks_full = np.array(rank_step(params, hi, ga, "a", "full"))
    for i in range(8):
        h = np.array(h_share[i, -1] + hx[i, int(ga["idx_last_a"][i]) %
                                         spec.len_max])
        scores = (h @ np.array(params["cls_a_w"])
                  + np.array(params["cls_a_b"]))[:na]
        gt = int(ga["gt_last"][i])
        want = int((scores > scores[gt]).sum()) + 1
        assert ranks_full[i] == want


def test_overfit_improves_ranking(setup):
    """Single-chip overfit: train on a tiny corpus, eval on the SAME users'
    next-step data -> improvement over random ranking."""
    cfg, spec, train, val, graphs = setup
    exp = Experiment(cfg.with_(n_epoch=1, lr=3e-3), spec, graphs, train, val,
                     val)
    # random-ranking baseline: expected rank ~ (n_neg+1)/2 ~ 10
    for _ in range(6):
        exp.run_train_epoch()
    ranks_a, ranks_b = exp.run_eval(val)
    mean_rank = np.mean(ranks_a + ranks_b)
    assert mean_rank < 9.0, mean_rank


def test_padded_batch_valid_matches_unpadded(setup):
    """A pad_to_multiple batch (padded duplicate rows + valid mask,
    data/pipeline.py) must reproduce the unpadded ragged batch's loss and
    gradients — the claim the multi-host input path relies on
    (trainer.py:47 ragged batches; train/step.loss_fn valid handling)."""
    from c2dsr_tpu.data.pipeline import BatchIterator
    cfg, spec, train, val, graphs = setup
    cfg = cfg.with_(dropout_gnn=0.0, dropout_attn=0.0)   # deterministic
    n = 13
    sub = {k: v[:n] for k, v in train.items()}

    it = BatchIterator(sub, batch_size=16, shuffle=False, pad_to_multiple=8)
    padded = next(iter(it.epoch()))
    assert padded["seq_share"].shape[0] == 16
    assert padded["valid"].sum() == n and padded["valid"][n:].sum() == 0

    rng = jax.random.PRNGKey(3)
    batch_u = {k: jnp.asarray(v) for k, v in sub.items()}
    batch_p = {k: jnp.asarray(v) for k, v in padded.items()}

    (l_u, aux_u), g_u = jax.value_and_grad(
        lambda p: step_mod.loss_fn(p, graphs, batch_u, rng, cfg, spec),
        has_aux=True)(params_mod.init_params(jax.random.PRNGKey(0), cfg,
                                             spec))
    (l_p, aux_p), g_p = jax.value_and_grad(
        lambda p: step_mod.loss_fn(p, graphs, batch_p, rng, cfg, spec),
        has_aux=True)(params_mod.init_params(jax.random.PRNGKey(0), cfg,
                                             spec))

    np.testing.assert_allclose(float(l_p), float(l_u), rtol=1e-6)
    for k in ("loss_rec", "loss_mi"):
        np.testing.assert_allclose(float(aux_p[k]), float(aux_u[k]),
                                   rtol=1e-6)
    assert float(aux_p["n_examples"]) == n
    paths = jax.tree_util.tree_flatten_with_path(g_u)[0]
    flat_p = jax.tree.flatten(g_p)[0]
    for (path, gu), gp in zip(paths, flat_p):
        scale = max(1.0, float(np.abs(np.asarray(gu)).max()))
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gu), atol=2e-6 * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")
