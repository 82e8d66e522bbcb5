"""Distributed-op correctness on a fake 8-device CPU pod.

Each sharded op must match its single-device reference bit-for-bit (or to
f32 tolerance where reduction order differs) — the substitute for multi-host
testing the reference never had (SURVEY.md section 4).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from c2dsr_tpu.parallel import embed, mesh as mesh_mod, sharded_eval, sharded_loss
from c2dsr_tpu.ops import losses

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >=4 (virtual) devices")

D = 16


@pytest.fixture(scope="module")
def mesh():
    n = len(jax.devices())
    return mesh_mod.make_mesh(n_data=n // 4, n_model=4)


def _table(n_rows, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (n_rows, D))


def test_sharded_lookup_matches_gather(mesh):
    table = _table(64)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 64, size=(6, 5)), jnp.int32)
    tbl = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    got = embed.sharded_lookup(tbl, ids, mesh)
    np.testing.assert_allclose(np.array(got), np.array(table[ids]), atol=1e-6)


def test_sharded_lookup_grad_matches(mesh):
    table = _table(64)
    ids = jnp.asarray(
        np.random.default_rng(1).integers(0, 64, size=(40,)), jnp.int32)
    # duplicate ids must accumulate gradient, like plain gather
    ids = jnp.concatenate([ids, ids[:10]])
    tbl = jax.device_put(table, NamedSharding(mesh, P("model", None)))

    g1 = jax.grad(lambda t: jnp.sum(embed.sharded_lookup(t, ids, mesh) ** 2)
                  )(tbl)
    g2 = jax.grad(lambda t: jnp.sum(t[ids] ** 2))(table)
    np.testing.assert_allclose(np.array(g1), np.array(g2), atol=1e-5)


def test_all_to_all_lookup_matches(mesh):
    table = _table(64, seed=2)
    n_total = 64
    ids = np.random.default_rng(2).integers(0, 64, size=(n_total,))
    ids_j = jax.device_put(jnp.asarray(ids, jnp.int32),
                           NamedSharding(mesh, P("model")))
    tbl = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    got = embed.all_to_all_lookup(tbl, ids_j, mesh, capacity_factor=2.0)
    np.testing.assert_allclose(np.array(got), np.array(table)[ids], atol=1e-6)


def test_all_to_all_lookup_overflow_fallback(mesh):
    """All ids hit ONE owner shard -> every bucket overflows its capacity;
    the psum fallback must still deliver exact rows."""
    table = _table(64, seed=3)
    ids = np.full((32,), 3, dtype=np.int32)       # all owned by shard 0
    ids_j = jax.device_put(jnp.asarray(ids),
                           NamedSharding(mesh, P("model")))
    tbl = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    got = embed.all_to_all_lookup(tbl, ids_j, mesh, capacity_factor=0.25)
    np.testing.assert_allclose(np.array(got), np.array(table)[ids], atol=1e-6)


def test_sharded_spmm_matches_dense(mesh):
    rng = np.random.default_rng(3)
    n = 64
    nnz = 200
    rows = np.sort(rng.integers(0, n, nnz)).astype(np.int32)
    cols = rng.integers(0, n, nnz).astype(np.int32)
    vals = rng.normal(size=nnz).astype(np.float32)
    table = _table(n, seed=4)
    tbl = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    got = embed.sharded_spmm(jnp.asarray(rows), jnp.asarray(cols),
                             jnp.asarray(vals), tbl, mesh)
    dense = np.zeros((n, n), np.float32)
    np.add.at(dense, (rows, cols), vals)
    np.testing.assert_allclose(np.array(got), dense @ np.array(table),
                               atol=1e-4)


def _random_coo(n, nnz, seed):
    rng = np.random.default_rng(seed)
    rows = np.sort(rng.integers(0, n, nnz)).astype(np.int32)
    cols = rng.integers(0, n, nnz).astype(np.int32)
    vals = rng.normal(size=nnz).astype(np.float32)
    return rows, cols, vals


def test_spmm_a2a_matches_dense(mesh):
    n, nnz = 64, 200
    rows, cols, vals = _random_coo(n, nnz, 12)
    table = _table(n, seed=12)
    tbl = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    plan = embed.plan_spmm_a2a(rows, cols, vals, n, mesh.shape["model"])
    got = embed.sharded_spmm_a2a(plan, tbl, mesh)
    dense = np.zeros((n, n), np.float32)
    np.add.at(dense, (rows, cols), vals)
    np.testing.assert_allclose(np.array(got), dense @ np.array(table),
                               atol=1e-4)


def test_spmm_a2a_skewed_graph(mesh):
    """All edges land in ONE destination shard and read from one source
    shard (worst-case skew): the per-pair capacity must stretch, not drop."""
    n = 64
    rng = np.random.default_rng(13)
    rows = np.sort(rng.integers(0, 8, 120)).astype(np.int32)   # dest shard 0
    cols = rng.integers(48, 64, 120).astype(np.int32)          # src shard 3
    vals = rng.normal(size=120).astype(np.float32)
    table = _table(n, seed=13)
    tbl = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    plan = embed.plan_spmm_a2a(rows, cols, vals, n, mesh.shape["model"])
    got = embed.sharded_spmm_a2a(plan, tbl, mesh)
    dense = np.zeros((n, n), np.float32)
    np.add.at(dense, (rows, cols), vals)
    np.testing.assert_allclose(np.array(got), dense @ np.array(table),
                               atol=1e-4)


def test_spmm_a2a_grad_matches_dense(mesh):
    n, nnz = 64, 150
    rows, cols, vals = _random_coo(n, nnz, 14)
    table = _table(n, seed=14)
    tbl = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    plan = embed.plan_spmm_a2a(rows, cols, vals, n, mesh.shape["model"])
    ct = jnp.asarray(np.random.default_rng(15).normal(size=(n, D)),
                     jnp.float32)
    g1 = jax.grad(lambda t: jnp.sum(embed.sharded_spmm_a2a(plan, t, mesh)
                                    * ct))(tbl)
    dense = np.zeros((n, n), np.float32)
    np.add.at(dense, (rows, cols), vals)
    g2 = dense.T @ np.array(ct)
    np.testing.assert_allclose(np.array(g1), g2, atol=1e-4)


def test_sharded_ce_matches_local(mesh):
    rng = np.random.default_rng(4)
    B, R, V_p, n_real = 8, 4, 32, 29
    h = jnp.asarray(rng.normal(size=(B, R, D)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(D, V_p)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(V_p,)), jnp.float32)
    pad = jnp.asarray(rng.normal(size=(B, R, 1)), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, n_real + 1, size=(B, R)), jnp.int32)

    w_s = jax.device_put(w, NamedSharding(mesh, P(None, "model")))
    b_s = jax.device_put(b, NamedSharding(mesh, P("model")))
    got, got_n = sharded_loss.sharded_rec_cross_entropy(
        h, w_s, b_s, pad, tgt, n_real, mesh)

    want, want_n = losses.rec_cross_entropy(
        jnp.einsum("brd,dv->brv", h, w) + b, pad, tgt, n_real)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    assert int(got_n) == int(want_n)


def test_sharded_ce_grad_matches(mesh):
    rng = np.random.default_rng(5)
    B, R, V_p, n_real = 4, 3, 32, 29
    h = jnp.asarray(rng.normal(size=(B, R, D)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(D, V_p)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(V_p,)), jnp.float32)
    pad = jnp.asarray(rng.normal(size=(B, R, 1)), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, n_real, size=(B, R)), jnp.int32)
    w_s = jax.device_put(w, NamedSharding(mesh, P(None, "model")))
    b_s = jax.device_put(b, NamedSharding(mesh, P("model")))

    g1 = jax.grad(lambda ww: sharded_loss.sharded_rec_cross_entropy(
        h, ww, b_s, pad, tgt, n_real, mesh)[0])(w_s)
    g2 = jax.grad(lambda ww: losses.rec_cross_entropy(
        jnp.einsum("brd,dv->brv", h, ww) + b, pad, tgt, n_real)[0])(w)
    np.testing.assert_allclose(np.array(g1), np.array(g2), atol=1e-5)


def test_sharded_ce_pallas_matches_xla(mesh):
    """The Pallas fused CE running on each vocab shard (interpret mode on
    the fake pod) must match the einsum shard kernel AND the local oracle:
    same lse/target-logit per row, incl. ignore-index masking and the
    shard-0-only pad fold."""
    rng = np.random.default_rng(8)
    B, R, V_p, n_real = 8, 4, 1024, 1000   # vocab shard = 256, kernel-ready
    h = jnp.asarray(rng.normal(size=(B, R, D)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(D, V_p)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(V_p,)) * 0.1, jnp.float32)
    pad = jnp.asarray(rng.normal(size=(B, R, 1)), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, n_real + 1, size=(B, R)), jnp.int32)
    w_s = jax.device_put(w, NamedSharding(mesh, P(None, "model")))
    b_s = jax.device_put(b, NamedSharding(mesh, P("model")))

    got = sharded_loss.sharded_rec_ce_rows_pallas(
        h, w_s, b_s, pad, tgt, n_real, mesh, interpret=True)
    want = sharded_loss.sharded_rec_ce_rows(
        h, w_s, b_s, pad, tgt, n_real, mesh)
    # fused_ce runs its matmuls in bf16 with f32 accumulation (the MXU fast
    # path); the einsum oracle is f32-highest -> tolerance is bf16-rounding
    np.testing.assert_allclose(np.array(got), np.array(want),
                               rtol=2e-3, atol=5e-3)

    local = losses.rec_ce_row_losses(
        jnp.einsum("brd,dv->brv", h, w) + b, pad, tgt, n_real)
    np.testing.assert_allclose(np.array(got), np.array(local),
                               rtol=2e-3, atol=5e-3)


def test_sharded_ce_pallas_grad_matches(mesh):
    rng = np.random.default_rng(9)
    B, R, V_p, n_real = 4, 3, 1024, 990
    h = jnp.asarray(rng.normal(size=(B, R, D)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(D, V_p)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(V_p,)) * 0.1, jnp.float32)
    pad = jnp.asarray(rng.normal(size=(B, R, 1)), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, n_real, size=(B, R)), jnp.int32)
    w_s = jax.device_put(w, NamedSharding(mesh, P(None, "model")))
    b_s = jax.device_put(b, NamedSharding(mesh, P("model")))

    def loss_pallas(hh, ww):
        rows = sharded_loss.sharded_rec_ce_rows_pallas(
            hh, ww, b_s, pad, tgt, n_real, mesh, interpret=True)
        return jnp.sum(rows)

    def loss_ref(hh, ww):
        return jnp.sum(losses.rec_ce_row_losses(
            jnp.einsum("brd,dv->brv", hh, ww) + b, pad, tgt, n_real))

    gh1, gw1 = jax.grad(loss_pallas, argnums=(0, 1))(h, w_s)
    gh2, gw2 = jax.grad(loss_ref, argnums=(0, 1))(h, w)
    np.testing.assert_allclose(np.array(gh1), np.array(gh2),
                               rtol=2e-3, atol=5e-3)
    np.testing.assert_allclose(np.array(gw1), np.array(gw2),
                               rtol=2e-3, atol=5e-3)


def test_sharded_full_rank_matches(mesh):
    rng = np.random.default_rng(6)
    B, V_p, n_real = 16, 32, 30
    h = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(D, V_p)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(V_p,)), jnp.float32)
    gt = jnp.asarray(rng.integers(0, n_real, size=(B,)), jnp.int32)
    w_s = jax.device_put(w, NamedSharding(mesh, P(None, "model")))
    b_s = jax.device_put(b, NamedSharding(mesh, P("model")))
    got = sharded_eval.sharded_full_rank(h, w_s, b_s, gt, n_real, mesh)

    scores = np.array(h @ w + b)[:, :n_real]
    want = (scores > scores[np.arange(B), np.array(gt)][:, None]).sum(1) + 1
    np.testing.assert_array_equal(np.array(got), want)


def test_sharded_topk_matches(mesh):
    rng = np.random.default_rng(7)
    B, V_p, n_real, k = 6, 32, 30, 5
    h = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(D, V_p)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(V_p,)), jnp.float32)
    w_s = jax.device_put(w, NamedSharding(mesh, P(None, "model")))
    b_s = jax.device_put(b, NamedSharding(mesh, P("model")))
    vals, idx = sharded_eval.sharded_topk(h, w_s, b_s, k, n_real, mesh)

    scores = np.array(h @ w + b)[:, :n_real]
    want_idx = np.argsort(-scores, axis=1)[:, :k]
    np.testing.assert_allclose(
        np.array(vals), np.take_along_axis(scores, want_idx, 1), rtol=1e-5)
    np.testing.assert_array_equal(np.array(idx), want_idx)


def test_sharded_train_step_matches_local(mesh):
    """Full train step through explicit collectives (ShardedOps) vs the
    single-device path: identical RNG -> loss must match to f32 tolerance."""
    import jax.numpy as jnp
    from c2dsr_tpu.config import Config, DataSpec
    from c2dsr_tpu.data import preprocess, synthetic
    from c2dsr_tpu.graph import build
    from c2dsr_tpu.model import c2dsr, params as params_mod
    from c2dsr_tpu.ops import spmm
    from c2dsr_tpu.parallel import mesh as mesh_mod
    from c2dsr_tpu.train import step as step_mod

    cfg_local = Config(data="fk", d_latent=32, len_rec=5,
                       vocab_pad_multiple=128)
    cfg_shard = cfg_local.with_(mesh_data=mesh.shape["data"],
                                mesh_model=mesh.shape["model"])
    spec = DataSpec(n_item_a=150, n_item_b=200, len_max=15)
    seqs = synthetic.generate_sequences(spec, 120, seed=11)
    train = preprocess.preprocess_train(seqs, spec, seed=11)
    gs, gp = build.build_graphs(seqs, spec)
    from c2dsr_tpu.config import padded_sizes
    n_p = padded_sizes(cfg_shard, spec)[0]
    graphs = c2dsr.Graphs(share=spmm.device_graph(gs),
                          specific=spmm.device_graph(gp))
    # the sharded strategy takes the precomputed all-to-all SpMM schedule
    graphs_s = c2dsr.Graphs(
        share=spmm.attach_a2a_plan(graphs.share, n_p, 4),
        specific=spmm.attach_a2a_plan(graphs.specific, n_p, 4))
    params = params_mod.init_params(jax.random.PRNGKey(0), cfg_local, spec)
    batch = {k: jnp.asarray(v[:16]) for k, v in train.items()}
    rng = jax.random.PRNGKey(5)

    from c2dsr_tpu.parallel import strategy
    l_local, aux_l = step_mod.loss_fn(params, graphs, batch, rng, cfg_local,
                                      spec, strategy.LocalOps(cfg=cfg_local))
    pops = strategy.make_ops(cfg_shard, mesh)
    params_s = jax.device_put(
        params, mesh_mod.params_shardings(params, mesh))
    batch_s = {k: jax.device_put(v, mesh_mod.batch_sharding(mesh))
               for k, v in batch.items()}
    l_shard, aux_s = jax.jit(
        lambda p, b: step_mod.loss_fn(p, graphs_s, b, rng, cfg_shard, spec,
                                      pops))(params_s, batch_s)
    np.testing.assert_allclose(float(l_shard), float(l_local), rtol=1e-4)
    np.testing.assert_allclose(float(aux_s["loss_rec"]),
                               float(aux_l["loss_rec"]), rtol=1e-4)


def test_dp_gradient_matches_single_device(mesh):
    """Data-parallel grad (batch sharded over 'data') == single-device grad."""
    rng = np.random.default_rng(8)
    w = jnp.asarray(rng.normal(size=(D, D)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(16, D)), jnp.float32)

    def loss(w_, x_):
        return jnp.mean((x_ @ w_) ** 2)

    g1 = jax.grad(loss)(w, x)
    x_s = jax.device_put(x, mesh_mod.batch_sharding(mesh))
    w_r = jax.device_put(w, mesh_mod.replicated(mesh))
    g2 = jax.jit(jax.grad(loss))(w_r, x_s)
    np.testing.assert_allclose(np.array(g1), np.array(g2), atol=1e-6)


def test_sharded_train_step_a2a_lookup_matches_local(mesh):
    """The a2a tower-lookup strategy (cfg.lookup_mode='a2a': ids sharded
    over the full mesh, bucket-by-owner exchange + all_gather,
    parallel/embed.a2a_lookup_replicated) must reproduce the local step's
    loss AND embedding-table gradients."""
    import jax.numpy as jnp
    from c2dsr_tpu.config import Config, DataSpec, padded_sizes
    from c2dsr_tpu.data import preprocess, synthetic
    from c2dsr_tpu.graph import build
    from c2dsr_tpu.model import c2dsr, params as params_mod
    from c2dsr_tpu.ops import spmm
    from c2dsr_tpu.parallel import mesh as mesh_mod, strategy
    from c2dsr_tpu.train import step as step_mod

    cfg_local = Config(data="fk", d_latent=32, len_rec=5,
                       vocab_pad_multiple=128)
    cfg_shard = cfg_local.with_(mesh_data=mesh.shape["data"],
                                mesh_model=mesh.shape["model"],
                                lookup_mode="a2a")
    spec = DataSpec(n_item_a=150, n_item_b=200, len_max=15)
    seqs = synthetic.generate_sequences(spec, 120, seed=13)
    train = preprocess.preprocess_train(seqs, spec, seed=13)
    gs, gp = build.build_graphs(seqs, spec)
    n_p = padded_sizes(cfg_shard, spec)[0]
    graphs = c2dsr.Graphs(share=spmm.device_graph(gs),
                          specific=spmm.device_graph(gp))
    graphs_s = c2dsr.Graphs(
        share=spmm.attach_a2a_plan(graphs.share, n_p, 4),
        specific=spmm.attach_a2a_plan(graphs.specific, n_p, 4))
    params = params_mod.init_params(jax.random.PRNGKey(0), cfg_local, spec)
    batch = {k: jnp.asarray(v[:16]) for k, v in train.items()}
    rng = jax.random.PRNGKey(5)

    (l_local, _), g_local = jax.value_and_grad(
        step_mod.loss_fn, has_aux=True)(
            params, graphs, batch, rng, cfg_local, spec,
            strategy.LocalOps(cfg=cfg_local))

    pops = strategy.make_ops(cfg_shard, mesh)
    assert cfg_shard.lookup_mode == "a2a"
    params_s = jax.device_put(params, mesh_mod.params_shardings(params, mesh))
    batch_s = {k: jax.device_put(v, mesh_mod.batch_sharding(mesh))
               for k, v in batch.items()}
    (l_shard, _), g_shard = jax.jit(jax.value_and_grad(
        lambda p, b: step_mod.loss_fn(p, graphs_s, b, rng, cfg_shard, spec,
                                      pops), has_aux=True))(params_s, batch_s)
    np.testing.assert_allclose(float(l_shard), float(l_local), rtol=1e-4)
    for name in ("embed_share", "embed_a", "embed_b", "cls_a_w"):
        ga, gl = np.asarray(g_shard[name]), np.asarray(g_local[name])
        scale = max(1e-3, float(np.abs(gl).max()))
        np.testing.assert_allclose(ga, gl, atol=1e-4 * scale,
                                   err_msg=name)
