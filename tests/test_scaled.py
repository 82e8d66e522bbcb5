"""Scaled-config execution on the fake 8-device pod (BASELINE.json cfg 5).

The 10M-item x d=512 regime can't run on CPU at full size, so this
exercises the exact sharded machinery at 1M rows (within CI memory):
shard-local table init (no replicated full table), masked-psum AND
all-to-all lookups, vocab-sharded CE, full-rank, and the a2a SpMM plan
over a realistically sparse million-row graph.  The real-chip throughput
measurements + 10M projections live in bench/scaled_bench.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from c2dsr_tpu.config import Config, DataSpec
from c2dsr_tpu.model import params as params_mod
from c2dsr_tpu.parallel import embed, mesh as mesh_mod, sharded_eval, \
    sharded_loss

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")

V_ROWS = 1 << 20            # 1,048,576 table rows
D = 64


@pytest.fixture(scope="module")
def mesh():
    return mesh_mod.make_mesh(n_data=1, n_model=8)


def test_shard_local_init_no_replicated_table(mesh):
    """init_params_sharded materializes each table directly in its sharding:
    every device holds exactly rows/8, and values match the unsharded init."""
    cfg = Config(d_latent=32, vocab_pad_multiple=1024)
    spec = DataSpec(n_item_a=3000, n_item_b=4000, len_max=15)
    p_sharded = params_mod.init_params_sharded(jax.random.PRNGKey(0), cfg,
                                               spec, mesh)
    tbl = p_sharded["embed_share"]
    n_p = tbl.shape[0]
    assert n_p % 8 == 0
    for s in tbl.addressable_shards:
        assert s.data.shape == (n_p // 8, cfg.d_latent)

    p_plain = params_mod.init_params(jax.random.PRNGKey(0), cfg, spec)
    for k in ("embed_share", "cls_a_w", "cls_b_b", "cls_pad_w"):
        np.testing.assert_allclose(np.asarray(p_sharded[k]),
                                   np.asarray(p_plain[k]), atol=1e-6)


def test_million_row_sharded_ops(mesh):
    """Lookup (both strategies), CE, full-rank and a2a SpMM at 1M rows."""
    key = jax.random.PRNGKey(1)
    tbl = jax.jit(
        lambda k: jax.random.normal(k, (V_ROWS, D), jnp.float32),
        out_shardings=NamedSharding(mesh, P("model", None)))(key)
    rng = np.random.default_rng(2)

    # masked-psum lookup (activations model-replicated)
    ids = jnp.asarray(rng.integers(0, V_ROWS, size=(64,)), jnp.int32)
    got = embed.sharded_lookup(tbl, ids, mesh)
    want = np.asarray(tbl)[np.asarray(ids)]
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    # all-to-all lookup (DLRM regime: ids sharded over the model axis)
    ids_s = jax.device_put(ids, NamedSharding(mesh, P("model")))
    got2 = embed.all_to_all_lookup(tbl, ids_s, mesh)
    np.testing.assert_allclose(np.asarray(got2), want, atol=1e-6)

    # vocab-sharded CE over the million-class classifier
    B, R = 8, 4
    h = jnp.asarray(rng.normal(size=(B, R, D)), jnp.float32)
    w = jax.jit(lambda k: jax.random.normal(k, (D, V_ROWS), jnp.float32)
                * 0.02,
                out_shardings=NamedSharding(mesh, P(None, "model")))(key)
    b = jax.device_put(jnp.zeros((V_ROWS,), jnp.float32),
                       NamedSharding(mesh, P("model")))
    pad = jnp.zeros((B, R, 1), jnp.float32)
    n_real = V_ROWS - 1024
    tgt = jnp.asarray(rng.integers(0, n_real, size=(B, R)), jnp.int32)
    loss, n = sharded_loss.sharded_rec_cross_entropy(h, w, b, pad, tgt,
                                                     n_real, mesh)
    assert np.isfinite(float(loss)) and int(n) == B * R
    # CE over V classes at near-uniform logits ~ log(V)
    assert abs(float(loss) - np.log(V_ROWS)) < 2.0

    # full-rank over the million-item vocab
    hv = jnp.asarray(rng.normal(size=(16, D)), jnp.float32)
    gt = jnp.asarray(rng.integers(0, n_real, size=(16,)), jnp.int32)
    ranks = sharded_eval.sharded_full_rank(hv, w, b, gt, n_real, mesh)
    ranks = np.asarray(ranks)
    assert ranks.min() >= 1 and ranks.max() <= n_real

    # a2a-plan SpMM over a sparse million-row graph (3 edges/row avg)
    nnz = 3 * V_ROWS
    rows = np.sort(rng.integers(0, V_ROWS, size=nnz)).astype(np.int64)
    cols = rng.integers(0, V_ROWS, size=nnz).astype(np.int64)
    vals = (np.ones(nnz) / 3).astype(np.float32)
    plan = embed.plan_spmm_a2a(rows, cols, vals, V_ROWS, 8)
    out = embed.sharded_spmm_a2a(plan, tbl, mesh)
    assert out.shape == (V_ROWS, D)
    # spot-check 3 destination rows against a host oracle
    tbl_np = np.asarray(tbl)
    out_np = np.asarray(out)
    for r in (0, V_ROWS // 2, V_ROWS - 7):
        sel = rows == r
        want_r = (tbl_np[cols[sel]] * vals[sel][:, None]).sum(0) \
            if sel.any() else np.zeros(D, np.float32)
        np.testing.assert_allclose(out_np[r], want_r, atol=1e-4)
