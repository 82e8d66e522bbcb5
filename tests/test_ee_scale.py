"""Entertainment-Education configuration coverage (len_max=30, main.py:71).

EE is the one reference dataset with a different sequence geometry: L=30
(vs 15), which exercises the fused encoder's L->32 alignment padding and
every preprocessing walk at double depth.  The EE interaction files are
missing from the mount (SURVEY.md), so these run the full pipeline on
synthetic EE-shaped data: preprocess -> graph -> one train epoch -> eval.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from c2dsr_tpu.config import Config, DataSpec
from c2dsr_tpu.data import preprocess, synthetic
from c2dsr_tpu.graph import build
from c2dsr_tpu.model import c2dsr, params as params_mod
from c2dsr_tpu.ops import spmm
from c2dsr_tpu.train.loop import Experiment

SPEC = DataSpec(n_item_a=80, n_item_b=110, len_max=30)


@pytest.fixture(scope="module")
def ee_setup():
    cfg = Config(data="ee", len_max=30, d_latent=32, batch_size=32,
                 batch_size_eval=64, len_rec=10, n_neg_sample=20)
    assert cfg.resolved_len_max() == 30          # main.py:71 mapping
    seqs = synthetic.generate_sequences(SPEC, 300, seed=3)
    train = preprocess.preprocess_train(seqs, SPEC, seed=3)
    ev = preprocess.preprocess_evaluate(seqs[:100], SPEC, n_neg_sample=20,
                                        seed=4)
    gs, gp = build.build_graphs(seqs, SPEC)
    graphs = c2dsr.Graphs(share=spmm.device_graph(gs),
                          specific=spmm.device_graph(gp))
    return cfg, train, ev, graphs


def test_ee_preprocess_geometry(ee_setup):
    cfg, train, ev, graphs = ee_setup
    assert train["seq_share"].shape[1] == 30
    assert train["gt_share_a"].shape[1] == 30
    assert ev["seq_share"].shape[1] == 30
    # sequences actually use the depth: some examples have > 15 real tokens
    real = (train["seq_share"] != SPEC.idx_pad).sum(1)
    assert real.max() > 15


def test_ee_train_epoch_and_eval(ee_setup):
    cfg, train, ev, graphs = ee_setup
    exp = Experiment(cfg.with_(n_epoch=2), SPEC, graphs, train, ev, ev)
    l1 = exp.run_train_epoch()
    l2 = exp.run_train_epoch()
    assert np.isfinite(l1).all() and np.isfinite(l2).all()
    assert l2[0] < l1[0]
    ra, rb = exp.run_eval(ev)
    assert len(ra) + len(rb) == ev["gt_last"].shape[0]
    assert min(ra + rb) >= 1 and max(ra + rb) <= 21


def test_ee_fused_encoder_l30_alignment():
    """L=30 -> LP=32 alignment in the fused kernel (interpret mode) must
    match the XLA encoder, forward and gradient."""
    from c2dsr_tpu.ops import encoder as enc
    from c2dsr_tpu.ops import encoder_pallas as encp
    encp.st_interpret.set(True)
    try:
        d, l, pad = 32, 30, 10 ** 6
        cfg = Config(d_latent=d, n_attn=1, n_head=1)
        p = params_mod.init_encoder_params(jax.random.PRNGKey(0), cfg, l)
        rng = np.random.default_rng(5)
        seq = rng.integers(0, 50, size=(8, l)).astype(np.int32)
        seq[:, :4] = pad                    # some data padding too
        pos = np.tile(np.arange(1, l + 1, dtype=np.int32), (8, 1))
        pos[:, :4] = 0
        h = jnp.asarray(rng.normal(size=(8, l, d)), jnp.float32)
        seq, pos = jnp.asarray(seq), jnp.asarray(pos)

        def f_x(hh):
            return jnp.sum(jnp.square(enc.encode_sequence(
                seq, hh, pos, p, idx_pad=pad, n_head=1, dropout=0.0,
                rng=None, norm_first=False, invert_padding_mask=False)))

        def f_p(hh):
            return jnp.sum(jnp.square(encp.encode_sequence_fused(
                seq, hh, pos, p, idx_pad=pad, n_head=1, dropout=0.0,
                rng=None, invert_padding_mask=False,
                matmul_dtype=jnp.float32, block_b=8)))

        vx, gx = jax.value_and_grad(f_x)(h)
        vp, gp_ = jax.value_and_grad(f_p)(h)
        real = np.asarray(seq != pad)[..., None]
        np.testing.assert_allclose(float(vp), float(vx), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gp_) * real,
                                   np.asarray(gx) * real, atol=1e-4)
    finally:
        encp.st_interpret.set(False)
