"""Checkpoint save/restore + experiment resume.

SURVEY.md section 5 sets the bar: save-on-best + resume.  These tests pin:
  * exact TrainState round-trip (params, AMSGrad moments, step counter),
  * bit-identical next-step loss after restore vs the uninterrupted run,
  * Experiment(resume=True) picks up the state AND the best-validation
    bookkeeping (start epoch, improvement, early-stop counter).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from c2dsr_tpu import checkpoint as ckpt_mod
from c2dsr_tpu.data import preprocess, synthetic
from c2dsr_tpu.graph import build
from c2dsr_tpu.model import c2dsr
from c2dsr_tpu.ops import spmm
from c2dsr_tpu.train.loop import Experiment


@pytest.fixture(scope="module")
def setup(tiny_cfg, tiny_spec, tiny_sequences):
    cfg, spec = tiny_cfg, tiny_spec
    train = preprocess.preprocess_train(tiny_sequences, spec, seed=1)
    eval_seqs = synthetic.generate_sequences(spec, 60, seed=2)
    val = preprocess.preprocess_evaluate(eval_seqs, spec, n_neg_sample=20,
                                         seed=2)
    gs, gp = build.build_graphs(tiny_sequences, spec)
    graphs = c2dsr.Graphs(share=spmm.device_graph(gs),
                          specific=spmm.device_graph(gp))
    return cfg, spec, train, val, graphs


def _tree_equal(a, b):
    for (pa, la), lb in zip(jax.tree_util.tree_flatten_with_path(a)[0],
                            jax.tree.leaves(b)):
        np.testing.assert_array_equal(
            np.asarray(la), np.asarray(lb),
            err_msg=f"mismatch at {jax.tree_util.keystr(pa)}")


def test_state_roundtrip_and_identical_next_step(setup, tmp_path):
    cfg, spec, train, val, graphs = setup
    path = str(tmp_path / "ckpt")

    exp1 = Experiment(cfg, spec, graphs, train, val, val, ckpt_path=path)
    exp1.run_train_epoch()
    ckpt_mod.save(path, exp1.state, meta={"epoch": 1, "imp_val_best": 0.25,
                                          "res_test": [0.1] * 13,
                                          "es_counter": 2})

    exp2 = Experiment(cfg.with_(resume=True), spec, graphs, train, val, val,
                      ckpt_path=path)
    # exact round-trip: params, torch-style AMSGrad moments, step counter
    _tree_equal(exp1.state, exp2.state)
    assert int(exp2.state.step) == int(exp1.state.step)
    assert exp2._start_epoch == 1
    assert exp2._best["imp_val_best"] == 0.25
    assert exp2._best["es_counter"] == 2

    # identical next step: same batch through both states -> same loss/state
    batch = {k: jnp.asarray(v[:16]) for k, v in train.items()}
    s1, aux1 = exp1.train_step(exp1.state, batch)
    s2, aux2 = exp2.train_step(exp2.state, batch)
    assert float(aux1["loss"]) == float(aux2["loss"])
    _tree_equal(s1.params, s2.params)


def test_resume_flag_off_ignores_checkpoint(setup, tmp_path):
    cfg, spec, train, val, graphs = setup
    path = str(tmp_path / "ckpt")
    exp1 = Experiment(cfg, spec, graphs, train, val, val, ckpt_path=path)
    exp1.run_train_epoch()
    ckpt_mod.save(path, exp1.state, meta={"epoch": 3})

    exp2 = Experiment(cfg, spec, graphs, train, val, val, ckpt_path=path)
    assert exp2._start_epoch == 0
    assert int(exp2.state.step) == 0


def test_run_saves_on_best_and_resumes_epoch_count(setup, tmp_path):
    cfg, spec, train, val, graphs = setup
    path = str(tmp_path / "ckpt")
    exp1 = Experiment(cfg.with_(n_epoch=1), spec, graphs, train, val, val,
                      ckpt_path=path)
    out1 = exp1.run()
    assert ckpt_mod.exists(path)
    meta = ckpt_mod.load_meta(path)
    assert meta["epoch"] == 1
    assert meta["imp_val_best"] == pytest.approx(out1["imp_val_best"])

    # resumed run continues at epoch 2 and can only improve on the best
    exp2 = Experiment(cfg.with_(n_epoch=2, resume=True), spec, graphs,
                      train, val, val, ckpt_path=path)
    assert int(exp2.state.step) == int(exp1.state.step)
    out2 = exp2.run()
    assert out2["epoch"] == 2
    assert out2["imp_val_best"] >= out1["imp_val_best"]


def test_async_save_overlaps_then_commits(setup, tmp_path):
    """save() must return before the disk commit (async, round-5 verdict
    item 7) and wait() must make the full checkpoint readable."""
    import time

    cfg, spec, train, val, graphs = setup
    path = str(tmp_path / "ckpt_async")
    exp = Experiment(cfg, spec, graphs, train, val, val, ckpt_path=path)
    exp.run_train_epoch()

    t0 = time.perf_counter()
    ckpt_mod.save(path, exp.state, meta={"epoch": 1})
    t_save = time.perf_counter() - t0
    ckpt_mod.wait()
    # meta.json is written by wait() AFTER the state commit finishes
    assert ckpt_mod.load_meta(path)["epoch"] == 1
    restored = ckpt_mod.restore(path, template=exp.state)
    _tree_equal(exp.state, restored)
    # the async dispatch itself must be quick (the commit runs on the
    # background thread); generous bound to stay robust on shared CI
    assert t_save < 5.0, t_save


def test_crash_window_keeps_previous_checkpoint(setup, tmp_path):
    """Durability contract: dispatching save k must never touch the newest
    COMPLETE checkpoint — if the process dies during the async commit, the
    previous (state, meta) pair survives and restore still works."""
    import os

    cfg, spec, train, val, graphs = setup
    path = str(tmp_path / "ckpt_crash")
    exp = Experiment(cfg, spec, graphs, train, val, val, ckpt_path=path)
    exp.run_train_epoch()

    ckpt_mod.save(path, exp.state, meta={"epoch": 1}, block=True)
    meta1 = ckpt_mod.load_meta(path)
    dir1 = os.path.join(path, meta1["state_dir"])
    exp.run_train_epoch()
    ckpt_mod.save(path, exp.state, meta={"epoch": 2})   # async, in flight
    # IMMEDIATELY after dispatch (commit may still be running): the
    # checkpoint meta points at must be intact, and meta unchanged
    assert os.path.isdir(dir1)
    assert ckpt_mod.load_meta(path, _wait=False)["epoch"] == 1
    restored = ckpt_mod.restore(path, template=exp.state)   # joins commit
    # after the join the NEW save is the visible one
    assert ckpt_mod.load_meta(path)["epoch"] == 2
    _tree_equal(exp.state, restored)


def test_legacy_round4_layout_restores(setup, tmp_path):
    """Checkpoints written by the round-4 PyTreeCheckpointer (single
    'state' dir, no state_dir in meta) still restore."""
    import json
    import os

    import orbax.checkpoint as ocp

    cfg, spec, train, val, graphs = setup
    path = str(tmp_path / "ckpt_legacy")
    exp = Experiment(cfg, spec, graphs, train, val, val)
    exp.run_train_epoch()
    ocp.PyTreeCheckpointer().save(os.path.join(path, "state"),
                                  jax.device_get(exp.state))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"epoch": 7, "imp_val_best": 0.5, "es_counter": 0,
                   "res_test": [0.1] * 13}, f)
    assert ckpt_mod.exists(path)
    restored = ckpt_mod.restore(path, template=exp.state)
    _tree_equal(exp.state, restored)
    assert ckpt_mod.load_meta(path)["epoch"] == 7


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs a fake pod")
def test_sharded_state_roundtrip(setup, tmp_path):
    """A TrainState with mesh-sharded tables must round-trip through the
    async checkpointer and restore straight to its mesh placement (the
    sharded 10M-row regime's resume path)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from c2dsr_tpu.parallel import mesh as mesh_mod

    cfg, spec, train, val, graphs = setup
    mesh = mesh_mod.make_mesh(n_data=1, n_model=4)
    exp = Experiment(cfg, spec, graphs, train, val, val)
    exp.run_train_epoch()

    sh = NamedSharding(mesh, P("model", None))
    state = exp.state._replace(params=jax.tree.map(
        lambda v: (jax.device_put(v, sh)
                   if v.ndim == 2 and v.shape[0] % 4 == 0 else v),
        exp.state.params))
    n_sharded = sum(1 for v in jax.tree.leaves(state.params)
                    if getattr(v.sharding, "spec", None) == P("model", None))
    assert n_sharded > 0

    path = str(tmp_path / "ckpt_sharded")
    ckpt_mod.save(path, state, meta={"epoch": 1}, block=True)
    restored = ckpt_mod.restore(path, template=state)
    _tree_equal(state, restored)
    for (pa, va), vr in zip(
            jax.tree_util.tree_flatten_with_path(state.params)[0],
            jax.tree.leaves(restored.params)):
        assert vr.sharding == va.sharding, jax.tree_util.keystr(pa)
