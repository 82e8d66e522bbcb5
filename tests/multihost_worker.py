"""Worker process for the multi-host CPU loopback test (test_multihost.py).

Each worker is one JAX process with 4 virtual CPU devices; together two
workers form a fake 2-host x 4-chip pod (SURVEY.md section 4's prescribed
substitute for real multi-node testing).  Runs TWO sharded train steps on
deterministic data through the full multi-host path — distributed init,
global mesh, per-process BatchIterator slices, global_batch assembly — plus
a multi-host eval, and writes loss/param-checksum/ranks to a JSON file.

Usage: python multihost_worker.py <process_id> <num_processes> <port> <out>
"""

import json
import os
import sys


def main():
    pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from c2dsr_tpu.parallel import distributed
    distributed.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc

    losses, checksum, ranks = run_experiment(n_data=2 * nproc, n_model=2)

    if pid == 0:
        with open(out, "w") as f:
            json.dump({"losses": losses, "checksum": checksum,
                       "ranks": ranks, "n_devices": len(jax.devices())}, f)


def run_experiment(n_data, n_model):
    """Two train steps + eval on the (n_data, n_model) mesh.  Runs the SAME
    deterministic computation in single- and multi-process form (the test
    compares the two)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from c2dsr_tpu.config import Config, DataSpec, padded_sizes
    from c2dsr_tpu.data import preprocess, synthetic
    from c2dsr_tpu.data.pipeline import BatchIterator
    from c2dsr_tpu.evaluate import ranker
    from c2dsr_tpu.graph import build
    from c2dsr_tpu.model import c2dsr, params as params_mod
    from c2dsr_tpu.ops import spmm
    from c2dsr_tpu.parallel import mesh as mesh_mod
    from c2dsr_tpu.train import optim, step as step_mod

    cfg = Config(data="fk", d_latent=32, len_rec=5, batch_size=32,
                 batch_size_eval=32, n_neg_sample=20, dropout_gnn=0.0,
                 dropout_attn=0.0, vocab_pad_multiple=128,
                 mesh_data=n_data, mesh_model=n_model)
    spec = DataSpec(n_item_a=150, n_item_b=200, len_max=15)
    seqs = synthetic.generate_sequences(spec, 128, seed=21)
    train = preprocess.preprocess_train(seqs, spec, seed=21)
    ev = preprocess.preprocess_evaluate(seqs[:48], spec, n_neg_sample=20,
                                        seed=22)
    gs, gp = build.build_graphs(seqs, spec)
    n_p = padded_sizes(cfg, spec)[0]
    graphs = c2dsr.Graphs(
        share=spmm.attach_a2a_plan(spmm.device_graph(gs), n_p, n_model),
        specific=spmm.attach_a2a_plan(spmm.device_graph(gp), n_p, n_model))

    mesh = mesh_mod.make_mesh(n_data, n_model)
    params = params_mod.init_params(jax.random.PRNGKey(0), cfg, spec)
    optimizer = optim.make_optimizer(cfg, steps_per_epoch=4)
    state = step_mod.init_state(params, optimizer)
    state = jax.device_put(state, mesh_mod.state_shardings(state, mesh))
    train_step = step_mod.make_train_step(cfg, spec, graphs, optimizer,
                                          jax.random.PRNGKey(7), mesh=mesh)

    pc, pi = jax.process_count(), jax.process_index()
    # drop_last=False: the final RAGGED batch is kept, so the multi-host
    # path exercises pad_to_multiple + the valid mask (train/step.loss_fn);
    # the single-process oracle runs the same ragged batch unpadded —
    # equality is the padded-batch equivalence proven in test_train.
    it = BatchIterator(train, cfg.batch_size, shuffle=True, seed=5,
                       drop_last=False, pad_to_multiple=n_data,
                       process_index=pi, process_count=pc)
    n_batches = len(it)
    assert next(iter(train.values())).shape[0] % cfg.batch_size != 0, (
        "corpus size must leave a ragged final batch for this test")
    losses = []
    for i, batch in enumerate(it.epoch()):
        if i >= n_batches:
            break
        if pc > 1:
            batch = mesh_mod.global_batch(batch, mesh)
        else:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, aux = train_step(state, batch)
        losses.append(float(aux["loss"]))

    # replicated scalar checksum of the (sharded) params after 2 steps
    @jax.jit
    def cksum(p):
        return sum(jnp.sum(jnp.square(x)) for x in jax.tree.leaves(p))

    checksum = float(cksum(state.params))

    # multi-host eval through the same plumbing as Experiment.run_eval
    convolve_eval, rank_step = ranker.make_eval_fns(cfg, spec, graphs,
                                                    mesh=mesh)
    hi = convolve_eval(state.params)
    to_global = None
    if pc > 1:
        def to_global(chunk):
            b = next(iter(chunk.values())).shape[0]
            k = b // pc
            return mesh_mod.global_batch(
                {kk: v[pi * k:(pi + 1) * k] for kk, v in chunk.items()},
                mesh)

    ra, rb = ranker.evaluate_split(state.params, hi, ev, rank_step, cfg,
                                   mode="full", to_global=to_global)
    return losses, checksum, ra + rb


if __name__ == "__main__":
    main()
