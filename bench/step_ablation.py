"""Train-step ablation: where do the milliseconds go?

Times the full FK-scale train step, then variants with one component
stubbed or switched, attributing step time to: fused CE, SpMM (graph
propagation fwd+bwd), attention towers, dropout RNG, and the optimizer.
Stubs monkeypatch the strategy/backend seams, so each variant recompiles
the whole step with that component removed — the delta is the component's
contribution INCLUDING its backward and fusion effects (which per-kernel
microbenches cannot see).

Merges a "step_breakdown" section into BENCH_DETAILS.json (round-5
verdict #5) so per-component attribution ships as an auditable artifact
next to the headline number instead of living in commit messages.

Run: python -m bench.step_ablation
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def step_time(cfg, spec, graphs, train, n_steps=40):
    from c2dsr_tpu.model import params as params_mod
    from c2dsr_tpu.train import optim, step as step_mod

    BATCH = 512
    params = params_mod.init_params(jax.random.PRNGKey(0), cfg, spec)
    optimizer = optim.make_optimizer(cfg, steps_per_epoch=16)
    state = step_mod.init_state(params, optimizer)
    train_step = step_mod.make_train_step(
        cfg, spec, graphs, optimizer,
        jax.random.key(1, impl=cfg.resolved_train_prng()))
    batches = []
    for i in range(4):
        s = i * BATCH
        batches.append({k: jnp.asarray(v[s:s + BATCH])
                        for k, v in train.items()})
    for b in batches[:2]:
        state, aux = train_step(state, b)
    jax.block_until_ready(aux["loss"])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, aux = train_step(state, batches[i % len(batches)])
        jax.block_until_ready(aux["loss"])
        ts.append((time.perf_counter() - t0) / n_steps)
    return min(ts)


def main():
    from bench import fk_graph
    from c2dsr_tpu.config import Config
    from c2dsr_tpu.graph.build import CooGraph
    from c2dsr_tpu.model import c2dsr
    from c2dsr_tpu.ops import backend as backend_mod
    from c2dsr_tpu.ops import spmm
    from c2dsr_tpu.parallel import strategy

    cfg = Config(data="fk", batch_size=512)
    spec = fk_graph.spec()
    train = fk_graph.load_train()
    g = fk_graph.load_or_build()
    n = spec.n_item
    graphs = c2dsr.Graphs(
        share=spmm.device_graph(
            CooGraph(g["s_rows"], g["s_cols"], g["s_vals"], n)),
        specific=spmm.device_graph(
            CooGraph(g["p_rows"], g["p_cols"], g["p_vals"], n)))

    results = {}

    def run(tag, cfg_=None):
        t = step_time(cfg_ or cfg, spec, graphs, train)
        results[tag] = t
        print(f"{tag:24s} {t*1e3:7.2f} ms   ({512/t:8.0f} ex/s)", flush=True)
        return t

    base = run("full")

    # --- no CE: stub ce_rows to a cheap row mean (kills fwd+bwd of both CE
    # kernel invocations; keeps shapes/masking downstream)
    orig_ce = strategy.LocalOps.ce_rows
    strategy.LocalOps.ce_rows = (
        lambda self, h, w, b, pad, tgt, n_real:
        jnp.mean(h, axis=-1) * 1e-3)
    try:
        run("no_ce")
    finally:
        strategy.LocalOps.ce_rows = orig_ce

    # --- no SpMM: n_gnn=0 skips graph propagation entirely (tables used raw)
    run("no_spmm", cfg.with_(n_gnn=0))

    # --- XLA encoder: disable the fused tower kernel only
    orig_enc = backend_mod.use_fused_encoder
    backend_mod.use_fused_encoder = lambda cfg_: False
    try:
        run("xla_encoder")
    finally:
        backend_mod.use_fused_encoder = orig_enc

    # --- no dropout: removes RNG mask generation (tables + attention)
    run("no_dropout", cfg.with_(dropout_gnn=0.0, dropout_attn=0.0))

    # --- f32 activations
    run("f32_compute", cfg.with_(compute_dtype="float32"))

    print("\nattribution (delta vs full):")
    for tag in ("no_ce", "no_spmm", "xla_encoder", "no_dropout"):
        if tag in results:
            print(f"  {tag:22s} {1e3*(base - results[tag]):+7.2f} ms")

    from bench.details import merge
    breakdown = {
        "method": "full FK-scale step re-timed with one component stubbed; "
                  "delta vs full = that component's cost incl. backward "
                  "and fusion effects",
        "device": str(jax.devices()[0]),
        "step_ms": {k: round(v * 1e3, 2) for k, v in results.items()},
        "attribution_ms": {
            tag: round(1e3 * (base - results[tag]), 2)
            for tag in ("no_ce", "no_spmm", "xla_encoder", "no_dropout")
            if tag in results},
    }
    details_path = merge({"step_breakdown": breakdown})
    print(f"merged step_breakdown into {details_path}")


if __name__ == "__main__":
    main()
