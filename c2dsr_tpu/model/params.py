"""Parameter pytrees and initialization for the C2DSR model.

Matches the reference's parameter set and init distributions
(models/C2DSR.py:20-56, torch defaults for nn.Embedding / nn.Linear /
nn.MultiheadAttention):

* item embedding tables: N(0, 1), pad row zero (padding_idx semantics —
  enforced at apply time by masking the pad row, see model/c2dsr.py).
* positional embedding: N(0, 1).
* attention in-proj: xavier-uniform over the combined (3d, d) matrix,
  zero bias; out-proj and FFN linears: torch Linear default
  (kaiming-uniform a=sqrt(5) -> U(+-sqrt(1/fan_in)), bias U(+-1/sqrt(fan_in)));
  out-proj bias zeroed (torch MHA _reset_parameters).
* classifiers: xavier-uniform weights, zero bias (C2DSR.py:39-44).
* bilinear discriminators: xavier-uniform with torch's 3D fan computation
  (fan_in = d*d, fan_out = d), optional zero bias (C2DSR.py:46-55).

Parameters are plain nested dicts — trivially shardable with path-based
rules (parallel/mesh.py) and directly consumable by optax.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from c2dsr_tpu.config import Config, DataSpec


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_encoder_params(key: jax.Array, cfg: Config, len_max: int
                        ) -> Dict[str, Any]:
    d = cfg.d_latent
    keys = jax.random.split(key, 2 + cfg.n_attn)
    xavier_qkv = math.sqrt(6.0 / (3 * d + d))
    lin_w = math.sqrt(1.0 / d)        # kaiming-uniform a=sqrt(5), fan_in=d
    lin_b = 1.0 / math.sqrt(d)

    layers = []
    for li in range(cfg.n_attn):
        k = jax.random.split(keys[2 + li], 8)
        layers.append({
            "w_qkv": _uniform(k[0], (d, 3 * d), xavier_qkv),
            "b_qkv": jnp.zeros((3 * d,), jnp.float32),
            "w_out": _uniform(k[1], (d, d), lin_w),
            "b_out": jnp.zeros((d,), jnp.float32),
            "w_ff1": _uniform(k[2], (d, d), lin_w),
            "b_ff1": _uniform(k[3], (d,), lin_b),
            "w_ff2": _uniform(k[4], (d, d), lin_w),
            "b_ff2": _uniform(k[5], (d,), lin_b),
            "ln1_scale": jnp.ones((d,), jnp.float32),
            "ln1_bias": jnp.zeros((d,), jnp.float32),
            "ln2_scale": jnp.ones((d,), jnp.float32),
            "ln2_bias": jnp.zeros((d,), jnp.float32),
        })
    return {
        "pos_emb": jax.random.normal(keys[0], (len_max, d), jnp.float32),
        "layers": layers,
        "lnf_scale": jnp.ones((d,), jnp.float32),
        "lnf_bias": jnp.zeros((d,), jnp.float32),
    }


def init_params(key: jax.Array, cfg: Config, spec: DataSpec) -> Dict[str, Any]:
    d = cfg.d_latent
    na, nb = spec.n_item_a, spec.n_item_b
    # padded table rows / classifier output dims (config.padded_sizes):
    # padding lives past every real id; rows init to zero and never receive
    # gradient, padded logit columns are masked downstream.
    from c2dsr_tpu.config import padded_sizes
    n_p, na_p, nb_p = padded_sizes(cfg, spec)
    ks = jax.random.split(key, 16)

    def embed_table(k):
        t = jax.random.normal(k, (spec.n_item, d), jnp.float32)
        t = t.at[spec.idx_pad].set(0.0)
        return jnp.concatenate(
            [t, jnp.zeros((n_p - spec.n_item, d), jnp.float32)])

    def cls(k, n_real, n_pad):
        w = _uniform(k, (d, n_real), math.sqrt(6.0 / (n_real + d)))
        return jnp.concatenate(
            [w, jnp.zeros((d, n_pad - n_real), jnp.float32)], axis=1)

    params: Dict[str, Any] = {
        "embed_share": embed_table(ks[0]),
        "attn_share": init_encoder_params(ks[3], cfg, spec.len_max),
        "attn_a": init_encoder_params(ks[4], cfg, spec.len_max),
        "attn_b": init_encoder_params(ks[5], cfg, spec.len_max),
        "cls_a_w": cls(ks[6], na, na_p),
        "cls_a_b": jnp.zeros((na_p,), jnp.float32),
        "cls_b_w": cls(ks[7], nb, nb_p),
        "cls_b_b": jnp.zeros((nb_p,), jnp.float32),
        "cls_pad_w": _uniform(ks[8], (d, 1), math.sqrt(6.0 / (1 + d))),
        "cls_pad_b": jnp.zeros((1,), jnp.float32),
        # torch Bilinear(1, d, d): fan_in = d*d, fan_out = 1*d
        "D_a_w": _uniform(ks[9], (d, d), math.sqrt(6.0 / (d * d + d))),
        "D_b_w": _uniform(ks[10], (d, d), math.sqrt(6.0 / (d * d + d))),
    }
    if not cfg.shared_item_embed:
        params["embed_a"] = embed_table(ks[1])
        params["embed_b"] = embed_table(ks[2])
    if cfg.d_bias:
        params["D_a_b"] = jnp.zeros((1,), jnp.float32)
        params["D_b_b"] = jnp.zeros((1,), jnp.float32)
    return params


def init_params_sharded(key: jax.Array, cfg: Config, spec: DataSpec,
                        mesh) -> Dict[str, Any]:
    """Initialize directly INTO the mesh sharding rules: each device
    materializes only its shard of the big tables (item rows / classifier
    columns over 'model'), never a replicated full copy — required at the
    10M-row scaled config where one full f32 table is ~20 GB.

    jit with out_shardings partitions the counter-based RNG init itself, so
    peak per-device memory is the shard size, not the table size."""
    import functools
    from c2dsr_tpu.parallel import mesh as mesh_mod

    fn = functools.partial(init_params, cfg=cfg, spec=spec)
    shapes = jax.eval_shape(fn, key)
    shardings = mesh_mod.params_shardings(shapes, mesh)
    return jax.jit(fn, out_shardings=shardings)(key)


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
