"""Typed experiment configuration.

Preserves every hyperparameter of the reference CLI with identical defaults
(reference: main.py:15-66), expressed as a frozen dataclass instead of an
argparse namespace with derived fields stuffed onto it (main.py:69-89).

Derived fields (item counts, pad index) live in :class:`DataSpec`, produced by
the data layer, so the model/config split is explicit instead of implicit.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

MAPPING_DATASET = {
    "fk": "Food-Kitchen",
    "mb": "Movie-Book",
    "ee": "Entertainment-Education",
}

# Paper's C2DSR results (hr5_a, ndcg5_a, hr5_b, ndcg5_b), the denominator of the
# "improvement" model-selection scalar.  Reference: utils/constant.py:13-17.
BENCHMARKS = {
    "fk": [0.1124, 0.0865, 0.0574, 0.0416],
    "mb": [0.0647, 0.0476, 0.0284, 0.0217],
    "ee": [0.6945, 0.5620, 0.7104, 0.5905],
}


@dataclasses.dataclass(frozen=True)
class Config:
    """All experiment hyperparameters (reference defaults, main.py:15-66)."""

    # Experiment
    data: str = "fk"                # fk | mb | ee
    len_rec: int = 10               # loss window over last positions (main.py:21)

    # Data
    use_raw: bool = False
    n_neg_sample: int = 999         # eval negatives (main.py:25)

    # Model
    d_latent: int = 128
    shared_item_embed: bool = False
    d_bias: bool = False            # bias on bilinear discriminators

    # GNN
    n_gnn: int = 1
    dropout_gnn: float = 0.2

    # Transformer
    n_attn: int = 1
    n_head: int = 1
    dropout_attn: float = 0.2
    norm_first: bool = False

    # Optimizer (AdamW amsgrad + StepLR; reference trainer.py:21-23)
    lr: float = 1e-3
    l2: float = 5e-4
    lr_gamma: float = 0.5
    lr_step: int = 10
    max_grad_norm: float = 5.0      # declared but unused in the reference (main.py:54)
    apply_grad_clip: bool = False   # parity default: reference never applies clipping

    # Sequences
    len_max: int = 15               # 30 for ee (main.py:71)
    lambda_loss: float = 0.7

    # Training
    seed: int = 3407
    n_epoch: int = 200
    batch_size: int = 512
    batch_size_eval: int = 2048
    es_patience: int = 10

    # --- TPU-build-only knobs (no reference counterpart) -------------------
    # Numerics for activations/matmuls; params stay f32.  "auto" resolves to
    # bfloat16 on TPU (measured faster at FK scale with matched quality,
    # tests/test_train.py) and float32 elsewhere; use resolved_compute_dtype().
    compute_dtype: str = "auto"
    # Streaming dtype of the classifier weight at its use sites (CE loss and
    # ranking).  Master params stay f32 in the optimizer; "bfloat16" casts
    # [d, V] once per use, halving the weight's HBM traffic in the CE
    # forward and all three backward streams (the step's dominant bytes) and
    # in eval scoring.  Matmul NUMERICS are unchanged on TPU — the kernels
    # already compute bf16 x bf16 -> f32 — only the stored rounding of W
    # differs.  "auto" -> bfloat16 on TPU, float32 elsewhere.
    classifier_dtype: str = "auto"
    # Kernel backend: "xla" (portable) or "pallas" (TPU fused kernels).
    kernel_backend: str = "auto"    # auto -> pallas on TPU, xla elsewhere
    # Batch-sparse graph propagation in the TRAIN step (Pallas path): mask
    # SpMM edges outside the batch's neighborhood — the step reads only
    # batch rows of the propagated tables and their cotangent is zero
    # elsewhere, so every consumed value and every gradient is exactly the
    # dense computation's (ops/spmm_pallas.make_blocked_spmm_flagged).
    # Eval/convolve-for-ranking always runs dense.  Default OFF: measured
    # SLOWER at FK scale on v5e (22.1 vs 17.0 ms/step) — the XLA row-marker
    # scatters and the masked gather's unchanged transaction count eat the
    # saved bytes; the switch exists for larger/denser graphs where the
    # batch neighborhood is a smaller fraction of nnz.
    batch_sparse_gnn: bool = False
    # Train-step dropout PRNG implementation ("auto" | "rbg" |
    # "threefry2x32"); see resolved_train_prng.
    train_prng: str = "auto"
    # Off-TPU, run shard-local Pallas kernels through the interpreter instead
    # of falling back to XLA (fake-pod dryrun/tests of the sharded fast path).
    pallas_interpret: bool = False
    # Mesh shape: data-parallel x model-parallel.  (1, 1) = single chip.
    mesh_data: int = 1
    mesh_model: int = 1
    # Sharded-table tower-lookup strategy (mesh_model > 1 only):
    # "psum" = owner-masked gather + psum (optimal when every model shard
    # needs every id); "a2a" = bucket-by-owner all-to-all exchange with the
    # id set sharded over the whole mesh (each device gathers only 1/M of
    # the rows) + an all_gather back.  Both are exact; see parallel/embed.py.
    lookup_mode: str = "psum"
    # Eval protocol: "sampled" = 999 negatives (reference default),
    # "full" = full-itemset ranking (the headline mode of this framework).
    eval_mode: str = "sampled"
    # Embedding-table rows and classifier output dims are padded up to this
    # multiple: keeps the last dims tileable on the MXU and makes row/vocab
    # sharding divisible by the model mesh axis.  Padded rows are never
    # indexed; padded logit columns are masked to -inf in loss and ranking.
    # Default 2048 = the fused-CE kernel's forward vocab block: classifiers
    # are then kernel-ready at rest, with no per-step pad copies (profiled
    # ~0.9ms/step at FK scale), and the forward runs its fastest measured
    # block shape (bv=2048, see ops/fused_ce._pick_blocks).  Must be
    # >= lcm(8, mesh_model).
    vocab_pad_multiple: int = 2048
    # Resume from the --ckpt directory if a checkpoint exists there
    # (params + opt state + step + best-validation bookkeeping).
    resume: bool = False
    # Write a jax.profiler trace of the first training epoch here.
    profile_dir: Optional[str] = None
    # Debug mode: enable jax_debug_nans and fail fast on non-finite losses.
    debug_nans: bool = False

    # --- Reference bug-parity switches (SURVEY.md section 2 quirks) --------
    # Quirk 1: reference inverts the key-padding mask (encoders.py:33): real
    # tokens are masked out and pads attended.  Default here: correct masking.
    bug_inverted_padding_mask: bool = False
    # Quirk 2: reference draws domain-B eval negatives from the truncated pool
    # [0, n_item_b - n_item_a) (dataloader.py:222-224).  Default: full pool.
    bug_truncated_b_neg_pool: bool = False
    # Quirk 11: the reference calls optimizer.zero_grad() once per EPOCH
    # (trainer.py:42) while train_batch does backward+step per batch with no
    # per-batch zero (trainer.py:157-158) — so the gradient each step is the
    # RUNNING SUM of every batch gradient so far this epoch.  The published
    # numbers come from those dynamics.  Default: standard fresh grads.
    bug_epoch_grad_accum: bool = False

    @property
    def dataset(self) -> str:
        return MAPPING_DATASET[self.data]

    @property
    def benchmark(self) -> list:
        return BENCHMARKS[self.data]

    def resolved_len_max(self) -> int:
        return 30 if self.data == "ee" else 15

    def resolved_compute_dtype(self) -> str:
        """'auto' -> bfloat16 on TPU, float32 elsewhere (params stay f32)."""
        if self.compute_dtype != "auto":
            return self.compute_dtype
        import jax
        return "bfloat16" if jax.default_backend() == "tpu" else "float32"

    def resolved_train_prng(self) -> str:
        """'auto' -> 'rbg' on TPU, 'threefry2x32' elsewhere.

        The TRAIN-STEP dropout stream only (init stays threefry).  rbg is
        the hardware-friendly counter PRNG: the per-step GNN dropout draws
        ~25M bernoullis over the full tables (trainer.py:48 semantics) and
        threefry mask generation costs ~0.8 ms/step at FK scale
        (bench/step_ablation.py no_dropout delta).  Dropout masks are
        never parity-matched to the reference (its torch stream is
        unreproducible anyway), so only the stream changes, not the
        distribution."""
        if self.train_prng != "auto":
            return self.train_prng
        import jax
        return "rbg" if jax.default_backend() == "tpu" else "threefry2x32"

    def resolved_classifier_dtype(self) -> str:
        """'auto' -> bfloat16 on TPU, float32 elsewhere."""
        if self.classifier_dtype != "auto":
            return self.classifier_dtype
        import jax
        return "bfloat16" if jax.default_backend() == "tpu" else "float32"

    def with_(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class DataSpec:
    """Derived dataset geometry (reference: dataloader.py:249-252).

    Shared id space: domain A occupies [0, n_item_a), domain B occupies
    [n_item_a, n_item_a + n_item_b); pad id = n_item - 1.
    """

    n_item_a: int
    n_item_b: int
    len_max: int

    @property
    def n_item(self) -> int:
        return self.n_item_a + self.n_item_b + 1  # + pad row

    @property
    def idx_pad(self) -> int:
        return self.n_item - 1


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def padded_sizes(cfg: "Config", spec: DataSpec):
    """(n_item_p, n_item_a_p, n_item_b_p): table rows / classifier output
    dims rounded up to cfg.vocab_pad_multiple.  Padding rows/columns sit at
    the END of each array, beyond every real id, so the shared id space
    (A = [0, na), B = [na, na+nb), pad = n_item-1) is untouched."""
    m = cfg.vocab_pad_multiple
    return (round_up(spec.n_item, m), round_up(spec.n_item_a, m),
            round_up(spec.n_item_b, m))
