"""Configuration dataclasses for every workload.

The reference hardcodes all of these as module constants scattered through
four training scripts (e.g. /root/reference/source/gpt2/train_gpt2.py:244-285,
source/gpt2_linear/train.py:55-62,132-144, source/gpt2_cross-att/train.py:47-49,
110-126). Here they are first-class, serializable configs with per-workload
presets so runs are reproducible and scriptable.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class GPTConfig:
    """GPT-2 decoder architecture.

    Mirrors the reference GPTConfig (train_gpt2.py:76-83) plus the
    cross-attention variant's `img_embd` (gpt2_cross-att/model.py:106-114).
    `padded_vocab_size` reproduces the reference's padding of 50257 -> 50304
    (train_gpt2.py:260) which is also the TPU-friendly lane-aligned size.
    """

    block_size: int = 1024
    vocab_size: int = 50257
    n_layer: int = 12
    n_head: int = 12
    n_embd: int = 768
    # Visual conditioning (0 = plain text decoder).
    img_embd: int = 0  # encoder feature dim for gated cross-attention variant
    cross_attention: bool = False  # in-block tanh-gated cross-attn (Flamingo-style)
    # Python-unroll the layer loop in the no-remat path: avoids lax.scan's
    # residual stacking (profiled at ~30% of the 124M no-remat step), at the
    # cost of an n_layer-times-larger jaxpr (slower compiles). Off by
    # default; the pretrain bench config turns it on.
    unroll_layers: bool = False

    @property
    def head_dim(self) -> int:
        assert self.n_embd % self.n_head == 0
        return self.n_embd // self.n_head

    @property
    def padded_vocab_size(self) -> int:
        # 50257 -> 50304: multiple of 128 (TPU lane width), matching the
        # reference's construction-time padding (train_gpt2.py:260).
        return _round_up(self.vocab_size, 128)

    def replace(self, **kw) -> "GPTConfig":
        return dataclasses.replace(self, **kw)


GPT2_124M = GPTConfig()
# Standard GPT-2 family (model-surgery-free scaling knobs; the reference
# ships only 124M but parameterizes the same fields, train_gpt2.py:76-83)
GPT2_350M = GPTConfig(n_layer=24, n_head=16, n_embd=1024)
GPT2_774M = GPTConfig(n_layer=36, n_head=20, n_embd=1280)
GPT2_1558M = GPTConfig(n_layer=48, n_head=25, n_embd=1600)


@dataclass(frozen=True)
class CLIPConfig:
    """CLIP ViT image encoder architecture (used frozen, features precomputed
    or computed on device). Defaults = ViT-L/14 per reference README:44-46;
    the reference bridges are built with enc_dim=768 (ViT-B/16-like), so both
    are representable."""

    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_tokens(self) -> int:
        return self.grid * self.grid + 1  # +CLS


CLIP_VIT_L14 = CLIPConfig()
CLIP_VIT_B16 = CLIPConfig(patch_size=16, width=768, layers=12, heads=12)
CLIP_TINY = CLIPConfig(image_size=32, patch_size=16, width=32, layers=2, heads=2)  # tests


@dataclass(frozen=True)
class BridgeConfig:
    """Vision->LM bridge configuration shared by the three bridge families.

    kind: 'linear' (gpt2_linear/model.py:114-129), 'qformer'
    (gpt2_q_former/model.py:114-168), or 'xattn' (handled by
    GPTConfig.cross_attention instead of a wrapper).
    """

    kind: str = "linear"
    enc_dim: int = 768  # CLIP feature dim fed to the bridge
    n_queries: int = 32  # Q-Former learnable queries / m_vis_tokens
    n_layers: int = 2  # Q-Former depth
    n_heads: int = 12
    dropout: float = 0.1
    use_cls_only: bool = False


@dataclass(frozen=True)
class ScheduleConfig:
    """Cosine decay with linear warmup (train_gpt2.py:273-285)."""

    max_lr: float = 6e-4
    min_lr: float = 6e-5
    warmup_steps: int = 715
    max_steps: int = 19073


@dataclass(frozen=True)
class OptimizerConfig:
    """AdamW hyperparameters (train_gpt2.py:127-144): decay applied only to
    params with torch-ndim >= 2, betas (0.9, 0.95), eps 1e-8, wd 0.1."""

    weight_decay: float = 0.1
    beta1: float = 0.9
    beta2: float = 0.95
    eps: float = 1e-8
    grad_clip: float = 1.0


@dataclass(frozen=True)
class PretrainConfig:
    """FineWeb-Edu pretraining workload (train_gpt2.py:243-285)."""

    # unroll_layers: no-remat + unrolled layer loop measured fastest on
    # v5e-1 (134.6k vs 108.2k tok/s scanned, vs 100.3k at B=16 remat=True —
    # see bench.py); costs ~1 min extra compile at startup.
    model: GPTConfig = field(
        default_factory=lambda: GPT2_124M.replace(unroll_layers=True)
    )
    total_batch_size: int = 524288  # tokens per optimizer step
    # The reference uses B=16 (train_gpt2.py:244); the effective batch is
    # identical at any micro split.
    micro_batch_size: int = 8  # B
    seq_len: int = 1024  # T
    schedule: ScheduleConfig = field(default_factory=ScheduleConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    val_every: int = 250
    val_steps: int = 20
    hellaswag_every: int = 250
    sample_every: int = 250
    save_every: int = 2500
    run_hellaswag: bool = True
    data_dir: Optional[str] = None  # defaults to $FW_OUT_DIR or edu_fineweb10B
    log_dir: Optional[str] = None  # defaults to $LOG_DIR or log
    seed: int = 1337
    # "bfloat16" halves AdamW m/v HBM (what fits GPT-2 774M on a 16GB
    # v5e chip); "int8" block-quantizes the moments to ~2.03 bytes/param
    # total (Dettmers-style absmax blocks, train/optimizer.py q8_*) —
    # frees ~4.3 GB at 1558M, the margin the single-chip run needs;
    # None = fp32, the reference-parity default
    opt_state_dtype: Optional[str] = None
    # "bfloat16" halves the grad-accumulator HBM via unbiased stochastic
    # rounding (train/step.py) — the enabler for GPT-2 1558M on one 16GB
    # chip; None = exact fp32 accumulation (reference parity)
    grad_accum_dtype: Optional[str] = None
    # False disables checkpointing entirely (including the device->host
    # gather) — for perf/bring-up runs of multi-GB configs over thin links
    save_ckpt: bool = True
    # False drops the in-graph NaN-rollback selects (train/step.py) —
    # frees the old-state liveness on HBM-edge configs; the loop still
    # halts on non-finite metrics
    nan_guard: bool = True
    # True pins the train/eval steps' param+opt entry/result layouts to
    # the state's layout at build time (train/step.py default_formats) so
    # XLA never materializes a bulk layout-conversion program (~4.1 GB of
    # simultaneous copy temps at 1558M — the last 127 MB OOM). Off by
    # default: per-executable compiler-preferred entry layouts may be
    # faster when HBM is not the constraint.
    pin_layouts: bool = False
    # n > 0 dispatches grad accumulation as small programs of n micros
    # each (donated accumulator carry, lax.scan inside) + one optimizer
    # program, instead of one jit holding the whole scan — the TPU
    # runtime then only needs one small temp arena at a time
    # (train/step.py split_accum; with the three bf16 flags + pin_layouts
    # this is what actually fits GPT-2 1558M's 524288-token batch on one
    # 16 GB chip). Numerically identical for every n, and measured equal
    # to the one-jit step's throughput at 124M (async dispatches
    # pipeline); n just bounds Python dispatch work per step.
    split_accum: int = 0
    # n > 0 host-syncs the accum carry every n split_accum dispatches so
    # at most one in-flight execution's temp arena is resident at a time
    # (train/step.py sync_every — async-enqueued executions each reserve
    # their own arena; the overlap OOMs HBM-edge configs like 1558M).
    # 0 = fully async (default; right everywhere with headroom).
    sync_accum: int = 0
    # Stream per-layer grads into the accumulators via the reverse-scan
    # VJP (models/gpt2.py::loss_grad_layerwise) instead of materializing
    # jax.grad's full stacked-grads tree inside the accum program — the
    # tree is a 2.9 GiB bf16 temp at 1558M and the dominant term of the
    # accum arena. Numerically identical chain rule (pinned by
    # tests/test_layerwise_grad.py); requires tp=sp=1.
    layerwise_grad: bool = False
    # "bfloat16" stores the MASTER PARAMS in bf16 — exactly the torch
    # reference's production mode on CUDA (model.to(bfloat16) + AdamW on
    # the bf16 params, train_gpt2.py:263-264). Our default keeps fp32
    # masters (less drift); whole-model bf16 is what fits GPT-2 1558M's
    # params+moments+accumulators in one 16GB chip (12.5 GB vs 15.6).
    param_dtype: Optional[str] = None
    # --- model-parallel knobs (beyond the DP-only reference,
    # train_gpt2.py:215-236): tp > 1 builds a ("data", "model") mesh with
    # a model axis of size tp and applies Megatron column/row parameter
    # shardings (parallel/sharding.py). seq_parallel additionally
    # constrains the residual stream to P("data", "model", None) between
    # blocks (requires tp > 1). attn_impl: "auto" | "xla" | "flash" |
    # "ring" — "ring" rotates K/V chunks over the model axis (long-context
    # sequence parallelism; requires tp > 1 and T % tp == 0).
    tp: int = 1
    seq_parallel: bool = False
    attn_impl: str = "auto"
    # pp > 1 builds a ("data", "pipe") mesh and runs the decoder blocks
    # through the GPipe schedule (parallel/pipeline.py): layers
    # stage-sharded on the pipe axis, activations hop via ppermute,
    # embeddings/lm_head replicated. pp_micro = GPipe microbatches per
    # grad-accum micro (0 -> pp); requires n_layer % pp == 0 and the
    # per-micro batch divisible by pp_micro. Mutually exclusive with tp.
    pp: int = 1
    pp_micro: int = 0

    def grad_accum_steps(self, world_size: int) -> int:
        denom = self.micro_batch_size * self.seq_len * world_size
        assert self.total_batch_size % denom == 0, (
            "total_batch_size must be divisible by B*T*world_size "
            f"({self.total_batch_size} % {denom})"
        )
        return self.total_batch_size // denom


@dataclass(frozen=True)
class FinetuneConfig:
    """COCO captioning bridge fine-tune workload.

    linear/qformer preset: gpt2_linear/train.py:55-62,132-144 (B=128, T=32,
    accum=524288/(B*T*world), lr 1e-3->1e-4, warmup 5, 80 steps).
    xattn preset: gpt2_cross-att/train.py:47-49,110-126 (accum=1, warmup 20,
    lr 1e-3->1e-5, steps = 1 epoch of the dataset).
    """

    model: GPTConfig = field(default_factory=lambda: GPT2_124M)
    bridge: BridgeConfig = field(default_factory=BridgeConfig)
    micro_batch_size: int = 128
    seq_len: int = 32  # caption text length
    total_batch_size: int = 524288
    grad_accum_override: Optional[int] = None  # xattn uses 1
    schedule: ScheduleConfig = field(
        default_factory=lambda: ScheduleConfig(
            max_lr=1e-3, min_lr=1e-4, warmup_steps=5, max_steps=80
        )
    )
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    val_every: int = 20
    val_steps: int = 20
    cider_every: int = 20
    cider_samples: int = 500
    cider_max_new_tokens: int = 24
    save_every: int = 2500
    init_ckpt: Optional[str] = None  # pretrained GPT-2 checkpoint to bootstrap
    coco_root: Optional[str] = None
    clip_feats_dir: Optional[str] = None
    log_dir: Optional[str] = None
    seed: int = 1337

    def grad_accum_steps(self, world_size: int) -> int:
        if self.grad_accum_override is not None:
            return self.grad_accum_override
        denom = self.micro_batch_size * self.seq_len * world_size
        assert self.total_batch_size % denom == 0
        return self.total_batch_size // denom


def finetune_linear_preset(**kw) -> FinetuneConfig:
    return FinetuneConfig(bridge=BridgeConfig(kind="linear"), **kw)


def finetune_qformer_preset(**kw) -> FinetuneConfig:
    return FinetuneConfig(bridge=BridgeConfig(kind="qformer"), **kw)


def finetune_xattn_preset(dataset_size: int = 118287, world_size: int = 1, **kw):
    """Cross-attention preset: 1 epoch at global batch B*world, accum=1
    (gpt2_cross-att/train.py:109-117)."""
    import math

    b = kw.pop("micro_batch_size", 128)
    steps = math.ceil(dataset_size / (b * world_size))
    return FinetuneConfig(
        model=GPT2_124M.replace(img_embd=768, cross_attention=True),
        bridge=BridgeConfig(kind="xattn"),
        micro_batch_size=b,
        grad_accum_override=1,
        schedule=ScheduleConfig(
            max_lr=1e-3, min_lr=1e-5, warmup_steps=20, max_steps=steps
        ),
        **kw,
    )
