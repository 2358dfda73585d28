"""Benchmark: GPT-2 124M pretrain throughput (tokens/sec/chip) on real TPU.

Full training step — forward + backward + grad-accum scan + global-norm
clip + AdamW + cosine LR — at the reference's effective batch (524,288
tokens/step at T=1024, bf16; the reference reaches it as B=16 x accum=32,
this bench as B=8 x accum=64 — measured faster on v5e, see the sweep table
below), Pallas flash attention. Baseline: the reference's derived ~58k
tok/s on an RTX A5000 (BASELINE.md: 10B tokens / ~2 days).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

`python bench.py --finetune` instead benchmarks the linear-bridge COCO
fine-tune step (frozen 124M GPT-2 + trainable linear bridge, B=128, T=32,
accum=128 — gpt2_linear/train.py:55-62) and prints ONE JSON line with
captions/sec/chip plus a v5e-8 single-epoch projection on stderr
(BASELINE.json north star: 1 COCO epoch < 20 min on v5e-8).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_TOK_S = 58000.0  # reference A5000 pretrain throughput (derived)
# Reference linear-bridge fine-tune: ~3 h per COCO 2017 train epoch on the
# A5000 (README.md:27,52,170); one epoch = 118,287 image-caption samples.
COCO_TRAIN_SAMPLES = 118287
BASELINE_CAPTIONS_S = COCO_TRAIN_SAMPLES / (3 * 3600.0)  # ~10.95 captions/s


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpt2_vision_language_tpu.core.config import (
        GPTConfig,
        OptimizerConfig,
        ScheduleConfig,
    )
    from gpt2_vision_language_tpu.models import gpt2
    from gpt2_vision_language_tpu.train import make_train_step
    from gpt2_vision_language_tpu.train.optimizer import adamw_init

    cfg = GPTConfig(unroll_layers=True)
    b, t, accum = 8, 1024, 64  # 524,288 tokens per optimizer step — the
    # reference's effective batch (train_gpt2.py:244-248). The micro-batch
    # split is an implementation detail; measured on v5e-1:
    #   B=16 remat=full  unfused CE        98.7k tok/s   (round-1 config)
    #   B=16 remat=full  fused CE         100.3k
    #   B=16 remat=none  fused CE ce=2     97.4k (fits only with chunked CE)
    #   B=8  remat=none  fused CE ce=1    108.2k
    #   B=8  remat=none  fused CE unroll  134.6k  <- this config
    # No remat (fits thanks to fused CE + LN custom-vjp memory savings)
    # skips the full forward recompute in the backward pass; unrolling the
    # layer loop removes lax.scan's residual-stacking DUS round-trips
    # (profiled at ~30% of the scanned no-remat step).

    def loss_fn(params, micro):
        # fused chunked lm_head+CE (ops/fused_ce.py)
        return gpt2.loss(
            params, micro["x"], cfg, targets=micro["y"], remat=False, ce_chunks=1
        )

    params = gpt2.init(jax.random.PRNGKey(0), cfg)
    opt_state = adamw_init(params)
    step = make_train_step(
        loss_fn,
        OptimizerConfig(),
        ScheduleConfig(),
        decay_mask=gpt2.decay_mask(params),
    )

    rng = np.random.RandomState(0)
    x = rng.randint(0, 50257, (accum, b, t)).astype(np.int32)
    y = np.roll(x, -1, axis=-1)
    batch = {"x": jnp.asarray(x), "y": jnp.asarray(y)}

    # compile + warmup (donated args: refresh state each call)
    params, opt_state, m = step(params, opt_state, batch, jnp.int32(0))
    float(m["loss"])  # float() forces a sync (block_until_ready is not
    # reliable on the tunneled TPU platform)

    iters = 3
    t0 = time.time()
    for i in range(iters):
        params, opt_state, m = step(params, opt_state, batch, jnp.int32(i + 1))
    float(m["loss"])
    dt = (time.time() - t0) / iters

    tok_per_step = accum * b * t
    tok_s = tok_per_step / dt
    n_chips = jax.device_count()
    tok_s_chip = tok_s / n_chips
    print(
        json.dumps(
            {
                "metric": "pretrain_tokens_per_sec_per_chip",
                "value": round(tok_s_chip, 1),
                "unit": "tok/s/chip",
                "vs_baseline": round(tok_s_chip / BASELINE_TOK_S, 3),
            }
        )
    )


def main_finetune():
    """Linear-bridge fine-tune step throughput at the reference production
    shape (gpt2_linear/train.py:55-62: B=128, T=32, accum=128 -> 16,384
    caption samples / 524,288 text tokens per optimizer step; frozen GPT-2,
    trainable bridge only). Features come from a device-resident pooled
    bank, as in train/finetune.py."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpt2_vision_language_tpu.core.config import (
        BridgeConfig,
        GPTConfig,
        OptimizerConfig,
        ScheduleConfig,
    )
    from gpt2_vision_language_tpu.models import caption, gpt2
    from gpt2_vision_language_tpu.models.bridges import bridge_decay_mask
    from gpt2_vision_language_tpu.train import make_train_step
    from gpt2_vision_language_tpu.train.optimizer import adamw_init

    cfg = GPTConfig()
    bridge_cfg = BridgeConfig(kind="linear")
    b, t, accum = 128, 32, 128
    n_bank = 4096  # synthetic stand-in for the pooled COCO feature bank

    gpt_params = gpt2.init(jax.random.PRNGKey(0), cfg)
    bridge_params = caption.init(jax.random.PRNGKey(1), cfg, bridge_cfg)
    params = {"gpt": gpt_params, "bridge": bridge_params}
    trainable = {
        "gpt": jax.tree.map(lambda _: False, gpt_params),
        "bridge": jax.tree.map(lambda _: True, bridge_params),
    }
    decay = {
        "gpt": gpt2.decay_mask(gpt_params),
        "bridge": bridge_decay_mask(bridge_params),
    }
    base_loss = caption.loss_fn_factory(cfg, bridge_cfg, train=True)

    def loss_fn(p, micro, bank):
        micro = dict(micro)
        micro["z"] = jnp.take(bank, micro["idx"], axis=0)
        return base_loss(p, micro)

    opt_state = adamw_init(params)
    step = make_train_step(
        loss_fn,
        OptimizerConfig(),
        ScheduleConfig(max_lr=1e-3, min_lr=1e-4, warmup_steps=5, max_steps=80),
        decay_mask=decay,
        trainable_mask=trainable,
    )

    rng = np.random.RandomState(0)
    bank = jnp.asarray(
        rng.randn(n_bank, 33, bridge_cfg.enc_dim).astype(np.float32),
        jnp.bfloat16,
    )
    x = rng.randint(0, 50257, (accum, b, t)).astype(np.int32)
    y = np.roll(x, -1, axis=-1)
    mask = np.ones((accum, b, t), dtype=bool)
    idx = rng.randint(0, n_bank, (accum, b)).astype(np.int32)
    batch = {
        "x": jnp.asarray(x),
        "y": jnp.asarray(y),
        "mask": jnp.asarray(mask),
        "idx": jnp.asarray(idx),
    }

    params, opt_state, m = step(params, opt_state, batch, jnp.int32(0), bank)
    float(m["loss"])  # sync

    iters = 3
    t0 = time.time()
    for i in range(iters):
        params, opt_state, m = step(
            params, opt_state, batch, jnp.int32(i + 1), bank
        )
    float(m["loss"])
    dt = (time.time() - t0) / iters

    n_chips = jax.device_count()
    captions_s_chip = accum * b / dt / n_chips
    # per-chip rate -> a true 1-chip epoch figure (independent of how many
    # chips this bench happened to run on); v5e-8 is the DP projection
    epoch_1chip_s = COCO_TRAIN_SAMPLES / captions_s_chip
    epoch_v5e8_s = epoch_1chip_s / 8
    print(
        f"[finetune-bench] step {dt * 1000:.0f} ms, "
        f"{captions_s_chip:.0f} captions/s/chip, "
        f"1-chip COCO epoch {epoch_1chip_s / 60:.1f} min, "
        f"v5e-8 projection {epoch_v5e8_s / 60:.2f} min "
        f"(north star < 20 min: {'PASS' if epoch_v5e8_s < 1200 else 'FAIL'})",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "finetune_linear_captions_per_sec_per_chip",
                "value": round(captions_s_chip, 1),
                "unit": "captions/s/chip",
                "vs_baseline": round(captions_s_chip / BASELINE_CAPTIONS_S, 3),
            }
        )
    )


def main_decode():
    """Third mode: KV-cached caption decode throughput, the workload shape
    of evaluate_cider (gpt2_linear/data.py:95-127). Delegates to
    cli/bench_decode (single source of truth) — the reference regime is a
    full re-forward per token at batch 1 (~0.48 captions/s measured)."""
    from gpt2_vision_language_tpu.cli.bench_decode import main as bd

    bd([])


if __name__ == "__main__":
    if "--finetune" in sys.argv:
        main_finetune()
    elif "--decode" in sys.argv:
        main_decode()
    else:
        main()
