"""Benchmark: GPT-2 124M pretrain throughput (tokens/sec/chip) on real TPU.

Full training step — forward + backward + grad-accum scan + global-norm
clip + AdamW + cosine LR — at the reference workload shape (B=16, T=1024,
bf16), Pallas flash attention, remat on blocks. Baseline: the reference's
derived ~58k tok/s on an RTX A5000 (BASELINE.md: 10B tokens / ~2 days).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_TOK_S = 58000.0  # reference A5000 pretrain throughput (derived)


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

    cfg = GPTConfig()
    b, t, accum = 8, 1024, 64  # 524,288 tokens per optimizer step — the
    # reference's effective batch (train_gpt2.py:244-248). The micro-batch
    # split is an implementation detail; measured on v5e-1:
    #   B=16 remat=full  unfused CE        98.7k tok/s   (round-1 config)
    #   B=16 remat=full  fused CE         100.3k
    #   B=16 remat=none  fused CE ce=2     97.4k (fits only with chunked CE)
    #   B=8  remat=none  fused CE ce=1    108.2k  <- this config
    # No remat (fits thanks to fused CE + LN custom-vjp memory savings)
    # skips the full forward recompute in the backward pass.

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


if __name__ == "__main__":
    main()
