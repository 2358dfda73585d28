"""Learning-rate schedules.

Cosine decay with linear warmup, exactly the reference's get_lr
(train_gpt2.py:277-285): warmup is (it+1)/warmup * max_lr; beyond max_steps
the schedule floors at min_lr; otherwise min + 0.5*(1+cos(pi*ratio))*(max-min).
Implemented with jnp so it can live inside the jitted train step (the
reference computes it host-side per step, train_gpt2.py:473-475).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.config import ScheduleConfig


def cosine_warmup_lr(step, cfg: ScheduleConfig):
    step = jnp.asarray(step, jnp.float32)
    warm = cfg.max_lr * (step + 1.0) / cfg.warmup_steps
    ratio = (step - cfg.warmup_steps) / (cfg.max_steps - cfg.warmup_steps)
    ratio = jnp.clip(ratio, 0.0, 1.0)
    coeff = 0.5 * (1.0 + jnp.cos(jnp.pi * ratio))
    decayed = cfg.min_lr + coeff * (cfg.max_lr - cfg.min_lr)
    after = jnp.where(step > cfg.max_steps, cfg.min_lr, decayed)
    return jnp.where(step < cfg.warmup_steps, warm, after)
