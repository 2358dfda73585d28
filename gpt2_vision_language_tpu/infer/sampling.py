"""Token samplers.

  * top-k=50 multinomial: the pretrain inline sampler
    (train_gpt2.py:444-448): softmax probs, top-50, renormalized multinomial.
  * temperature + nucleus top-p: the caption sampler in evaluate_cider
    (gpt2_linear/data.py:114-125): logits/0.8, sort desc, cumulative-prob
    cutoff shifted one right so the first token past the boundary stays in.
  * greedy argmax.

All are pure functions (B, V) -> (B,) int32, jit/scan-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def greedy(rng, logits):
    del rng
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def sample_top_k(rng, logits, k: int = 50, temperature: float = 1.0):
    logits = logits.astype(jnp.float32) / temperature
    top_logits, top_idx = jax.lax.top_k(logits, k)
    choice = jax.random.categorical(rng, top_logits, axis=-1)  # renormalizes
    return jnp.take_along_axis(top_idx, choice[..., None], axis=-1)[..., 0].astype(
        jnp.int32
    )


def sample_top_p(rng, logits, p: float = 0.9, temperature: float = 0.8):
    logits = logits.astype(jnp.float32) / temperature
    probs = jax.nn.softmax(logits, axis=-1)
    # One stable key-value sort yields BOTH the descending probs and their
    # indices. The naive jnp.argsort(-probs) + take_along_axis(probs, idx)
    # spelling costs a full (B, V) gather on top of the sort, and TPU
    # gathers run element-wise on the scalar core: profiled at 24.3 ms per
    # decode step for (50, 50304) vs ~3 ms for the sort itself — 75% of
    # the entire decode step (tools/profile_trace.py decode, r4). Ordering
    # is bit-identical: same negated keys, same stable tie-break by index.
    neg, sort_idx = jax.lax.sort_key_val(
        -probs,
        jnp.broadcast_to(
            jnp.arange(probs.shape[-1], dtype=jnp.int32), probs.shape
        ),
        dimension=-1,
        is_stable=True,
    )
    sorted_probs = -neg
    cum = jnp.cumsum(sorted_probs, axis=-1)
    # reference cutoff semantics (gpt2_linear/data.py:119-121): drop tokens
    # whose PRECEDING cumulative mass already exceeds p; always keep rank 0.
    cutoff = cum > p
    cutoff = jnp.concatenate(
        [jnp.zeros_like(cutoff[..., :1]), cutoff[..., :-1]], axis=-1
    )
    sorted_probs = jnp.where(cutoff, 0.0, sorted_probs)
    sorted_logits = jnp.where(cutoff, -jnp.inf, jnp.log(sorted_probs + 1e-20))
    choice = jax.random.categorical(rng, sorted_logits, axis=-1)
    return jnp.take_along_axis(sort_idx, choice[..., None], axis=-1)[..., 0].astype(
        jnp.int32
    )
