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


def sample_top_p_fast(rng, logits, p: float = 0.9, temperature: float = 0.8):
    """Sort-free nucleus sampling: same kept set and distribution as
    `sample_top_p`, no full-vocab sort.

    Even with the r4 gather fix, the (B, V) bitonic sort costs ~3 ms per
    decode step at (50, 50304) — 44% of the whole step (profile_trace.py
    decode). But nucleus sampling never needs a total order, only the
    boundary: the kept set is {tokens whose exclusive prefix mass in
    descending-prob, ascending-index order is <= p}. That boundary is a
    probability VALUE, findable by bisection.

    Algorithm (all (B,)-vectorized):
      1. Bisect on the int32 bit pattern of nonnegative f32 (monotone in
         value) for 31 steps to find adjacent floats lo < hi with
         G(lo) > p >= G(hi), where G(t) = sum(probs[probs > t]). The jump
         between adjacent representables pins hi as an exact element of
         probs: the boundary tie-group value vb.
      2. Tokens with probs > vb are all kept (a partially-kept tie group
         above vb would contradict the minimality of vb).
      3. Within the vb tie group, keep members while
         G(vb) + k * vb <= p, ties broken by ascending index via an
         exclusive cumsum — the stable-argsort order of the sorted path.
      4. categorical over the masked log-probs: softmax restricted to the
         kept set == the sorted path's renormalized multinomial.

    ~33 bandwidth passes over (B, V) ≈ 0.4 ms vs ~3 ms for the sort.
    The kept set can differ from `sample_top_p` by one boundary token
    when the f32 reduction orders round the cumulative mass across p in
    opposite directions (reduce-sum here vs sequential sorted cumsum
    there); per-key draws differ (different Gumbel alignment), the
    distribution does not. Reference semantics: gpt2_linear/data.py:114-125.
    """
    logits = logits.astype(jnp.float32) / temperature
    probs = jax.nn.softmax(logits, axis=-1)
    b = probs.shape[0]

    def mass_above(t):
        # G(t): total mass strictly above threshold t, per row
        return jnp.sum(jnp.where(probs > t[:, None], probs, 0.0), axis=-1)

    # bisect on float bits: nonneg f32 order == int32 order
    lo = jnp.zeros((b,), jnp.int32)  # G(0) >= G(min prob) ... > p or not
    hi = jnp.full((b,), jnp.float32(1.0).view(jnp.int32), jnp.int32)
    # invariant wants G(lo_val) > p; G(0) can already be <= p when a
    # single token holds all mass and equals p... G(0)=sum(probs)=1 > p
    # for p < 1 (softmax sums to 1 up to rounding). Guard anyway below.

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        g = mass_above(mid.view(jnp.float32))
        take_hi = g <= p
        return (jnp.where(take_hi, lo, mid), jnp.where(take_hi, mid, hi))

    lo, hi = jax.lax.fori_loop(0, 31, body, (lo, hi))
    vb = hi.view(jnp.float32)[:, None]  # boundary tie-group value
    g_vb = mass_above(hi.view(jnp.float32))[:, None]  # mass strictly above
    eq = probs == vb
    # exclusive count of equal-prob tokens with smaller index
    k_before = jnp.cumsum(eq, axis=-1) - eq
    # rank 0 needs no special guard: the first max-prob token has
    # exclusive mass 0 <= p, so the tie rule keeps it for any p >= 0
    keep = (probs > vb) | (eq & (g_vb + k_before * vb <= p))
    masked = jnp.where(keep, jnp.log(probs + 1e-20), -jnp.inf)
    return jax.random.categorical(rng, masked, axis=-1).astype(jnp.int32)
