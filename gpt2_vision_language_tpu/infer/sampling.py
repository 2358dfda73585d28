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


def _bisect_passes(width: int, ways: int, _memo={}) -> int:
    """Exact worst-case pass count for `ways`-way bisection of an
    integer interval of `width`: each pass splits [lo, hi] at
    lo + step*j (step = max(width // ways, 1), j = 1..ways-1, clamped
    to hi), so the next width is step (interior segment) or
    step + width % ways (last segment); step == 0 cases degenerate to
    step 1, which covers any width <= ways in one pass."""
    key = (width, ways)
    if width <= 1:
        return 0
    if key in _memo:
        return _memo[key]
    q, r = divmod(width, ways)
    n = 1 if q == 0 else 1 + max(
        _bisect_passes(q, ways), _bisect_passes(q + r, ways)
    )
    _memo[key] = n
    return n


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


def sample_top_p_fast(rng, logits, p: float = 0.9, temperature: float = 0.8,
                      ways: int = 2):
    """Sort-free nucleus sampling: same kept set and distribution as
    `sample_top_p`, no full-vocab sort.

    Even with the r4 gather fix, the (B, V) bitonic sort costs ~3 ms per
    decode step at (50, 50304) — 44% of the whole step (profile_trace.py
    decode). But nucleus sampling never needs a total order, only the
    boundary: the kept set is {tokens whose exclusive prefix mass in
    descending-prob, ascending-index order is <= p}. That boundary is a
    probability VALUE, findable by bisection.

    Algorithm (all (B,)-vectorized; see `top_p_keep_mask`):
      1. Bisect on the int32 bit pattern of nonnegative f32 (monotone in
         value) to find adjacent floats lo < hi with
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

    The bisection arity is measured, not assumed: the r4 snapshot's 8-way
    rewrite (11 passes of 7 sibling (B, V) reduces instead of 31 passes
    of 1) looked like fewer passes but is 2.5x the total VPU reduce work,
    and on-chip it LOSES — bench_decode r5: 914.7 captions/s at ways=8 vs
    962.05 at ways=2 (B=50, 24 new tokens, v5e-1). ways=2 is the default;
    the knob stays for re-measurement (cli/bench_decode --topp-ways).
    The boundary mass G(hi) is carried through the loop so no extra pass
    is needed after it. Any-arity
    bisection of the same monotone predicate over the same integer
    lattice converges to the same adjacent (lo, hi) pair, so the kept
    set matches the 2-way path's bit-for-bit wherever the backend
    evaluates each per-threshold sum with the lone-reduce rounding
    (pinned on CPU in tests/test_decode.py; XLA:TPU's multi-output
    fusion may round the sibling reduces differently, which can move
    the boundary within the same cumulative-mass-rounding window the
    paragraph below already tolerates vs the sorted path).

    The kept set can differ from `sample_top_p` by one boundary token
    when the f32 reduction orders round the cumulative mass across p in
    opposite directions (reduce-sum here vs sequential sorted cumsum
    there); per-key draws differ (different Gumbel alignment), the
    distribution does not. Reference semantics: gpt2_linear/data.py:114-125.
    """
    logits = logits.astype(jnp.float32) / temperature
    probs = jax.nn.softmax(logits, axis=-1)
    keep = top_p_keep_mask(probs, p, ways=ways)
    masked = jnp.where(keep, jnp.log(probs + 1e-20), -jnp.inf)
    return jax.random.categorical(rng, masked, axis=-1).astype(jnp.int32)


def top_p_keep_mask(probs, p: float, ways: int = 2):
    """The nucleus keep mask for `sample_top_p_fast`, sort-free.

    (B, V) probabilities -> (B, V) bool: token kept iff its exclusive
    prefix mass in descending-prob, ascending-index order is <= p (the
    sorted path's shifted-cutoff rule). Exposed so parity tests can pin
    the kept set against the sorted implementation directly.
    """
    b = probs.shape[0]

    def mass_above(t):
        # G(t): total mass strictly above threshold t, per row.
        # t: (B, K) thresholds -> (B, K) masses. Deliberately K separate
        # (B, V) reduces (stacked), NOT one (B, V, K) reduce: XLA fuses
        # sibling reduces over the same operand into a single
        # multi-output pass over probs, and each per-threshold sum then
        # has the SAME reduction shape/order as a lone binary-bisection
        # evaluation — so every predicate decision, and with it the
        # final boundary, is bit-identical to the 2-way path. A
        # (B, V, K) reduce rounds differently and was observed to shift
        # the boundary by 2 tokens at V=50304, p=0.999.
        return jnp.stack(
            [
                jnp.sum(jnp.where(probs > t[:, k, None], probs, 0.0), axis=-1)
                for k in range(t.shape[1])
            ],
            axis=1,
        )

    # bisect on float bits: nonneg f32 order == int32 order.
    # invariant: G(lo_val) > p >= G(hi_val). G(0)=sum(probs)=1 > p for
    # p < 1 (softmax sums to 1 up to rounding); G(1.0) = 0 <= p since
    # no prob exceeds 1.0 (the boundary-tie rule below guards rank 0
    # regardless).
    one = 0x3F800000  # int32 bit pattern of f32 1.0 — a Python int, NOT
    # a jnp value: the pass count below must be concrete under jit.
    lo = jnp.zeros((b,), jnp.int32)
    hi = jnp.full((b,), one, jnp.int32)
    g_hi = jnp.zeros((b,), jnp.float32)  # G(hi_val), carried

    # fixed worst-case pass count for the `ways`-way narrowing of the
    # [0, bits(1.0f)] lattice (width 0x3F800000): 11 at ways=8 (vs 31
    # binary). The width recurrence is NOT monotone (e.g. 15 -> 8 but
    # 16 -> 2), so _bisect_passes takes the exact worst case over all
    # reachable widths, not a single trajectory.
    n_pass = _bisect_passes(one, ways)
    jj = jnp.arange(1, ways, dtype=jnp.int32)

    def body(_, carry):
        lo, hi, g_hi = carry
        step = jnp.maximum((hi - lo) // ways, 1)
        # ways-1 interior thresholds, clamped to hi (duplicates at hi
        # keep the invariant: probs > hi_val is the same mask)
        mids = jnp.minimum(lo[:, None] + step[:, None] * jj[None, :], hi[:, None])
        g = mass_above(mids.view(jnp.float32))  # (B, ways-1)
        above = g > p
        # lo' = largest threshold still above p (mids ascending)
        lo2 = jnp.max(jnp.where(above, mids, lo[:, None]), axis=1)
        # hi' = smallest threshold at/below p; pick its g BY POSITION
        # (g is only mathematically nonincreasing in j — f32 rounding
        # of subset sums must not decide which g rides along with hi')
        sel = jnp.where(above, jnp.iinfo(jnp.int32).max, mids)
        jidx = jnp.argmin(sel, axis=1)
        found = ~jnp.all(above, axis=1)
        hi2 = jnp.where(
            found, jnp.take_along_axis(mids, jidx[:, None], 1)[:, 0], hi
        )
        g2 = jnp.where(
            found, jnp.take_along_axis(g, jidx[:, None], 1)[:, 0], g_hi
        )
        return (lo2, hi2, g2)

    lo, hi, g_hi = jax.lax.fori_loop(0, n_pass, body, (lo, hi, g_hi))
    vb = hi.view(jnp.float32)[:, None]  # boundary tie-group value
    g_vb = g_hi[:, None]  # mass strictly above, carried from the loop
    eq = probs == vb
    # exclusive count of equal-prob tokens with smaller index
    k_before = jnp.cumsum(eq, axis=-1) - eq
    # rank 0 needs no special guard: the first max-prob token has
    # exclusive mass 0 <= p, so the tie rule keeps it for any p >= 0
    return (probs > vb) | (eq & (g_vb + k_before * vb <= p))
