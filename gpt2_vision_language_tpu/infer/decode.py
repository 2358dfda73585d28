"""KV-cached autoregressive generation.

The reference generates by re-forwarding the whole growing sequence for
every new token (inline sampler train_gpt2.py:440-449; CIDEr eval
gpt2_linear/data.py:111-127 — 500 images x 24 full forwards, its single
biggest inefficiency per SURVEY.md §3.3). Here: one jitted prefill over the
prompt, then a jitted `lax.scan` decode loop over single tokens against the
KV cache — O(T) instead of O(T^2) decoder work, no per-token dispatch.

Visual-prefix handling (the subtle part, gpt2_linear/model.py:197-200): the
M bridge tokens occupy cache slots [0, M) but receive NO positional
embeddings; text token t gets wpe[t] while living in cache slot M + t. The
Decoder tracks `slot` and `pos` separately to reproduce this exactly.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core.config import GPTConfig
from ..core.precision import Policy, DEFAULT_POLICY
from ..models import gpt2
from .sampling import sample_top_k


def cast_decode_params(params, policy: Policy = DEFAULT_POLICY):
    """Store matrix params in the compute dtype for serving.

    A KV-cached decode step is bandwidth-bound: it reads every weight
    once per token (124M fp32 = 0.50 GB/step vs a ~1 ms measured
    transformer step — ROUND_NOTES r4 decode profile). `linear`/the dt
    projections cast weights to `policy.compute_dtype` anyway, so
    pre-casting the weight-matrix leaves (same name rule as
    models/gpt2.py::decay_mask: leaves named ``w*`` plus wte/wpe — NOT
    LayerNorm scale/bias, biases, or gates, which stay fp32 and are read
    in fp32 epilogues) halves the per-token HBM read with matmul
    numerics bit-identical to the fp32-stored run. The only divergence
    is the token-embedding add (wte[ids] + wpe rounds per-operand
    instead of after the fp32 add) — below bf16 resolution of the
    logits.

    Under an fp32-compute policy this is a no-op, so parity tests are
    unaffected. Training params must NOT pass through this (the
    optimizer owns master precision — train/step.py docstring).
    """

    def per_path(path, leaf):
        if not (hasattr(leaf, "dtype")
                and jnp.issubdtype(leaf.dtype, jnp.floating)):
            return leaf
        last = getattr(path[-1], "key", getattr(path[-1], "name", ""))
        if last in ("wte", "wpe") or (
            last.startswith("w") and last != "gate" and leaf.ndim >= 2
        ):
            return leaf.astype(policy.compute_dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(per_path, params)


class Decoder:
    """Reusable jitted prefill + decode-loop for a fixed config/policy."""

    def __init__(
        self,
        cfg: GPTConfig,
        *,
        policy: Policy = DEFAULT_POLICY,
        sample_fn: Callable = sample_top_k,
        unroll_layers: bool = True,
    ):
        self.cfg = cfg
        self.policy = policy
        self.sample_fn = sample_fn
        # unrolled layer loop: kills the per-layer cache dynamic-slice /
        # update pairs and the per-step cache layout copies the stacked
        # scan forces (~2 ms of the ~4 ms 124M B=50 step — profile_trace)
        self.unroll_layers = unroll_layers
        self._prefill = jax.jit(self._prefill_impl)
        self._prefill_cache_only = jax.jit(self._prefill_cache_only_impl)
        # the first-token sample runs OUTSIDE the decode scan; un-jitted it
        # executes the sampler eagerly — op-by-op dispatch that costs more
        # wall time than the whole jitted decode loop on a remote device
        self._first_sample = jax.jit(self._first_sample_impl)
        self._decode_loop = jax.jit(
            self._decode_loop_impl, static_argnames=("num_steps",)
        )

    def _first_sample_impl(self, rng, logits):
        rng, sub = jax.random.split(rng)
        return rng, self.sample_fn(sub, logits)

    # -- prefill ------------------------------------------------------------

    def _prefill_impl(self, params, embeds, cache, slot, z):
        logits, cache = gpt2.forward_cached(
            params, embeds, self.cfg, cache, slot, z=z, policy=self.policy,
            unroll=self.unroll_layers, last_only=True,
        )
        return logits[:, -1, :], cache

    def _prefill_cache_only_impl(self, params, embeds, cache, slot, z):
        # the visual-prefix prefill discards its logits; skipping the
        # lm_head saves a (B, M, C) x (C, V) matmul (DCE'd by XLA once the
        # logits aren't a jit output)
        _, cache = gpt2.forward_cached(
            params, embeds, self.cfg, cache, slot, z=z, policy=self.policy,
            unroll=self.unroll_layers, last_only=True,
        )
        return cache

    def prefill_tokens(self, params, ids, cache, slot, pos_offset=0, z=None):
        """Embed ids with positions pos_offset.. and prefill at `slot`."""
        embeds = gpt2.embed_tokens(params, ids, self.cfg, pos_offset=pos_offset)
        embeds = embeds.astype(self.policy.compute_dtype)
        return self._prefill(params, embeds, cache, slot, z)

    def prefill_embeds(self, params, embeds, cache, slot, z=None):
        """Prefill raw embeddings (visual prefix: no positional embeddings)."""
        embeds = embeds.astype(self.policy.compute_dtype)
        return self._prefill(params, embeds, cache, slot, z)

    def prefill_embeds_cache_only(self, params, embeds, cache, slot, z=None):
        """Like prefill_embeds but returns only the cache (no lm_head)."""
        embeds = embeds.astype(self.policy.compute_dtype)
        return self._prefill_cache_only(params, embeds, cache, slot, z)

    # -- decode loop ----------------------------------------------------------

    def _decode_loop_impl(
        self, params, first_token, cache, slot0, pos0, rng, z, *, num_steps
    ):
        def step(carry, _):
            tok, cache, slot, pos, rng = carry
            embeds = gpt2.embed(params["wte"], tok[:, None]) + gpt2.embed(
                params["wpe"], pos[None, None]
            )
            embeds = embeds.astype(self.policy.compute_dtype)
            logits, cache = gpt2.forward_cached(
                params, embeds, self.cfg, cache, slot, z=z, policy=self.policy,
                unroll=self.unroll_layers,
            )
            rng, sub = jax.random.split(rng)
            nxt = self.sample_fn(sub, logits[:, -1, :])
            return (nxt, cache, slot + 1, pos + 1, rng), nxt

        carry0 = (first_token, cache, slot0, pos0, rng)
        (_, cache, _, _, _), toks = jax.lax.scan(
            step, carry0, None, length=num_steps
        )
        return jnp.moveaxis(toks, 0, 1), cache  # (B, num_steps)

    # -- public -----------------------------------------------------------

    def generate(
        self,
        params,
        prompt_ids,
        max_new_tokens: int,
        rng,
        *,
        prefix_embeds=None,
        z=None,
        max_len: Optional[int] = None,
    ):
        """Sample continuations. Returns (B, max_new_tokens) new tokens.

        prompt_ids: (B, Tp) int32. prefix_embeds: optional (B, M, D) visual
        prefix placed before the prompt without positional embeddings.
        z: optional cross-attention memory (xattn variant).
        """
        b, tp = prompt_ids.shape
        m = 0 if prefix_embeds is None else prefix_embeds.shape[1]
        total = m + tp + max_new_tokens
        max_len = max_len or total
        assert max_len >= total
        cache = gpt2.init_cache(self.cfg, b, max_len, self.policy.compute_dtype)

        slot = jnp.int32(0)
        if prefix_embeds is not None:
            cache = self.prefill_embeds_cache_only(
                params, prefix_embeds, cache, slot, z=z
            )
            slot = jnp.int32(m)
        logits_last, cache = self.prefill_tokens(
            params, prompt_ids, cache, slot, pos_offset=0, z=z
        )
        rng, first = self._first_sample(rng, logits_last)
        if max_new_tokens == 1:
            return first[:, None], cache
        rest, cache = self._decode_loop(
            params,
            first,
            cache,
            jnp.int32(m + tp),
            jnp.int32(tp),
            rng,
            z,
            num_steps=max_new_tokens - 1,
        )
        return jnp.concatenate([first[:, None], rest], axis=1), cache


def generate(
    params,
    cfg: GPTConfig,
    prompt_ids,
    max_new_tokens: int,
    rng,
    *,
    sample_fn: Callable = sample_top_k,
    policy: Policy = DEFAULT_POLICY,
    **kw,
):
    """One-shot convenience wrapper around Decoder."""
    dec = Decoder(cfg, policy=policy, sample_fn=sample_fn)
    toks, _ = dec.generate(params, prompt_ids, max_new_tokens, rng, **kw)
    return toks
