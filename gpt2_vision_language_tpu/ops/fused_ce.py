"""Fused (chunked) LM-head + cross-entropy that never materializes the
full (B*T, V) logits tensor.

The reference computes `lm_head` then `F.cross_entropy` over the full
(B, T, 50304) logits (train_gpt2.py:120-124). At the production shape
(B=16, T=1024) that tensor is 3.3 GB in fp32 — the largest activation in
the model — and it is materialized twice per micro-step (forward logits,
backward dlogits), making the loss region HBM-bandwidth-bound on TPU
(round-1 profile: ~100 ms of a 661 ms step in lm_head + CE).

This op chunks the TOKEN axis: the forward scans (N/n_chunks, V)-sized
logit tiles, keeping only the per-row logsumexp and gold logit (two (N,)
fp32 vectors); the backward recomputes each tile and contracts it into
dx and dw immediately, so peak extra HBM is one tile instead of the full
logits + dlogits. Cost: one extra lm_head matmul (the backward recompute),
~+8% model FLOPs, against ~6.6 GB/micro-step less HBM traffic. Numerics
are EXACTLY those of the unfused path per row (the full vocab is present
in each tile, so the logsumexp has the same reduction tree); only the
dw accumulation order differs (chunk-summed, fp32).

Matmuls follow the precision policy: bf16 MXU inputs, fp32 accumulation
(preferred_element_type), CE math in fp32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.precision import Policy, DEFAULT_POLICY


def _pad_rows(a, n_pad):
    if n_pad == 0:
        return a
    widths = [(0, n_pad)] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, widths)


@functools.lru_cache(maxsize=None)
def _make(n_chunks: int, policy: Policy):
    cc = policy.cast_compute
    acc = policy.accum_dtype

    def tile_logits(xc, w):
        # (Nc, D) @ (D, V) on the MXU, fp32 accumulation, COMPUTE-dtype
        # output: same rounding as the unfused lm_head (models/gpt2.py
        # lm_head returns compute dtype before the CE upcasts to fp32), and
        # half the HBM traffic of an fp32 tile under the bf16 policy.
        return jnp.dot(cc(xc), cc(w).T, preferred_element_type=acc).astype(
            policy.compute_dtype
        )

    @jax.custom_vjp
    def f(x, w, targets):
        nll, _ = _fwd(x, w, targets)
        return nll

    def _fwd(x, w, targets):
        n = x.shape[0]
        n_pad = (-n) % n_chunks
        xp = _pad_rows(x, n_pad)
        tp = _pad_rows(targets, n_pad)
        nc = xp.shape[0] // n_chunks
        xs = xp.reshape(n_chunks, nc, x.shape[1])
        ts = tp.reshape(n_chunks, nc)

        def body(_, inp):
            xc, tc = inp
            logits = tile_logits(xc, w).astype(jnp.float32)
            logz = jax.scipy.special.logsumexp(logits, axis=-1)
            gold = jnp.take_along_axis(logits, tc[:, None], axis=-1)[:, 0]
            return None, (logz - gold, logz)

        _, (nll, logz) = jax.lax.scan(body, None, (xs, ts))
        nll = nll.reshape(-1)[:n]
        logz = logz.reshape(-1)[:n]
        return nll, (x, w, targets, logz)

    def _bwd(res, g):
        x, w, targets, logz = res
        n, d = x.shape
        v = w.shape[0]
        n_pad = (-n) % n_chunks
        xp = _pad_rows(x, n_pad)
        tp = _pad_rows(targets, n_pad)
        gp = _pad_rows(g.astype(jnp.float32), n_pad)
        lp = _pad_rows(logz, n_pad)
        nc = xp.shape[0] // n_chunks
        xs = xp.reshape(n_chunks, nc, d)
        ts = tp.reshape(n_chunks, nc)
        gs = gp.reshape(n_chunks, nc)
        ls = lp.reshape(n_chunks, nc)

        def body(dw, inp):
            xc, tc, gc, lzc = inp
            logits = tile_logits(xc, w)
            # d nll / d logits = softmax - onehot(target), scaled by the
            # incoming cotangent (0 on masked/ignored rows). The one-hot
            # subtraction is an iota-compare select — a pure elementwise
            # fusion with the exp, NOT a scatter (scatter forces p into an
            # HBM buffer and breaks the fusion chain) — and p is cast to
            # the compute dtype ONCE inside the same fusion.
            cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            p32 = jnp.exp(logits.astype(jnp.float32) - lzc[:, None]) * gc[:, None]
            p32 = p32 - jnp.where(cols == tc[:, None], gc[:, None], 0.0)
            p = p32.astype(policy.compute_dtype)
            dxc = jnp.dot(p, cc(w), preferred_element_type=acc)
            dw_c = jnp.dot(p.T, cc(xc), preferred_element_type=acc)
            return dw + dw_c.astype(dw.dtype), dxc.astype(x.dtype)

        # The (V, D) dw chunk accumulator follows the PARAM dtype: fp32
        # masters keep the exact fp32 carry (parity path, unchanged); bf16
        # masters (whole-model-bf16, GPT-2 1558M on one chip) carry bf16 —
        # the cotangent is returned in w.dtype anyway, and the fp32 buffer
        # (50304 x 1600 x 4 = 322 MB) was the single largest backward
        # transient on a config that sat 134 MB over the HBM budget.
        dw_dt = jnp.float32 if w.dtype == jnp.float32 else w.dtype
        dw, dxs = jax.lax.scan(body, jnp.zeros((v, d), dw_dt), (xs, ts, gs, ls))
        dx = dxs.reshape(-1, d)[:n]
        return dx, dw.astype(w.dtype), None

    f.defvjp(_fwd, _bwd)
    return f


def fused_linear_ce(
    x,
    w,
    targets,
    *,
    n_chunks: int = 8,
    policy: Policy = DEFAULT_POLICY,
):
    """Per-position NLL of a tied LM head without full logits.

    x: (N, D) hidden states (already layer-normed), any float dtype.
    w: (V, D) unembedding matrix (tied wte, train_gpt2.py:96-97).
    targets: (N,) int32 class ids; entries outside [0, V) (e.g. the
      ignore_index -100, gpt2_linear/model.py:205-210) must be pre-clipped
      by the caller — their rows get a finite NLL that the caller masks out
      (and their zero cotangent kills any backward contribution).

    Returns nll (N,) fp32: logsumexp(logits) - logits[target] per row.
    """
    return _make(int(n_chunks), policy)(x, w, targets)
