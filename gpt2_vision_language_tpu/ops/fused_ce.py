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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.precision import Policy, DEFAULT_POLICY

NUM_LANES = 128
NEG_INF = -1e30

# Global interpreter-mode override so CPU tests can exercise the Pallas
# forward (mirrors flash_attention.FORCE_INTERPRET).
FORCE_INTERPRET = False


def _pad_rows(a, n_pad):
    if n_pad == 0:
        return a
    widths = [(0, n_pad)] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, widths)


# ---------------------------------------------------------------------------
# Pallas forward: lm_head matmul with the softmax stats fused into its
# epilogue — the (N, V) logits never reach HBM at all.
#
# The XLA forward (scan below) writes each logits tile to HBM and reads it
# back for the logsumexp/gold pass: at the bench shape (N=8192, V=50304,
# bf16) that is ~824 MB written + ~824 MB re-read per micro-step, itemized
# at ~1.3 ms of softmax stats on top of the matmul (ROUND_NOTES r4
# post-dt table). Here each (bn, bv) logits tile lives only in VMEM:
# grid (N/bn, V/bv) with the vocab sweep innermost/sequential, online
# max/sumexp + the gold-logit pick accumulating in lane-replicated VMEM
# scratch (the _fwd_step trick from ops/flash_attention.py), outputs
# (nll, logz) written on the last vocab tile. w traffic is (N/bn) * V * D
# bytes, so bn is chosen as large as VMEM allows.
#
# Numerics: bf16 MXU inputs, fp32 accumulation — same OPERAND rounding as
# tile_logits, but NOT the same logit rounding: tile_logits rounds the
# fp32 accumulator through the bf16 compute dtype before its logsumexp,
# while this kernel keeps the logits fp32 end-to-end (and its logsumexp is
# the online blockwise one). The Pallas loss is therefore the MORE
# accurate of the two — it differs from the XLA path by the bf16 logit
# round-trip, not just reduction-order ulps (ADVICE r4). The backward is
# unchanged XLA (it recomputes logits from the saved logz, which this
# forward supplies; using the Pallas logz there keeps fwd/bwd mutually
# consistent). Gated like the dt attention kernels: TPU (or forced
# interpreter), shapes divisible, compute dtype != fp32 is NOT required —
# the kernel is exact fp32-in too — but the parity-pinned fp32 policy
# keeps the XLA path (see fused_linear_ce).
# ---------------------------------------------------------------------------


def _rep(stat, w):
    """Broadcast a lane-replicated (bn, NUM_LANES) stat to width w
    (flash_attention._rep)."""
    if w <= NUM_LANES:
        return stat[:, :w]
    reps = -(-w // NUM_LANES)
    out = jnp.tile(stat, (1, reps))
    return out if out.shape[1] == w else out[:, :w]


def _ce_fwd_kernel(x_ref, w_ref, t_ref, nll_ref, lse_ref, m_ref, l_ref,
                   g_ref, *, bv, nv):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        g_ref[...] = jnp.zeros_like(g_ref)

    s = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bn, bv) logits tile, fp32
    m = m_ref[...]
    m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - _rep(m_new, bv))
    l_ref[...] = l_ref[...] * jnp.exp(m - m_new) + jnp.sum(
        p, axis=1, keepdims=True
    )
    m_ref[...] = m_new
    # gold logit: each row's target falls in exactly one vocab tile
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * bv
    hit = cols == t_ref[...]  # (bn, 1) broadcasts over lanes
    g_ref[...] = g_ref[...] + jnp.sum(
        jnp.where(hit, s, 0.0), axis=1, keepdims=True
    )

    @pl.when(j == nv - 1)
    def _():
        lse = m_ref[...] + jnp.log(l_ref[...])
        lse_ref[...] = lse[:, :1]
        nll_ref[...] = (lse - g_ref[...])[:, :1]


def _ce_block_sizes(n: int, d: int, v: int, itemsize: int = 2):
    """(bn, bv) for the Pallas forward, or None when the shape does not
    tile cleanly / fit VMEM.

    bv: largest multiple-of-128 divisor of V that is <= 512 (V=50304 ->
    384). bn: largest multiple-of-256 divisor of N whose working set
    (x tile + 2 w tiles + 2 fp32 (bn, bv) tiles + 3 fp32 stat vregs)
    stays under ~12 MB of the 16 MB scoped VMEM; bigger bn means fewer
    full sweeps over w ((N/bn) * V * D bytes of HBM traffic).

    d is NOT grid-split (each block spans the full depth), so Mosaic only
    needs sublane alignment on the contraction dim — it lane-pads the
    (bn, d)/(bv, d) blocks to the next multiple of 128 with zeros, which
    the dot_general contracts away. d=1600 (1558M) pads to 1664; the
    VMEM estimate below uses the PADDED depth. itemsize is the compute
    dtype's (2 for bf16; pass 4 under an fp32 policy — the estimate was
    2x low there before, ADVICE r4).
    """
    if n % 256 or d % (8 if itemsize == 4 else 16) or v % 128:
        return None
    d_pad = -(-d // NUM_LANES) * NUM_LANES  # Mosaic lane-pads blocks
    bv = 0
    for cand in range(512, 127, -128):
        if v % cand == 0:
            bv = cand
            break
    if not bv:
        return None
    budget = 12 * 1024 * 1024
    bn = 0
    for cand in (4096, 2048, 1024, 512, 256):
        if n % cand:
            continue
        use = (
            cand * d_pad * itemsize      # x tile
            + 2 * bv * d_pad * itemsize  # double-buffered w tile
            + 2 * cand * bv * 4          # s + p fp32 transients
            + 3 * cand * NUM_LANES * 4   # m/l/g scratch
        )
        if use <= budget:
            bn = cand
            break
    return (bn, bv) if bn else None


def _ce_fwd_pallas(x, w, targets, policy: Policy, bn: int, bv: int,
                   interpret: bool):
    n, d = x.shape
    v = w.shape[0]
    nv = v // bv
    nll, lse = pl.pallas_call(
        functools.partial(_ce_fwd_kernel, bv=bv, nv=nv),
        grid=(n // bn, nv),
        in_specs=[
            pl.BlockSpec((bn, d), lambda i, j: (i, 0)),
            pl.BlockSpec((bv, d), lambda i, j: (j, 0)),
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bn, NUM_LANES), jnp.float32),
            pltpu.VMEM((bn, NUM_LANES), jnp.float32),
            pltpu.VMEM((bn, NUM_LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * v * d,
            bytes_accessed=(n * d + (n // bn) * v * d) * x.dtype.itemsize,
            transcendentals=n * v,
        ),
    )(
        policy.cast_compute(x),
        policy.cast_compute(w),
        targets.astype(jnp.int32)[:, None],
    )
    return nll[:, 0], lse[:, 0]


def ce_pallas_eligible(n: int, d: int, v: int, itemsize: int = 2) -> bool:
    """Can the Pallas fused-CE forward run this shape? itemsize is the
    compute dtype's (2 bf16 / 4 fp32) — it sizes the VMEM working set."""
    return _ce_block_sizes(n, d, v, itemsize) is not None


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # no backend yet
        return False


@functools.lru_cache(maxsize=None)
def _make(n_chunks: int, policy: Policy, pallas_fwd: str = "never"):
    """pallas_fwd routes the FORWARD implementation:

    "never"   — XLA chunked scan everywhere (fp32 parity pin; and the
                right choice whenever a backward follows, see below).
    "always"  — Pallas stats-in-epilogue kernel in both the primal call
                and the custom-vjp forward (forced impl="pallas").
    "primal"  — Pallas for plain (non-differentiated) calls, XLA for the
                custom-vjp forward. This is what impl="auto" picks on TPU:
                measured in-context on v5e-1 at the bench shape (N=8192,
                D=768, V=50304, bf16; r5 A/B), the Pallas forward wins
                ISOLATED (5.32 vs 7.30 ms fwd-only — no (N, V) logits HBM
                round-trip, stats fused into the matmul epilogue) but
                LOSES inside the train step (158.8k vs 165.1k tok/s):
                XLA CSEs the XLA forward's logits matmul against the
                backward's tile_logits recompute, so the "recomputed"
                matmul is free, while the Pallas forward's unreadable
                logits force the backward to pay it for real (+3.2 ms,
                against ~1.3 ms of saved stats traffic). Under jax.grad /
                value_and_grad the custom-vjp forward runs, not the
                primal, so this split gives eval/val-loss the kernel and
                training the CSE.
    """
    assert pallas_fwd in ("never", "always", "primal")
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
        # plain (non-differentiated) call — jax.grad never sees this body
        nll, _ = _fwd_impl(x, w, targets, pallas_fwd in ("always", "primal"))
        return nll

    def _fwd(x, w, targets):
        # custom-vjp forward — the backward's tile_logits recompute CSEs
        # against the XLA forward's matmul, so only "always" forces Pallas
        return _fwd_impl(x, w, targets, pallas_fwd == "always")

    def _fwd_impl(x, w, targets, use_pallas):
        if use_pallas:
            bs = _ce_block_sizes(
                x.shape[0], x.shape[1], w.shape[0],
                jnp.dtype(policy.compute_dtype).itemsize,
            )
            assert bs is not None, (
                "pallas fused-CE forward: shape not eligible "
                f"(N={x.shape[0]}, D={x.shape[1]}, V={w.shape[0]})"
            )
            nll, logz = _ce_fwd_pallas(
                x, w, targets, policy, bs[0], bs[1], FORCE_INTERPRET
            )
            return nll, (x, w, targets, logz)
        n = x.shape[0]
        n_pad = (-n) % n_chunks
        xp = _pad_rows(x, n_pad)
        tp = _pad_rows(targets, n_pad)
        nc = xp.shape[0] // n_chunks
        xs = xp.reshape(n_chunks, nc, x.shape[1])
        ts = tp.reshape(n_chunks, nc)

        def body(_, inp):
            xc, tc = inp
            logits = tile_logits(xc, w)
            # A GATHER operand must be materialized, so take_along_axis on
            # the f32 upcast makes XLA write a full f32 (Nc, V) logits copy
            # (r5 trace: fusion.1357 emitted both f32 and bf16 logits —
            # 1.65 GB at the bench shape). Gathering from the compute-dtype
            # tensor and upcasting the Nc gathered values is BITWISE
            # identical (f32-of-bf16 is exact) and drops that transient —
            # but it also measured a reproducible -0.29% on the bench
            # (164.6k vs 165.1k tok/s, two runs each; the copy was fully
            # overlapped there). So: chunked configs (the 774M/1558M
            # HBM-edge recipes) take the lean gather; the ce_chunks=1
            # bench/124M path keeps the f32 gather and the 0.3%.
            logz = jax.scipy.special.logsumexp(
                logits.astype(jnp.float32), axis=-1
            )
            if n_chunks == 1:
                gold = jnp.take_along_axis(
                    logits.astype(jnp.float32), tc[:, None], axis=-1
                )[:, 0]
            else:
                gold = jnp.take_along_axis(logits, tc[:, None], axis=-1)[
                    :, 0
                ].astype(jnp.float32)
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
    impl: str = "auto",
):
    """Per-position NLL of a tied LM head without full logits.

    x: (N, D) hidden states (already layer-normed), any float dtype.
    w: (V, D) unembedding matrix (tied wte, train_gpt2.py:96-97).
    targets: (N,) int32 class ids; entries outside [0, V) (e.g. the
      ignore_index -100, gpt2_linear/model.py:205-210) must be pre-clipped
      by the caller — their rows get a finite NLL that the caller masks out
      (and their zero cotangent kills any backward contribution).

    impl: forward implementation. "auto" routes NON-DIFFERENTIATED calls
    (eval / val-loss / HellaSwag scoring) to the Pallas stats-in-epilogue
    kernel on TPU (or under FORCE_INTERPRET) for eligible shapes under a
    non-fp32 compute policy, and keeps the XLA chunked forward for the
    custom-vjp forward — in a train step XLA CSEs that matmul against the
    backward recompute, which beats the kernel (in-context bench A/B, r5:
    165.1k vs 158.8k tok/s; isolated the kernel wins 0.73x). The fp32
    policy is the reference-parity pin and keeps the XLA forward's exact
    logsumexp reduction tree everywhere. "pallas"/"xla" force one path
    for both calls. The backward is the XLA chunked recompute either way.

    Returns nll (N,) fp32: logsumexp(logits) - logits[target] per row.
    """
    if impl == "auto":
        # measurement override for in-context A/Bs (tools/ab_ce.py measures
        # the op isolated; the bench measures it inside the whole train
        # step, where XLA's CSE of the forward logits matmul against the
        # backward recompute changes the economics — see ROUND_NOTES r5)
        impl = os.environ.get("GPT2VL_CE_IMPL", "auto") or "auto"
    if impl == "pallas":
        mode = "always"
    elif impl == "auto" and (
        (_on_tpu() or FORCE_INTERPRET)
        and policy.compute_dtype != jnp.float32
        and ce_pallas_eligible(
            x.shape[0], x.shape[1], w.shape[0],
            jnp.dtype(policy.compute_dtype).itemsize,
        )
    ):
        mode = "primal"
    else:
        mode = "never"
    return _make(int(n_chunks), policy, mode)(x, w, targets)
