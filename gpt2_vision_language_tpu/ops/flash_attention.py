"""Pallas TPU flash attention (forward + backward).

TPU-native replacement for the reference's FlashAttention CUDA kernel
reached via `F.scaled_dot_product_attention` (train_gpt2.py:40). Blockwise
online-softmax: the (T, T) score matrix never exists in HBM; per-block
scores live in VMEM, matmuls hit the MXU in bf16 with fp32 accumulation.

Layout: inputs (B, H, T, hs) are collapsed to (BH, T, hs). Grid is
(BH, num_q_blocks); K/V for one (b, h) fit comfortably in VMEM at the
sequence lengths this framework targets (T <= 4096), so each grid step
streams K/V blocks from VMEM with `pl.ds` while the causal loop bound
(`iq + 1` blocks) skips the strictly-upper-triangular work — ~2x FLOP
saving over masked dense attention.

Backward follows the FlashAttention-2 recipe: save per-row logsumexp from
the forward, precompute D = rowsum(dout * out) with XLA, then two kernels:
one gridded over KV blocks producing (dk, dv), one over Q blocks producing
dq. All accumulation in fp32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512
NEG_INF = -1e30
# Global interpreter-mode override for CPU testing of callers that do not
# thread an `interpret` argument (e.g. the model's attn_impl="flash" path).
FORCE_INTERPRET = False


def _fit_block(t: int, want: int) -> int:
    """Largest multiple of 128 that divides t and is <= want."""
    b = min(want, t)
    while b >= 128:
        if t % b == 0 and b % 128 == 0:
            return b
        b -= 128
    raise AssertionError(f"T={t} has no 128-aligned divisor block")


def _block_sizes(t: int, bq: int, bk: int):
    return _fit_block(t, bq), _fit_block(t, bk)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, bq, bk, scale, causal, t):
    iq = pl.program_id(1)
    q = q_ref[0]  # (bq, hs); scores accumulate fp32 via preferred_element_type
    hs = q.shape[-1]

    if causal:
        # number of kv blocks this q block attends into
        num_kv = (iq * bq) // bk + pl.cdiv(bq, bk)
    else:
        num_kv = t // bk

    def body(j, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(j * bk, bk), :]
        v = v_ref[0, pl.ds(j * bk, bk), :]
        s = jax.lax.dot_general(
            q,
            k,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, bk)
        s = s * scale
        if causal:
            qpos = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            kpos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = jnp.where(qpos >= kpos, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc * corr + pv
        return acc, m_new, l

    acc0 = jnp.zeros((bq, hs), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kv, body, (acc0, m0, l0))

    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)  # (bq, 1)


def _fwd(q, k, v, *, causal, bq, bk, interpret):
    b, h, t, hs = q.shape
    bq, bk = _block_sizes(t, bq, bk)
    scale = 1.0 / (hs**0.5)
    qf = q.reshape(b * h, t, hs)
    kf = k.reshape(b * h, t, hs)
    vf = v.reshape(b * h, t, hs)
    grid = (b * h, t // bq)
    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, bq=bq, bk=bk, scale=scale, causal=causal, t=t
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, hs), lambda bh, iq: (bh, iq, 0)),
            pl.BlockSpec((1, t, hs), lambda bh, iq: (bh, 0, 0)),
            pl.BlockSpec((1, t, hs), lambda bh, iq: (bh, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, hs), lambda bh, iq: (bh, iq, 0)),
            pl.BlockSpec((1, bq, 1), lambda bh, iq: (bh, iq, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, t, hs), q.dtype),
            jax.ShapeDtypeStruct((b * h, t, 1), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(2 if causal else 4) * b * h * t * t * hs,
            bytes_accessed=3 * b * h * t * hs * q.dtype.itemsize,
            transcendentals=b * h * t * t // (2 if causal else 1),
        ),
    )(qf, kf, vf)
    return out.reshape(b, h, t, hs), lse


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dcap_ref, dq_ref, *, bq, bk, scale, causal, t
):
    iq = pl.program_id(1)
    q = q_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # (bq, 1)
    dcap = dcap_ref[0]  # (bq, 1)
    hs = q.shape[-1]
    num_kv = ((iq * bq) // bk + pl.cdiv(bq, bk)) if causal else t // bk

    def body(j, dq):
        k = k_ref[0, pl.ds(j * bk, bk), :]
        v = v_ref[0, pl.ds(j * bk, bk), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if causal:
            qpos = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            kpos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = jnp.where(qpos >= kpos, s, NEG_INF)
        p = jnp.exp(s - lse)  # (bq, bk)
        dp = jax.lax.dot_general(
            do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - dcap) * scale
        dq = dq + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dq

    dq = jax.lax.fori_loop(0, num_kv, body, jnp.zeros((bq, hs), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dcap_ref, dk_ref, dv_ref,
    *, bq, bk, scale, causal, t,
):
    jk = pl.program_id(1)
    k = k_ref[0]
    v = v_ref[0]
    hs = k.shape[-1]
    nq = t // bq
    start_q = (jk * bk) // bq if causal else 0

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * bq, bq), :]
        do = do_ref[0, pl.ds(i * bq, bq), :]
        lse = lse_ref[0, pl.ds(i * bq, bq), :]  # (bq, 1)
        dcap = dcap_ref[0, pl.ds(i * bq, bq), :]  # (bq, 1)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if causal:
            qpos = i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            kpos = jk * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = jnp.where(qpos >= kpos, s, NEG_INF)
        p = jnp.exp(s - lse)  # (bq, bk)
        dv = dv + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - dcap) * scale
        dk = dk + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk, dv

    dk0 = jnp.zeros((bk, hs), jnp.float32)
    dv0 = jnp.zeros((bk, hs), jnp.float32)
    dk, dv = jax.lax.fori_loop(start_q, nq, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd(q, k, v, out, lse, do, *, causal, bq, bk, interpret):
    b, h, t, hs = q.shape
    bq, bk = _block_sizes(t, bq, bk)
    scale = 1.0 / (hs**0.5)
    shape3 = (b * h, t, hs)
    qf, kf, vf = (x.reshape(shape3) for x in (q, k, v))
    dof = do.reshape(shape3)
    # D_i = rowsum(dout * out): cheap elementwise+reduce, leave it to XLA.
    dcap = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    ).reshape(b * h, t, 1)

    full = lambda bh, i: (bh, 0, 0)

    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, bq=bq, bk=bk, scale=scale, causal=causal, t=t
        ),
        grid=(b * h, t // bq),
        in_specs=[
            pl.BlockSpec((1, bq, hs), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, t, hs), full),
            pl.BlockSpec((1, t, hs), full),
            pl.BlockSpec((1, bq, hs), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda bh, i: (bh, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, hs), lambda bh, i: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct(shape3, q.dtype),
        interpret=interpret,
    )(qf, kf, vf, dof, lse, dcap)

    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, bq=bq, bk=bk, scale=scale, causal=causal, t=t
        ),
        grid=(b * h, t // bk),
        in_specs=[
            pl.BlockSpec((1, t, hs), full),
            pl.BlockSpec((1, bk, hs), lambda bh, j: (bh, j, 0)),
            pl.BlockSpec((1, bk, hs), lambda bh, j: (bh, j, 0)),
            pl.BlockSpec((1, t, hs), full),
            pl.BlockSpec((1, t, 1), full),
            pl.BlockSpec((1, t, 1), full),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, hs), lambda bh, j: (bh, j, 0)),
            pl.BlockSpec((1, bk, hs), lambda bh, j: (bh, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(shape3, k.dtype),
            jax.ShapeDtypeStruct(shape3, v.dtype),
        ],
        interpret=interpret,
    )(qf, kf, vf, dof, lse, dcap)

    rs = lambda x: x.reshape(b, h, t, hs)
    return rs(dq), rs(dk), rs(dv)


# ---------------------------------------------------------------------------
# Public API with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6)
)
def _flash(q, k, v, causal, bq, bk, interpret):
    out, _ = _fwd(q, k, v, causal=causal, bq=bq, bk=bk, interpret=interpret)
    return out


def _flash_fwd(q, k, v, causal, bq, bk, interpret):
    out, lse = _fwd(q, k, v, causal=causal, bq=bq, bk=bk, interpret=interpret)
    return out, (q, k, v, out, lse)


def _flash_bwd(causal, bq, bk, interpret, res, do):
    q, k, v, out, lse = res
    dq, dk, dv = _bwd(
        q, k, v, out, lse, do, causal=causal, bq=bq, bk=bk, interpret=interpret
    )
    return dq, dk, dv


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q,
    k,
    v,
    *,
    causal: bool = True,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
):
    """Flash attention over (B, H, T, hs); self-attention (Tq == Tk).

    Differentiable (custom VJP). `interpret=True` runs the kernels in the
    Pallas interpreter for CPU tests.
    """
    assert q.shape == k.shape == v.shape, "flash path is self-attention only"
    return _flash(q, k, v, causal, block_q, block_k, interpret or FORCE_INTERPRET)
