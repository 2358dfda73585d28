"""A/B: dt-layout flash-attention forward prototype vs the shipping kernel.

Hypothesis (ROUND_NOTES r4 "misc itemized"): the shipping kernel's q/k/v/o
tiles are (block, hs=64) — 64 LANES, half a (8, 128) tile — so Mosaic pads
every load/store/VPU op on them to 128 lanes (50% density), and the bhtd
head transposes outside the kernel pay the same padding. A transposed
"dt" kernel keeps hs in SUBLANES (64 = 8 full sublane tiles) and the
sequence in LANES: 100% tile density, and the qkv projection can emit the
layout for free (dot_general(W, x) -> (3C', B, T) reshapes to
(3, H, hs, B*T) with no copy).

dt kernel math (axes swapped vs ops/flash_attention.py::_fwd_kernel):
  q (hs, bq), k/v (hs, bk)
  s  = k^T q                          (bk, bq)  [contract sublane dim 0]
  softmax stats reduce over axis 0 (sublanes) -> (1, bq) lane rows,
  which broadcast over the (hs, bq) accumulator for free
  acc += v @ p                        (hs, bq)  [plain matmul]

Usage (real TPU):  python tools/ab_dt_flash.py [--iters 24]
Numerics check (CPU):  python tools/ab_dt_flash.py --check
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
SUBL = 8  # f32 sublane tile


def _rep_sub(stat, rows):
    """Broadcast a sublane-replicated (SUBL, bq) stat to `rows` sublanes."""
    if rows <= SUBL:
        return stat[:rows, :]
    return jnp.tile(stat, (rows // SUBL, 1))


def _fwd_dt_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, bq, bk, tk_pad,
                   causal):
    """Grid (H, B, nq); K/V for one (h, b) VMEM-resident.

    Blocks: q (1, hs, bq), k/v (1, hs, tk_pad), o (1, hs, bq),
    lse (1, SUBL, bq). Aligned shapes only (tq % bq == tk % bk == 0):
    this is a prototype for the pretrain hot shape.
    """
    iq = pl.program_id(2)
    q = q_ref[0]  # (hs, bq)
    hs = q.shape[0]
    nk = tk_pad // bk
    num_kv = jnp.minimum((iq + 1) * bq // bk + (bq % bk != 0), nk) if causal \
        else nk

    acc0 = jnp.zeros((hs, bq), jnp.float32)
    m0 = jnp.full((SUBL, bq), NEG_INF, jnp.float32)
    l0 = jnp.zeros((SUBL, bq), jnp.float32)

    def step(j, carry):
        acc, m, l = carry
        k = k_ref[0, :, pl.ds(j * bk, bk)]  # (hs, bk)
        v = v_ref[0, :, pl.ds(j * bk, bk)]
        s = jax.lax.dot_general(
            k, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        if causal:
            kpos = jax.lax.broadcasted_iota(jnp.int32, (bk, bq), 0) + j * bk
            qpos = jax.lax.broadcasted_iota(jnp.int32, (bk, bq), 1) + iq * bq
            s = jnp.where(qpos >= kpos, s, NEG_INF)
        m_new = jnp.maximum(m, _rep_sub(jnp.max(s, axis=0, keepdims=True),
                                        SUBL))
        p = jnp.exp(s - _rep_sub(m_new, s.shape[0]))
        corr = jnp.exp(m - m_new)
        l = l * corr + _rep_sub(jnp.sum(p, axis=0, keepdims=True), SUBL)
        pv = jax.lax.dot_general(
            v, p.astype(v.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc * _rep_sub(corr, hs) + pv, m_new, l

    acc, m, l = jax.lax.fori_loop(0, num_kv, step, (acc0, m0, l0))
    o_ref[0] = (acc / _rep_sub(l, hs)).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)  # (SUBL, bq), row-replicated


def flash_fwd_dt_b(q, k, v, b, tq, tk, *, causal=True, bq=512, bk=512,
                   interpret=False):
    """Explicit-batch variant. q (H, hs, B*Tq) with per-b contiguous slabs."""
    h, hs, _ = q.shape
    assert tq % bq == 0 and tk % bk == 0, "prototype: aligned shapes only"
    nq = tq // bq
    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_dt_kernel, bq=bq, bk=bk, tk_pad=tk, causal=causal
        ),
        grid=(h, b, nq),
        in_specs=[
            pl.BlockSpec((1, hs, bq), lambda hh, bb, iq: (hh, 0, bb * nq + iq)),
            pl.BlockSpec((1, hs, tk), lambda hh, bb, iq: (hh, 0, bb)),
            pl.BlockSpec((1, hs, tk), lambda hh, bb, iq: (hh, 0, bb)),
        ],
        out_specs=[
            pl.BlockSpec((1, hs, bq), lambda hh, bb, iq: (hh, 0, bb * nq + iq)),
            pl.BlockSpec((1, SUBL, bq),
                         lambda hh, bb, iq: (hh, 0, bb * nq + iq)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, hs, b * tq), q.dtype),
            jax.ShapeDtypeStruct((h, SUBL, b * tq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(2 if causal else 4) * h * b * tq * tk * hs,
            bytes_accessed=(h * b * (tq + 2 * tk) * hs) * q.dtype.itemsize,
            transcendentals=h * b * tq * tk // (2 if causal else 1),
        ),
    )(q, k, v)
    return out, lse


def _bwd_dt_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dcap_ref,
                   dq_ref, dk_ref, dv_ref, dq_acc, *, bq, bk, tq, tk,
                   causal, dq_scale):
    """Fused single-pass dt backward: grid (H, B), everything resident.

    Transposed mirror of ops/flash_attention.py::_bwd_kernel_fused:
    s/p/ds live (bk, bq); lse/dcap are (1, bq) lane rows (sublane
    broadcasts are cheap); dk/dv accumulate (hs, bk) in registers per kv
    tile; dq accumulates (hs, tq) in fp32 VMEM scratch.
    """
    hs = q_ref.shape[1]
    nq, nk = tq // bq, tk // bk
    dq_acc[...] = jnp.zeros_like(dq_acc)

    def kv_tile(jk, carry_unused):
        k = k_ref[0, :, pl.ds(jk * bk, bk)]
        v = v_ref[0, :, pl.ds(jk * bk, bk)]
        start_q = (jk * bk) // bq if causal else 0

        def q_tile(i, carry):
            dk, dv = carry
            sl = pl.ds(i * bq, bq)
            q = q_ref[0, :, sl]
            do = do_ref[0, :, sl].astype(jnp.float32)
            lse = lse_ref[0, 0:1, sl]
            dcap = dcap_ref[0, 0:1, sl]
            s = jax.lax.dot_general(
                k, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (bk, bq)
            if causal:
                kpos = jax.lax.broadcasted_iota(jnp.int32, (bk, bq), 0) \
                    + jk * bk
                qpos = jax.lax.broadcasted_iota(jnp.int32, (bk, bq), 1) \
                    + i * bq
                s = jnp.where(qpos >= kpos, s, NEG_INF)
            p = jnp.exp(s - lse)  # (bk, bq); lse row sublane-broadcasts
            dv = dv + jax.lax.dot_general(
                do, p.astype(do.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (hs, bk)
            dp = jax.lax.dot_general(
                v, do.astype(v.dtype), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (bk, bq)
            ds = p * (dp - dcap)
            dk = dk + jax.lax.dot_general(
                q, ds.astype(q.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (hs, bk)
            dq_acc[:, sl] += jax.lax.dot_general(
                k, ds.astype(k.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (hs, bq)
            return dk, dv

        dk0 = jnp.zeros((hs, bk), jnp.float32)
        dv0 = jnp.zeros((hs, bk), jnp.float32)
        dk, dv = jax.lax.fori_loop(start_q, nq, q_tile, (dk0, dv0))
        ksl = pl.ds(jk * bk, bk)
        dk_ref[0, :, ksl] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, ksl] = dv.astype(dv_ref.dtype)
        return carry_unused

    jax.lax.fori_loop(0, nk, kv_tile, 0)
    dq_out = dq_acc[...]
    if dq_scale != 1.0:
        dq_out = dq_out * dq_scale
    dq_ref[0] = dq_out.astype(dq_ref.dtype)


def flash_bwd_dt_b(q, k, v, do, lse, dcap, b, tq, tk, *, causal=True,
                   bq=512, bk=512, dq_scale=1.0, interpret=False):
    """q/k/v/do: (H, hs, B*T) dt layout (q pre-scaled); lse/dcap:
    (H, SUBL/1, B*Tq). Returns (dq, dk, dv) in dt layout."""
    h, hs, _ = q.shape
    assert tq % bq == 0 and tk % bk == 0
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dt_kernel, bq=bq, bk=bk, tq=tq, tk=tk, causal=causal,
            dq_scale=dq_scale,
        ),
        grid=(h, b),
        in_specs=[
            pl.BlockSpec((1, hs, tq), lambda hh, bb: (hh, 0, bb)),
            pl.BlockSpec((1, hs, tk), lambda hh, bb: (hh, 0, bb)),
            pl.BlockSpec((1, hs, tk), lambda hh, bb: (hh, 0, bb)),
            pl.BlockSpec((1, hs, tq), lambda hh, bb: (hh, 0, bb)),
            pl.BlockSpec((1, lse.shape[1], tq), lambda hh, bb: (hh, 0, bb)),
            pl.BlockSpec((1, dcap.shape[1], tq), lambda hh, bb: (hh, 0, bb)),
        ],
        out_specs=[
            pl.BlockSpec((1, hs, tq), lambda hh, bb: (hh, 0, bb)),
            pl.BlockSpec((1, hs, tk), lambda hh, bb: (hh, 0, bb)),
            pl.BlockSpec((1, hs, tk), lambda hh, bb: (hh, 0, bb)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((hs, tq), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(5 if causal else 10) * h * b * tq * tk * hs,
            bytes_accessed=3 * (h * b * (tq + 2 * tk) * hs) * q.dtype.itemsize,
            transcendentals=h * b * tq * tk // (2 if causal else 1),
        ),
    )(q, k, v, do, lse, dcap)
    return dq, dk, dv


def check_bwd_numerics():
    """Interpreter-mode grad parity vs the shipping custom-VJP kernel."""
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from gpt2_vision_language_tpu.ops.flash_attention import flash_attention

    b, h, t, hs = 2, 3, 1024, 64
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(b, h, t, hs), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, t, hs), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, t, hs), jnp.float32)
    dout = jnp.asarray(rng.randn(b, h, t, hs), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True, interpret=True)
                       * dout)

    dq_ref, dk_ref, dv_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)

    scale = 1.0 / hs**0.5
    to_dt = lambda x: x.transpose(1, 3, 0, 2).reshape(h, hs, b * t)
    from_dt = lambda x: x.reshape(h, hs, b, t).transpose(2, 0, 3, 1)
    qs = to_dt(q * scale)
    kd, vd, dod = to_dt(k), to_dt(v), to_dt(dout)
    o, lse = flash_fwd_dt_b(qs, kd, vd, b, t, t, causal=True, interpret=True)
    dcap = jnp.sum(o.astype(jnp.float32) * dod, axis=1, keepdims=True)
    dq, dk, dv = flash_bwd_dt_b(
        qs, kd, vd, dod, lse, dcap, b, t, t, causal=True, dq_scale=scale,
        interpret=True,
    )
    for name, got, ref in (("dq", from_dt(dq), dq_ref),
                           ("dk", from_dt(dk), dk_ref),
                           ("dv", from_dt(dv), dv_ref)):
        err = float(jnp.max(jnp.abs(got - ref)))
        rel = err / float(jnp.max(jnp.abs(ref)))
        print(f"{name}: max |err| {err:.2e} (rel {rel:.2e})")
        assert rel < 1e-5, (name, err)
    print("OK")


def bench_bwd():
    """Device A/B: shipping fused bwd (bhtd, incl. its transposes) vs dt."""
    import tempfile

    import numpy as np

    from gpt2_vision_language_tpu.ops.flash_attention import flash_attention
    from tools.profile_trace import parse_trace

    b, h, t, hs, layers = 8, 12, 1024, 64, 12
    rng = np.random.RandomState(0)
    mk = lambda: jnp.asarray(rng.randn(b, t, h, hs), jnp.bfloat16)
    q, k, v, dout = mk(), mk(), mk(), mk()

    def path_a(q, k, v):
        def one(x, _):
            return flash_attention(x, k, v, causal=True, layout="bthd"), None
        out, _ = jax.lax.scan(one, q, None, length=layers)
        return jnp.sum(out * dout)

    ga = jax.jit(jax.grad(path_a, argnums=(0, 1, 2)))
    _ = np.asarray(ga(q, k, v)[0])[0, 0, 0]

    scale = 1.0 / hs**0.5
    to_dt = lambda x: x.transpose(2, 3, 0, 1).reshape(h, hs, b * t)
    qd = jax.jit(lambda a: to_dt(a) * scale)(q)
    kd, vd, dod = (jax.jit(to_dt)(a) for a in (k, v, dout))

    def path_b(q, k, v, do):
        o, lse = flash_fwd_dt_b(q, k, v, b, t, t, causal=True)
        dcap = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32),
                       axis=1, keepdims=True)

        def one(c, _):
            dq, dk, dv = flash_bwd_dt_b(
                q, k, v, do, lse, dcap, b, t, t, causal=True, dq_scale=scale
            )
            return c + dq[0, 0, 0].astype(jnp.float32), None

        acc, _ = jax.lax.scan(one, jnp.float32(0), None, length=layers)
        return acc

    fb = jax.jit(path_b)
    _ = float(fb(qd, kd, vd, dod))

    for name, thunk in (
        ("A bhtd grad (fwd+fused bwd+transposes)",
         lambda: np.asarray(ga(q, k, v)[0])[0, 0, 0]),
        ("B dt fwd+bwd x12", lambda: float(fb(qd, kd, vd, dod))),
    ):
        tmp = tempfile.mkdtemp(prefix="ab_dt_bwd_")
        with jax.profiler.trace(tmp):
            thunk()
        excl, count, meta, total = parse_trace(tmp)
        print(f"{name}: {total:.3f} ms device "
              f"({total/layers*1000:.1f} us/layer)")
        for op, ms in excl.most_common(8):
            print(f"    {ms:7.3f} ms  {count[op]:3d}x  {op[:60]}")


def check_numerics():
    """Interpreter-mode parity vs the shipping kernel on CPU."""
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from gpt2_vision_language_tpu.ops.flash_attention import flash_attention

    b, h, t, hs = 2, 3, 1024, 64
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, t, hs), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, t, hs), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, t, hs), jnp.float32)
    ref = flash_attention(q, k, v, causal=True, interpret=True)

    scale = 1.0 / hs**0.5
    # (B,H,T,hs) -> dt (H, hs, B*T): b-major slabs along the last axis
    to_dt = lambda x: x.transpose(1, 3, 0, 2).reshape(h, hs, b * t)
    o_dt, lse = flash_fwd_dt_b(
        to_dt(q * scale), to_dt(k), to_dt(v), b, t, t, causal=True,
        interpret=True,
    )
    got = o_dt.reshape(h, hs, b, t).transpose(2, 0, 3, 1)
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f"dt fwd max |err| vs shipping kernel: {err:.2e}")
    assert err < 2e-5, err
    print("OK")


def bench():
    """Device A/B in a 12-layer-like loop, traced for device time.

    A = shipping path cost: bthd transposes + bhtd kernel (what the model
        pays per layer today, models/gpt2.py:131-143 + fa:847).
    B = dt path: kernel only (the projection reshape is free by design).
    """
    import tempfile

    import numpy as np

    from gpt2_vision_language_tpu.ops.flash_attention import flash_attention
    from tools.profile_trace import parse_trace

    b, h, t, hs, layers = 8, 12, 1024, 64, 12
    rng = np.random.RandomState(0)
    mk = lambda: jnp.asarray(rng.randn(b, t, h, hs), jnp.bfloat16)
    q_bthd, k_bthd, v_bthd = mk(), mk(), mk()
    scale = 1.0 / hs**0.5

    def path_a(q, k, v):
        x = q
        for _ in range(layers):
            x = flash_attention(x, k, v, causal=True, layout="bthd")
        return x

    to_dt = lambda x: x.transpose(2, 3, 0, 1).reshape(h, hs, b * t)
    q_dt = jax.jit(lambda a: to_dt(a) * scale)(q_bthd)
    k_dt, v_dt = jax.jit(to_dt)(k_bthd), jax.jit(to_dt)(v_bthd)

    def path_b(q, k, v):
        x = q
        for _ in range(layers):
            x, _ = flash_fwd_dt_b(x, k, v, b, t, t, causal=True)
        return x

    fa = jax.jit(path_a)
    fb = jax.jit(path_b)
    _ = np.asarray(fa(q_bthd, k_bthd, v_bthd))[0, 0, 0]
    _ = np.asarray(fb(q_dt, k_dt, v_dt))[0, 0, 0]

    for name, fn, args in (("A bthd+transpose", fa, (q_bthd, k_bthd, v_bthd)),
                           ("B dt", fb, (q_dt, k_dt, v_dt))):
        tmp = tempfile.mkdtemp(prefix="ab_dt_")
        with jax.profiler.trace(tmp):
            r = fn(*args)
            _ = np.asarray(r)[0, 0, 0]
        excl, count, meta, total = parse_trace(tmp)
        print(f"{name}: {total:.3f} ms device for {layers} layers "
              f"({total/layers*1000:.1f} us/layer)")
        for op, ms in excl.most_common(6):
            print(f"    {ms:7.3f} ms  {count[op]:3d}x  {op[:60]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--check-bwd", action="store_true")
    ap.add_argument("--bwd", action="store_true")
    args = ap.parse_args()
    if args.check:
        check_numerics()
    elif args.check_bwd:
        check_bwd_numerics()
    elif args.bwd:
        bench_bwd()
    else:
        bench()
