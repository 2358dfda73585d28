"""A/B device-time benchmark: our Pallas flash kernels vs jax upstream
pallas flash_attention and splash_attention, at the pretrain shape
(B=8, H=12, T=1024, hs=64, bf16, causal) — VERDICT r2 task #1.

Timing discipline (ROUND_NOTES): single-kernel microbenchmarks through the
axon tunnel are garbage below ~1 ms/call, so each variant runs N chained
iterations (data-dependent lax.scan carry) inside ONE jit dispatch; wall
time / N is then device time to within the amortized dispatch cost.
`float(x)` forces the sync (jax.block_until_ready lies on axon).

Usage: python tools/ab_flash.py [--iters 50] [--fwd-only] [--shape B H T hs]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def make_inputs(B, H, T, hs, seed=0):
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(k0, (B, H, T, hs), jnp.bfloat16)
    k = jax.random.normal(k1, (B, H, T, hs), jnp.bfloat16)
    v = jax.random.normal(k2, (B, H, T, hs), jnp.bfloat16)
    return q, k, v


def ref_sdpa(q, k, v):
    """fp32 einsum reference for numerics checks (causal, 1/sqrt(hs))."""
    hs = q.shape[-1]
    qf, kf, vf = (a.astype(jnp.float32) for a in (q, k, v))
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) / (hs**0.5)
    T = q.shape[2]
    mask = jnp.tril(jnp.ones((T, T), bool))
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, vf)


def variants(B, H, T, hs):
    out = {}

    from gpt2_vision_language_tpu.ops.flash_attention import flash_attention
    from jax.experimental.pallas.ops.tpu import flash_attention as ufa

    # a same-config warmup slot absorbs the first-measurement penalty
    # (order effects of ~20% were observed between cold/warm processes)
    out["warmup_ours"] = lambda q, k, v: flash_attention(q, k, v, causal=True)
    out["ours"] = lambda q, k, v: flash_attention(q, k, v, causal=True)

    scale = 1.0 / (hs**0.5)
    out["upstream_flash"] = lambda q, k, v: ufa.flash_attention(
        q, k, v, causal=True, sm_scale=scale
    )
    # Upstream with our block sizes for a like-for-like granularity check.
    bs = ufa.BlockSizes(
        block_q=512, block_k_major=512, block_k=512, block_b=1,
        block_q_major_dkv=512, block_k_major_dkv=512, block_k_dkv=512,
        block_q_dkv=512, block_k_major_dq=512, block_k_dq=512,
        block_q_dq=512,
    )
    out["upstream_flash_b512"] = lambda q, k, v: ufa.flash_attention(
        q, k, v, causal=True, sm_scale=scale, block_sizes=bs
    )

    # Apples-to-apples with OUR fwd, which always emits lse for the custom
    # VJP: upstream's residual-saving fwd (the one its own vjp dispatches —
    # flash_attention.py::_flash_attention_fwd) also writes l and m.
    def upstream_b512_res(q, k, v):
        o, l, m = ufa._flash_attention_impl(
            q, k, v, None, None, True, True, scale,
            bs.block_b, bs.block_q, bs.block_k_major, bs.block_k, False,
        )
        return o

    out["upstream_flash_b512_res"] = upstream_b512_res

    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    mask = sm.MultiHeadMask([sm.CausalMask((T, T)) for _ in range(H)])
    kernel = sk.make_splash_mha_single_device(mask=mask)

    def splash(q, k, v):
        # splash consumes pre-scaled q, per-batch (H, T, hs); vmap batch.
        return jax.vmap(kernel)(q * scale, k, v)

    out["splash"] = splash

    out["xla_sdpa"] = lambda q, k, v: _xla_sdpa(q, k, v)
    return out


def ours_sweep_variants():
    """Scheduling variants of OUR kernel only (fwd A/B follow-up)."""
    from gpt2_vision_language_tpu.ops.flash_attention import flash_attention

    mk = lambda **kw: (lambda q, k, v: flash_attention(q, k, v, causal=True, **kw))
    return {
        "ours_512_512_resident": mk(block_q=512, block_k=512, stream_kv=False),
        "ours_512_1024_resident": mk(block_q=512, block_k=1024, stream_kv=False),
        "ours_1024_512_resident": mk(block_q=1024, block_k=512, stream_kv=False),
        "ours_1024_1024_resident": mk(block_q=1024, block_k=1024, stream_kv=False),
        "ours_512_512_streamed": mk(block_q=512, block_k=512, stream_kv=True),
        "ours_512_256_streamed": mk(block_q=512, block_k=256, stream_kv=True),
        "ours_256_256_streamed": mk(block_q=256, block_k=256, stream_kv=True),
    }


def _xla_sdpa(q, k, v):
    hs = q.shape[-1]
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / (hs**0.5)
    T = q.shape[2]
    mask = jnp.tril(jnp.ones((T, T), bool))
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def timed_run(fn, q, k, v, iters, fwd_only):
    if fwd_only:
        def body(c, _):
            o = fn(c, k, v)
            return (c + 1e-6 * o).astype(c.dtype), jnp.float32(0)
    else:
        def loss(q_, k_, v_):
            o = fn(q_, k_, v_)
            return jnp.sum(o.astype(jnp.float32) ** 2) * 1e-6

        grad = jax.grad(loss, argnums=(0, 1, 2))

        def body(c, _):
            dq, dk, dv = grad(c, k, v)
            return (c + 1e-6 * dq).astype(c.dtype), jnp.float32(0)

    @jax.jit
    def run(q0):
        final, _ = jax.lax.scan(body, q0, None, length=iters)
        return jnp.sum(final.astype(jnp.float32))

    r = run(q)  # compile + warm
    float(r)
    t0 = time.perf_counter()
    r = run(q)
    float(r)
    t1 = time.perf_counter()
    return (t1 - t0) / iters * 1e3  # ms per iteration


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--shape", type=int, nargs=4, default=[8, 12, 1024, 64])
    ap.add_argument("--only", type=str, default=None)
    ap.add_argument("--ours-sweep", action="store_true")
    args = ap.parse_args()
    B, H, T, hs = args.shape
    q, k, v = make_inputs(B, H, T, hs)
    print(f"backend={jax.default_backend()} shape B={B} H={H} T={T} hs={hs}")

    vs = ours_sweep_variants() if args.ours_sweep else variants(B, H, T, hs)
    ref = None
    rows = []
    for name, fn in vs.items():
        if args.only and not any(
            s and s in name for s in args.only.split(",")
        ):
            continue
        try:
            o = jax.jit(fn)(q, k, v)
            if ref is None and name != "ours":
                ref = np.asarray(ref_sdpa(q, k, v))
            if ref is not None:
                err = float(
                    np.max(np.abs(np.asarray(o, np.float32) - ref))
                )
            else:
                ref = np.asarray(ref_sdpa(q, k, v))
                err = float(
                    np.max(np.abs(np.asarray(o, np.float32) - ref))
                )
            ms = timed_run(fn, q, k, v, args.iters, args.fwd_only)
            # causal flops: fwd 4*B*H*T^2*hs*0.5 ; fwd+bwd = 3.5x fwd
            fwd_fl = 4 * B * H * T * T * hs * 0.5
            fl = fwd_fl if args.fwd_only else 3.5 * fwd_fl
            tfs = fl / (ms * 1e-3) / 1e12
            rows.append((name, ms, tfs, err))
            print(f"{name:24s} {ms:8.3f} ms/iter  {tfs:6.1f} TF/s  max_err {err:.3e}")
        except Exception as e:
            print(f"{name:24s} FAILED: {type(e).__name__}: {e}")
    print()
    mode = "fwd" if args.fwd_only else "fwd+bwd"
    for name, ms, tfs, err in rows:
        print(f"| {name} | {mode} | {ms:.3f} | {tfs:.1f} |")


if __name__ == "__main__":
    main()
