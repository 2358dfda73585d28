"""A/B the fused-CE forward implementations on the real TPU at the
pretrain bench shape (N=8192, D=768, V=50304, bf16 policy).

Contenders:
  * xla:    the chunked scan forward (logits tile -> HBM -> logsumexp)
  * pallas: the stats-in-epilogue kernel (ops/fused_ce.py _ce_fwd_kernel)

Both run fwd-only and fwd+bwd (the backward is the shared XLA recompute,
so the fwd+bwd delta isolates the forward). All data is generated
device-side (the axon tunnel moves ~1.3 MB/s); ITERS iterations ride one
jitted lax.scan so per-dispatch tunnel latency amortizes to noise
(ROUND_NOTES: standalone microbenchmarks under ~1 ms/call are garbage
through the tunnel).

  python tools/ab_ce.py [--iters 16] [--n 8192] [--d 768] [--v 50304]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--v", type=int, default=50304)
    ap.add_argument("--ce-chunks", type=int, default=1,
                    help="bench.py uses 1 at 124M")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gpt2_vision_language_tpu.core.precision import DEFAULT_POLICY
    from gpt2_vision_language_tpu.ops import fused_ce

    n, d, v, iters = args.n, args.d, args.v, args.iters
    print(f"backend={jax.default_backend()} N={n} D={d} V={v} iters={iters}")
    print("blocks:", fused_ce._ce_block_sizes(n, d, v))

    key = jax.random.PRNGKey(0)

    @jax.jit
    def init(key):
        kx, kw, kt = jax.random.split(key, 3)
        xs = (
            jax.random.normal(kx, (iters, n, d), jnp.bfloat16) * 0.3
        ).astype(jnp.float32)
        w = jax.random.normal(kw, (v, d), jnp.float32) * 0.02
        ts = jax.random.randint(kt, (iters, n), 0, v, jnp.int32)
        return xs, w, ts

    xs, w, ts = init(key)
    jax.block_until_ready(w)

    def make_fwd(use_pallas):
        f = fused_ce._make(args.ce_chunks, DEFAULT_POLICY,
                           "always" if use_pallas else "never")

        @jax.jit
        def run(xs, w, ts):
            def body(acc, inp):
                x, t = inp
                return acc + jnp.sum(f(x, w, t)), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), (xs, ts))
            return acc

        return run

    def make_fwdbwd(use_pallas):
        f = fused_ce._make(args.ce_chunks, DEFAULT_POLICY,
                           "always" if use_pallas else "never")

        @jax.jit
        def run(xs, w, ts):
            def body(acc, inp):
                x, t = inp
                loss, (dx, dw) = jax.value_and_grad(
                    lambda x, w: jnp.mean(f(x, w, t)), (0, 1)
                )(x, w)
                return (
                    acc[0] + loss,
                    acc[1] + jnp.sum(dx * dx),
                    acc[2] + jnp.sum(dw * dw),
                ), None

            acc, _ = jax.lax.scan(
                body, (jnp.float32(0),) * 3, (xs, ts)
            )
            return acc[0]

        return run

    results = {}
    for name, maker in [("fwd", make_fwd), ("fwd+bwd", make_fwdbwd)]:
        for impl, use_pallas in [("xla", False), ("pallas", True)]:
            run = maker(use_pallas)
            t0 = time.time()
            val = float(run(xs, w, ts))  # compile + run
            compile_s = time.time() - t0
            t0 = time.time()
            val = float(run(xs, w, ts))
            dt = (time.time() - t0) / iters * 1e3
            results[(name, impl)] = (dt, val)
            print(f"{name:8s} {impl:6s} {dt:8.3f} ms/call "
                  f"(acc {val:.4f}, compile {compile_s:.0f}s)")

    for name in ("fwd", "fwd+bwd"):
        a, b = results[(name, "xla")][0], results[(name, "pallas")][0]
        print(f"{name}: pallas/xla = {b / a:.3f}x  (delta {a - b:+.3f} ms)")


if __name__ == "__main__":
    main()
