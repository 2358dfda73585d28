"""Validate the FULL GPT-2 1558M train step TP-sharded on a CPU mesh.

Runs one real train step (grad accum 2, AdamW, fp32) at the exact 1558M
parameter shapes (`core/config.py:GPT2_1558M`) twice — on a (data=2,
model=4) mesh with Megatron column/row parameter shardings, and on a
single device — and pins the sharded loss/grad-norm to the single-device
run. Complements the single-chip artifact (`runs/r3_1558m/`): this is the
multi-chip path at full model scale, executable without TPU hardware
(VERDICT r2 "next #5" validation clause).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/validate_1558m_tp_cpu.py [--seq-len 64]
      [--opt-state-dtype int8] [--layerwise]
(~11 GB host RAM for two fp32 param trees + optimizer state.
--opt-state-dtype int8 --layerwise together pin the full one-chip
memory recipe composed with tp=4 model parallelism at 1558M scale.)
"""
import argparse
import os
import sys
import time

# XLA:CPU's collective rendezvous hard-SIGABRTs after 40 s if device
# threads starve on a loaded 1-core host (tests/conftest.py has the full
# story) — this run takes ~30+ min sharded, so raise the timeouts BEFORE
# backend init. Reproduced 2026-08-20: the tp=4 step died at op_id=16's
# all-gather when a TPU trace ran concurrently.
_flags = os.environ.get("XLA_FLAGS", "")
for _f in (
    "--xla_cpu_collective_timeout_seconds=1200",
    "--xla_cpu_collective_call_terminate_timeout_seconds=1200",
):
    if _f.split("=")[0] not in _flags:
        _flags += " " + _f
os.environ["XLA_FLAGS"] = _flags.strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, ".")

from gpt2_vision_language_tpu.core.config import (  # noqa: E402
    GPT2_1558M,
    OptimizerConfig,
    ScheduleConfig,
)
from gpt2_vision_language_tpu.core.precision import FP32_POLICY  # noqa: E402
from gpt2_vision_language_tpu.models import gpt2  # noqa: E402
from gpt2_vision_language_tpu.parallel.mesh import (  # noqa: E402
    make_mesh,
    shard_batch,
)
from gpt2_vision_language_tpu.parallel.sharding import shard_params  # noqa: E402
from gpt2_vision_language_tpu.train.optimizer import adamw_init  # noqa: E402
from gpt2_vision_language_tpu.train.step import make_train_step  # noqa: E402


def run_step(params, batch, cfg, mesh=None, state_dtype=None,
             layerwise=False):
    def loss_fn(p, micro):
        _, l = gpt2.apply(
            p, micro["x"], cfg, targets=micro["y"], policy=FP32_POLICY
        )
        return l

    lw_fn = None
    if layerwise:
        # the 1558M one-chip recipe's reverse-scan grad streaming
        # (models/gpt2.py::loss_grad_layerwise) — with --tp this run pins
        # the full memory stack composed with model parallelism
        def lw_fn(p, micro, gsum, acc):
            return gpt2.loss_grad_layerwise(
                p, micro["x"], cfg, targets=micro["y"], gsum=gsum, acc=acc,
                policy=FP32_POLICY,
            )

    opt = adamw_init(params, state_dtype=state_dtype)
    if mesh is not None and state_dtype is not None:
        # int8 x TP: the flat q8 {q, s} buffers ride a block-aligned
        # "model" sharding (parallel/sharding.py moment_specs) — this run
        # IS the 1558M-scale pin for that composition (VERDICT r3 #6)
        from gpt2_vision_language_tpu.parallel.sharding import shard_moments

        opt["m"] = shard_moments(params, opt["m"], mesh)
        opt["v"] = shard_moments(params, opt["v"], mesh)
    step = make_train_step(
        loss_fn,
        OptimizerConfig(),
        ScheduleConfig(max_lr=1e-4, min_lr=1e-5, warmup_steps=2, max_steps=10),
        decay_mask=gpt2.decay_mask(params),
        donate=False,  # params are reused for the second (sharded) run
        layerwise_loss_grad=lw_fn,
    )
    t0 = time.time()
    _, _, metrics = step(params, opt, batch, jnp.int32(0))
    loss = float(metrics["loss"])
    norm = float(metrics["grad_norm"])
    print(f"  loss {loss:.6f} grad_norm {norm:.6f} ({time.time()-t0:.0f}s)")
    return loss, norm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq-len", type=int, default=64)
    ap.add_argument("--tp", type=int, default=4)
    ap.add_argument(
        "--opt-state-dtype", default=None, choices=[None, "int8", "bfloat16"],
        help="moment storage for BOTH runs (int8 exercises q8 x TP)",
    )
    ap.add_argument(
        "--layerwise", action="store_true",
        help="reverse-scan layerwise grad streaming for BOTH runs "
             "(with --tp: pins the 1558M recipe x model parallelism)",
    )
    args = ap.parse_args()
    state_dtype = jnp.dtype(args.opt_state_dtype) if args.opt_state_dtype else None

    n = len(jax.devices())
    assert n >= args.tp, f"need {args.tp} devices, have {n} (set XLA_FLAGS)"
    cfg = GPT2_1558M
    T, accum, B = args.seq_len, 2, 2
    print(f"devices={n} model=1558M T={T} accum={accum} B={B}", flush=True)

    print("init params (fp32, full 1558M shapes)...", flush=True)
    params = jax.jit(lambda: gpt2.init(jax.random.PRNGKey(1337), cfg))()
    print(f"  {gpt2.param_count(params):,} parameters", flush=True)

    rng = np.random.RandomState(0)
    x = rng.randint(0, cfg.vocab_size, size=(accum, B, T), dtype=np.int32)
    batch_host = {"x": x, "y": np.roll(x, -1, axis=-1)}

    print(f"single-device step (opt_state_dtype={args.opt_state_dtype})...", flush=True)
    ref = run_step(
        params, jax.tree.map(jnp.asarray, batch_host), cfg,
        state_dtype=state_dtype, layerwise=args.layerwise,
    )

    print(f"tp={args.tp} sharded step...", flush=True)
    mesh = make_mesh(n, ("data", "model"), shape=(n // args.tp, args.tp))
    sharded = shard_params(params, mesh)
    del params
    batch = shard_batch(mesh, batch_host, leading_accum_axis=True)
    got = run_step(
        sharded, batch, cfg, mesh, state_dtype=state_dtype,
        layerwise=args.layerwise,
    )

    np.testing.assert_allclose(got[0], ref[0], rtol=2e-6)
    np.testing.assert_allclose(got[1], ref[1], rtol=2e-5)
    print(
        f"OK: tp={args.tp} 1558M train step matches single-device "
        f"(loss {got[0]:.6f} vs {ref[0]:.6f}, "
        f"norm {got[1]:.6f} vs {ref[1]:.6f})"
    )


if __name__ == "__main__":
    main()
