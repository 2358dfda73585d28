"""Measure the tunneled chip's EFFECTIVE HBM budget by allocation ladder.

The 1558M single-chip recipe is AOT-verified at 12.95 GiB against the
v5e's nominal 15.75 GiB, yet every runtime dispatch has OOM'd
(ROUND_NOTES attempt ledger) — and `device.memory_stats()` comes back
empty through the axon tunnel, so the real `bytes_limit` has never been
observed. This probe measures it directly: allocate `--step-mib` chunks
one at a time, scalar-syncing each (float(x[0]) — the only true sync on
the tunnel), until either `--max-gib` cumulative is reached (budget >=
max proven) or an allocation raises RESOURCE_EXHAUSTED (budget
bracketed to one step). On OOM every reference is dropped first so the
failed ladder leaves the device empty.

A pure allocation failure (fill program whose output cannot be placed)
is the least wedge-prone OOM available — nothing else is in flight —
but treat a failed run as a possible wedge anyway (verify skill: 35+
min hands-off, then ONE probe).

Usage: python tools/hbm_limit_probe.py [--step-mib 256] [--max-gib 15.6]
"""

from __future__ import annotations

import argparse
import gc
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--step-mib", type=int, default=256)
    ap.add_argument("--max-gib", type=float, default=15.6)
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}  step={args.step_mib} MiB  "
          f"cap={args.max_gib} GiB", flush=True)

    step_elems = args.step_mib * (1 << 20) // 4  # f32 elements per chunk
    held = []
    total = 0
    try:
        while total + args.step_mib * (1 << 20) <= args.max_gib * (1 << 30):
            # distinct fill value per chunk: no buffer dedup possible
            x = jnp.full((step_elems,), float(len(held) + 1), jnp.float32)
            float(x[0])  # true sync through the tunnel
            held.append(x)
            total += args.step_mib * (1 << 20)
            print(f"  ok  {total / (1 << 30):6.2f} GiB", flush=True)
        print(f"RESULT: budget >= {total / (1 << 30):.2f} GiB "
              f"(cap reached, no OOM)", flush=True)
    except Exception as e:
        held.clear()
        gc.collect()
        print(f"RESULT: OOM after {total / (1 << 30):.2f} GiB; next "
              f"{args.step_mib} MiB chunk failed -> effective budget in "
              f"[{total / (1 << 30):.2f}, "
              f"{(total + args.step_mib * (1 << 20)) / (1 << 30):.2f}) GiB",
              flush=True)
        print(f"  error: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
