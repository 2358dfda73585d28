"""Trace-profile the pretrain micro-step or the KV decode step on the
real TPU and print a per-op device-time table.

Automates the ROUND_NOTES trace recipe: jax.profiler.trace around the
target, parse `plugins/profile/*/*.trace.json.gz`, keep events on the
device's 'XLA Ops' thread, group by op name prefix, and print total
device ms per group — the itemization VERDICT r3 weak #1/#3 asked for
("misc ~6 ms" in the 58.9 ms micro profile; the never-profiled decode
step).

Usage (real TPU; takes a few minutes of compile):
  python tools/profile_trace.py micro   [--steps 2]
  python tools/profile_trace.py decode  [--batch 50] [--new 24]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_trace(tmpdir, min_ms=0.02):
    """Per-op EXCLUSIVE device time from the 'XLA Ops' thread.

    Events on that thread nest (a `while` span covers every op of its
    body), so naive duration sums double-count control flow: the r4 decode
    trace read "while 50% / fusion 41%" when the real story was one gather
    fusion at 75%. A nesting stack subtracts each child's duration from
    its parent, keeps individual op names (fusion.199 != fusion.200 — the
    .N suffix IS the identity), and keeps each op's `long_name` HLO +
    `source` file:line for attribution."""
    paths = glob.glob(os.path.join(tmpdir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {tmpdir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # find the device pid and its 'XLA Ops' tid
    pid_names = {e["pid"]: e["args"]["name"] for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}
    tid_names = {(e["pid"], e["tid"]): e["args"]["name"] for e in events
                 if e.get("ph") == "M" and e.get("name") == "thread_name"}
    op_tids = {(p, t) for (p, t), n in tid_names.items()
               if p in dev_pids and "XLA Ops" in n}
    ops = sorted(
        (e for e in events
         if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids),
        key=lambda e: e["ts"],
    )
    excl = collections.Counter()
    count = collections.Counter()
    meta = {}
    stack = []  # (end_ts, name) — events on one thread nest properly
    for e in ops:
        ts, dur = e["ts"], e.get("dur", 0)
        while stack and stack[-1][0] <= ts:
            stack.pop()
        if stack:
            excl[stack[-1][1]] -= dur / 1e3
        name = e["name"]
        excl[name] += dur / 1e3
        count[name] += 1
        if name not in meta:
            a = e.get("args", {})
            meta[name] = {
                "hlo": a.get("long_name", "")[:160],
                "source": a.get("source", ""),
                "category": a.get("hlo_category", ""),
            }
        stack.append((ts + dur, name))
    total = sum(excl.values())
    return excl, count, meta, total


def print_table(excl, count, meta, total, top=30):
    print(f"\n{'device ms':>10}  {'%':>6}  {'n':>6}  op [category] source")
    shown = 0.0
    for name, ms in excl.most_common(top):
        if ms < 0.005 * total and shown / max(total, 1e-9) > 0.97:
            break
        m = meta.get(name, {})
        src = m.get("source", "")
        src = re.sub(r"^/root/repo/", "", src)
        print(f"{ms:10.3f}  {100*ms/total:6.2f}  {count[name]:6d}  "
              f"{name[:46]} [{m.get('category','')}] {src[:60]}")
        shown += ms
    print(f"{total:10.3f}  100.00  TOTAL device time (exclusive)")
    print("\nhlo of top 8:")
    for name, _ in excl.most_common(8):
        print(f"  {name}: {meta.get(name, {}).get('hlo','')}")


def run_micro(args):
    """The bench.py micro shape: 124M, B=8, T=1024, unrolled no-remat
    fwd+bwd+accum (the 58.9 ms/micro profile's unit of account)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpt2_vision_language_tpu.core.config import GPTConfig
    from gpt2_vision_language_tpu.models import gpt2

    # bench.py's exact config: unrolled layer loop, no remat, ce_chunks=1
    cfg = GPTConfig(unroll_layers=True)
    params = jax.jit(
        lambda: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16),
            gpt2.init(jax.random.PRNGKey(0), cfg),
        )
    )()

    def micro_grad(p, x, y, gsum):
        def loss_fn(p):
            return gpt2.loss(p, x, cfg, targets=y, remat=False, ce_chunks=1)

        l, g = jax.value_and_grad(loss_fn)(p)
        gsum = jax.tree.map(lambda a, b: a + b.astype(a.dtype), gsum, g)
        return l, gsum

    fn = jax.jit(micro_grad, donate_argnums=(3,))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, cfg.vocab_size, (8, 1024)), jnp.int32)
    y = jnp.asarray(np.roll(np.asarray(x), -1, -1))
    gsum = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.bfloat16), params)
    l, gsum = fn(params, x, y, gsum)  # compile
    print(f"warm loss {float(l):.4f}", flush=True)

    tmpdir = tempfile.mkdtemp(prefix="trace_micro_")
    with jax.profiler.trace(tmpdir):
        for _ in range(args.steps):
            l, gsum = fn(params, x, y, gsum)
        _ = float(l)
    excl, count, meta, total = parse_trace(tmpdir)
    print(f"\n=== pretrain micro (B=8 T=1024, {args.steps} micros) ===")
    print(f"per-micro device time: {total/args.steps:.3f} ms")
    print_table(excl, count, meta, total)


def run_decode(args):
    """The bench_decode shape: 124M, 33-token visual prefix + 3-token
    prompt, batch B, `--new` sampled tokens through the KV-cached scan."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpt2_vision_language_tpu.core.config import GPTConfig
    from gpt2_vision_language_tpu.infer.decode import Decoder
    from gpt2_vision_language_tpu.infer.sampling import sample_top_p, sample_top_p_fast
    from gpt2_vision_language_tpu.models import gpt2

    cfg = GPTConfig()
    init = lambda: gpt2.init(jax.random.PRNGKey(0), cfg)
    if args.param_dtype == "bfloat16":
        params = jax.jit(lambda: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16), init()))()
    else:
        params = jax.jit(init)()
    dec = Decoder(
        cfg,
        sample_fn=sample_top_p_fast if args.sampler == 'fast' else sample_top_p,
    )
    b, m = args.batch, 33
    rng = np.random.RandomState(0)
    prefix = jnp.asarray(rng.randn(b, m, cfg.n_embd), jnp.float32)
    prompt = jnp.asarray([[32, 1212, 318]] * b, jnp.int32)  # "A photo of"

    toks, _ = dec.generate(
        params, prompt, args.new, jax.random.PRNGKey(0),
        prefix_embeds=prefix,
    )
    _ = np.asarray(toks)  # compile + sync
    print("warm decode done", flush=True)

    tmpdir = tempfile.mkdtemp(prefix="trace_decode_")
    with jax.profiler.trace(tmpdir):
        toks, _ = dec.generate(
            params, prompt, args.new, jax.random.PRNGKey(1),
            prefix_embeds=prefix,
        )
        _ = np.asarray(toks)
    excl, count, meta, total = parse_trace(tmpdir)
    n_steps = args.new - 1
    print(f"\n=== decode (B={b}, prefix 33+3, {args.new} new, "
          f"params {args.param_dtype}) ===")
    # roofline: bytes that MUST move per decode step
    pbytes = sum(l.size * l.dtype.itemsize for l in jax.tree.leaves(params))
    maxt = m + 3 + args.new
    cbytes = 2 * cfg.n_layer * b * cfg.n_head * maxt * cfg.head_dim * 2
    print(f"params {pbytes/1e9:.3f} GB -> {pbytes/819e9*1e3:.3f} ms/step at "
          f"819 GB/s; cache {cbytes/1e6:.1f} MB -> {cbytes/819e9*1e3:.3f} ms")
    print(f"measured: {total:.3f} ms total, "
          f"~{total/ (n_steps + 2):.3f} ms per step incl. prefills")
    print_table(excl, count, meta, total)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("micro")
    p1.add_argument("--steps", type=int, default=2)
    p2 = sub.add_parser("decode")
    p2.add_argument("--batch", type=int, default=50)
    p2.add_argument("--new", type=int, default=24)
    p2.add_argument("--param-dtype", default="float32",
                    choices=["float32", "bfloat16"])
    p2.add_argument("--sampler", default="fast", choices=["fast", "sorted"],
                    help="fast = serving default (bisection top-p)")
    args = ap.parse_args()
    (run_micro if args.cmd == "micro" else run_decode)(args)


if __name__ == "__main__":
    main()
