"""AOT HBM probe for the 1558M single-chip recipe (no execution, no wedge).

Builds the EXACT attempt-5 state (bf16 params, int8 moments, bf16 SR grad
accumulators, pinned layouts, split_accum) the way train/pretrain.py does,
then lowers + compiles the accum-chunk and optimizer-update programs and
prints each executable's memory_analysis() — argument/output/temp/alias
bytes — plus the resident-state total. Nothing is ever dispatched to the
device except the state allocation itself (~8.8 GiB, fits alone), so a
config that would OOM at runtime can be diagnosed without wedging the
tunneled chip (verify skill: a device-side runtime OOM wedges it 30+ min).

--ladder adds STAGED free-HBM measurement (attempts #5-#8 all OOM'd at
AOT-accounted footprints 4+ GiB below the fresh-process 15.5 GiB budget,
so something resident is invisible to both memory_stats — empty through
the tunnel — and memory_analysis). After each stage (param init, full
state, each executable load, optional --dispatch) it allocates 256 MiB
filler chunks up to `15.6 - accounted - margin`: reaching the cap proves
the stage clean; an OOM brackets the unaccounted bytes to one chunk.
Ladder buffers are freed before the next stage. A filler-allocation OOM
is the least wedge-prone kind (nothing in flight), --dispatch is the
only stage that can wedge (runtime OOM mid-execution).

Usage: python tools/mem_probe_1558m.py [--micro-batch 1] [--chunk 4]
       [--layerwise] [--ladder] [--dispatch]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def gib(n: int) -> str:
    return f"{n / (1 << 30):.3f} GiB"


def devmem(tag: str) -> None:
    """Live device HBM counters, if the backend exposes them."""
    try:
        ms = jax.local_devices()[0].memory_stats()
    except Exception as e:  # axon tunnel may not forward stats
        print(f"[mem:{tag}] memory_stats unavailable: {e}")
        return
    if not ms:
        print(f"[mem:{tag}] memory_stats empty")
        return
    keys = (
        "bytes_in_use",
        "peak_bytes_in_use",
        "bytes_reserved",
        "largest_free_block_bytes",
        "bytes_limit",
    )
    parts = [f"{k}={gib(ms[k])}" for k in keys if k in ms]
    extra = [k for k in ms if k not in keys]
    print(f"[mem:{tag}] " + "  ".join(parts) + (f"  (+{extra})" if extra else ""))


BUDGET_GIB = 15.6  # fresh-process ladder measured 15.50 OK (ROUND_NOTES)


def ladder(tag: str, accounted_bytes: int, margin_gib: float = 0.35) -> None:
    """Allocate 256 MiB filler chunks up to (BUDGET - accounted - margin).

    Cap reached  -> stage holds no unaccounted memory (within margin).
    OOM before   -> unaccounted = cap_gib - reached_gib (+- one chunk).
    Buffers are freed (and a dummy sync run) before returning.
    """
    import gc

    step = 256 * (1 << 20)
    cap = BUDGET_GIB * (1 << 30) - accounted_bytes - margin_gib * (1 << 30)
    cap = min(cap, 14.0 * (1 << 30))  # never probe more than the state gap
    if cap < step:
        print(f"[ladder:{tag}] cap < one chunk, skipping")
        return
    held = []
    total = 0
    print(
        f"[ladder:{tag}] accounted {gib(accounted_bytes)}, probing up to "
        f"{cap / (1 << 30):.2f} GiB free...",
        flush=True,
    )
    try:
        while total + step <= cap:
            x = jnp.full((step // 4,), float(len(held) + 1), jnp.float32)
            float(x[0])  # true sync through the tunnel
            held.append(x)
            total += step
        print(
            f"[ladder:{tag}] CLEAN: {total / (1 << 30):.2f} GiB free "
            f"(cap reached; accounted + free covers the budget)",
            flush=True,
        )
    except Exception as e:
        print(
            f"[ladder:{tag}] OOM at {total / (1 << 30):.2f} GiB free of "
            f"{cap / (1 << 30):.2f} expected -> "
            f"{(cap - total) / (1 << 30):.2f} GiB UNACCOUNTED (+-0.25)",
            flush=True,
        )
        print(f"  error: {type(e).__name__}: {str(e)[:2000]}", flush=True)
    finally:
        held.clear()
        gc.collect()
        try:
            # force the frees to land before the caller's next big alloc
            float(jnp.float32(0.0) + 1.0)
        except Exception:
            pass  # a saturated device can OOM even this tiny sync


def analyze(name: str, compiled) -> int:
    ma = compiled.memory_analysis()
    if ma is None:
        print(f"[{name}] memory_analysis unavailable")
        return 0
    arg = ma.argument_size_in_bytes
    out = ma.output_size_in_bytes
    tmp = ma.temp_size_in_bytes
    alias = ma.alias_size_in_bytes
    print(
        f"[{name}] arg {gib(arg)}  out {gib(out)}  alias {gib(alias)}  "
        f"TEMP {gib(tmp)}  (arg+out-alias+temp = "
        f"{gib(arg + out - alias + tmp)})"
    )
    return tmp


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--micro-batch", type=int, default=1)
    p.add_argument("--chunk", type=int, default=4)
    p.add_argument(
        "--sweep",
        default="",
        help="semicolon list of B,chunk pairs to probe in one process "
        "(e.g. '1,1;1,2;2,1'); overrides --micro-batch/--chunk",
    )
    p.add_argument("--model", default="1558M")
    p.add_argument(
        "--layerwise",
        action="store_true",
        help="probe the layerwise reverse-scan grad path "
        "(loss_grad_layerwise) instead of value_and_grad + remat",
    )
    p.add_argument(
        "--cpu",
        action="store_true",
        help="pin the CPU backend (wiring smoke test; use --model 124M)",
    )
    p.add_argument(
        "--ladder",
        action="store_true",
        help="measure FREE HBM after each stage by filler allocation "
        "(finds resident memory invisible to AOT analysis)",
    )
    p.add_argument(
        "--dispatch",
        action="store_true",
        help="with --ladder: dispatch ONE synced accum chunk and ladder "
        "again (the only stage that can wedge the chip on OOM)",
    )
    p.add_argument(
        "--budget-gib",
        type=float,
        default=None,
        help="override the assumed HBM budget for the ladder (use a "
        "small value for CPU smoke tests)",
    )
    p.add_argument(
        "--commit",
        action="store_true",
        help="replicate split_step's first-call commit (leaf-by-leaf "
        "device_put into the pinned formats) while keeping the old "
        "trees referenced — measures whether commit COPIES (the "
        "caller's frame keeps the old tree alive all step long)",
    )
    p.add_argument(
        "--skip-programs",
        action="store_true",
        help="exit before lowering the update/accum programs (fast "
        "state-only probing)",
    )
    args = p.parse_args()
    if args.budget_gib is not None:
        global BUDGET_GIB
        BUDGET_GIB = args.budget_gib
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gpt2_vision_language_tpu.core.config import (
        GPT2_124M,
        GPT2_350M,
        GPT2_774M,
        GPT2_1558M,
        PretrainConfig,
    )
    from gpt2_vision_language_tpu.core.precision import DEFAULT_POLICY
    from gpt2_vision_language_tpu.models import gpt2
    from gpt2_vision_language_tpu.data.fineweb import split_rows_on_device
    from gpt2_vision_language_tpu.parallel.mesh import make_mesh, shard_batch
    from gpt2_vision_language_tpu.train.optimizer import adamw_init
    from gpt2_vision_language_tpu.train.step import (
        make_train_step,
        default_formats,
    )

    preset = {
        "124M": GPT2_124M,
        "350M": GPT2_350M,
        "774M": GPT2_774M,
        "1558M": GPT2_1558M,
    }[args.model]
    cfg = PretrainConfig()
    model_cfg = preset
    if args.sweep:
        combos = [
            tuple(int(v) for v in pair.split(","))
            for pair in args.sweep.split(";")
            if pair
        ]
    else:
        combos = [(args.micro_batch, args.chunk)]
    print(f"model {args.model}  combos={combos}  dev={jax.devices()[0]}")

    mesh = make_mesh()
    policy = DEFAULT_POLICY

    def loss_fn(params, micro):
        x, y = split_rows_on_device(micro["rows"])
        return gpt2.loss(
            params, x, model_cfg, targets=y, policy=policy, remat=True
        )

    def _build_params():
        p0 = gpt2.init(jax.random.PRNGKey(42), model_cfg)
        return jax.tree.map(lambda x: x.astype(jnp.bfloat16), p0)

    devmem("boot")
    params = jax.jit(_build_params)()
    jax.block_until_ready(jax.tree.leaves(params)[0])
    devmem("post-init (init executable still loaded)")
    jax.clear_caches()
    devmem("post-clear_caches")
    psz0 = sum(x.nbytes for x in jax.tree.leaves(params))
    if args.ladder:
        ladder("post-init+clear", psz0)
    opt_state = adamw_init(params, state_dtype=jnp.dtype("int8"))

    psz = sum(x.nbytes for x in jax.tree.leaves(params))
    osz = sum(
        x.nbytes for x in jax.tree.leaves(opt_state) if hasattr(x, "nbytes")
    )
    print(f"resident: params {gib(psz)}  opt_state {gib(osz)}")

    pf = default_formats(params)
    io_formats = (pf, default_formats(opt_state))
    layerwise_fn = None
    if args.layerwise:

        def layerwise_fn(lw_params, micro, gsum, acc):
            x, y = split_rows_on_device(micro["rows"])
            return gpt2.loss_grad_layerwise(
                lw_params, x, model_cfg, targets=y, gsum=gsum, acc=acc,
                policy=policy,
            )

    train_step = make_train_step(
        loss_fn,
        cfg.optimizer,
        cfg.schedule,
        decay_mask=gpt2.decay_mask(params),
        grad_accum_dtype="bfloat16",
        nan_guard=False,
        io_formats=io_formats,
        split_accum=args.chunk,
        layerwise_loss_grad=layerwise_fn,
    )

    carry = train_step.debug_init_carry(params)
    gsz = sum(x.nbytes for x in jax.tree.leaves(carry[0]))
    print(f"resident: gsum {gib(gsz)}  total state {gib(psz + osz + gsz)}")
    devmem("post-state")
    state = psz + osz + gsz
    if args.ladder:
        ladder("post-state", state)

    if args.commit:
        # EXACTLY what split_step's first call does (train/step.py
        # committed[0] block), with the old trees still referenced the
        # way run_pretrain's frame keeps them alive during the call.
        def bufptr(x):
            try:
                return x.unsafe_buffer_pointer()
            except Exception:
                return None

        old_p0 = jax.tree.leaves(params)[0]
        params2 = jax.tree.map(jax.device_put, params, pf)
        opt2 = jax.tree.map(jax.device_put, opt_state, io_formats[1])
        jax.block_until_ready(jax.tree.leaves(params2)[0])
        new_p0 = jax.tree.leaves(params2)[0]
        p_old, p_new = bufptr(old_p0), bufptr(new_p0)
        if p_old is not None:
            print(
                f"[commit] leaf0 buffer {'ALIASED (no copy)' if p_old == p_new else 'COPIED'}"
                f"  old=0x{p_old:x} new=0x{p_new:x}",
                flush=True,
            )
        else:
            print("[commit] unsafe_buffer_pointer unavailable; ladder decides")
        if args.ladder:
            # accounted only for ONE copy of each tree: if commit copied,
            # the ladder OOMs ~5.85 GiB early (old params+opt still live)
            ladder("post-commit (old trees still referenced)", state)
        params, opt_state = params2, opt2
        del params2, opt2, old_p0, new_p0
        if args.ladder:
            ladder("post-commit (old trees dropped)", state)

    if args.skip_programs:
        print("(--skip-programs: done)")
        return

    step_idx = jnp.int32(0)
    start = jnp.int32(0)

    print("lowering update program...", flush=True)
    upd = train_step.debug_update_jit.lower(
        params, opt_state, carry, step_idx, jnp.float32(1.0 / 512)
    ).compile()
    t2 = analyze("update", upd)
    devmem("post-update-load")
    if args.ladder:
        ladder("post-update-load", state)

    for mb, chunk in combos:
        accum = cfg.total_batch_size // (mb * cfg.seq_len)
        rows = shard_batch(
            mesh,
            {"rows": jnp.zeros((accum, mb, cfg.seq_len + 1), jnp.uint16)},
            leading_accum_axis=True,
        )
        tag = f"accum B={mb} chunk={chunk}"
        print(f"lowering {tag} (accum={accum})...", flush=True)
        accum_jit = train_step.debug_get_accum_jit(chunk)
        try:
            c1 = accum_jit.lower(
                params, carry, rows, step_idx, start
            ).compile()
        except Exception as e:
            devmem(f"{tag}-load-FAILED")
            print(f"{tag} compile/load failed: {e}")
            continue
        t1 = analyze(tag, c1)
        devmem(f"post-{tag}-load")
        # arenas COEXIST once both executables are loaded (ROUND_NOTES:
        # the eval executable's arena alone made the update dispatch
        # OOM), so the honest runtime peak is state + sum(arenas), not
        # state + max(arenas)
        print(
            f"TOTAL[{tag}]: state {gib(state)} + arenas "
            f"{gib(t1 + t2)} = {gib(state + t1 + t2)} (budget ~15.75 GiB)"
        )
        if args.ladder:
            ladder(f"post-{tag}-load", state)
        if args.ladder and args.dispatch:
            print(
                f"[dispatch:{tag}] ONE synced accum chunk (wedge-risk "
                f"stage)...",
                flush=True,
            )
            try:
                # call the AOT-compiled executable directly (the jit
                # wrapper would recompile: lower().compile() does not
                # seed jit's own call cache)
                carry2 = c1(params, carry, rows, step_idx, start)
                loss = float(carry2[1])
                print(f"[dispatch:{tag}] OK, lsum={loss:.4f}", flush=True)
                # carry was DONATED to the dispatch; the returned carry2
                # aliases it, so accounted state is unchanged
                carry = carry2
                ladder(f"post-{tag}-dispatch", state)
            except Exception as e:
                print(
                    f"[dispatch:{tag}] FAILED: {type(e).__name__}: "
                    f"{str(e)[:2000]}",
                    flush=True,
                )
                return


if __name__ == "__main__":
    main()
