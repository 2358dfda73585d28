"""Jitted training / eval steps with in-graph gradient accumulation.

Replaces the reference's hot loop (train_gpt2.py:456-476): the 32-micro-step
Python loop with backward per micro-batch and a DDP all-reduce on the last
one becomes a single jitted function containing a `lax.scan` over
micro-batches. Consequences on TPU:

  * one compilation, zero Python dispatch per micro-step;
  * gradients live in fp32 accumulators carried through the scan;
  * data parallelism: the micro-batch axis is sharded over the mesh "data"
    axis; XLA inserts the gradient all-reduce (psum over ICI) exactly once,
    fused into the update — the moral equivalent of DDP's
    `require_backward_grad_sync = (micro == last)` (train_gpt2.py:467-468);
  * LR schedule, global-norm clip and the AdamW update (Pallas fused kernel)
    run in the same graph, so one host->device dispatch per optimizer step.

Donation of (params, opt_state) keeps peak HBM at params + opt + one grads
tree + activations of a single micro-batch (with remat on blocks).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

from ..core.config import OptimizerConfig, ScheduleConfig
from .optimizer import adamw_update, freeze, global_norm
from .schedule import cosine_warmup_lr


def stochastic_round_bf16(x32, key):
    """fp32 -> bf16 with unbiased stochastic rounding.

    Truncating fp32 to bf16 drops 16 mantissa bits; over a 64-micro-step
    gradient accumulation the systematic round-to-nearest bias compounds.
    Adding 16 uniform random bits below the kept mantissa and truncating
    makes E[round(x)] = x exactly (magnitude-symmetric for negatives since
    IEEE is sign-magnitude). Non-finite caveat: the random add can carry
    into the exponent, so a NaN with a small payload may come out as Inf
    — callers must treat non-finite as non-finite generically (the NaN
    guard's isfinite check does), never rely on NaN-ness surviving.
    This is the trick that lets GPT-2 1558M's grad accumulators live in
    bf16 (3.1 GB instead of 6.2) without trajectory drift — see
    tests/test_bf16_drift.py::test_bf16_grad_accum_trajectory."""
    bits = jax.lax.bitcast_convert_type(x32.astype(jnp.float32), jnp.uint32)
    # 16 random bits generated AS uint16: at GPT-2 1558M the largest leaf
    # is the (48, 1600, 4800) QKV stack, whose uint32 bits tensor alone
    # would be a 1.5 GB transient per accumulate — uint16 halves every
    # RNG temporary on the already-HBM-tight whole-model-bf16 path
    rnd = jax.random.bits(key, x32.shape, jnp.uint16).astype(jnp.uint32)
    out = (bits + rnd) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(out, jnp.float32).astype(jnp.bfloat16)


def default_formats(tree):
    """Tree of `Format`s pinning each live array's CURRENT sharding and
    CURRENT layout.

    Purpose: on TPU, XLA picks preferred entry layouts per executable (e.g.
    a transposed {1,2,0} for the stacked MLP wproj in the train step's
    backward). When init/eval/train disagree, jax materializes a bulk
    layout-conversion program holding a copy of every mismatched leaf
    SIMULTANEOUSLY — ~4.1 GB of transients at GPT-2 1558M, which is what
    pushed the whole-model-bf16 single-chip config 127 MB over the 15.75 GB
    HBM budget. Pinning in/out formats keeps the param/opt trees
    layout-stable end-to-end; any preferred-layout transposes happen inside
    the step as scheduled (not all-live) temps.

    Pinning the CURRENT layout (not the default major-to-minor): even a
    bare zeros fill gets a transposed preferred layout at some shapes
    (zeros((48,6400,1600), bf16) is {0,2,1} on v5e), so fresh-init params
    already sit in preferred layouts. Declaring those exact layouts means
    no leaf ever needs a relayout copy — committing the state into the
    pinned format is then free, whereas forcing default layouts costs a
    full param+opt copy with BOTH trees live (~9 GB at 1558M: the caller
    still references the originals)."""
    from jax.experimental.layout import Format, Layout

    return jax.tree.map(
        lambda x: Format(
            Layout(x.format.layout.major_to_minor), x.sharding
        ),
        tree,
    )


def make_train_step(
    loss_fn: Callable,
    opt_cfg: OptimizerConfig,
    sched_cfg: ScheduleConfig,
    *,
    decay_mask,
    trainable_mask=None,
    use_fused_adamw: bool = False,
    donate: bool = True,
    grad_accum_dtype=None,
    nan_guard: bool = True,
    io_formats=None,
    split_accum: bool = False,
    sync_every: int = 0,
    layerwise_loss_grad=None,
):
    """Build `step(params, opt_state, batch, step_idx) -> (params, opt_state,
    metrics)`.

    loss_fn(params, micro_batch) -> scalar loss, or
    loss_fn(params, micro_batch, extra) when the step is called with a 5th
    argument `extra` — a pytree that is NOT scanned over (e.g. a
    device-resident feature bank indexed by ids in the batch). metrics
    carries {loss, lr, grad_norm} matching the reference's per-step log line
    (train_gpt2.py:485).

    grad_accum_dtype: None/float32 = exact fp32 accumulators (reference
    parity, train_gpt2.py:465-469 semantics). "bfloat16" halves the
    accumulator HBM (the enabler for GPT-2 1558M on a 16 GB chip) using
    unbiased stochastic rounding at each accumulate; drift pinned in
    tests/test_bf16_drift.py.

    io_formats: optional (params_formats, opt_formats) trees from
    `default_formats` — pins the step's param/opt entry AND result layouts
    so no bulk layout-conversion program is ever materialized (see
    default_formats; pure memory knob, numerics unchanged). Incompatible
    with the 5-arg `extra` calling form.

    split_accum (int; True==1): dispatch the accumulation as small jitted
    programs of `split_accum` micro-batches each (donated accumulator
    carry, scan inside) plus one optimizer-update program, instead of a
    single jit containing the whole lax.scan. Numerically IDENTICAL to
    the one-jit scan for every chunking (same micro order, same SR keys)
    but the TPU runtime only ever needs one program's temp arena at a
    time: the one-jit 1558M step's arena is ~9 GiB *on top of* the
    8.9 GiB of donated state, ~18 GiB total on a 16 GiB chip (it executes
    nothing — runtime ResourceExhausted even though the scheduler's
    live-peak passed the compile-time check), while a split program needs
    state 11.6 GiB + a ~3.3 GiB arena regardless of chunk length (the
    scan reuses its body buffers). Dispatches are async-enqueued and
    pipeline cleanly even through the axon tunnel — measured split ==
    one-jit step time at 124M — so chunk length is a minor knob (fewer
    Python dispatches per step). The update program also emits the next
    step's zeroed accumulator carry (aliasing the donated gsum), so
    steps after the first skip the ~150-leaf init dispatch. The returned
    callable has the same signature but is not itself a jax.jit object.

    nan_guard: failure detection (SURVEY §5 — the reference has none).
    One-jit path: in-graph rollback selects (loss/grad-norm finiteness
    gates the update; costs old+new trees live in the step's arena).
    split_accum path: guarded HOST-SIDE instead — a small program reads
    (loss, grad_norm) off the accumulator carry and the update program is
    only dispatched if both are finite, so a poisoned step is a no-op at
    zero select HBM (the reason --no-nan-guard existed at the 1558M HBM
    edge is gone; the flag now only matters for one-jit configs). Costs
    one 2-scalar host sync per step on the split path.

    sync_every (split_accum only): host-sync the loss carry every N accum
    dispatches, bounding how many in-flight executions the runtime holds
    at once. Async-enqueued executions each reserve their own temp arena,
    so ≥2 in flight doubles the accum arena; at HBM-edge configs (1558M:
    8.75 GiB state + 4.06 GiB arena) the overlap is the difference
    between fitting and a device-side OOM. The sync reads back one f32
    scalar (float(), the only true sync through the axon tunnel —
    block_until_ready returns early there). 0 = never (full async
    pipelining, the right default everywhere with headroom).
    """
    accum_dt = jnp.dtype(grad_accum_dtype) if grad_accum_dtype else jnp.float32
    use_sr = accum_dt == jnp.bfloat16

    # The freeze (stop_gradient on frozen leaves) must be applied INSIDE
    # the traced function being differentiated: stop_gradient applied to
    # the *argument* of value_and_grad does nothing — grads are taken
    # w.r.t. the argument itself, so frozen leaves would still receive
    # full nonzero gradients (extra backward matmuls + fp32 grad HBM for
    # the frozen 124M decoder in finetunes). With the freeze inside, the
    # frozen cotangents are structural zeros that XLA dead-code
    # eliminates, reproducing requires_grad_(False)
    # (gpt2_linear/model.py:161-164).
    def wrapped_loss(p, micro, extra=None):
        if trainable_mask is not None:
            p = freeze(p, trainable_mask)
        return loss_fn(p, micro) if extra is None else loss_fn(p, micro, extra)

    def tmask_for(params):
        return (
            trainable_mask
            if trainable_mask is not None
            else jax.tree.map(lambda _: True, params)
        )

    def accumulate(gsum, grads, tmask, step_idx, midx):
        """gsum += grads on trainable leaves (shared by the scan body and
        the split_accum per-micro program — identical SR keys either way)."""
        if not use_sr:
            return jax.tree.map(
                lambda a, g, tr: a + g.astype(jnp.float32) if tr else a,
                gsum,
                grads,
                tmask,
            )
        # bf16 accumulators: add in fp32, stochastic-round the sum
        # back to bf16. Keys: one per (step, micro, leaf[, slice]) so no
        # two roundings ever share randomness.
        base = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(0x5EED), step_idx), midx
        )

        def sr_chunks(shape):
            """Leading-axis scan length for the SR add: smallest row-group
            count whose slices stay under ~16 MB of fp32 (the transient
            the chunking exists to bound) — NOT one row per step, which
            would make the wte leaf a 50304-iteration sequential scan."""
            d0 = int(shape[0])
            rest = 1
            for d in shape[1:]:
                rest *= int(d)
            target = 1 << 22  # 4M elements -> 16 MB fp32 slice
            n = d0 if rest > target else 1  # huge rows: per-row is the floor
            for g in range(1, d0 + 1):
                if d0 % g == 0 and g * rest <= target:
                    n = d0 // g
            return n

        def sr_add(a, g, key):
            # chunk the fp32 sum over the leading (layer-stack) axis: a
            # whole-leaf fp32 transient is 1.4 GiB at 1558M's QKV stack,
            # and those transients were the difference between the
            # per-micro accum program's arena fitting (3.3 GiB) and not
            # (5.0 GiB) next to 11.6 GiB of resident state. lax.scan
            # sequences the row-group slices so only one is live.
            nc = sr_chunks(a.shape) if a.ndim >= 2 else 1
            if nc >= 2:
                def body(_, xs):
                    ai, gi, ki = xs
                    return None, stochastic_round_bf16(
                        ai.astype(jnp.float32) + gi.astype(jnp.float32), ki
                    )

                grp = a.shape[0] // nc
                sh = (nc, grp) + a.shape[1:]
                _, out = jax.lax.scan(
                    body, None,
                    (a.reshape(sh), g.reshape(sh), jax.random.split(key, nc)),
                )
                return out.reshape(a.shape)
            return stochastic_round_bf16(
                a.astype(jnp.float32) + g.astype(jnp.float32), key
            )

        flat_a, tdef = jax.tree_util.tree_flatten(gsum)
        flat_g = jax.tree_util.tree_leaves(grads)
        flat_t = jax.tree_util.tree_leaves(tmask)
        flat_a = [
            sr_add(a, g, jax.random.fold_in(base, i)) if tr else a
            for i, (a, g, tr) in enumerate(zip(flat_a, flat_g, flat_t))
        ]
        return jax.tree_util.tree_unflatten(tdef, flat_a)

    if layerwise_loss_grad is not None:
        assert trainable_mask is None, (
            "layerwise_loss_grad accumulates every leaf; freeze masks are "
            "the finetune paths', which don't carry billion-param grads"
        )

    def make_acc(step_idx, midx):
        """Accumulator adapter for models/gpt2.py::loss_grad_layerwise.

        block_slice_add folds ONE layer's grads into the (L, ...) stacked
        accumulator leaves at slice i — dynamic-update-slice on the scan
        carry, so XLA updates the donated gsum buffers in place and no
        stacked grads tree ever exists. tree_add handles the non-block
        leaves (wte/wpe/lnf) through the shared `accumulate` (identical
        SR chunking/keys to the standard path). SR keys: block leaves use
        salt 4096+n per leaf then fold in the layer index; `accumulate`
        salts its subtree 0..k — disjoint by construction."""
        base = (
            jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(0x5EED), step_idx),
                midx,
            )
            if use_sr
            else None
        )

        class Acc:
            @staticmethod
            def block_slice_add(gb, g_lp, i):
                flat_a, tdef = jax.tree_util.tree_flatten(gb)
                flat_g = jax.tree_util.tree_leaves(g_lp)
                out = []
                for n, (a, g) in enumerate(zip(flat_a, flat_g)):
                    cur = jax.lax.dynamic_index_in_dim(
                        a, i, 0, keepdims=False
                    )
                    s = cur.astype(jnp.float32) + g.astype(jnp.float32)
                    if use_sr:
                        k = jax.random.fold_in(
                            jax.random.fold_in(base, 4096 + n), i
                        )
                        upd = stochastic_round_bf16(s, k)
                    else:
                        upd = s
                    out.append(
                        jax.lax.dynamic_update_index_in_dim(a, upd, i, 0)
                    )
                return jax.tree_util.tree_unflatten(tdef, out)

            @staticmethod
            def tree_add(gsub, dsub):
                tm = jax.tree.map(lambda _: True, gsub)
                return accumulate(gsub, dsub, tm, step_idx, midx)

        return Acc

    def micro_grads_into(gsum, lsum, params, micro, step_idx, midx, extra):
        """One micro-batch's (loss, grads) folded into the accumulators —
        layerwise streaming when configured, value_and_grad otherwise."""
        if layerwise_loss_grad is not None:
            assert extra is None, "layerwise grad does not support `extra`"
            loss, gsum = layerwise_loss_grad(
                params, micro, gsum, make_acc(step_idx, midx)
            )
        else:
            loss, grads = jax.value_and_grad(
                lambda p, m: wrapped_loss(p, m, extra)
            )(params, micro)
            gsum = accumulate(
                gsum, grads, tmask_for(params), step_idx, midx
            )
        return gsum, lsum + loss

    def gzero_for(params, tmask):
        # frozen leaves carry scalar placeholders, not (shape) fp32 buffers:
        # the frozen 124M decoder in finetunes costs 0 grad-accumulator HBM
        return jax.tree.map(
            lambda p, tr: jnp.zeros(p.shape if tr else (), accum_dt),
            params,
            tmask,
        )

    def apply_update(
        params, opt_state, gsum, lsum, step_idx, inv_accum,
        guard_selects=True, precomputed_norm=None,
    ):
        lr = cosine_warmup_lr(step_idx, sched_cfg)
        # the 1/accum mean is folded into adamw_update's clip scalar
        # (grad_scale) rather than applied as a tree.map here: a pre-scaled
        # grads tree is a second full-size materialization (2.9 GB at
        # 1558M) that cannot fuse into the chunked 8-bit update's loop.
        # Exact for power-of-two accum, where the scaling commutes
        # bit-for-bit with the clip multiply.
        loss = lsum * inv_accum

        new_params, new_opt, norm = adamw_update(
            params,
            gsum,
            opt_state,
            lr,
            opt_cfg,
            decay_mask=decay_mask,
            trainable_mask=trainable_mask,
            use_fused=use_fused_adamw,
            grad_scale=jnp.asarray(inv_accum, jnp.float32),
            precomputed_norm=precomputed_norm,
        )
        # failure guard: if the loss OR the grad norm went non-finite, keep
        # the old state so the caller can halt and the last checkpoint
        # stays usable (the reference has no failure detection at all,
        # SURVEY.md §5). The norm check matters: a NaN that appears only in
        # the backward (e.g. 0*inf in a VJP) leaves the forward loss finite
        # while poisoning every parameter through clip_scale.
        # nan_guard=False drops the rollback selects: they keep OLD and NEW
        # leaves simultaneously live, and on HBM-edge configs (GPT-2 1558M
        # whole-model-bf16 sat 134 MB over a 15.75 GB budget) that
        # scheduling slack is the difference between fitting and not. The
        # caller's halt-on-nonfinite check still fires; only the
        # keep-last-good-state property is traded away. The split_accum
        # path never takes these selects (guard_selects=False): it guards
        # HOST-SIDE instead — finiteness checked BEFORE the update program
        # is dispatched, and a bad step simply skips the dispatch, which
        # is a perfect rollback at zero HBM cost (see split_step).
        if nan_guard and guard_selects:
            ok = jnp.logical_and(jnp.isfinite(loss), jnp.isfinite(norm))
            new_params = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old), new_params, params
            )
            new_opt = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old), new_opt, opt_state
            )
        metrics = {"loss": loss, "lr": lr, "grad_norm": norm}
        return new_params, new_opt, metrics

    def step(params, opt_state, batch, step_idx, extra=None):
        def body(carry, xs):
            micro, midx = xs
            gsum, lsum = carry
            gsum, lsum = micro_grads_into(
                gsum, lsum, params, micro, step_idx, midx, extra
            )
            return (gsum, lsum), None

        accum = jax.tree.leaves(batch)[0].shape[0]
        (gsum, lsum), _ = jax.lax.scan(
            body,
            (gzero_for(params, tmask_for(params)), jnp.float32(0.0)),
            (batch, jnp.arange(accum, dtype=jnp.int32)),
        )
        return apply_update(
            params, opt_state, gsum, lsum, step_idx, jnp.float32(1.0 / accum)
        )

    if split_accum:
        # int semantics: micros per dispatched program (True == 1). Larger
        # chunks scan several micros inside one program — same small temp
        # arena (the scan reuses its body buffers), 1/chunk the host
        # dispatches. Dispatches are async-enqueued and pipeline cleanly
        # even through the axon tunnel (measured: chunked split == one-jit
        # step time at 124M), so chunk mainly bounds Python dispatch work
        # per step. SR keys depend only on (step_idx, midx, leaf), so
        # every chunking is numerically identical.
        chunk = max(1, int(split_accum))

        def accum_chunk_fn(g):
            def accum_chunk(params, carry, batch, step_idx, start):
                # slice each micro INSIDE the jit: the staged (accum, B,
                # T+1) batch stays one resident device array across all
                # dispatches
                def body(c, midx):
                    micro = jax.tree.map(
                        lambda x: jax.lax.dynamic_index_in_dim(
                            x, midx, 0, keepdims=False
                        ),
                        batch,
                    )
                    gsum, lsum = c
                    gsum, lsum = micro_grads_into(
                        gsum, lsum, params, micro, step_idx, midx, None
                    )
                    return (gsum, lsum), None

                carry, _ = jax.lax.scan(
                    body, carry, start + jnp.arange(g, dtype=jnp.int32)
                )
                return carry

            return accum_chunk

        def update(params, opt_state, carry, step_idx, inv_accum,
                   norm=None):
            gsum, lsum = carry
            # guard_selects=False: the rollback jnp.where selects keep OLD
            # and NEW trees simultaneously live in the update program's
            # arena; the split path guards host-side before dispatch.
            # norm (nan_guard only): the guard program already computed
            # this step's grad_scaled global norm; reusing it here drops
            # adamw_update's in-graph recompute — a full bandwidth pass
            # over the gsum tree (2.9 GiB at 1558M) per healthy step
            new_params, new_opt, metrics = apply_update(
                params, opt_state, gsum, lsum, step_idx, inv_accum,
                guard_selects=False, precomputed_norm=norm,
            )
            # also emit next step's zeroed accumulator carry: it aliases
            # the donated gsum buffers, so steps after the first need no
            # separate ~150-leaf init (each tree init is its own host
            # dispatch — ~0.3 s/step through the axon tunnel)
            gzero = jax.tree.map(jnp.zeros_like, gsum)
            return new_params, new_opt, metrics, (gzero, jnp.float32(0.0))

        if io_formats is not None:
            from jax.experimental.layout import Format, Layout

            pf, of = io_formats
            tmf = (
                trainable_mask
                if trainable_mask is not None
                else jax.tree.map(lambda _: True, pf)
            )
            # accumulator formats: the params' pinned layouts at trainable
            # leaves (scalar placeholders at frozen ones), same shardings
            gf = jax.tree.map(
                lambda f, tr: Format(
                    Layout(f.layout.major_to_minor if tr else ()),
                    f.sharding,
                ),
                pf,
                tmf,
            )
            cf = (gf, None)
            accum_jit_kw = dict(
                donate_argnums=(1,) if donate else (),
                in_shardings=(pf, cf, None, None, None),
                out_shardings=cf,
            )
            # with nan_guard the guard's norm scalar rides in as a 6th arg
            up_in = (pf, of, cf, None, None) + ((None,) if nan_guard else ())
            update_jit = jax.jit(
                update,
                donate_argnums=(0, 1, 2) if donate else (),
                in_shardings=up_in,
                out_shardings=(pf, of, None, cf),
            )
        else:
            accum_jit_kw = dict(donate_argnums=(1,) if donate else ())
            update_jit = jax.jit(
                update, donate_argnums=(0, 1, 2) if donate else ()
            )

        def guard_check(gsum, lsum, step_idx, inv_accum):
            """Pre-update finiteness probe: the step's loss and grad norm
            (the exact pair the in-graph guard selects on — the norm also
            catches backward-only NaNs that leave the forward loss finite).
            Reads the accumulator carry WITHOUT donating it; the update
            program consumes it afterwards on the healthy path. One extra
            bandwidth pass over gsum + a 2-scalar host sync per step —
            noise next to the accum programs it guards."""
            tm = (
                trainable_mask
                if trainable_mask is not None
                else jax.tree.map(lambda _: True, gsum)
            )
            norm = global_norm(gsum, tm) * inv_accum
            lr = cosine_warmup_lr(step_idx, sched_cfg)
            return lsum * inv_accum, norm, lr

        if io_formats is not None:
            # pin the gsum entry layouts: an auto-layout guard program
            # whose preferred layouts disagree with the pinned carry would
            # relayout-copy the whole accumulator tree (2.9 GiB at 1558M)
            guard_jit = jax.jit(
                guard_check, in_shardings=(gf, None, None, None)
            )
        else:
            guard_jit = jax.jit(guard_check)

        accum_jits = {}  # chunk length -> jitted program (≤2 distinct)

        def get_accum_jit(g):
            if g not in accum_jits:
                accum_jits[g] = jax.jit(accum_chunk_fn(g), **accum_jit_kw)
            return accum_jits[g]

        def init_carry(params):
            # every leaf must come out COMMITTED (explicit device_put):
            # update_jit's recycled carry is committed, and a single
            # uncommitted first-step leaf — even just the lsum scalar —
            # is a different jit cache key that recompiles both programs
            # a second time after step 0 (measured +22 s at 124M, ~10 min
            # at 1558M). A jitted fill doesn't work here: jit prunes the
            # unused params arg, and a no-input program's outputs are
            # uncommitted.
            tmask = tmask_for(params)
            if io_formats is not None:
                # pin the zeros into gf explicitly: XLA gives even a bare
                # fill a transposed preferred layout at some shapes
                # (measured: zeros((48,6400,1600), bf16) comes out
                # (0,2,1) on v5e), and a committed arg whose layout
                # mismatches accum_jit's declared in_shardings is a hard
                # error
                gsum = jax.tree.map(
                    lambda p, tr, f: jax.device_put(
                        jnp.zeros(p.shape if tr else (), accum_dt), f
                    ),
                    params,
                    tmask,
                    gf,
                )
            else:
                gsum = jax.tree.map(
                    lambda p, tr: jax.device_put(
                        jnp.zeros(p.shape if tr else (), accum_dt),
                        p.sharding,
                    ),
                    params,
                    tmask,
                )
            sh0 = jax.tree.leaves(params)[0].sharding
            if hasattr(sh0, "spec"):  # NamedSharding: scalars need P()
                from jax.sharding import NamedSharding, PartitionSpec

                sh0 = NamedSharding(sh0.mesh, PartitionSpec())
            return (gsum, jax.device_put(jnp.float32(0.0), sh0))

        next_carry = [None]  # zeroed carry recycled from the last update
        staged = {}  # python int -> staged device scalar (reused each step)

        def stage(v, dt):
            key = (v, dt)
            if key not in staged:
                staged[key] = jnp.asarray(v, dt)
            return staged[key]

        committed = [False]

        def split_step(params, opt_state, batch, step_idx, extra=None):
            assert extra is None, "split_accum does not support `extra`"
            accum = jax.tree.leaves(batch)[0].shape[0]
            if not committed[0]:
                # commit the state arrays: fresh init() output is
                # UNcommitted, but everything update_jit returns is
                # committed, and that jit-cache-key difference would
                # recompile both programs a second time after step 0
                # (measured: +22 s at 124M, ~+10 min at 1558M). With
                # pinned io_formats, commit INTO the declared format —
                # a committed arg whose layout mismatches in_shardings is
                # a hard error (uncommitted args would be silently
                # relaid) — leaf-by-leaf, so the relayout transient is
                # one leaf's copy, never the all-leaves-live bulk program
                # pin_layouts exists to avoid.
                # ...and CONSUME the caller's leaves as we go: device_put
                # into a Format COPIES even at matching layout (measured,
                # CPU and TPU), and the caller's frame keeps its whole
                # old tree referenced for the duration of this call — at
                # 1558M that is +5.85 GiB (params+opt both live twice)
                # and was the entire attempt-5..8 OOM mystery (staged
                # ladder probe: state+arenas accounted to 9.99 GiB yet
                # runtime OOM'd; the invisible resident was the
                # uncollected pre-commit trees). Deleting each source
                # buffer right after its copy bounds the transient to ONE
                # leaf. Only when donate=True does split_step own the
                # state (the caller must never reuse the trees it passed
                # in — update_jit donates them anyway); with donate=False
                # the caller may reuse its trees, so never delete.
                def commit_consume(x, f=None):
                    y = jax.device_put(x, f if f is not None else x.sharding)
                    if donate and y is not x:
                        try:
                            x.delete()
                        except Exception:
                            pass  # non-deletable (e.g. np scalar leaf)
                    return y

                if io_formats is None:
                    params = jax.tree.map(commit_consume, params)
                    opt_state = jax.tree.map(commit_consume, opt_state)
                else:
                    params = jax.tree.map(commit_consume, params, pf)
                    opt_state = jax.tree.map(commit_consume, opt_state, of)
                committed[0] = True
            carry = next_carry[0]
            if carry is None:
                carry = init_carry(params)
            step_idx = jnp.asarray(step_idx, jnp.int32)
            for n, start in enumerate(range(0, accum, chunk), start=1):
                g = min(chunk, accum - start)
                carry = get_accum_jit(g)(
                    params, carry, batch, step_idx, stage(start, jnp.int32)
                )
                if sync_every and n % sync_every == 0:
                    float(carry[1])  # true sync; see docstring
            guard_norm = ()
            if nan_guard:
                # host-side failure guard: check finiteness BEFORE the
                # update program runs. A bad step never dispatches the
                # update — params/opt are untouched (perfect rollback)
                # and the step counter stays put, exactly the in-graph
                # guard's semantics but with zero select/rollback HBM:
                # this is what lets the 1558M HBM-edge recipe keep its
                # failure detection (the in-graph selects were the one
                # mechanism --no-nan-guard existed to drop).
                loss_d, norm_d, lr_d = guard_jit(
                    carry[0], carry[1], step_idx,
                    stage(1.0 / accum, jnp.float32),
                )
                if not (
                    math.isfinite(float(loss_d))
                    and math.isfinite(float(norm_d))
                ):
                    # drop the poisoned carry; next step re-inits zeros
                    next_carry[0] = None
                    return params, opt_state, {
                        "loss": loss_d, "lr": lr_d, "grad_norm": norm_d,
                    }
                # healthy: hand the guard's norm to the update program so
                # it skips its own full-gsum global_norm pass
                guard_norm = (norm_d,)
            params, opt_state, metrics, nxt = update_jit(
                params,
                opt_state,
                carry,
                step_idx,
                stage(1.0 / accum, jnp.float32),
                *guard_norm,
            )
            next_carry[0] = nxt
            return params, opt_state, metrics

        # debug/AOT hooks: memory probes lower these against real state to
        # read each program's arena (jit.lower(...).compile()
        # .memory_analysis()) without executing a step
        split_step.debug_update_jit = update_jit
        split_step.debug_get_accum_jit = get_accum_jit
        split_step.debug_init_carry = init_carry
        return split_step

    donate_argnums = (0, 1) if donate else ()
    if io_formats is not None:
        pf, of = io_formats
        return jax.jit(
            step,
            donate_argnums=donate_argnums,
            in_shardings=(pf, of, None, None),
            out_shardings=(pf, of, None),
        )
    return jax.jit(step, donate_argnums=donate_argnums)


def make_eval_step(loss_fn: Callable, params_formats=None):
    """Jitted eval: mean loss over a (steps, B, ...) batch pytree
    (val-loss loop, train_gpt2.py:341-350). Accepts the same optional
    `extra` pytree as make_train_step."""

    def step(params, batch, extra=None):
        if extra is None:
            lf = loss_fn
        else:
            lf = lambda p, m: loss_fn(p, m, extra)

        def body(lsum, micro):
            return lsum + lf(params, micro), None

        n = jax.tree.leaves(batch)[0].shape[0]
        lsum, _ = jax.lax.scan(body, jnp.float32(0.0), batch)
        return lsum / n

    if params_formats is not None:
        # pin the params entry layouts to match the (pinned) train step so
        # running eval never re-lays-out the whole tree (see default_formats)
        return jax.jit(step, in_shardings=(params_formats, None))
    return jax.jit(step)
