"""GPipe-style pipeline parallelism over a "pipe" mesh axis.

The reference has no model parallelism of any kind (DDP only,
/root/reference/source/gpt2/train_gpt2.py:215-236). This module completes
the framework's parallelism matrix (DP = batch sharding, TP = Megatron
column/row sharding, SP = residual/ring sequence sharding, PP = here): the
scan-stacked block parameters (L, ...) are sharded on their LAYER axis so
each device owns a contiguous stage of L/S layers, and microbatches stream
through the stages with `jax.lax.ppermute` hops — the classic GPipe
schedule with M + S - 1 ticks and (S-1)/(M+S-1) bubble overhead.

TPU-native shape: one `shard_map` program per stage; activations hop
stage→stage over ICI; no host coordination. Differentiable end-to-end
(scan + ppermute + psum are all differentiable), so `jax.grad` of a
pipelined loss works — pinned against the single-device decoder in
tests/test_pipeline.py on a CPU mesh.

A FULL pipelined train step exists too: `make_pipeline_loss_fn` builds the
embed -> pipelined blocks -> ln_f -> fused-CE loss (embeddings and the
tied lm_head are replicated across stages — they are 39% of 124M params
but their compute is tiny next to the blocks, and replication keeps the
fused chunked CE intact), and `pipeline_param_pspecs` gives the matching
placement (blocks layer-sharded on the pipe axis, the rest replicated) so
`train.step.make_train_step` runs grad-accum + AdamW over stage-sharded
parameters with grads flowing backward through the GPipe schedule
(ppermute hops transpose to reverse hops). Numerics-pinned against the
single-device step at pp and pp x dp in tests/test_pipeline.py; the same
step is the exact parallelization of the reference's hot loop
(train_gpt2.py:456-476).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.precision import Policy, DEFAULT_POLICY


def stage_param_specs(block_params, axis_name: str = "pipe"):
    """PartitionSpec pytree sharding every (L, ...) leaf on its layer axis."""
    return jax.tree.map(
        lambda p: P(axis_name, *([None] * (p.ndim - 1))), block_params
    )


def pipeline_param_pspecs(params, axis_name: str = "pipe", tp: bool = False):
    """PartitionSpecs for the FULL decoder param tree under pipeline
    parallelism: block stacks layer-sharded on `axis_name`, embeddings /
    final LN replicated. Feed to `jax.device_put` / `NamedSharding` so the
    optimizer state and grad accumulators inherit the same placement.

    tp=True composes with Megatron tensor parallelism on a
    ("data", "pipe", "model") mesh: every block leaf keeps its column/row
    "model" axis from parallel.sharding.gpt2_param_specs UNDER the leading
    "pipe" stage axis (e.g. wqkv (L, C, 3C) -> P("pipe", None, "model")),
    and the non-block leaves (wte, wpe, lnf) take their Megatron specs
    directly. pipeline_run_blocks' shard_map stays manual over "pipe"
    only, so inside each stage GSPMD sees model-sharded weights and
    inserts the usual Megatron all-reduces per tick — pp x tp without a
    single hand-written collective beyond the pipe ppermute."""
    if not tp:
        specs = {k: jax.tree.map(lambda _: P(), v) for k, v in params.items()}
        specs["blocks"] = stage_param_specs(params["blocks"], axis_name)
        return specs
    from .sharding import gpt2_param_specs

    specs = gpt2_param_specs(params)
    specs["blocks"] = jax.tree.map(
        lambda sp: P(axis_name, *tuple(sp)[1:]),
        specs["blocks"],
        is_leaf=lambda x: isinstance(x, P),
    )
    return specs


def transport_dtype(compute_dt, platform: str, override: str = "auto"):
    """Dtype for the pipeline TRANSPORT (scan carries, ppermute payloads,
    output accumulator, psums and their transposes).

    bf16 collectives under the partial-manual shard_map crash XLA:CPU's
    SPMD partitioner ("Invalid binary instruction opcode copy", jax 0.9.0
    — minimal repro bisected in ROUND_NOTES r3), and the crash reaches
    beyond the final psum: the shard_map TRANSPOSE inserts cotangent psums
    for every pipe-invariant input. So on CPU meshes a bf16 compute dtype
    upcasts the transport to fp32 (each stage casts to compute dtype on
    entry and back on exit — per-stage casts, not per-layer). TPU meshes
    ride the compute dtype: bf16 ppermute hops are fine there and the
    fp32 workaround would double the stage-to-stage ICI bytes for a bug
    the TPU partitioner does not have. `override` forces a dtype
    ("float32"/"bfloat16") for A/B or if a TPU partitioner regression
    ever surfaces."""
    if override != "auto":
        return jnp.dtype(override)
    if compute_dt == jnp.bfloat16 and platform == "cpu":
        return jnp.dtype(jnp.float32)
    return jnp.dtype(compute_dt)


def make_pipeline_loss_fn(
    cfg,
    mesh: Mesh,
    *,
    axis_name: str = "pipe",
    n_micro: int = 2,
    policy: Policy = DEFAULT_POLICY,
    attn_impl: str = "xla",
    ce_chunks: int = 1,
    transport: str = "auto",
):
    """Loss for a PIPELINED train step, shaped for train.step.make_train_step:
    ``loss_fn(params, {"x": ids, "y": targets})`` — token embedding and the
    fused chunked lm_head+CE run replicated; the decoder blocks run through
    the GPipe schedule with layers stage-sharded on `axis_name`.

    This is the missing piece between "pipeline forward helper" and
    "pipeline training": jax.grad of this loss back-propagates through the
    ppermute hops (their transpose is the reverse-ring hop), so the whole
    grad-accum scan + AdamW update of make_train_step applies unchanged to
    stage-sharded parameters. Parallelizes the reference's training step
    (train_gpt2.py:456-476) across a "pipe" mesh axis the reference never
    had.
    """
    from ..models.gpt2 import embed_tokens, fused_ce_loss
    from ..ops.layers import layer_norm

    def loss_fn(params, micro):
        x = embed_tokens(params, micro["x"], cfg).astype(policy.compute_dtype)
        h = pipeline_run_blocks(
            params["blocks"], x, cfg, mesh,
            axis_name=axis_name, n_micro=n_micro, policy=policy,
            attn_impl=attn_impl, transport=transport,
        )
        h = layer_norm(h, params["lnf"]["scale"], params["lnf"]["bias"])
        return fused_ce_loss(
            h, params["wte"], micro["y"], policy=policy, ce_chunks=ce_chunks
        )

    return loss_fn


def pipeline_run_blocks(
    block_params,
    x,
    cfg,
    mesh: Mesh,
    *,
    axis_name: str = "pipe",
    n_micro: int = 2,
    policy: Policy = DEFAULT_POLICY,
    attn_impl: str = "xla",
    transport: str = "auto",
):
    """Run the decoder blocks over embedded inputs x (B, T, C), with layers
    sharded into pipeline stages on `axis_name` and the batch split into
    `n_micro` microbatches. Returns the same value as
    models.gpt2.run_blocks up to fp32 reduction order."""
    from ..models.gpt2 import block

    n_stage = mesh.shape[axis_name]
    assert cfg.n_layer % n_stage == 0, (cfg.n_layer, n_stage)
    b = x.shape[0]
    assert b % n_micro == 0, (b, n_micro)
    if n_stage == 1:
        from ..models.gpt2 import run_blocks

        return run_blocks(
            {"blocks": block_params}, x, cfg, policy=policy,
            attn_impl=attn_impl,
        )
    # transport dtype: fp32 on CPU meshes when compute is bf16 (XLA:CPU
    # partitioner crash workaround), the compute dtype on TPU — see
    # transport_dtype above
    compute_dt = x.dtype
    tdt = transport_dtype(
        compute_dt, mesh.devices.flat[0].platform, transport
    )
    xm = x.reshape(n_micro, b // n_micro, *x.shape[1:]).astype(tdt)
    ticks = n_micro + n_stage - 1
    perm = [(i, (i + 1) % n_stage) for i in range(n_stage)]

    def stage_fn(bp, xm):
        s = jax.lax.axis_index(axis_name)

        def run_local(h):
            def body(c, lp):
                return (
                    block(lp, c, None, cfg, policy=policy, attn_impl=attn_impl),
                    None,
                )

            h, _ = jax.lax.scan(body, h.astype(compute_dt), bp)
            return h.astype(tdt)

        def tick(carry, t):
            recv, acc = carry
            mb = t - s
            first_in = jax.lax.dynamic_index_in_dim(
                xm, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False
            )
            inp = jnp.where(s == 0, first_in, recv)
            out = run_local(inp)
            # the last stage banks microbatch mb's output on valid ticks;
            # bubble ticks compute garbage that is simply never stored
            store = jnp.logical_and(
                jnp.logical_and(mb >= 0, mb < n_micro), s == n_stage - 1
            )
            idx = jnp.clip(mb, 0, n_micro - 1)
            acc = jnp.where(
                store,
                jax.lax.dynamic_update_index_in_dim(acc, out, idx, 0),
                acc,
            )
            send = jax.lax.ppermute(out, axis_name, perm)
            return (send, acc), None

        # carries must enter the scan already marked as varying over the
        # pipe axis (ppermute outputs are), or the carry types mismatch
        pvary = lambda a: jax.lax.pcast(a, (axis_name,), to="varying")
        recv0 = pvary(jnp.zeros_like(xm[0]))
        acc0 = pvary(jnp.zeros_like(xm))
        (_, acc), _ = jax.lax.scan(
            tick, (recv0, acc0), jnp.arange(ticks)
        )
        # only the last stage holds real outputs; psum replicates them
        # (exact in ANY dtype: every shard is either the value or zeros,
        # so this sum is a selection, not an accumulation)
        acc = jnp.where(s == n_stage - 1, acc, jnp.zeros_like(acc))
        return jax.lax.psum(acc, axis_name)

    pspecs = stage_param_specs(block_params, axis_name)
    # Manual only over the pipe axis: any other mesh axes (e.g. "data" when
    # composing pp x dp) stay in GSPMD auto mode, so a batch-sharded x keeps
    # its data-parallel placement through the pipeline instead of being
    # all-gathered at the shard_map boundary.
    out = jax.shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(pspecs, P()),
        out_specs=P(),
        axis_names={axis_name},
    )(block_params, xm)
    return out.reshape(b, *x.shape[1:]).astype(compute_dt)
