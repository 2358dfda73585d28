"""Parameter sharding rules: data parallelism + Megatron-style tensor
parallelism over a ("data", "model") mesh.

The reference is DP-only (DDP/NCCL, SURVEY.md §2.3); TP is our scaling
extension point, expressed the TPU way: annotate PARAMETER shardings with
NamedSharding and let GSPMD propagate activation shardings and insert the
all-reduces over ICI — no hand-written collectives.

Megatron pattern per block:
  * fused QKV / MLP up-projection: column-parallel (output features
    sharded over "model") — each chip computes its heads / hidden slice;
  * attention output / MLP down-projection: row-parallel (input features
    sharded) — XLA inserts one psum per residual branch;
  * embeddings: vocab rows sharded over "model" (lm_head matmul becomes a
    sharded contraction + gather for the embed);
  * layernorms, biases of row-parallel layers, gates, wpe: replicated.

Optimizer state (m, v) inherits the parameter sharding automatically by
tree_map.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path_names, leaf) -> P:
    last = path_names[-1]
    n = leaf.ndim
    if last == "wte":
        return P("model", None)
    if last in ("wqkv", "wfc"):  # column parallel (L, in, out)
        return P(None, None, "model")
    if last in ("bqkv", "bfc"):  # match column-parallel outputs (L, out)
        return P(None, "model")
    if last in ("wo", "wproj"):  # row parallel (L, in, out)
        return P(None, "model", None)
    if last in ("wq", "wkv"):  # xattn projections: column parallel
        return P(None, None, "model")
    if last in ("bq", "bkv"):
        return P(None, "model")
    # everything else replicated (LN, wpe, gates, vis_proj, small biases)
    return P(*([None] * n)) if n else P()


def gpt2_param_specs(params):
    """Pytree of PartitionSpec matching models/gpt2.py layouts."""

    def per_path(path, leaf):
        names = [str(getattr(k, "key", getattr(k, "name", k))) for k in path]
        return _spec_for(names, leaf)

    return jax.tree_util.tree_map_with_path(per_path, params)


def replicated_specs(params):
    return jax.tree.map(lambda p: P(*([None] * p.ndim)) if p.ndim else P(), params)


def seq_parallel_sharding(mesh: Mesh) -> NamedSharding:
    """Sequence-parallel residual-stream sharding for (B, T, C) activations.

    Batch over "data", sequence over "model", features replicated. Passed
    as `act_sharding` to models/gpt2.py:run_blocks, it converts the
    Megatron-TP all-reduce after each row-parallel projection into a
    reduce-scatter (block output lands T-sharded) plus an all-gather
    before the next block's attention — the LN/residual segments hold and
    compute only T/tp tokens per chip (Korthikanti et al., "Reducing
    Activation Recomputation in Large Transformer Models"). The reference
    has no model parallelism at all (DDP only, train_gpt2.py:215-236);
    this is the TPU-native scaling extension."""
    return NamedSharding(mesh, P("data", "model", None))


def moment_specs(params, moments, mesh: Mesh, *, pspecs=None,
                 flat_axes=None):
    """PartitionSpecs for an optimizer moment tree (adamw_init output for
    one of m/v), which may contain three leaf kinds per parameter:

      * plain arrays shaped like the param (fp32/bf16 moments) — inherit
        the param's spec (`pspecs`, default the Megatron TP specs);
      * scalar () placeholders (frozen leaves) — replicated;
      * block-quantized {"q": (npad,) int8, "s": (npad/256,) fp32} dicts
        (train/optimizer.py q8) — the flat buffers are sharded over
        `flat_axes` on their single axis whenever every shard boundary
        lands on a 256-element block boundary
        (npad % (Q8_BLOCK * n_shards) == 0, true for all q8-eligible
        GPT-2 leaves), else replicated.

    `flat_axes` defaults to ("model",); pass ("pipe", "model") under a
    pipeline(+TP) mesh so the q/s buffers shard over every model axis
    (axes absent from the mesh are dropped). The flat-contiguous sharding
    of q/s does NOT coincide with the owning param's sharded axes
    (pipe-stage layer axis, Megatron column/row) for most leaves; GSPMD
    inserts the int8-sized reshard inside the update program's dequant
    reshape. That trades one small collective per moment per step for the
    4.3 GB HBM saving that makes int8 moments worth having — the SAME
    global block grid as the single-device recipe, so the quantized
    trajectory is unchanged by the sharding (pinned by
    test_int8_tp_step_parity and test_pipeline_int8_moments_parity).
    Per-shard requantization (zero-collective, grid depends on the mesh)
    is the known faster variant if multi-chip profiling ever shows the
    reshard matters.
    """
    from ..train.optimizer import Q8_BLOCK

    if flat_axes is None:
        flat_axes = ("model",)
    axes = tuple(a for a in flat_axes if mesh.shape.get(a, 1) > 1)
    ways = 1
    for a in axes:
        ways *= mesh.shape[a]
    if pspecs is None:
        pspecs = gpt2_param_specs(params)
    flat_p, treedef = jax.tree.flatten(params)
    flat_spec = treedef.flatten_up_to(pspecs)
    flat_m = treedef.flatten_up_to(moments)
    out = []
    for p, sp, m in zip(flat_p, flat_spec, flat_m):
        if isinstance(m, dict):  # q8 blocks
            aligned = ways > 1 and m["q"].size % (Q8_BLOCK * ways) == 0
            ax = axes if aligned else None
            out.append({"q": P(ax), "s": P(ax)})
        elif m.ndim == p.ndim:
            out.append(sp)
        else:  # scalar placeholder for a frozen leaf
            out.append(P())
    return jax.tree.unflatten(treedef, out)


def shard_moments(params, moments, mesh: Mesh, *, pspecs=None,
                  flat_axes=None):
    """Place one moment tree (m or v) on the mesh; q8-dict aware."""
    return shard_params(
        moments, mesh,
        specs=moment_specs(
            params, moments, mesh, pspecs=pspecs, flat_axes=flat_axes
        ),
    )


def shard_params(params, mesh: Mesh, specs=None):
    """Place a parameter pytree on the mesh under the given specs.

    With a 1-axis ("data",) mesh every spec collapses to replicated —
    the same code path serves pure DP and DP+TP."""
    if specs is None:
        specs = (
            gpt2_param_specs(params)
            if "model" in mesh.axis_names
            else replicated_specs(params)
        )

    def _valid(spec, leaf):
        # drop axes that are not in this mesh; a spec entry may be a
        # TUPLE of axes (q8 flat buffers shard over ("pipe", "model"))
        def keep(p):
            if p is None:
                return None
            if isinstance(p, tuple):
                kept = tuple(a for a in p if a in mesh.axis_names)
                return kept if kept else None
            return p if p in mesh.axis_names else None

        return NamedSharding(mesh, P(*(keep(p) for p in spec)))

    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, _valid(spec, leaf)),
        params,
        specs,
    )
