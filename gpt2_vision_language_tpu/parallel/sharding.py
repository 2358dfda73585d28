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
        # drop "model" axes that are not in this mesh
        parts = tuple(
            p if (p is None or p in mesh.axis_names) else None for p in spec
        )
        return NamedSharding(mesh, P(*parts))

    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, _valid(spec, leaf)),
        params,
        specs,
    )
