"""Device mesh and sharding for SPMD data parallelism.

TPU-native replacement for the reference's DDP/NCCL runtime
(train_gpt2.py:215-236,269-271,467-471):

  * `init_process_group('nccl')` + per-rank device pin  ->  one SPMD program
    over a `jax.sharding.Mesh`; multi-host runs call
    `jax.distributed.initialize()` once and get the same program.
  * DDP bucketed gradient all-reduce deferred to the last micro-step  ->
    gradients are averaged by XLA-inserted collectives over ICI exactly
    once per step, because the whole grad-accumulation scan lives inside
    one jitted step (no per-micro-step sync to suppress).
  * `dist.all_reduce(loss, AVG)` / HellaSwag SUM  ->  jnp reductions over
    sharded arrays; XLA lowers them to psum on ICI.
  * "master process" (rank 0 does I/O)  ->  jax.process_index() == 0.

The default mesh is 1-D ("data") matching the reference's DP-only
parallelism (SURVEY.md §2.3); a second "model" axis is accepted for
tensor-parallel extension.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> None:
    """Multi-host init (torchrun-env equivalent). No-op single-host."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def is_master() -> bool:
    return jax.process_index() == 0


def local_world() -> int:
    return jax.device_count()


def make_mesh(
    num_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(shape)) == n, f"mesh shape {shape} != {n} devices"
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, *, leading_accum_axis: bool = False) -> NamedSharding:
    """Shard the per-device batch axis over the "data" mesh axis.

    Batches are (B, ...) or (accum, B, ...) with `leading_accum_axis`.
    """
    if leading_accum_axis:
        return NamedSharding(mesh, P(None, "data"))
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, batch, *, leading_accum_axis: bool = False):
    """Place a host batch pytree onto the mesh, sharded over "data".

    Single-process: a plain device_put. Multi-host (jax.process_count()>1):
    each process holds only ITS slice of the global batch, assembled into a
    global array with make_array_from_process_local_data — the SPMD
    equivalent of per-rank DataLoader striding (train_gpt2.py:175,182)."""
    sh = batch_sharding(mesh, leading_accum_axis=leading_accum_axis)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)

    def to_global(x):
        local = np.asarray(x)
        gshape = list(local.shape)
        axis = 1 if leading_accum_axis else 0
        gshape[axis] = gshape[axis] * jax.process_count()
        return jax.make_array_from_process_local_data(sh, local, tuple(gshape))

    return jax.tree.map(to_global, batch)
