"""Ring attention: causal attention with Q/K/V sharded along the sequence
axis over a mesh axis, communicated block-by-block over ICI.

The reference caps context at block_size=1024 on one GPU
(/root/reference/source/gpt2/train_gpt2.py:79) — sequence-length scaling
there is just FlashAttention's O(T) memory within a device. This module is
the TPU-native long-context extension SURVEY.md §5 names: each device
holds one contiguous sequence chunk; K/V chunks rotate around the mesh
axis with `jax.lax.ppermute` while every device folds the incoming chunk
into its local queries' online softmax (Liu et al., "Ring Attention with
Blockwise Transformers"). Peak activation memory per device is
O(T/n_ring), and the per-hop FLOPs hide the ppermute latency on ICI.

Causality across chunks: device i's queries attend to
  * chunk j <  i : fully visible  -> unmasked flash call
  * chunk j == i : standard causal flash call
  * chunk j >  i : fully masked   -> skipped (contributes nothing)
The per-chunk partials (acc, running max m, normalizer l) merge with the
usual flash rescaling, so the result is EXACTLY softmax over the full
sequence (up to fp32 reduction order) — pinned by
tests/test_ring_attention.py against single-device attention on an
8-device CPU mesh.

Differentiation: the ring loop is plain traceable JAX (fori-free Python
loop over static n_ring hops), so jax.grad flows through ppermute; wrap
the call in jax.checkpoint at the block level for long-context training.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .attention import xla_sdpa

NEG_INF = -1e30

# (mesh, ring_axis, batch_axis) consumed by ops.attention.sdpa(impl="ring")
# so the model's attn_impl flag can select the ring path without threading
# mesh objects through every layer signature.
RING_MESH = None


def set_ring_mesh(mesh: Mesh, axis_name: str = "model",
                  batch_axis: str | None = "data") -> None:
    global RING_MESH
    RING_MESH = (mesh, axis_name, batch_axis) if mesh is not None else None


def _local_attn_stats(q, k, v, *, causal, scale):
    """Blockwise attention over local chunks returning (acc, m, l) partials.

    q: (B, H, Tq, hs), k/v: (B, H, Tk, hs). fp32 stats, unnormalized acc.
    """
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if causal:
        tq, tk = q.shape[2], k.shape[2]
        qpos = jnp.arange(tq)[:, None] + (tk - tq)
        keep = qpos >= jnp.arange(tk)[None, :]
        s = jnp.where(keep, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)  # (B, H, Tq, 1)
    # fully-masked rows (none here by construction) would give m=NEG_INF
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return acc, m, l


def _merge(carry, update):
    """Online-softmax merge of two (acc, m, l) partials."""
    acc0, m0, l0 = carry
    acc1, m1, l1 = update
    m = jnp.maximum(m0, m1)
    c0 = jnp.exp(m0 - m)
    c1 = jnp.exp(m1 - m)
    return acc0 * c0 + acc1 * c1, m, l0 * c0 + l1 * c1


def _ring_body(q, k, v, *, axis_name, n_ring, scale):
    """Per-device program: fold n_ring K/V chunks into local queries."""
    my = jax.lax.axis_index(axis_name)
    b, h, tq, hs = q.shape
    acc = jnp.zeros((b, h, tq, hs), jnp.float32)
    m = jnp.full((b, h, tq, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((b, h, tq, 1), jnp.float32)
    perm = [(i, (i + 1) % n_ring) for i in range(n_ring)]

    for hop in range(n_ring):
        src = (my - hop) % n_ring  # owner of the chunk currently held
        # chunk-level causality, branched (not masked) so each device does
        # ~half the ring's FLOPs, like the in-kernel causal block skip:
        #   src == my -> intra-chunk causal; src < my -> fully visible;
        #   src > my  -> future chunk, contributes nothing
        part = jax.lax.cond(
            src == my,
            lambda q, k, v: _local_attn_stats(q, k, v, causal=True, scale=scale),
            lambda q, k, v: jax.lax.cond(
                src < my,
                lambda q, k, v: _local_attn_stats(
                    q, k, v, causal=False, scale=scale
                ),
                # derived from q (not fresh constants) so the outputs carry
                # shard_map's varying-axes type like the compute branches;
                # XLA constant-folds the arithmetic
                lambda q, k, v: (
                    (q * 0.0).astype(jnp.float32),
                    (q[..., :1] * 0.0).astype(jnp.float32) + NEG_INF,
                    (q[..., :1] * 0.0).astype(jnp.float32),
                ),
                q, k, v,
            ),
            q, k, v,
        )
        acc, m, l = _merge((acc, m, l), part)
        if hop + 1 < n_ring:
            k = jax.lax.ppermute(k, axis_name, perm)
            v = jax.lax.ppermute(v, axis_name, perm)

    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ring_attention(
    q,
    k,
    v,
    mesh: Mesh,
    *,
    axis_name: str = "model",
    batch_axis: str | None = "data",
    causal: bool = True,
):
    """Causal attention over (B, H, T, hs) with T sharded on `axis_name`.

    Must be called with GLOBAL arrays (or inside jit) whose sequence axis
    is divisible by the ring size; shard_map splits them so each device
    sees its (B, H, T/n, hs) chunk. Batch is additionally sharded over
    `batch_axis` when given.
    """
    assert causal, "non-causal ring attention not needed by any caller"
    n_ring = mesh.shape[axis_name]
    hs = q.shape[-1]
    scale = 1.0 / (hs ** 0.5)
    if n_ring == 1:
        return xla_sdpa(q, k, v, causal=True)
    bspec = batch_axis if batch_axis in mesh.axis_names else None
    spec = P(bspec, None, axis_name, None)
    body = functools.partial(
        _ring_body, axis_name=axis_name, n_ring=n_ring, scale=scale
    )
    return jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec
    )(q, k, v)
