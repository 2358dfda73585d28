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


def _chunk_attn_einsum(q, k, v, *, causal, scale):
    """Per-chunk attention returning NORMALIZED (out fp32, lse).

    Reference path (CPU tests / small chunks): materializes the per-chunk
    (Tq, Tk/n) score matrix. q: (B, H, Tq, hs), k/v: (B, H, Tk, hs)."""
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if causal:
        tq, tk = q.shape[2], k.shape[2]
        qpos = jnp.arange(tq)[:, None] + (tk - tq)
        keep = qpos >= jnp.arange(tk)[None, :]
        s = jnp.where(keep, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)  # (B, H, Tq, 1)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ) / l
    return out, m + jnp.log(l)


def _chunk_attn_flash(q, k, v, *, causal, scale, interpret=False):
    """Per-chunk attention via the Pallas kernel + logsumexp output —
    O(block) score memory per chunk, so per-device activation memory is
    truly O(T/n_ring). `scale` is fixed 1/sqrt(hs) inside the kernel."""
    del scale  # kernel applies 1/sqrt(hs) itself
    from .flash_attention import flash_attention_with_lse

    out, lse = flash_attention_with_lse(
        q, k, v, causal=causal, interpret=interpret
    )
    return out.astype(jnp.float32), lse


def _merge(carry, update):
    """Merge two normalized partials (out, lse): exact softmax combine."""
    o0, l0 = carry
    o1, l1 = update
    l = jnp.logaddexp(l0, l1)
    # exp(-inf - -inf) is nan; a chunk with l == NEG_INF contributes 0
    w0 = jnp.where(l0 <= NEG_INF, 0.0, jnp.exp(l0 - l))
    w1 = jnp.where(l1 <= NEG_INF, 0.0, jnp.exp(l1 - l))
    return o0 * w0 + o1 * w1, l


def _ring_body(q, k, v, *, axis_name, n_ring, scale, chunk_impl, interpret):
    """Per-device program: fold n_ring K/V chunks into local queries."""
    my = jax.lax.axis_index(axis_name)
    b, h, tq, hs = q.shape
    out = jnp.zeros((b, h, tq, hs), jnp.float32)
    lse = jnp.full((b, h, tq, 1), NEG_INF, jnp.float32)
    perm = [(i, (i + 1) % n_ring) for i in range(n_ring)]
    if chunk_impl == "flash":
        attn = functools.partial(_chunk_attn_flash, interpret=interpret)
    else:
        attn = _chunk_attn_einsum

    for hop in range(n_ring):
        src = (my - hop) % n_ring  # owner of the chunk currently held
        # chunk-level causality, branched (not masked) so each device does
        # ~half the ring's FLOPs, like the in-kernel causal block skip:
        #   src == my -> intra-chunk causal; src < my -> fully visible;
        #   src > my  -> future chunk, contributes nothing
        part = jax.lax.cond(
            src == my,
            lambda q, k, v: attn(q, k, v, causal=True, scale=scale),
            lambda q, k, v: jax.lax.cond(
                src < my,
                lambda q, k, v: attn(q, k, v, causal=False, scale=scale),
                # derived from q (not fresh constants) so the outputs carry
                # shard_map's varying-axes type like the compute branches;
                # XLA constant-folds the arithmetic
                lambda q, k, v: (
                    (q * 0.0).astype(jnp.float32),
                    (q[..., :1] * 0.0).astype(jnp.float32) + NEG_INF,
                ),
                q, k, v,
            ),
            q, k, v,
        )
        out, lse = _merge((out, lse), part)
        if hop + 1 < n_ring:
            k = jax.lax.ppermute(k, axis_name, perm)
            v = jax.lax.ppermute(v, axis_name, perm)

    return out.astype(q.dtype)


def ring_attention(
    q,
    k,
    v,
    mesh: Mesh,
    *,
    axis_name: str = "model",
    batch_axis: str | None = "data",
    causal: bool = True,
    chunk_impl: str = "auto",
    interpret: bool = False,
):
    """Causal attention over (B, H, T, hs) with T sharded on `axis_name`.

    Must be called with GLOBAL arrays (or inside jit) whose sequence axis
    is divisible by the ring size; shard_map splits them so each device
    sees its (B, H, T/n, hs) chunk. Batch is additionally sharded over
    `batch_axis` when given.

    chunk_impl: "flash" runs each hop through the Pallas kernel via
    flash_attention_with_lse — per-device memory is O(T/n_ring) with no
    per-chunk score matrix; "einsum" is the dense reference; "auto" picks
    flash on TPU for chunks >= 512 (mirroring attention.sdpa's policy).
    """
    assert causal, "non-causal ring attention not needed by any caller"
    n_ring = mesh.shape[axis_name]
    hs = q.shape[-1]
    scale = 1.0 / (hs ** 0.5)
    if n_ring == 1:
        return xla_sdpa(q, k, v, causal=True)
    if chunk_impl == "auto":
        chunk = q.shape[2] // n_ring
        try:
            on_tpu = jax.devices()[0].platform == "tpu"
        except Exception:  # pragma: no cover
            on_tpu = False
        chunk_impl = "flash" if (on_tpu and chunk >= 512) else "einsum"
    bspec = batch_axis if batch_axis in mesh.axis_names else None
    spec = P(bspec, None, axis_name, None)
    body = functools.partial(
        _ring_body, axis_name=axis_name, n_ring=n_ring, scale=scale,
        chunk_impl=chunk_impl, interpret=interpret,
    )
    return jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        # pallas_call (flash chunks) can't annotate varying-manual-axes on
        # its out_shapes; numerics are pinned by tests/test_ring_attention
        check_vma=False,
    )(q, k, v)
