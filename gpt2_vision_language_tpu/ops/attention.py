"""Scaled dot-product attention.

TPU-native replacement for the reference's `F.scaled_dot_product_attention`
(FlashAttention CUDA kernel, train_gpt2.py:40; non-causal cross-attention
gpt2_cross-att/model.py:55). Two paths:

  * `impl='xla'`  — plain einsum attention; XLA fuses it well for small
    KV (the 33-token cross-attention, Q-Former) and it is the numerics
    reference for tests.
  * `impl='flash'` — blockwise online-softmax Pallas kernel
    (ops/flash_attention.py), used for the causal T=1024 decoder hot path
    on TPU. O(T) memory, never materializes the (T, T) score matrix in HBM.

`impl='auto'` routes causal long-sequence attention to flash when running
on TPU, everything else to XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _flash_available() -> bool:
    try:
        from . import flash_attention  # noqa: F401

        return True
    except ImportError:
        return False


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def sdpa(q, k, v, *, causal: bool, impl: str = "auto", layout: str = "bhtd"):
    """Attention over (B, H, Tq, hs) x (B, H, Tk, hs) -> (B, H, Tq, hs),
    or the same in (B, T, H, hs) order with layout="bthd" (the layout the
    fused-QKV projection yields for free — both the flash kernel and the
    einsum path consume it without a transpose).

    Matches torch F.scaled_dot_product_attention semantics: scale =
    1/sqrt(head_dim), softmax in fp32.
    """
    t_axis = 1 if layout == "bthd" else 2
    if impl == "auto":
        # Measured on v5e-1 (bf16, hs=64, fwd+bwd): flash ~= XLA at T
        # 512-768, 1.28x at 1024, 3.6x at 4096, 31x at 8192 (streamed);
        # XLA wins below 512 (caption T=65: 0.6x, CLIP T=257: 0.7x). Any
        # T works since the kernel block-pads ragged lengths.
        use_flash = (
            causal
            and _flash_available()
            and _on_tpu()
            and q.shape[t_axis] == k.shape[t_axis]
            and q.shape[t_axis] >= 512
        )
        impl = "flash" if use_flash else "xla"
    if impl == "flash":
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, causal=causal, layout=layout)
    if impl == "ring":
        # sequence-sharded long-context path: requires set_ring_mesh()
        # to have been called with the mesh + axis to ring over
        from . import ring_attention as ra

        assert ra.RING_MESH is not None, (
            "attn_impl='ring' needs ops.ring_attention.set_ring_mesh(mesh)"
        )
        mesh, axis_name, batch_axis = ra.RING_MESH
        if layout == "bthd":
            tr = lambda a: a.transpose(0, 2, 1, 3)
            out = ra.ring_attention(
                tr(q), tr(k), tr(v), mesh, axis_name=axis_name,
                batch_axis=batch_axis, causal=causal,
            )
            return tr(out)
        return ra.ring_attention(
            q, k, v, mesh, axis_name=axis_name, batch_axis=batch_axis,
            causal=causal,
        )
    return xla_sdpa(q, k, v, causal=causal, layout=layout)


def causal_sdpa(q, k, v, *, impl: str = "auto"):
    return sdpa(q, k, v, causal=True, impl=impl)


def xla_sdpa(q, k, v, *, causal: bool, layout: str = "bhtd"):
    """Reference einsum attention. Softmax in fp32, matmuls accumulate fp32.

    layout="bthd" consumes/produces (B, T, H, hs) directly — the einsum
    contraction absorbs the head/sequence axis order, so callers in that
    layout never pay a transpose; the contraction and values are identical
    either way."""
    out_dtype = q.dtype
    head_dim = q.shape[-1]
    scale = 1.0 / (head_dim**0.5)
    t_axis = 1 if layout == "bthd" else 2
    qk = "bqhd,bkhd->bhqk" if layout == "bthd" else "bhqd,bhkd->bhqk"
    pv = "bhqk,bkhd->bqhd" if layout == "bthd" else "bhqk,bhkd->bhqd"
    scores = jnp.einsum(qk, q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if causal:
        tq, tk = q.shape[t_axis], k.shape[t_axis]
        qpos = jnp.arange(tq)[:, None] + (tk - tq)  # right-aligned for decode
        kpos = jnp.arange(tk)[None, :]
        mask = qpos >= kpos
        scores = jnp.where(mask[None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        pv, probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(out_dtype)
