"""Flash-attention kernel numerics vs the XLA reference (interpreter mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt2_vision_language_tpu.ops.attention import xla_sdpa
from gpt2_vision_language_tpu.ops.flash_attention import flash_attention


def _rand_qkv(key, b, h, t, hs, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    mk = lambda k: jax.random.normal(k, (b, h, t, hs), dtype)
    return mk(ks[0]), mk(ks[1]), mk(ks[2])


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("t,bq,bk", [(256, 128, 128), (512, 256, 128), (256, 256, 256)])
def test_forward_matches_xla(causal, t, bq, bk):
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), 2, 3, t, 64)
    ref = xla_sdpa(q, k, v, causal=causal)
    out = flash_attention(
        q, k, v, causal=causal, block_q=bq, block_k=bk, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_non_multiple_lane_head_size_matches_xla():
    """hs=192 (> 128 lanes, not a multiple): _rep must tile the
    lane-replicated softmax stats up and slice back to width."""
    q, k, v = _rand_qkv(jax.random.PRNGKey(7), 1, 2, 256, 192)
    ref = xla_sdpa(q, k, v, causal=True)
    out = flash_attention(q, k, v, causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, causal=True, interpret=True)
        return jnp.sum(jnp.sin(o))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(xla_sdpa(q, k, v, causal=True)))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4, err_msg=f"d{name}"
        )


def test_backward_matches_xla():
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), 1, 2, 256, 64)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, causal=True, block_q=128, block_k=128, interpret=True)
        return jnp.sum(jnp.sin(o))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(xla_sdpa(q, k, v, causal=True)))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4, err_msg=f"d{name}"
        )


@pytest.mark.parametrize("t,bq,bk", [(256, 128, 128), (384, 256, 128)])
def test_bthd_forward_matches_bhtd(t, bq, bk):
    """The transpose-free (B, T, H, hs) layout must agree with the classic
    layout bit-for-bit in interpreter mode (same tile math, different
    BlockSpec index maps)."""
    q, k, v = _rand_qkv(jax.random.PRNGKey(4), 2, 3, t, 64)
    ref = flash_attention(
        q, k, v, causal=True, block_q=bq, block_k=bk, interpret=True
    )
    tr = lambda a: a.transpose(0, 2, 1, 3)
    out = flash_attention(
        tr(q), tr(k), tr(v), causal=True, block_q=bq, block_k=bk,
        interpret=True, layout="bthd",
    )
    np.testing.assert_array_equal(np.asarray(tr(out)), np.asarray(ref))


def test_bthd_backward_matches_bhtd():
    q, k, v = _rand_qkv(jax.random.PRNGKey(5), 1, 2, 256, 64)
    tr = lambda a: a.transpose(0, 2, 1, 3)

    def loss_ref(q, k, v):
        o = flash_attention(
            q, k, v, causal=True, block_q=128, block_k=128, interpret=True
        )
        return jnp.sum(jnp.sin(o))

    def loss_bthd(q, k, v):
        o = flash_attention(
            tr(q), tr(k), tr(v), causal=True, block_q=128, block_k=128,
            interpret=True, layout="bthd",
        )
        return jnp.sum(jnp.sin(tr(o)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gb = jax.grad(loss_bthd, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gb, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6,
            err_msg=f"d{name}",
        )


def test_bthd_ragged_and_streamed_fallback():
    """Unaligned T works in bthd; past the stream threshold the bthd entry
    transposes onto the streamed bhtd grid and still matches XLA."""
    q, k, v = _rand_qkv(jax.random.PRNGKey(6), 1, 2, 200, 64)
    tr = lambda a: a.transpose(0, 2, 1, 3)
    ref = xla_sdpa(q, k, v, causal=True)
    out = flash_attention(
        tr(q), tr(k), tr(v), causal=True, interpret=True, layout="bthd"
    )
    np.testing.assert_allclose(
        np.asarray(tr(out)), np.asarray(ref), atol=2e-5, rtol=2e-5
    )
    out2 = flash_attention(
        tr(q), tr(k), tr(v), causal=True, interpret=True, layout="bthd",
        stream_kv=True, block_q=128, block_k=128,
    )
    np.testing.assert_allclose(
        np.asarray(tr(out2)), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_backward_noncausal_matches_xla():
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), 1, 2, 256, 64)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, causal=False, block_q=128, block_k=128, interpret=True)
        return jnp.sum(o * o)

    def loss_ref(q, k, v):
        o = xla_sdpa(q, k, v, causal=False)
        return jnp.sum(o * o)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4, err_msg=f"d{name}"
        )


def test_bf16_forward_close():
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), 1, 2, 256, 64, jnp.bfloat16)
    ref = xla_sdpa(q, k, v, causal=True).astype(jnp.float32)
    out = flash_attention(q, k, v, causal=True, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=2e-2, rtol=2e-2
    )


def test_full_model_with_flash_interpret():
    """gpt2.apply with the flash kernel (interpret mode) matches the XLA
    attention path — pins the model<->kernel integration, not just the op."""
    import functools
    from unittest import mock

    import gpt2_vision_language_tpu.ops.flash_attention as fa
    from gpt2_vision_language_tpu.core.config import GPTConfig
    from gpt2_vision_language_tpu.core.precision import FP32_POLICY
    from gpt2_vision_language_tpu.models import gpt2 as G

    cfg = GPTConfig(block_size=256, vocab_size=128, n_layer=2, n_head=2, n_embd=32)
    params = G.init(jax.random.PRNGKey(0), cfg)
    idx = jnp.asarray(np.random.RandomState(0).randint(0, 128, (1, 256)), jnp.int32)

    ref, _ = G.apply(params, idx, cfg, policy=FP32_POLICY, attn_impl="xla")
    with mock.patch.object(fa, "FORCE_INTERPRET", True):
        out, _ = G.apply(params, idx, cfg, policy=FP32_POLICY, attn_impl="flash")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4
    )

# ---- round-2 kernel upgrades: ragged T, Tq != Tk, streamed K/V ----


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("t", [65, 130, 1000])
def test_ragged_t_matches_xla(causal, t):
    """T with no 128-aligned divisor (caption path is T=65) pads internally
    and must match XLA exactly on the real rows."""
    q, k, v = _rand_qkv(jax.random.PRNGKey(4), 2, 2, t, 64)
    ref = xla_sdpa(q, k, v, causal=causal)
    out = flash_attention(q, k, v, causal=causal, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("t", [65, 130])
def test_ragged_t_backward_matches_xla(t):
    q, k, v = _rand_qkv(jax.random.PRNGKey(5), 1, 2, t, 64)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v, causal=True, interpret=True)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(xla_sdpa(q, k, v, causal=True)))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4, err_msg=f"d{name}"
        )


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("tq,tk", [(64, 256), (1, 193), (130, 385)])
def test_cross_shapes_match_xla(causal, tq, tk):
    """Tq != Tk (decode / cross-attention shapes); causal is right-aligned
    like xla_sdpa (query i attends to keys <= i + Tk - Tq)."""
    key = jax.random.PRNGKey(6)
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (2, 2, tq, 64))
    k = jax.random.normal(ks[1], (2, 2, tk, 64))
    v = jax.random.normal(ks[2], (2, 2, tk, 64))
    ref = xla_sdpa(q, k, v, causal=causal)
    out = flash_attention(q, k, v, causal=causal, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_cross_shape_backward_matches_xla():
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (1, 2, 65, 64))
    k = jax.random.normal(ks[1], (1, 2, 260, 64))
    v = jax.random.normal(ks[2], (1, 2, 260, 64))

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v, causal=True, interpret=True)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(xla_sdpa(q, k, v, causal=True)))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4, err_msg=f"d{name}"
        )


def test_with_lse_causal_tq_gt_tk_rejected():
    """flash_attention_with_lse must reject causal Tq > Tk like
    flash_attention does — that shape's fully-masked leading rows would
    emit exp(0)-weighted garbage, not an error."""
    from gpt2_vision_language_tpu.ops.flash_attention import (
        flash_attention_with_lse,
    )

    q, k, v = _rand_qkv(jax.random.PRNGKey(3), 1, 2, 256, 64)
    with pytest.raises(AssertionError):
        flash_attention_with_lse(
            q, k[:, :, :128], v[:, :, :128], causal=True, interpret=True
        )


def test_causal_tq_gt_tk_rejected():
    q, k, v = _rand_qkv(jax.random.PRNGKey(8), 1, 1, 256, 64)
    with pytest.raises(AssertionError, match="Tq <= Tk"):
        flash_attention(q, k[:, :, :128], v[:, :, :128], causal=True, interpret=True)


@pytest.mark.parametrize("causal", [True, False])
def test_streamed_kv_matches_resident(causal):
    """stream_kv=True (double-buffered HBM tile DMA) must be numerically
    identical to the VMEM-resident path, fwd and bwd."""
    q, k, v = _rand_qkv(jax.random.PRNGKey(9), 1, 2, 512, 64)

    def loss(q, k, v, stream):
        o = flash_attention(
            q, k, v, causal=causal, block_q=128, block_k=128,
            stream_kv=stream, interpret=True,
        )
        return jnp.sum(jnp.sin(o)), o

    (_, o_res), g_res = jax.value_and_grad(
        lambda *a: loss(*a, False), argnums=(0, 1, 2), has_aux=True
    )(q, k, v)
    (_, o_str), g_str = jax.value_and_grad(
        lambda *a: loss(*a, True), argnums=(0, 1, 2), has_aux=True
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(o_str), np.asarray(o_res), atol=1e-6)
    for a, b, name in zip(g_str, g_res, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, err_msg=f"d{name}"
        )


def test_streamed_kv_ragged_matches_xla():
    q, k, v = _rand_qkv(jax.random.PRNGKey(10), 1, 1, 330, 64)
    ref = xla_sdpa(q, k, v, causal=True)
    out = flash_attention(
        q, k, v, causal=True, block_q=128, block_k=128,
        stream_kv=True, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_auto_stream_threshold():
    """stream_kv=None auto-selects streaming for long Tk only."""
    from gpt2_vision_language_tpu.ops import flash_attention as fa

    short = 2 * 1024 * 64 * 4  # Tk=1024 fp32: 512 KiB -> resident
    assert short <= fa.STREAM_KV_BYTES
    long = 2 * 16384 * 64 * 4  # Tk=16k fp32 -> streamed
    assert long > fa.STREAM_KV_BYTES


def test_auto_stream_kv_decision():
    """Auto-select must stream once the RESIDENT fused backward's combined
    per-(b,h) VMEM pin (K+V whole, plus q/do/dq at full Tq) crosses the
    budget — T=4096 hs=64 bf16 sat exactly at the old per-side threshold
    and Mosaic refused the 20MB scoped-VMEM compile on device (r3 run)."""
    from gpt2_vision_language_tpu.ops.flash_attention import _auto_stream_kv

    # production pretrain shape stays resident (fastest measured)
    assert not _auto_stream_kv(1024, 1024, 64, 2, 512, 512)
    assert not _auto_stream_kv(2048, 2048, 64, 2, 512, 512)
    # long context streams
    assert _auto_stream_kv(4096, 4096, 64, 2, 512, 512)
    assert _auto_stream_kv(8192, 8192, 64, 2, 512, 512)
    # long-q / short-kv cross-attention: q side alone must trigger
    assert _auto_stream_kv(8192, 64, 64, 2, 512, 512)


# ---- round-4: dt (head-major, time-in-lanes) kernels ----


def _to_dt(x):
    """(B, H, T, hs) -> (H, hs, B*T) with per-b contiguous time slabs."""
    b, h, t, hs = x.shape
    return x.transpose(1, 3, 0, 2).reshape(h, hs, b * t)


def _from_dt(x, b):
    h, hs, bt = x.shape
    return x.reshape(h, hs, b, bt // b).transpose(2, 0, 3, 1)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("t,bq,bk", [(256, 128, 128), (1024, 512, 512)])
def test_dt_forward_matches_xla(causal, t, bq, bk):
    from gpt2_vision_language_tpu.ops.flash_attention import flash_attention_dt

    b, h, hs = 2, 3, 64
    q, k, v = _rand_qkv(jax.random.PRNGKey(10), b, h, t, hs)
    ref = xla_sdpa(q, k, v, causal=causal)
    out = flash_attention_dt(
        _to_dt(q), _to_dt(k), _to_dt(v), b=b, causal=causal,
        block_q=bq, block_k=bk, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(_from_dt(out, b)), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_dt_grads_match_xla():
    from gpt2_vision_language_tpu.ops.flash_attention import flash_attention_dt

    b, h, t, hs = 2, 2, 256, 64
    q, k, v = _rand_qkv(jax.random.PRNGKey(11), b, h, t, hs)
    g = jax.random.normal(jax.random.PRNGKey(12), q.shape, jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(xla_sdpa(q, k, v, causal=True) * g)

    def loss_dt(q, k, v):
        o = flash_attention_dt(
            _to_dt(q), _to_dt(k), _to_dt(v), b=b, causal=True, interpret=True
        )
        return jnp.sum(_from_dt(o, b) * g)

    refs = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    outs = jax.grad(loss_dt, argnums=(0, 1, 2))(q, k, v)
    for name, a, r in zip("qkv", outs, refs):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=5e-5, rtol=5e-4,
            err_msg=f"d{name}",
        )


def test_model_dt_path_loss_and_grads_match_xla():
    """gpt2.loss + grads through the dt self-attention path (the pretrain
    hot path on TPU) vs the einsum path — pins the head-major QKV
    projection, the dt kernel VJP, and the head-major output projection
    end to end."""
    from unittest import mock

    import gpt2_vision_language_tpu.ops.flash_attention as fa
    from gpt2_vision_language_tpu.core.config import GPTConfig
    from gpt2_vision_language_tpu.core.precision import FP32_POLICY
    from gpt2_vision_language_tpu.models import gpt2 as G

    cfg = GPTConfig(block_size=256, vocab_size=128, n_layer=2, n_head=2,
                    n_embd=128)
    params = G.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 128, (2, 256)), jnp.int32)
    y = jnp.asarray(rng.randint(0, 128, (2, 256)), jnp.int32)

    def loss(p, impl):
        return G.loss(p, x, cfg, targets=y, policy=FP32_POLICY, attn_impl=impl)

    ref_l, ref_g = jax.value_and_grad(loss)(params, "xla")
    with mock.patch.object(fa, "FORCE_INTERPRET", True):
        # sanity: the gate actually routes to dt for this shape
        assert G._use_dt_attention("flash", 256, 64)
        out_l, out_g = jax.value_and_grad(loss)(params, "flash")
    np.testing.assert_allclose(float(out_l), float(ref_l), atol=1e-5, rtol=1e-5)
    flat_r, _ = jax.tree_util.tree_flatten(ref_g)
    flat_o, _ = jax.tree_util.tree_flatten(out_g)
    for a, r in zip(flat_o, flat_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=3e-4, rtol=3e-3
        )


def test_dt_gate_falls_back_on_unaligned_t():
    """T=65 (caption decode prefill) must NOT take the dt path."""
    from gpt2_vision_language_tpu.models import gpt2 as G

    assert not G._use_dt_attention("flash", 65, 64)
    assert not G._use_dt_attention("xla", 1024, 64)
