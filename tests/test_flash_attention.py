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
