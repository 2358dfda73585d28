"""Ring attention vs single-device attention on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from gpt2_vision_language_tpu.ops.attention import xla_sdpa
from gpt2_vision_language_tpu.ops.ring_attention import ring_attention
from gpt2_vision_language_tpu.parallel.mesh import make_mesh


def _qkv(b=2, h=2, t=32, hs=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    mk = lambda k: jax.random.normal(k, (b, h, t, hs), jnp.float32)
    return mk(ks[0]), mk(ks[1]), mk(ks[2])


def test_ring_matches_single_device():
    assert jax.device_count() >= 8
    mesh = make_mesh(8, ("data", "model"), shape=(2, 4))
    q, k, v = _qkv()
    ref = xla_sdpa(q, k, v, causal=True)
    got = jax.jit(
        lambda q, k, v: ring_attention(q, k, v, mesh, axis_name="model")
    )(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_ring_grads_match_single_device():
    assert jax.device_count() >= 8
    mesh = make_mesh(8, ("data", "model"), shape=(2, 4))
    q, k, v = _qkv(seed=1)
    do = jax.random.normal(jax.random.PRNGKey(7), q.shape, jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(xla_sdpa(q, k, v, causal=True) * do)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh, axis_name="model") * do)

    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    gg = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(gg, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5
        )


def test_ring_flash_chunks_match_single_device():
    """chunk_impl="flash" (interpret mode): each ring hop runs the Pallas
    kernel via flash_attention_with_lse; values AND grads must match the
    dense single-device reference — this exercises the lse-cotangent
    backward (D_i -> D_i - dlse_i)."""
    assert jax.device_count() >= 8
    mesh = make_mesh(8, ("data", "model"), shape=(2, 4))
    # chunks of 128 rows keep the kernel's 128-lane tiling exact
    q, k, v = _qkv(b=2, h=2, t=512, hs=64, seed=4)
    do = jax.random.normal(jax.random.PRNGKey(9), q.shape, jnp.float32)

    ref = xla_sdpa(q, k, v, causal=True)
    got = jax.jit(
        lambda q, k, v: ring_attention(
            q, k, v, mesh, axis_name="model", chunk_impl="flash",
            interpret=True,
        )
    )(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )

    def loss_ref(q, k, v):
        return jnp.sum(xla_sdpa(q, k, v, causal=True) * do)

    def loss_ring(q, k, v):
        return jnp.sum(
            ring_attention(
                q, k, v, mesh, axis_name="model", chunk_impl="flash",
                interpret=True,
            )
            * do
        )

    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    gg = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    for a, b, n in zip(gg, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=f"d{n}",
        )


def test_gpt2_forward_with_ring_attn_impl():
    """attn_impl="ring" end to end through the decoder: loss must match the
    xla attention path (the long-context training wiring)."""
    from gpt2_vision_language_tpu.core.config import GPTConfig
    from gpt2_vision_language_tpu.core.precision import FP32_POLICY
    from gpt2_vision_language_tpu.models import gpt2
    from gpt2_vision_language_tpu.ops import ring_attention as ra

    assert jax.device_count() >= 8
    mesh = make_mesh(8, ("data", "model"), shape=(2, 4))
    cfg = GPTConfig(block_size=16, vocab_size=128, n_layer=2, n_head=2,
                    n_embd=32)
    params = gpt2.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 128)
    y = jnp.roll(x, -1, axis=-1)

    _, ref = jax.jit(
        lambda p, x, y: gpt2.apply(
            p, x, cfg, targets=y, policy=FP32_POLICY, attn_impl="xla"
        )
    )(params, x, y)
    ra.set_ring_mesh(mesh)
    try:
        _, got = jax.jit(
            lambda p, x, y: gpt2.apply(
                p, x, cfg, targets=y, policy=FP32_POLICY, attn_impl="ring"
            )
        )(params, x, y)
    finally:
        ra.set_ring_mesh(None)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_ring_trivial_on_1d_mesh():
    """axis absent / size-1 ring degrades to plain attention."""
    mesh = make_mesh(2, ("data", "model"), shape=(2, 1))
    q, k, v = _qkv(t=16, seed=2)
    ref = xla_sdpa(q, k, v, causal=True)
    got = ring_attention(q, k, v, mesh, axis_name="model")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )
