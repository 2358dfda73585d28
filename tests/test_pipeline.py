"""Pipeline parallelism vs single-device decoder on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from gpt2_vision_language_tpu.core.config import GPTConfig
from gpt2_vision_language_tpu.core.precision import FP32_POLICY
from gpt2_vision_language_tpu.models import gpt2
from gpt2_vision_language_tpu.parallel.mesh import make_mesh
from gpt2_vision_language_tpu.parallel.pipeline import pipeline_run_blocks

CFG = GPTConfig(block_size=16, vocab_size=128, n_layer=4, n_head=2, n_embd=32)


def _setup(seed=0):
    params = gpt2.init(jax.random.PRNGKey(seed), CFG)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (4, 16, 32))
    return params, x


def test_pipeline_matches_run_blocks():
    assert jax.device_count() >= 4
    mesh = make_mesh(4, ("pipe",))
    params, x = _setup()
    ref = gpt2.run_blocks(params, x, CFG, policy=FP32_POLICY, attn_impl="xla")
    got = jax.jit(
        lambda bp, x: pipeline_run_blocks(
            bp, x, CFG, mesh, n_micro=2, policy=FP32_POLICY
        )
    )(params["blocks"], x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_pipeline_grads_match():
    """The GPipe schedule is differentiable end-to-end: parameter grads of a
    pipelined scalar loss match the single-device decoder's."""
    assert jax.device_count() >= 4
    mesh = make_mesh(4, ("pipe",))
    params, x = _setup(seed=3)

    def loss_ref(bp, x):
        out = gpt2.run_blocks(
            {"blocks": bp}, x, CFG, policy=FP32_POLICY, attn_impl="xla"
        )
        return jnp.sum(out**2)

    def loss_pp(bp, x):
        out = pipeline_run_blocks(
            bp, x, CFG, mesh, n_micro=2, policy=FP32_POLICY
        )
        return jnp.sum(out**2)

    gr = jax.jit(jax.grad(loss_ref))(params["blocks"], x)
    gp = jax.jit(jax.grad(loss_pp))(params["blocks"], x)
    flat_r = jax.tree.leaves(gr)
    flat_p = jax.tree.leaves(gp)
    for a, b in zip(flat_p, flat_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        )


def test_pipeline_microbatch_counts():
    """More microbatches (smaller bubbles) must not change the result."""
    assert jax.device_count() >= 4
    mesh = make_mesh(4, ("pipe",))
    params, x = _setup(seed=5)
    a = pipeline_run_blocks(
        params["blocks"], x, CFG, mesh, n_micro=2, policy=FP32_POLICY
    )
    b = pipeline_run_blocks(
        params["blocks"], x, CFG, mesh, n_micro=4, policy=FP32_POLICY
    )
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
    )
