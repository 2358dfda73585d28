"""Layerwise reverse-scan gradient accumulation parity.

models/gpt2.py::loss_grad_layerwise streams each layer's grads into the
accumulator slices instead of materializing jax.grad's stacked tree (the
2.9 GiB accum-arena term at GPT-2 1558M). Chain rule and accumulation
order are identical, so in fp32 the result must match value_and_grad +
whole-tree accumulate to fp tolerance; in SR-bf16 mode the keys differ
(per-layer salts) but the trajectory must track the fp32 one like the
standard SR path does (tests/test_bf16_drift.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt2_vision_language_tpu.core.config import (
    GPTConfig,
    OptimizerConfig,
    ScheduleConfig,
)
from gpt2_vision_language_tpu.core.precision import FP32_POLICY
from gpt2_vision_language_tpu.models import gpt2
from gpt2_vision_language_tpu.train import make_train_step
from gpt2_vision_language_tpu.train.optimizer import adamw_init

SMALL = GPTConfig(block_size=32, vocab_size=128, n_layer=3, n_head=2, n_embd=32)
SCHED = ScheduleConfig(max_lr=1e-3, min_lr=1e-4, warmup_steps=2, max_steps=10)


def _loss_fn(params, micro):
    return gpt2.loss(
        params, micro["x"], SMALL, targets=micro["y"], policy=FP32_POLICY,
        ce_chunks=2,
    )


def _layerwise_fn(params, micro, gsum, acc):
    return gpt2.loss_grad_layerwise(
        params, micro["x"], SMALL, targets=micro["y"], gsum=gsum, acc=acc,
        policy=FP32_POLICY, ce_chunks=2,
    )


def _batch(rng, accum, b, t):
    x = rng.randint(0, SMALL.vocab_size, size=(accum, b, t))
    y = np.roll(x, -1, axis=-1)
    return {"x": jnp.asarray(x), "y": jnp.asarray(y)}


def _steps(step_fn, params, state, n=3, seed=0):
    rng = np.random.RandomState(seed)
    m = None
    for i in range(n):
        batch = _batch(rng, 4, 2, 16)
        params, state, m = step_fn(params, state, batch, jnp.int32(i))
    return params, m


@pytest.mark.parametrize("split", [0, 2])
def test_layerwise_matches_standard_fp32(split):
    """Same data, fp32 accumulators: layerwise == value_and_grad to fp
    tolerance, through both the one-jit scan and split_accum paths."""
    params = gpt2.init(jax.random.PRNGKey(0), SMALL)
    state = adamw_init(params)
    kw = dict(
        decay_mask=gpt2.decay_mask(params), donate=False, split_accum=split
    )
    std = make_train_step(_loss_fn, OptimizerConfig(), SCHED, **kw)
    lw = make_train_step(
        _loss_fn, OptimizerConfig(), SCHED,
        layerwise_loss_grad=_layerwise_fn, **kw
    )
    p1, m1 = _steps(std, params, state)
    p2, m2 = _steps(lw, params, state)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
        ),
        p1,
        p2,
    )


def test_layerwise_sr_bf16_tracks_fp32():
    """SR-bf16 accumulators under layerwise streaming: different rounding
    keys than the standard SR path, but must track the fp32 trajectory."""
    params = gpt2.init(jax.random.PRNGKey(1), SMALL)
    state = adamw_init(params)
    kw = dict(decay_mask=gpt2.decay_mask(params), donate=False, split_accum=1)
    ref = make_train_step(_loss_fn, OptimizerConfig(), SCHED, **kw)
    lw16 = make_train_step(
        _loss_fn, OptimizerConfig(), SCHED,
        layerwise_loss_grad=_layerwise_fn, grad_accum_dtype="bfloat16", **kw
    )
    p1, m1 = _steps(ref, params, state, n=4)
    p2, m2 = _steps(lw16, params, state, n=4)
    assert np.isfinite(float(m2["loss"]))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=3e-3)
    err = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))),
        p1,
        p2,
    )
    assert max(jax.tree.leaves(err)) < 5e-3, err


def test_layerwise_grads_match_jax_grad():
    """Raw gradient parity against jax.grad of the same loss, fp32."""
    params = gpt2.init(jax.random.PRNGKey(2), SMALL)
    rng = np.random.RandomState(7)
    micro = jax.tree.map(lambda a: a[0], _batch(rng, 1, 2, 16))

    loss_ref, g_ref = jax.value_and_grad(_loss_fn)(params, micro)

    step = make_train_step(
        _loss_fn, OptimizerConfig(), SCHED,
        decay_mask=gpt2.decay_mask(params), donate=False,
        layerwise_loss_grad=_layerwise_fn,
    )
    del step  # built only to assert the wiring accepts the fn

    # drive loss_grad_layerwise directly with a plain fp32 accumulator
    class Acc:
        @staticmethod
        def block_slice_add(gb, g_lp, i):
            return jax.tree.map(
                lambda a, g: jax.lax.dynamic_update_index_in_dim(
                    a,
                    jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False)
                    + g.astype(jnp.float32),
                    i,
                    0,
                ),
                gb,
                g_lp,
            )

        @staticmethod
        def tree_add(gsub, dsub):
            return jax.tree.map(
                lambda a, g: a + g.astype(jnp.float32), gsub, dsub
            )

    gsum = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
    loss_lw, g_lw = jax.jit(
        lambda p, m, gs: _layerwise_fn(p, m, gs, Acc)
    )(params, micro, gsum)

    np.testing.assert_allclose(float(loss_ref), float(loss_lw), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        g_ref,
        g_lw,
    )
