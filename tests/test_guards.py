"""Failure-detection guard: non-finite loss must not corrupt state."""

import jax
import jax.numpy as jnp
import numpy as np

from gpt2_vision_language_tpu.core.config import OptimizerConfig, ScheduleConfig
from gpt2_vision_language_tpu.train import make_train_step
from gpt2_vision_language_tpu.train.optimizer import adamw_init


def test_nan_loss_rolls_back_update():
    def loss_fn(params, micro):
        # loss poisoned by the batch: finite for ones, NaN for zeros
        base = jnp.sum(params["w"] * micro["x"].sum())
        return base / micro["x"].sum()  # 0/0 -> NaN when x all zeros

    params = {"w": jnp.ones((8, 128))}
    state = adamw_init(params)
    step = make_train_step(
        loss_fn,
        OptimizerConfig(),
        ScheduleConfig(max_lr=1e-2, min_lr=1e-3, warmup_steps=1, max_steps=5),
        decay_mask={"w": True},
        donate=False,
    )
    good = {"x": jnp.ones((1, 4))}
    bad = {"x": jnp.zeros((1, 4))}

    p1, s1, m1 = step(params, state, good, jnp.int32(0))
    assert np.isfinite(float(m1["loss"]))
    assert not np.allclose(np.asarray(p1["w"]), 1.0)  # update applied

    p2, s2, m2 = step(params, state, bad, jnp.int32(0))
    assert not np.isfinite(float(m2["loss"]))
    np.testing.assert_array_equal(np.asarray(p2["w"]), np.asarray(params["w"]))
    np.testing.assert_array_equal(
        np.asarray(s2["m"]["w"]), np.asarray(state["m"]["w"])
    )
