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

def test_split_accum_host_guard_skips_update():
    """split_accum + nan_guard: the host-side guard must skip the update
    dispatch on a non-finite step (params/opt bitwise untouched, step
    counter unchanged), surface non-finite metrics for the caller's halt
    check, and recover cleanly (fresh zero carry) if stepped again with
    good data. This is the zero-HBM replacement for the in-graph rollback
    selects that the 1558M HBM-edge recipe had to disable."""

    def loss_fn(params, micro):
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
        split_accum=1,
    )
    good = {"x": jnp.ones((2, 1, 4))}  # accum=2 micros
    bad = {"x": jnp.concatenate(
        [jnp.ones((1, 1, 4)), jnp.zeros((1, 1, 4))], axis=0
    )}  # second micro poisons the accumulated grads

    p2, s2, m2 = step(params, state, bad, jnp.int32(0))
    assert not np.isfinite(float(m2["loss"]))
    assert not np.isfinite(float(m2["grad_norm"]))
    np.testing.assert_array_equal(np.asarray(p2["w"]), np.asarray(params["w"]))
    np.testing.assert_array_equal(
        np.asarray(s2["m"]["w"]), np.asarray(state["m"]["w"])
    )
    assert int(s2["step"]) == int(state["step"])

    # recovery: a good step after the skipped one still trains
    p3, s3, m3 = step(p2, s2, good, jnp.int32(1))
    assert np.isfinite(float(m3["loss"]))
    assert np.isfinite(float(m3["grad_norm"]))
    assert not np.allclose(np.asarray(p3["w"]), 1.0)
    assert int(s3["step"]) == int(state["step"]) + 1


def test_split_accum_host_guard_healthy_path_bitwise():
    """Removing the in-graph selects (guard_selects=False in the split
    update program) must be bitwise invisible on healthy steps: split with
    nan_guard=True == split with nan_guard=False on finite data."""

    def loss_fn(params, micro):
        return jnp.sum((params["w"] - micro["x"].mean()) ** 2)

    params = {"w": jnp.ones((8, 128)) * 0.5}
    sched = ScheduleConfig(max_lr=1e-2, min_lr=1e-3, warmup_steps=1, max_steps=5)
    kw = dict(decay_mask={"w": True}, donate=False, split_accum=2)
    guarded = make_train_step(loss_fn, OptimizerConfig(), sched, **kw)
    unguarded = make_train_step(
        loss_fn, OptimizerConfig(), sched, nan_guard=False, **kw
    )
    batch = {"x": jnp.arange(8.0).reshape(4, 1, 2)}
    pg, sg = params, adamw_init(params)
    pu, su = params, adamw_init(params)
    for i in range(3):
        pg, sg, mg = guarded(pg, sg, batch, jnp.int32(i))
        pu, su, mu = unguarded(pu, su, batch, jnp.int32(i))
    assert float(mg["loss"]) == float(mu["loss"])
    assert float(mg["grad_norm"]) == float(mu["grad_norm"])
    np.testing.assert_array_equal(np.asarray(pg["w"]), np.asarray(pu["w"]))
    np.testing.assert_array_equal(
        np.asarray(sg["v"]["w"]), np.asarray(su["v"]["w"])
    )
