"""DP+TP sharding: 2-D mesh train step must match single-device numerics."""

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
from gpt2_vision_language_tpu.parallel.mesh import make_mesh, shard_batch
from gpt2_vision_language_tpu.parallel.sharding import (
    gpt2_param_specs,
    shard_params,
)
from gpt2_vision_language_tpu.train import make_train_step
from gpt2_vision_language_tpu.train.optimizer import adamw_init

SMALL = GPTConfig(block_size=32, vocab_size=256, n_layer=2, n_head=4, n_embd=64)
SCHED = ScheduleConfig(max_lr=1e-3, min_lr=1e-4, warmup_steps=2, max_steps=10)


def _loss_fn(params, micro):
    _, loss = gpt2.apply(
        params, micro["x"], SMALL, targets=micro["y"], policy=FP32_POLICY
    )
    return loss


def test_param_specs_shapes():
    params = gpt2.init(jax.random.PRNGKey(0), SMALL)
    specs = gpt2_param_specs(params)
    assert specs["wte"] == jax.sharding.PartitionSpec("model", None)
    assert specs["blocks"]["attn"]["wqkv"][2] == "model"
    assert specs["blocks"]["attn"]["wo"][1] == "model"
    assert specs["blocks"]["ln1"]["scale"] == jax.sharding.PartitionSpec(None, None)


def test_tp_matches_single_device():
    assert jax.device_count() >= 8
    params = gpt2.init(jax.random.PRNGKey(0), SMALL)
    state = adamw_init(params)
    step = make_train_step(
        _loss_fn,
        OptimizerConfig(),
        SCHED,
        decay_mask=gpt2.decay_mask(params),
        donate=False,
    )
    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (2, 8, 16)).astype(np.int32)
    batch = {"x": jnp.asarray(x), "y": jnp.asarray(np.roll(x, -1, -1))}

    p1, s1, m1 = step(params, state, batch, jnp.int32(0))

    mesh = make_mesh(8, ("data", "model"), shape=(2, 4))
    sp = shard_params(params, mesh)
    ss = {
        "m": shard_params(state["m"], mesh),
        "v": shard_params(state["v"], mesh),
        "step": state["step"],
    }
    sbatch = shard_batch(mesh, batch, leading_accum_axis=True)
    p2, s2, m2 = step(sp, ss, sbatch, jnp.int32(0))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(p1["wte"]), np.asarray(p2["wte"]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(p1["blocks"]["mlp"]["wfc"]),
        np.asarray(p2["blocks"]["mlp"]["wfc"]),
        rtol=1e-4,
        atol=1e-5,
    )
    # params actually sharded: wqkv last dim split over 4 model chips
    shard_shape = p2["blocks"]["attn"]["wqkv"].sharding.shard_shape(
        p2["blocks"]["attn"]["wqkv"].shape
    )
    assert shard_shape[2] == p2["blocks"]["attn"]["wqkv"].shape[2] // 4


def test_sequence_parallel_matches_single_device():
    """act_sharding=P("data","model",None) on the residual stream is a pure
    layout/communication hint: loss, grads, and updated params must match
    the unconstrained single-device step exactly (up to fp32 reduction
    order)."""
    from gpt2_vision_language_tpu.parallel.sharding import (
        seq_parallel_sharding,
    )

    assert jax.device_count() >= 8
    mesh = make_mesh(8, ("data", "model"), shape=(2, 4))
    act_sh = seq_parallel_sharding(mesh)

    def sp_loss_fn(params, micro):
        _, loss = gpt2.apply(
            params, micro["x"], SMALL, targets=micro["y"], policy=FP32_POLICY,
            act_sharding=act_sh,
        )
        return loss

    params = gpt2.init(jax.random.PRNGKey(0), SMALL)
    state = adamw_init(params)
    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (2, 8, 16)).astype(np.int32)  # T=16 -> 4/chip
    batch = {"x": jnp.asarray(x), "y": jnp.asarray(np.roll(x, -1, -1))}

    ref_step = make_train_step(
        _loss_fn, OptimizerConfig(), SCHED,
        decay_mask=gpt2.decay_mask(params), donate=False,
    )
    p1, _, m1 = ref_step(params, state, batch, jnp.int32(0))

    sp_step = make_train_step(
        sp_loss_fn, OptimizerConfig(), SCHED,
        decay_mask=gpt2.decay_mask(params), donate=False,
    )
    sp = shard_params(params, mesh)
    ss = {
        "m": shard_params(state["m"], mesh),
        "v": shard_params(state["v"], mesh),
        "step": state["step"],
    }
    sbatch = shard_batch(mesh, batch, leading_accum_axis=True)
    p2, _, m2 = sp_step(sp, ss, sbatch, jnp.int32(0))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(p1["blocks"]["mlp"]["wfc"]),
        np.asarray(p2["blocks"]["mlp"]["wfc"]),
        rtol=1e-4,
        atol=1e-5,
    )
