"""AdamW + clip parity vs torch.optim.AdamW, schedule parity, fused kernel."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt2_vision_language_tpu.core.config import OptimizerConfig, ScheduleConfig
from gpt2_vision_language_tpu.train.optimizer import (
    adamw_init,
    adamw_update,
    global_norm,
)
from gpt2_vision_language_tpu.train.schedule import cosine_warmup_lr


def _ref_get_lr(it, max_lr, min_lr, warmup_steps, max_steps):
    """Reference LR schedule (train_gpt2.py:277-285), re-stated for testing."""
    if it < warmup_steps:
        return max_lr * (it + 1) / warmup_steps
    if it > max_steps:
        return min_lr
    decay_ratio = (it - warmup_steps) / (max_steps - warmup_steps)
    coeff = 0.5 * (1.0 + math.cos(math.pi * decay_ratio))
    return min_lr + coeff * (max_lr - min_lr)


def test_schedule_matches_reference_formula():
    cfg = ScheduleConfig(max_lr=6e-4, min_lr=6e-5, warmup_steps=715, max_steps=19073)
    for it in [0, 1, 100, 714, 715, 716, 5000, 19072, 19073, 19074, 25000]:
        ours = float(cosine_warmup_lr(it, cfg))
        ref = _ref_get_lr(it, 6e-4, 6e-5, 715, 19073)
        np.testing.assert_allclose(ours, ref, rtol=1e-6, err_msg=f"step {it}")


@pytest.mark.parametrize("with_clip", [False, True])
def test_adamw_matches_torch(with_clip):
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    w = rng.randn(16, 128).astype(np.float32)  # decay group (ndim 2)
    b = rng.randn(128).astype(np.float32)  # no-decay group

    tw = torch.nn.Parameter(torch.tensor(w))
    tb = torch.nn.Parameter(torch.tensor(b))
    opt = torch.optim.AdamW(
        [
            {"params": [tw], "weight_decay": 0.1},
            {"params": [tb], "weight_decay": 0.0},
        ],
        lr=1e-3,
        betas=(0.9, 0.95),
        eps=1e-8,
    )

    params = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    state = adamw_init(params)
    cfg = OptimizerConfig(grad_clip=1.0 if with_clip else 1e9)
    decay = {"w": True, "b": False}

    for step in range(5):
        gw = rng.randn(16, 128).astype(np.float32) * (3.0 if with_clip else 0.01)
        gb = rng.randn(128).astype(np.float32) * (3.0 if with_clip else 0.01)
        opt.zero_grad()
        tw.grad = torch.tensor(gw)
        tb.grad = torch.tensor(gb)
        torch.nn.utils.clip_grad_norm_([tw, tb], cfg.grad_clip)
        opt.step()
        params, state, _ = adamw_update(
            params,
            {"w": jnp.asarray(gw), "b": jnp.asarray(gb)},
            state,
            jnp.float32(1e-3),
            cfg,
            decay_mask=decay,
        )

    np.testing.assert_allclose(
        np.asarray(params["w"]), tw.detach().numpy(), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(params["b"]), tb.detach().numpy(), rtol=2e-5, atol=2e-6
    )


def test_trainable_mask_freezes():
    params = {"a": jnp.ones((8, 128)), "b": jnp.ones((8, 128))}
    grads = {"a": jnp.ones((8, 128)), "b": jnp.ones((8, 128))}
    state = adamw_init(params)
    new_params, _, norm = adamw_update(
        params,
        grads,
        state,
        jnp.float32(0.1),
        OptimizerConfig(),
        decay_mask={"a": True, "b": True},
        trainable_mask={"a": True, "b": False},
    )
    assert not np.allclose(np.asarray(new_params["a"]), 1.0)
    np.testing.assert_array_equal(np.asarray(new_params["b"]), 1.0)
    # frozen leaves excluded from the clip norm
    np.testing.assert_allclose(float(norm), np.sqrt(8 * 128), rtol=1e-6)


def test_bf16_state_tracks_fp32_trajectory():
    """Compact (bf16) m/v states: update math is fp32 with one rounding per
    step at store, so a short trajectory must stay close to the fp32-state
    trajectory (this is the opt-in memory mode that fits 774M on a 16GB
    chip)."""
    rng = np.random.RandomState(0)
    params32 = {"w": jnp.asarray(rng.randn(16, 128), jnp.float32)}
    params16 = jax.tree.map(lambda p: p, params32)
    s32 = adamw_init(params32)
    s16 = adamw_init(params32, state_dtype=jnp.bfloat16)
    assert s16["m"]["w"].dtype == jnp.bfloat16
    cfg = OptimizerConfig()
    for i in range(10):
        g = {"w": jnp.asarray(rng.randn(16, 128) * 0.1, jnp.float32)}
        params32, s32, _ = adamw_update(
            params32, g, s32, jnp.float32(1e-2), cfg, decay_mask={"w": True}
        )
        params16, s16, _ = adamw_update(
            params16, g, s16, jnp.float32(1e-2), cfg, decay_mask={"w": True}
        )
    assert s16["v"]["w"].dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(params16["w"]), np.asarray(params32["w"]), atol=5e-3
    )


def test_fused_leaf_matches_xla():
    from gpt2_vision_language_tpu.ops import fused_adamw as fa

    rng = np.random.RandomState(1)
    shape = (40, 128)
    p = jnp.asarray(rng.randn(*shape), jnp.float32)
    g = jnp.asarray(rng.randn(*shape), jnp.float32)
    params = {"p": p}
    grads = {"p": g}
    cfg = OptimizerConfig()
    s1 = adamw_init(params)
    ref_p, ref_s, _ = adamw_update(
        params, grads, s1, jnp.float32(1e-3), cfg, decay_mask={"p": True},
        use_fused=False,
    )
    # fused path via interpret mode (CPU)
    import functools
    import gpt2_vision_language_tpu.ops.fused_adamw as mod
    from unittest import mock

    orig = mod.fused_adamw_leaf

    def interp_leaf(*args, **kw):
        with mock.patch.object(mod.pl, "pallas_call", functools.partial(mod.pl.pallas_call, interpret=True)):
            return orig(*args, **kw)

    with mock.patch.object(mod, "fused_adamw_leaf", interp_leaf), mock.patch(
        "gpt2_vision_language_tpu.train.optimizer.fused_adamw_leaf", interp_leaf
    ):
        s2 = adamw_init(params)
        fus_p, fus_s, _ = adamw_update(
            params, grads, s2, jnp.float32(1e-3), cfg, decay_mask={"p": True},
            use_fused=True,
        )
    np.testing.assert_allclose(
        np.asarray(fus_p["p"]), np.asarray(ref_p["p"]), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(fus_s["m"]["p"]), np.asarray(ref_s["m"]["p"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(fus_s["v"]["p"]), np.asarray(ref_s["v"]["p"]), rtol=1e-6
    )


def test_bridge_decay_mask_by_name():
    """Stacked Q-Former leaves: LN scales/biases (L, D) must NOT decay even
    though raw ndim >= 2; weights and query_tokens must."""
    import jax

    from gpt2_vision_language_tpu.core.config import BridgeConfig
    from gpt2_vision_language_tpu.models.bridges import (
        bridge_decay_mask,
        qformer_bridge_init,
    )

    cfg = BridgeConfig(kind="qformer", enc_dim=24, n_queries=8, n_layers=2, n_heads=2)
    params = qformer_bridge_init(jax.random.PRNGKey(0), cfg, 32)
    mask = bridge_decay_mask(params)
    assert mask["query_tokens"] is True
    assert mask["vis_proj"]["w"] is True
    assert mask["vis_proj"]["b"] is False
    assert mask["layers"]["ln1"]["scale"] is False
    assert mask["layers"]["ln1"]["bias"] is False
    assert mask["layers"]["self_attn"]["wq"] is True
    assert mask["layers"]["self_attn"]["bq"] is False
    assert mask["layers"]["mlp"]["wfc"] is True
    assert mask["layers"]["mlp"]["bfc"] is False
