"""Pooling / bridge / caption-model parity vs the PyTorch reference."""

import numpy as np
import pytest

from conftest import requires_reference

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from test_parity_reference import _load_ref_module

from gpt2_vision_language_tpu.core.config import BridgeConfig, GPTConfig
from gpt2_vision_language_tpu.core.precision import FP32_POLICY
from gpt2_vision_language_tpu.models import caption, gpt2
from gpt2_vision_language_tpu.models.bridges import (
    linear_bridge_apply,
    qformer_bridge_apply,
)
from gpt2_vision_language_tpu.ops.pooling import (
    adaptive_avg_pool2d,
    pool_clip_tokens_to_33,
)
from gpt2_vision_language_tpu.ckpt.torch_import import (
    gpt2_from_torch_state_dict,
    linear_bridge_from_torch,
    qformer_bridge_from_torch,
)

SMALL_KW = dict(block_size=64, vocab_size=128, n_layer=2, n_head=2, n_embd=32)


@requires_reference
@pytest.mark.parametrize("side", [14, 16])
def test_adaptive_pool_parity(side):
    """14x14 (ViT-B/16) has uneven overlapping bins; must match torch."""
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, side, side).astype(np.float32)
    ref = torch.nn.functional.adaptive_avg_pool2d(torch.tensor(x), (4, 8)).numpy()
    ours = np.asarray(adaptive_avg_pool2d(jnp.asarray(x), (4, 8)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@requires_reference
@pytest.mark.parametrize("n_tokens", [197, 257])
def test_pool_clip_tokens_parity(n_tokens):
    ref_mod = _load_ref_module("gpt2_linear")
    rng = np.random.RandomState(1)
    toks = rng.randn(2, n_tokens, 24).astype(np.float32)
    ref = ref_mod.pool_clip_197_to_33_avg_with_cls(torch.tensor(toks)).numpy()
    ours = np.asarray(pool_clip_tokens_to_33(jnp.asarray(toks)))
    assert ours.shape == (2, 33, 24)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@requires_reference
def test_linear_bridge_parity():
    ref_mod = _load_ref_module("gpt2_linear")
    torch.manual_seed(0)
    tb = ref_mod.Linear_Bridge(enc_dim=24, d_lm=32).eval()
    params = linear_bridge_from_torch(tb.state_dict(), prefix="")
    rng = np.random.RandomState(2)
    z = rng.randn(2, 33, 24).astype(np.float32)
    with torch.no_grad():
        ref = tb(torch.tensor(z)).numpy()
    ours = np.asarray(
        linear_bridge_apply(params, jnp.asarray(z), policy=FP32_POLICY)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@requires_reference
def test_qformer_bridge_parity():
    ref_mod = _load_ref_module("gpt2_q_former")
    torch.manual_seed(0)
    tb = ref_mod.BLIP2Bridge(
        enc_dim=24, d_lm=32, n_heads=2, n_queries=8, n_layers=2, drop=0.1
    ).eval()  # eval: dropout off
    params = qformer_bridge_from_torch(tb.state_dict(), n_layers=2, prefix="")
    cfg = BridgeConfig(kind="qformer", enc_dim=24, n_queries=8, n_layers=2, n_heads=2)
    rng = np.random.RandomState(3)
    z = rng.randn(2, 33, 24).astype(np.float32)
    with torch.no_grad():
        ref = tb(torch.tensor(z)).numpy()
    ours = np.asarray(
        qformer_bridge_apply(
            params, jnp.asarray(z), cfg, policy=FP32_POLICY, train=False
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


@requires_reference
@pytest.mark.parametrize("variant", ["gpt2_linear", "gpt2_q_former"])
def test_caption_model_parity(variant):
    """Full GPT_Caption forward + masked loss at matched weights."""
    ref_mod = _load_ref_module(variant)
    tcfg = ref_mod.GPTConfig(**SMALL_KW)
    torch.manual_seed(0)
    lm = ref_mod.GPT_previous(tcfg)
    tmodel = ref_mod.GPT_Caption(
        enc_dim=24, lm=lm, m_vis_tokens=8, use_cls_only=False, freeze_lm=True
    ).eval()

    cfg = GPTConfig(**SMALL_KW)
    gpt_params = gpt2_from_torch_state_dict(lm.state_dict(), cfg)
    if variant == "gpt2_linear":
        bridge_cfg = BridgeConfig(kind="linear", enc_dim=24)
        bridge_params = linear_bridge_from_torch(tmodel.state_dict(), "bridge.")
    else:
        bridge_cfg = BridgeConfig(
            kind="qformer", enc_dim=24, n_queries=8, n_layers=2, n_heads=tcfg.n_head
        )
        bridge_params = qformer_bridge_from_torch(
            tmodel.state_dict(), n_layers=2, prefix="bridge."
        )

    rng = np.random.RandomState(4)
    z = rng.randn(2, 33, 24).astype(np.float32)
    ids = rng.randint(0, 128, (2, 12))
    labels = rng.randint(0, 128, (2, 12))
    labels[0, 8:] = -100

    with torch.no_grad():
        tlogits, tloss = tmodel(
            torch.tensor(z),
            torch.tensor(ids, dtype=torch.long),
            labels=torch.tensor(labels, dtype=torch.long),
        )
    jlogits, jloss = caption.apply(
        gpt_params,
        bridge_params,
        jnp.asarray(z),
        jnp.asarray(ids),
        cfg,
        bridge_cfg,
        labels=jnp.asarray(labels),
        policy=FP32_POLICY,
    )
    np.testing.assert_allclose(
        np.asarray(jlogits), tlogits.numpy(), rtol=5e-4, atol=5e-4
    )
    np.testing.assert_allclose(float(jloss), float(tloss), rtol=2e-4)


def test_qformer_dropout_active_in_training():
    """train=True with distinct rngs must perturb outputs (dropout 0.1
    active, gpt2_q_former/model.py:119-131); eval is deterministic."""
    import jax

    from gpt2_vision_language_tpu.models.bridges import (
        qformer_bridge_init,
        qformer_bridge_apply,
    )

    cfg = BridgeConfig(kind="qformer", enc_dim=24, n_queries=8, n_layers=2, n_heads=2)
    params = qformer_bridge_init(jax.random.PRNGKey(0), cfg, 32)
    z = jnp.asarray(np.random.RandomState(0).randn(2, 33, 24), jnp.float32)
    o1 = qformer_bridge_apply(params, z, cfg, policy=FP32_POLICY,
                              rng=jax.random.PRNGKey(1), train=True)
    o2 = qformer_bridge_apply(params, z, cfg, policy=FP32_POLICY,
                              rng=jax.random.PRNGKey(2), train=True)
    o3 = qformer_bridge_apply(params, z, cfg, policy=FP32_POLICY, train=False)
    o4 = qformer_bridge_apply(params, z, cfg, policy=FP32_POLICY, train=False)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(o3), np.asarray(o4))
