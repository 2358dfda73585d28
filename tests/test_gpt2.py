"""Unit tests for the GPT-2 decoder core."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt2_vision_language_tpu.core.config import GPTConfig
from gpt2_vision_language_tpu.core.precision import FP32_POLICY
from gpt2_vision_language_tpu.models import gpt2

SMALL = GPTConfig(block_size=32, vocab_size=100, n_layer=2, n_head=2, n_embd=32)
SMALL_X = SMALL.replace(img_embd=16, cross_attention=True)


def test_init_shapes():
    params = gpt2.init(jax.random.PRNGKey(0), SMALL)
    assert params["wte"].shape == (SMALL.padded_vocab_size, 32)
    assert params["wpe"].shape == (32, 32)
    assert params["blocks"]["attn"]["wqkv"].shape == (2, 32, 96)
    assert params["blocks"]["mlp"]["wfc"].shape == (2, 32, 128)
    assert params["lnf"]["scale"].shape == (32,)


def test_param_count_124m():
    """Reference 124M GPT-2: 124,475,904 params with tied wte/lm_head
    (wte 50304*768 + wpe 1024*768 + 12 blocks + ln_f)."""
    cfg = GPTConfig()
    d, L, vp = cfg.n_embd, cfg.n_layer, cfg.padded_vocab_size
    per_block = (
        2 * 2 * d  # ln1, ln2
        + d * 3 * d + 3 * d  # c_attn
        + d * d + d  # attn c_proj
        + d * 4 * d + 4 * d  # c_fc
        + 4 * d * d + d  # mlp c_proj
    )
    expected = vp * d + cfg.block_size * d + L * per_block + 2 * d
    params = gpt2.init(jax.random.PRNGKey(0), cfg)
    assert gpt2.param_count(params) == expected == 124475904


def test_forward_and_loss():
    params = gpt2.init(jax.random.PRNGKey(0), SMALL)
    idx = jnp.arange(16).reshape(2, 8) % SMALL.vocab_size
    targets = jnp.roll(idx, -1, axis=1)
    logits, loss = gpt2.apply(params, idx, SMALL, targets=targets, policy=FP32_POLICY)
    assert logits.shape == (2, 8, SMALL.padded_vocab_size)
    assert np.isfinite(float(loss))
    # Untrained loss should be near ln(V) over the padded vocab.
    assert abs(float(loss) - np.log(SMALL.padded_vocab_size)) < 1.0


def test_forward_is_jittable_and_deterministic():
    params = gpt2.init(jax.random.PRNGKey(0), SMALL)
    idx = jnp.arange(16).reshape(2, 8) % SMALL.vocab_size
    f = jax.jit(lambda p, i: gpt2.apply(p, i, SMALL, policy=FP32_POLICY)[0])
    l1, l2 = f(params, idx), f(params, idx)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_causality():
    """Changing a future token must not change past logits."""
    params = gpt2.init(jax.random.PRNGKey(0), SMALL)
    idx = jnp.arange(8).reshape(1, 8) % SMALL.vocab_size
    idx2 = idx.at[0, -1].add(1)
    l1, _ = gpt2.apply(params, idx, SMALL, policy=FP32_POLICY)
    l2, _ = gpt2.apply(params, idx2, SMALL, policy=FP32_POLICY)
    np.testing.assert_allclose(
        np.asarray(l1[0, :-1]), np.asarray(l2[0, :-1]), rtol=1e-5, atol=1e-5
    )
    assert not np.allclose(np.asarray(l1[0, -1]), np.asarray(l2[0, -1]))


def test_cross_entropy_ignore_index():
    logits = jnp.asarray(np.random.RandomState(0).randn(2, 4, 7), jnp.float32)
    targets = jnp.asarray([[1, 2, -100, 3], [-100, -100, 0, 1]])
    loss = gpt2.cross_entropy(logits, targets)
    # manual masked mean
    l32 = np.asarray(logits, np.float64)
    logz = np.log(np.exp(l32).sum(-1))
    nll, cnt = 0.0, 0
    for b in range(2):
        for t in range(4):
            y = int(targets[b, t])
            if y == -100:
                continue
            nll += logz[b, t] - l32[b, t, y]
            cnt += 1
    np.testing.assert_allclose(float(loss), nll / cnt, rtol=1e-5)


def test_cross_attention_gate_zero_is_identity():
    """With gates at init (0.0), the xattn variant must produce identical
    logits to the plain decoder given matching shared weights
    (gpt2_cross-att/model.py:97 — tanh(0)=0)."""
    px = gpt2.init(jax.random.PRNGKey(0), SMALL_X)
    # plain decoder params = xattn params minus the xattn-only leaves
    import copy

    pp = {
        "wte": px["wte"],
        "wpe": px["wpe"],
        "blocks": {
            k: px["blocks"][k] for k in ("ln1", "attn", "ln2", "mlp")
        },
        "lnf": px["lnf"],
    }
    idx = jnp.arange(8).reshape(1, 8) % SMALL_X.vocab_size
    z = jnp.asarray(np.random.RandomState(1).randn(1, 5, 16), jnp.float32)
    lx, _ = gpt2.apply(px, idx, SMALL_X, z=z, policy=FP32_POLICY)
    lp, _ = gpt2.apply(pp, idx, SMALL, policy=FP32_POLICY)
    np.testing.assert_allclose(np.asarray(lx), np.asarray(lp), rtol=1e-5, atol=1e-6)


def test_decay_mask():
    params = gpt2.init(jax.random.PRNGKey(0), SMALL_X)
    mask = gpt2.decay_mask(params)
    assert mask["wte"] is True and mask["wpe"] is True
    assert mask["blocks"]["attn"]["wqkv"] is True
    assert mask["blocks"]["attn"]["bqkv"] is False
    assert mask["blocks"]["ln1"]["scale"] is False
    assert mask["blocks"]["gate"] is False
    assert mask["vis_proj"]["w"] is True
    assert mask["vis_proj"]["b"] is False


def test_trainable_mask_xattn():
    params = gpt2.init(jax.random.PRNGKey(0), SMALL_X)
    mask = gpt2.trainable_mask_xattn(params)
    assert mask["blocks"]["xattn"]["wq"] is True
    assert mask["blocks"]["gate"] is True
    assert mask["vis_proj"]["w"] is True
    assert mask["wte"] is False
    assert mask["blocks"]["attn"]["wqkv"] is False
    assert mask["blocks"]["lnx"]["scale"] is False  # ln_x stays frozen


def test_remat_matches():
    params = gpt2.init(jax.random.PRNGKey(0), SMALL)
    idx = jnp.arange(16).reshape(2, 8) % SMALL.vocab_size
    l1, _ = gpt2.apply(params, idx, SMALL, policy=FP32_POLICY, remat=False)
    l2, _ = gpt2.apply(params, idx, SMALL, policy=FP32_POLICY, remat=True)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6)


def test_unrolled_layers_match_scan():
    """cfg.unroll_layers=True (no-remat perf path) must be numerically
    identical to the lax.scan path, forward and grads."""
    import jax
    import jax.numpy as jnp
    from gpt2_vision_language_tpu.core.precision import FP32_POLICY

    cfg = GPTConfig(block_size=32, vocab_size=128, n_layer=3, n_head=2, n_embd=32)
    cfg_u = cfg.replace(unroll_layers=True)
    params = gpt2.init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(0).randint(0, 128, (2, 32)), jnp.int32)
    y = jnp.roll(x, -1, axis=1)

    def loss(p, c):
        _, l = gpt2.apply(p, x, c, targets=y, policy=FP32_POLICY)
        return l

    l1, g1 = jax.value_and_grad(loss)(params, cfg)
    l2, g2 = jax.value_and_grad(loss)(params, cfg_u)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
