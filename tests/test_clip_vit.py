"""CLIP ViT encoder: shapes, preprocessing, HF parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpt2_vision_language_tpu.core.config import CLIPConfig
from gpt2_vision_language_tpu.core.precision import FP32_POLICY
from gpt2_vision_language_tpu.models import clip_vit

TINY = CLIPConfig(image_size=32, patch_size=16, width=32, layers=2, heads=2)


def test_shapes_and_grid():
    params = clip_vit.init(jax.random.PRNGKey(0), TINY)
    imgs = jnp.zeros((2, 32, 32, 3))
    out = clip_vit.features(params, imgs, TINY, policy=FP32_POLICY)
    assert out.shape == (2, 1 + 4, 32)  # CLS + 2x2 grid
    b16 = CLIPConfig(patch_size=16, width=768, layers=12, heads=12)
    assert b16.num_tokens == 197
    l14 = CLIPConfig()
    assert l14.num_tokens == 257


def test_preprocess():
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (2, 48, 64, 3), dtype=np.uint8)
    out = np.asarray(clip_vit.preprocess(jnp.asarray(imgs), size=32))
    assert out.shape == (2, 32, 32, 3)
    # normalized: roughly zero-centered, bounded by (1-mean)/std
    assert -2.2 < out.mean() < 2.2
    assert out.min() > -2.5 and out.max() < 3.0


def test_patchify_matches_conv():
    """patchify+matmul == stride-p conv with the same kernel."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    imgs = rng.randn(2, 32, 32, 3).astype(np.float32)
    kernel = rng.randn(8, 3, 16, 16).astype(np.float32)  # (out, in, kh, kw)
    conv = torch.nn.functional.conv2d(
        torch.tensor(imgs.transpose(0, 3, 1, 2)), torch.tensor(kernel), stride=16
    )
    ref = conv.flatten(2).transpose(1, 2).numpy()  # (B, N, out)
    w = kernel.transpose(2, 3, 1, 0).reshape(-1, 8)
    patches = clip_vit.patchify(jnp.asarray(imgs), 16)
    ours = np.asarray(patches @ jnp.asarray(w))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_hf_parity():
    transformers = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf_cfg = CLIPVisionConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=128,
        image_size=32,
        patch_size=16,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    model = CLIPVisionModel(hf_cfg).eval()

    params = clip_vit.from_hf_state_dict(model.state_dict(), TINY)
    rng = np.random.RandomState(2)
    imgs = rng.randn(2, 32, 32, 3).astype(np.float32)

    with torch.no_grad():
        ref = model(
            pixel_values=torch.tensor(imgs.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()
    # HF last_hidden_state excludes post_layernorm (applied only to pooled)
    ours = np.asarray(
        clip_vit.features(
            params, jnp.asarray(imgs), TINY, policy=FP32_POLICY, apply_ln_post=False
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)
