"""Fine-tune bootstrap: load pretrained GPT-2 from .npz or torch .pt,
including strict=False merge semantics for the xattn variant."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import requires_reference

from gpt2_vision_language_tpu.core.config import GPTConfig
from gpt2_vision_language_tpu.ckpt.checkpoint import save_checkpoint
from gpt2_vision_language_tpu.models import gpt2
from gpt2_vision_language_tpu.train.finetune import load_pretrained_gpt

SMALL = GPTConfig(block_size=32, vocab_size=128, n_layer=2, n_head=2, n_embd=32)
SMALL_X = SMALL.replace(img_embd=16, cross_attention=True)


def test_bootstrap_from_npz(tmp_path):
    src = gpt2.init(jax.random.PRNGKey(5), SMALL)
    p = str(tmp_path / "pre.npz")
    save_checkpoint(p, {"params": src, "opt_state": {}}, {"step": 9})
    loaded = load_pretrained_gpt(SMALL, p)
    np.testing.assert_array_equal(np.asarray(loaded["wte"]), np.asarray(src["wte"]))


def test_bootstrap_npz_into_xattn_merges(tmp_path):
    """Plain-decoder checkpoint into the xattn model: shared leaves imported,
    xattn-only leaves keep fresh init (strict=False,
    gpt2_cross-att/train.py:89-91)."""
    src = gpt2.init(jax.random.PRNGKey(5), SMALL)
    p = str(tmp_path / "pre.npz")
    save_checkpoint(p, {"params": src, "opt_state": {}}, {})
    loaded = load_pretrained_gpt(SMALL_X, p, seed=0)
    np.testing.assert_array_equal(np.asarray(loaded["wte"]), np.asarray(src["wte"]))
    np.testing.assert_array_equal(
        np.asarray(loaded["blocks"]["attn"]["wqkv"]),
        np.asarray(src["blocks"]["attn"]["wqkv"]),
    )
    # xattn leaves exist and are freshly initialized (gates zero)
    assert loaded["blocks"]["xattn"]["wq"].shape == (2, 32, 32)
    np.testing.assert_array_equal(np.asarray(loaded["blocks"]["gate"]), 0.0)


@requires_reference
def test_bootstrap_from_torch_pt(tmp_path):
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_parity_reference import _load_ref_module

    ref = _load_ref_module("gpt2_linear")
    torch.manual_seed(0)
    tmodel = ref.GPT_previous(
        ref.GPTConfig(block_size=32, vocab_size=128, n_layer=2, n_head=2, n_embd=32)
    )
    p = str(tmp_path / "model_best.pt")
    torch.save({"model": tmodel.state_dict(), "step": 3}, p)

    loaded = load_pretrained_gpt(SMALL, p)
    np.testing.assert_allclose(
        np.asarray(loaded["wte"]),
        tmodel.transformer.wte.weight.detach().numpy(),
        rtol=1e-6,
    )
    # and into the xattn variant (strict=False: xattn keys absent from ckpt)
    loaded_x = load_pretrained_gpt(SMALL_X, p, seed=0)
    np.testing.assert_allclose(
        np.asarray(loaded_x["blocks"]["mlp"]["wfc"][1]),
        tmodel.transformer.h[1].mlp.c_fc.weight.detach().numpy().T,
        rtol=1e-6,
    )
    np.testing.assert_array_equal(np.asarray(loaded_x["blocks"]["gate"]), 0.0)
