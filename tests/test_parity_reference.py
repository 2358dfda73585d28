"""Logit-parity tests against the PyTorch reference at matched weights.

The reference repo is mounted read-only; we import its model modules
directly (never copying code) and compare our JAX forward at fp32 against
torch fp32. BASELINE.json demands "logit parity vs the PyTorch reference".
"""

import os
import sys

import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_ROOT

torch = pytest.importorskip("torch")

from gpt2_vision_language_tpu.core.config import GPTConfig
from gpt2_vision_language_tpu.core.precision import FP32_POLICY
from gpt2_vision_language_tpu.models import gpt2
from gpt2_vision_language_tpu.ckpt.torch_import import gpt2_from_torch_state_dict

import jax.numpy as jnp


def _load_ref_module(subdir, name="model"):
    """Import a reference model.py without polluting sys.modules['model']."""
    import importlib.util

    path = os.path.join(REFERENCE_ROOT, "source", subdir, f"{name}.py")
    spec = importlib.util.spec_from_file_location(f"ref_{subdir}_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


SMALL_KW = dict(block_size=32, vocab_size=128, n_layer=2, n_head=2, n_embd=32)


@requires_reference
def test_gpt2_logit_parity():
    ref = _load_ref_module("gpt2_linear")
    tcfg = ref.GPTConfig(**SMALL_KW)
    torch.manual_seed(0)
    tmodel = ref.GPT_previous(tcfg).eval()

    cfg = GPTConfig(**SMALL_KW)
    params = gpt2_from_torch_state_dict(tmodel.state_dict(), cfg)

    rng = np.random.RandomState(0)
    idx = rng.randint(0, 128, size=(2, 16))
    targets = rng.randint(0, 128, size=(2, 16))

    with torch.no_grad():
        tlogits, tloss = tmodel(
            torch.tensor(idx, dtype=torch.long), torch.tensor(targets, dtype=torch.long)
        )
    jlogits, jloss = gpt2.apply(
        params, jnp.asarray(idx), cfg, targets=jnp.asarray(targets), policy=FP32_POLICY
    )
    np.testing.assert_allclose(
        np.asarray(jlogits), tlogits.numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(float(jloss), float(tloss), rtol=1e-4)


@requires_reference
def test_xattn_gpt2_logit_parity():
    ref = _load_ref_module("gpt2_cross-att")
    tcfg = ref.GPTConfig(img_embd=16, **SMALL_KW)
    torch.manual_seed(0)
    tmodel = ref.GPT(tcfg).eval()
    # Push gates off zero so the cross-attention path is actually exercised.
    with torch.no_grad():
        for blk in tmodel.transformer.h:
            blk.cross_gate.fill_(0.37)

    cfg = GPTConfig(img_embd=16, cross_attention=True, **SMALL_KW)
    params = gpt2_from_torch_state_dict(tmodel.state_dict(), cfg)

    rng = np.random.RandomState(1)
    idx = rng.randint(0, 128, size=(2, 16))
    z = rng.randn(2, 5, 16).astype(np.float32)
    targets = rng.randint(0, 128, size=(2, 16))
    mask = rng.rand(2, 16) > 0.3

    with torch.no_grad():
        tlogits, tloss = tmodel(
            torch.tensor(idx, dtype=torch.long),
            z=torch.tensor(z),
            targets=torch.tensor(targets, dtype=torch.long),
            target_mask=torch.tensor(mask),
        )
    jlogits, jloss = gpt2.apply(
        params,
        jnp.asarray(idx),
        cfg,
        z=jnp.asarray(z),
        targets=jnp.asarray(targets),
        target_mask=jnp.asarray(mask),
        policy=FP32_POLICY,
    )
    np.testing.assert_allclose(
        np.asarray(jlogits), tlogits.numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(float(jloss), float(tloss), rtol=1e-4)


@requires_reference
def test_gelu_tanh_parity():
    from gpt2_vision_language_tpu.ops.layers import gelu_tanh

    x = np.linspace(-5, 5, 101).astype(np.float32)
    tx = torch.nn.functional.gelu(torch.tensor(x), approximate="tanh").numpy()
    np.testing.assert_allclose(np.asarray(gelu_tanh(jnp.asarray(x))), tx, atol=1e-6)
