"""Elementary neural-net ops as pure functions.

These replace torch nn.Linear / nn.LayerNorm / nn.GELU(tanh) /
nn.Embedding used throughout the reference models. Matmuls cast to the
policy compute dtype (bf16 on TPU -> MXU) and accumulate in fp32 via
`preferred_element_type`; normalizations run in fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.precision import Policy, DEFAULT_POLICY


def linear(x, w, b=None, *, policy: Policy = DEFAULT_POLICY):
    """y = x @ w + b with w stored (in_features, out_features).

    Note: torch nn.Linear stores weight as (out, in); the importer
    transposes. bf16 inputs, fp32 accumulation on the MXU.
    """
    y = jnp.dot(
        policy.cast_compute(x),
        policy.cast_compute(w),
        preferred_element_type=policy.accum_dtype,
    )
    if b is not None:
        y = y + b.astype(policy.accum_dtype)
    return y.astype(x.dtype)


def layer_norm(x, scale, bias, *, eps: float = 1e-5):
    """LayerNorm over the last axis in fp32 (torch nn.LayerNorm default eps)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)


def gelu_tanh(x):
    """GELU with tanh approximation, matching torch nn.GELU(approximate='tanh')
    used by the reference MLP (train_gpt2.py:51)."""
    return jax.nn.gelu(x, approximate=True)


def gelu_exact(x):
    """Exact (erf) GELU, used only inside the Q-Former MLP which uses plain
    nn.GELU() (gpt2_q_former/model.py:128)."""
    return jax.nn.gelu(x, approximate=False)


def embed(table, ids):
    """Embedding lookup. `table` (V, D) fp32; gather stays in param dtype."""
    return jnp.take(table, ids, axis=0)
