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


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm(x, scale, bias, eps: float = 1e-5):
    """LayerNorm over the last axis in fp32 (torch nn.LayerNorm default eps).

    Custom VJP: plain autodiff stashes the fp32 upcast of x (and the fp32
    centered tensor) for the backward — at GPT-2 124M no-remat that is six
    (L, B, T, D) fp32 buffers ≈ 3.4 GB of HBM. The upcast is exact, so the
    backward instead recomputes x-hat from the (already-resident) input and
    keeps only the per-row mean/rstd — numerically identical gradients at
    ~0 extra activation memory.
    """
    y, _ = _ln_fwd(x, scale, bias, eps)
    return y


def _ln_stats(x32, eps):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return mean, jax.lax.rsqrt(var + eps)


def _ln_fwd(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mean, rstd = _ln_stats(x32, eps)
    xhat = (x32 - mean) * rstd
    y = xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype), (x, scale, mean, rstd)


def _ln_bwd(eps, res, g):
    x, scale, mean, rstd = res
    g32 = g.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mean) * rstd
    # reduce over all leading axes for the (D,) params
    red = tuple(range(g32.ndim - 1))
    dscale = jnp.sum(g32 * xhat, axis=red).astype(scale.dtype)
    dbias = jnp.sum(g32, axis=red).astype(scale.dtype)
    dxhat = g32 * scale.astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (rstd * (dxhat - m1 - xhat * m2)).astype(x.dtype)
    return dx, dscale, dbias


layer_norm.defvjp(_ln_fwd, _ln_bwd)


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
