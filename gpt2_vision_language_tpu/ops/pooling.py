"""CLIP token pooling with exact torch adaptive_avg_pool2d parity.

The reference compresses CLIP's (1 CLS + side*side patch) tokens to 33 by
adaptive-average-pooling the patch grid to (4, 8) and re-attaching CLS,
then L2-normalizing per token (pool_clip_197_to_33_avg_with_cls,
gpt2_linear/model.py:240-254).

torch adaptive pooling uses bins [floor(i*in/out), ceil((i+1)*in/out)) —
overlapping and uneven when `out` does not divide `in` (e.g. 14 -> 4).
We reproduce that exactly by building static averaging matrices and
contracting them on the MXU: pooled = Wh @ grid @ Ww^T (einsum), instead of
a gather/window loop — both bit-faithful and TPU-fast.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _adaptive_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) row-stochastic matrix replicating torch's bin formula."""
    w = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = math.ceil((i + 1) * in_size / out_size)
        w[i, start:end] = 1.0 / (end - start)
    return w


def adaptive_avg_pool2d(x, out_hw):
    """x (..., H, W) -> (..., oh, ow), torch.nn.functional parity."""
    oh, ow = out_hw
    h, w = x.shape[-2], x.shape[-1]
    wh = jnp.asarray(_adaptive_matrix(h, oh))
    ww = jnp.asarray(_adaptive_matrix(w, ow))
    y = jnp.einsum("ph,...hw->...pw", wh, x.astype(jnp.float32))
    y = jnp.einsum("qw,...pw->...pq", ww, y)
    return y.astype(x.dtype)


def pool_clip_tokens_to_33(tokens, *, out_hw=(4, 8)):
    """(B, 1+side*side, D) CLIP tokens -> (B, 33, D): CLS + pooled grid,
    L2-normalized per token (gpt2_linear/model.py:240-254). Handles any
    square grid (197 for ViT-B/16, 257 for ViT-L/14)."""
    b, l, d = tokens.shape
    cls = tokens[:, :1, :]
    patches = tokens[:, 1:, :]
    n = patches.shape[1]
    side = int(round(n**0.5))
    assert side * side == n, f"Expected square grid, got N={n}"
    grid = patches.reshape(b, side, side, d).transpose(0, 3, 1, 2)  # (B, D, s, s)
    pooled = adaptive_avg_pool2d(grid, out_hw)  # (B, D, oh, ow)
    m = out_hw[0] * out_hw[1]
    pooled = pooled.reshape(b, d, m).transpose(0, 2, 1)  # (B, m, D)
    z = jnp.concatenate([cls, pooled], axis=1)
    norm = jnp.sqrt(
        jnp.sum(jnp.square(z.astype(jnp.float32)), axis=-1, keepdims=True)
    )
    # torch F.normalize: x / max(||x||, eps), eps=1e-12
    z = (z.astype(jnp.float32) / jnp.maximum(norm, 1e-12)).astype(tokens.dtype)
    return z
