"""Fused AdamW parameter update as a Pallas TPU kernel.

TPU-native equivalent of the reference's fused CUDA AdamW
(torch.optim.AdamW(fused=True), train_gpt2.py:140-143). One pass over HBM
per leaf: read (param, grad, m, v), apply global-norm clip scale + Adam
moments + bias correction + decoupled weight decay, write (param, m, v)
in place via input_output_aliases.

Measured on v5e (124M params): this kernel ~15 ms/step vs ~6.4 ms for the
identical arithmetic left to XLA — XLA emits one perfectly fused
elementwise kernel per leaf with better pipelining, and VMEM limits cap
our block depth. Per the TPU design rule (don't hand-schedule what the
compiler already fuses), `use_fused=False` (XLA) is the default in
train/optimizer.py; this kernel is kept parity-tested as the extension
point for updates XLA cannot express (e.g. quantized/stochastic-rounded
optimizer states).

Leaves whose size is not lane-aligned (tiny gates, biases under one tile)
always fall back to the identical XLA arithmetic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# rows per grid step; 8 sublanes * 128 lanes * 512 rows = 512 KB fp32 per buf
_BLOCK_ROWS = 1024


def _adamw_kernel(
    scal_ref, p_ref, g_ref, m_ref, v_ref, po_ref, mo_ref, vo_ref, *, wd: float
):
    lr = scal_ref[0]
    beta1 = scal_ref[1]
    beta2 = scal_ref[2]
    eps = scal_ref[3]
    clip_scale = scal_ref[4]
    bc1 = scal_ref[5]  # 1 - beta1**t
    bc2 = scal_ref[6]  # 1 - beta2**t

    g = g_ref[:] * clip_scale
    m = beta1 * m_ref[:] + (1.0 - beta1) * g
    v = beta2 * v_ref[:] + (1.0 - beta2) * g * g
    mhat = m / bc1
    vhat = v / bc2
    p = p_ref[:]
    # decoupled weight decay, torch AdamW order: p *= (1 - lr*wd) first
    if wd != 0.0:
        p = p * (1.0 - lr * wd)
    p = p - lr * mhat / (jnp.sqrt(vhat) + eps)
    po_ref[:] = p
    mo_ref[:] = m
    vo_ref[:] = v


def fused_adamw_leaf(p, g, m, v, scalars, *, wd: float):
    """Update one fp32 leaf whose size is a multiple of 128.

    scalars: fp32 vector [lr, beta1, beta2, eps, clip_scale, bc1, bc2].
    Returns (new_p, new_m, new_v).
    """
    shape = p.shape
    n = p.size
    assert n % LANES == 0
    rows = n // LANES
    block_rows = min(_BLOCK_ROWS, rows)
    # Non-divisible grids are fine: Pallas masks the out-of-range tail of the
    # last block, so no host-side padding copies.
    as2d = lambda x: x.reshape(rows, LANES)
    p2, g2, m2, v2 = as2d(p), as2d(g), as2d(m), as2d(v)
    grid = (pl.cdiv(rows, block_rows),)
    spec = pl.BlockSpec(
        (block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    po, mo, vo = pl.pallas_call(
        functools.partial(_adamw_kernel, wd=wd),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec,
            spec,
            spec,
            spec,
        ],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct(p2.shape, jnp.float32)] * 3,
        input_output_aliases={1: 0, 3: 1, 4: 2},
    )(scalars, p2, g2, m2, v2)
    return po.reshape(shape), mo.reshape(shape), vo.reshape(shape)


def leaf_supports_fused(p) -> bool:
    return p.dtype == jnp.float32 and p.size % LANES == 0 and p.size >= 8 * LANES
