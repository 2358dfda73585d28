"""AdamW with decay/no-decay groups, global-norm clipping and freezing.

Semantics match the reference exactly (train_gpt2.py:127-144 + clip at
:472): weight decay 0.1 only on torch-ndim>=2 params, betas (0.9, 0.95),
eps 1e-8, decoupled decay applied before the Adam step (torch AdamW order),
grads pre-scaled by min(1, clip/||g||) with the global norm taken over ALL
trainable grads. Frozen params (requires_grad=False in the reference,
e.g. gpt2_linear/model.py:161-164) are excluded from both the update and
the clip norm by a trainable mask.

The update runs through the fused Pallas kernel (ops/fused_adamw.py) on
TPU for lane-aligned leaves and through identical XLA arithmetic otherwise.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..core.config import OptimizerConfig
from ..ops.fused_adamw import fused_adamw_leaf, leaf_supports_fused


def _tmap(f, *trees):
    return jax.tree.map(f, *trees)


# ---------------------------------------------------------------------------
# Block-wise 8-bit moment quantization
# ---------------------------------------------------------------------------
# Implements the *published* block-wise absmax scheme of Dettmers et al.,
# "8-bit Optimizers via Block-wise Quantization" (2021) — algorithmic
# similarity is to that public paper, not to /root/reference (whose AdamW
# keeps fp32 state, train_gpt2.py:127-144). Deviation from the paper: the
# second moment is stored as sqrt(v) in unsigned 8-bit, which places the
# 8 bits of resolution directly on the quantity the update divides by
# (sqrt(vhat)) instead of on v itself — simpler than the paper's dynamic
# map and, per the drift test, adequate over a 50-step horizon.

Q8_BLOCK = 256  # two 128-lane vregs per block
Q8_MIN_SIZE = 1 << 16  # smaller leaves keep fp32 moments (negligible HBM)


def _q8_eligible(p) -> bool:
    return p.ndim >= 2 and p.size >= Q8_MIN_SIZE


def _q8_padded(n: int) -> int:
    return -(-n // Q8_BLOCK) * Q8_BLOCK


def q8_quantize(x, *, unsigned: bool = False):
    """Flatten, pad to Q8_BLOCK, and absmax-quantize per block.

    Returns {"q": (npad,) int8/uint8, "s": (npad/Q8_BLOCK,) fp32 scales}.
    unsigned=True stores non-negative inputs on the full [0, 255] range
    (used for sqrt(v), which is >= 0 by construction)."""
    flat = x.astype(jnp.float32).reshape(-1)
    n = flat.shape[0]
    npad = _q8_padded(n)
    if npad != n:
        flat = jnp.concatenate([flat, jnp.zeros((npad - n,), jnp.float32)])
    blocks = flat.reshape(-1, Q8_BLOCK)
    absmax = jnp.max(jnp.abs(blocks), axis=1)
    cap = 255.0 if unsigned else 127.0
    s = jnp.where(absmax > 0, absmax, 1.0) / cap
    q = jnp.round(blocks / s[:, None])
    q = (
        jnp.clip(q, 0, 255).astype(jnp.uint8)
        if unsigned
        else jnp.clip(q, -127, 127).astype(jnp.int8)
    )
    return {"q": q.reshape(-1), "s": s}


def q8_dequantize(mq, shape):
    """Inverse of q8_quantize back to fp32 of `shape` (sliced un-padded)."""
    size = 1
    for d in shape:
        size *= int(d)
    blocks = mq["q"].reshape(-1, Q8_BLOCK).astype(jnp.float32)
    return (blocks * mq["s"][:, None]).reshape(-1)[:size].reshape(shape)


Q8_CHUNK_TARGET = 1 << 22  # ~4M elements of fp32 chunk temps (~16 MB each)
Q8_CHUNK_MIN = 1 << 22  # leaves below this update un-chunked


def _q8_chunk_rows(shape) -> int:
    """Rows of the leading axis per update chunk: the largest divisor G of
    shape[0] with (G * rest) % Q8_BLOCK == 0 and G * rest <= the target
    (or the smallest block-aligned G if even that exceeds the target).
    Chunking over the LEADING axis (not the flat view) keeps each chunk a
    contiguous slice of the stored buffer regardless of the leaf's pinned
    layout, so the in-place loop below can read-modify-write it."""
    d0 = int(shape[0])
    rest = 1
    for d in shape[1:]:
        rest *= int(d)
    best = 0
    for g in range(1, d0 + 1):
        if d0 % g or (g * rest) % Q8_BLOCK:
            continue
        if best and g * rest > Q8_CHUNK_TARGET:
            break
        best = g
    return best  # 0: no block-aligned leading split exists


def _q8_update_leaf_chunked(p, g, mq, vq, scal, G):
    """In-place chunked 8-bit AdamW leaf update (exact same math and block
    grouping as the un-chunked path — pinned by test_q8_chunked_matches).

    Whole-leaf dequant -> update -> requant materializes ~4 fp32 copies of
    the leaf in the update program's arena (the requant block-max keeps
    m_new/v_new live); at GPT-2 1558M XLA overlapped several such leaves
    and the update program asked for 21.9 GiB. This version walks the leaf
    in G-leading-row chunks with a fori_loop whose carry IS the output
    buffers: fp32 temps shrink to one chunk (~16 MB) and the donated
    inputs alias straight through."""
    lr, b1, b2, eps, clip_scale, bc1, bc2, wd = scal
    shape = p.shape
    rest = p.size // shape[0]
    E = G * rest  # elements per chunk (multiple of Q8_BLOCK)
    nchunks = shape[0] // G

    def body(i, carry):
        pb, qm, sm, qv, sv = carry
        row0 = i * G
        e0 = i * E
        b0 = i * (E // Q8_BLOCK)
        pc = jax.lax.dynamic_slice_in_dim(pb, row0, G, 0)
        gc = jax.lax.dynamic_slice_in_dim(g, row0, G, 0)
        mqc = jax.lax.dynamic_slice(qm, (e0,), (E,))
        msc = jax.lax.dynamic_slice(sm, (b0,), (E // Q8_BLOCK,))
        vqc = jax.lax.dynamic_slice(qv, (e0,), (E,))
        vsc = jax.lax.dynamic_slice(sv, (b0,), (E // Q8_BLOCK,))
        m32 = q8_dequantize({"q": mqc, "s": msc}, (E,))
        r = q8_dequantize({"q": vqc, "s": vsc}, (E,))
        g32 = gc.reshape(E).astype(jnp.float32) * clip_scale
        m_new = b1 * m32 + (1.0 - b1) * g32
        v_new = b2 * (r * r) + (1.0 - b2) * g32 * g32
        p32 = pc.reshape(E).astype(jnp.float32)
        p32 = p32 * (1.0 - lr * wd) if wd else p32
        p32 = p32 - lr * (m_new / bc1) / (jnp.sqrt(v_new / bc2) + eps)
        nm = q8_quantize(m_new)
        nv = q8_quantize(jnp.sqrt(v_new), unsigned=True)
        pb = jax.lax.dynamic_update_slice_in_dim(
            pb, p32.astype(pb.dtype).reshape((G,) + shape[1:]), row0, 0
        )
        qm = jax.lax.dynamic_update_slice(qm, nm["q"], (e0,))
        sm = jax.lax.dynamic_update_slice(sm, nm["s"], (b0,))
        qv = jax.lax.dynamic_update_slice(qv, nv["q"], (e0,))
        sv = jax.lax.dynamic_update_slice(sv, nv["s"], (b0,))
        return pb, qm, sm, qv, sv

    pb, qm, sm, qv, sv = jax.lax.fori_loop(
        0, nchunks, body, (p, mq["q"], mq["s"], vq["q"], vq["s"])
    )
    return pb, {"q": qm, "s": sm}, {"q": qv, "s": sv}


def adamw_init(params, state_dtype=None, trainable_mask=None):
    """Zero moments. state_dtype=jnp.bfloat16 halves the m/v HBM footprint
    (the difference between GPT-2 774M fitting a 16GB v5e chip or not:
    fp32 params+m+v+gsum is ~15.5GB transient, bf16 m/v brings it to
    ~12.4GB). The update math still runs in fp32 — moments are upcast at
    use and rounded once per step at store (adamw_update). Opt-in: the
    reference (and our parity tests) keep fp32 state
    (train_gpt2.py:127-144).

    trainable_mask: frozen leaves get SCALAR placeholder moments instead of
    full buffers — update_leaf never reads them ('if not trainable') — the
    same trick train/step.py uses for grad accumulators. A finetune with
    the 124M decoder frozen saves ~1 GB of HBM and the same in every
    checkpoint.

    state_dtype=jnp.int8 block-quantizes the moments of every eligible
    leaf (_q8_eligible: ndim>=2 and >=64k elements) to 8 bits with
    per-256-block absmax scales — m signed, v as sqrt(v) unsigned (see
    q8_quantize). m+v drop from 4 to ~2.03 bytes/param: at GPT-2 1558M
    that frees ~4.3 GB of HBM next to bf16 params, which is what lets the
    full 0.5M-token batch train on ONE 16 GB chip (runs/r3_1558m).
    Ineligible leaves (biases, LayerNorms) keep fp32 moments."""
    int8_state = state_dtype is not None and jnp.dtype(state_dtype) == jnp.int8

    def zeros(p, trainable=True, unsigned=False):
        if int8_state and trainable and _q8_eligible(p):
            npad = _q8_padded(p.size)
            return {
                "q": jnp.zeros((npad,), jnp.uint8 if unsigned else jnp.int8),
                "s": jnp.full((npad // Q8_BLOCK,), 1.0 / 127.0, jnp.float32),
            }
        shape = p.shape if trainable else ()
        if int8_state:
            return jnp.zeros(shape, jnp.float32)
        return jnp.zeros(shape, state_dtype or p.dtype)

    def moments(unsigned=False):
        if trainable_mask is None:
            return _tmap(lambda p: zeros(p, unsigned=unsigned), params)
        return _tmap(
            lambda p, tr: zeros(p, tr, unsigned=unsigned),
            params,
            trainable_mask,
        )

    return {
        "m": moments(),
        "v": moments(unsigned=True),
        "step": jnp.zeros((), jnp.int32),
    }


def convert_moments(params, opt_state, state_dtype=None, trainable_mask=None):
    """Re-encode a (restored) optimizer state's m/v into the storage format
    adamw_init(state_dtype=...) would build — fp32/bf16 arrays or int8
    blocks — preserving the moment VALUES.

    Resume support: a checkpoint written under a different
    --opt-state-dtype would otherwise silently replace the compressed
    moments an HBM-edge config's memory budget depends on (or run a
    parity config with quantized moments it never asked for). Leaves whose
    format already matches pass through untouched — no lossy
    requantization round-trip on a same-dtype resume. Remember v's int8
    form stores sqrt(v) on the unsigned grid (see q8_quantize); the
    fp32/bf16 forms store v itself. Runs eagerly, leaf by leaf (one-time
    host-side cost; transients bounded by the largest single leaf)."""
    int8_state = state_dtype is not None and jnp.dtype(state_dtype) == jnp.int8

    def conv(p, cur, trainable, *, is_v):
        if not trainable:
            # scalar placeholder (adamw_init trainable_mask contract)
            return jnp.zeros((), jnp.float32 if int8_state else
                             (state_dtype or p.dtype))
        want_q8 = int8_state and _q8_eligible(p)
        is_q8 = isinstance(cur, dict)
        if want_q8 and is_q8:
            return cur
        if not want_q8 and not is_q8:
            want = jnp.float32 if int8_state else (state_dtype or p.dtype)
            return cur if cur.dtype == want else cur.astype(want)
        if want_q8:  # array -> int8 blocks
            x = cur.astype(jnp.float32)
            return q8_quantize(jnp.sqrt(x) if is_v else x, unsigned=is_v)
        # int8 blocks -> array (sqrt(v) grid back to v)
        x = q8_dequantize(cur, p.shape)
        if is_v:
            x = x * x
        return x.astype(state_dtype or p.dtype)

    # flatten_up_to keeps each q8 {"q","s"} dict intact as ONE moment leaf
    # (plain tree.map would descend into it and break the params zip —
    # same pattern as adamw_update)
    flat_p, treedef = jax.tree.flatten(params)
    flat_tr = (
        [True] * len(flat_p)
        if trainable_mask is None
        else [bool(t) for t in treedef.flatten_up_to(trainable_mask)]
    )

    def walk(tree, *, is_v):
        flat = [
            conv(p, c, tr, is_v=is_v)
            for p, c, tr in zip(flat_p, treedef.flatten_up_to(tree), flat_tr)
        ]
        return jax.tree.unflatten(treedef, flat)

    out = dict(opt_state)
    out["m"] = walk(opt_state["m"], is_v=False)
    out["v"] = walk(opt_state["v"], is_v=True)
    return out


def global_norm(grads, mask=None):
    # upcast per element INSIDE the reduction (XLA fuses cast+square+sum, no
    # fp32 materialization): grads may arrive as bf16 accumulators
    # (make_train_step grad_accum_dtype) and a bf16 sum-of-squares over
    # millions of elements would overflow/lose the norm
    sq = lambda g: jnp.sum(jnp.square(g.astype(jnp.float32)))
    leaves = jax.tree.leaves(
        _tmap(lambda g, m: sq(g) * m, grads, mask)
        if mask is not None
        else _tmap(sq, grads)
    )
    return jnp.sqrt(sum(leaves))


def adamw_update(
    params,
    grads,
    state,
    lr,
    cfg: OptimizerConfig,
    *,
    decay_mask,
    trainable_mask=None,
    use_fused: bool = False,
    grad_scale=None,
    precomputed_norm=None,
):
    """One optimizer step. Returns (new_params, new_state, pre_clip_norm).

    grad_scale: optional scalar applied to every grad (the grad-accum
    1/accum mean). Folding it in here — norm scales linearly, and the
    per-element multiply fuses into clip_scale — instead of pre-scaling
    the grads tree in the caller avoids materializing a second full-size
    grads tree (2.9 GB at 1558M: a scaled tree feeding the chunked 8-bit
    update's fori_loop cannot fuse into the loop body, so XLA kept the
    whole copy live in the update program's arena). Bit-identical to
    pre-scaling whenever grad_scale is a power of two (1/accum is).

    precomputed_norm: optional already-grad_scaled global norm. The
    split-accum host guard (train/step.py guard_check) computes the exact
    same `global_norm(grads, mask) * grad_scale` every step to test
    finiteness before dispatching the update; threading that scalar in
    here skips the in-graph recompute — one full bandwidth pass over the
    grad-accumulator tree (2.9 GiB at 1558M) saved per healthy step.
    Bit-identical: same reduction, same mask, same scale order."""
    if trainable_mask is None:
        trainable_mask = _tmap(lambda _: True, params)
    step = state["step"] + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - cfg.beta1**t
    bc2 = 1.0 - cfg.beta2**t

    if precomputed_norm is not None:
        norm = jnp.asarray(precomputed_norm, jnp.float32)
    else:
        norm = global_norm(grads, trainable_mask)
        if grad_scale is not None:
            norm = norm * grad_scale
    clip_scale = jnp.minimum(1.0, cfg.grad_clip / (norm + 1e-6))
    if grad_scale is not None:
        clip_scale = clip_scale * grad_scale

    scalars_nowd = jnp.stack(
        [
            lr,
            jnp.float32(cfg.beta1),
            jnp.float32(cfg.beta2),
            jnp.float32(cfg.eps),
            clip_scale,
            bc1,
            bc2,
        ]
    ).astype(jnp.float32)

    def update_leaf(p, g, m, v, decay, trainable):
        if not trainable:
            return p, m, v
        wd = cfg.weight_decay if decay else 0.0
        q8 = isinstance(m, dict)  # block-quantized 8-bit moments
        if (
            use_fused
            and not q8
            and leaf_supports_fused(p)
            and m.dtype == p.dtype
        ):
            return fused_adamw_leaf(p, g, m, v, scalars_nowd, wd=wd)
        # moments (and params, in the whole-model-bf16 mode that mirrors
        # the reference's CUDA cast, train_gpt2.py:264) may be stored
        # compact; the arithmetic is always fp32, with one rounding (or
        # requantization) per step at store — the same semantics as torch
        # bf16 AdamW
        param_dtype = p.dtype
        if q8:
            G = _q8_chunk_rows(p.shape) if p.size >= Q8_CHUNK_MIN else 0
            if G and p.shape[0] // G > 1:
                return _q8_update_leaf_chunked(
                    p, g, m, v,
                    (
                        lr, cfg.beta1, cfg.beta2, cfg.eps, clip_scale,
                        bc1, bc2, wd,
                    ),
                    G,
                )
            m = q8_dequantize(m, p.shape)
            r = q8_dequantize(v, p.shape)
            v = r * r  # v stored as sqrt(v)
        else:
            state_dtype = m.dtype
            m = m.astype(jnp.float32)
            v = v.astype(jnp.float32)
        g = g * clip_scale
        m_new = cfg.beta1 * m + (1.0 - cfg.beta1) * g
        v_new = cfg.beta2 * v + (1.0 - cfg.beta2) * g * g
        mhat = m_new / bc1
        vhat = v_new / bc2
        p = p.astype(jnp.float32)
        if wd:
            p = p * (1.0 - lr * wd)
        p = p - lr * mhat / (jnp.sqrt(vhat) + cfg.eps)
        if q8:
            return (
                p.astype(param_dtype),
                q8_quantize(m_new),
                q8_quantize(jnp.sqrt(v_new), unsigned=True),
            )
        return (
            p.astype(param_dtype),
            m_new.astype(state_dtype),
            v_new.astype(state_dtype),
        )

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state["m"])
    flat_v = treedef.flatten_up_to(state["v"])
    flat_decay = treedef.flatten_up_to(decay_mask)
    flat_train = treedef.flatten_up_to(trainable_mask)

    new_p, new_m, new_v = [], [], []
    for p, g, m, v, d, tr in zip(
        flat_p, flat_g, flat_m, flat_v, flat_decay, flat_train
    ):
        np_, nm, nv = update_leaf(p, g, m, v, bool(d), bool(tr))
        new_p.append(np_)
        new_m.append(nm)
        new_v.append(nv)

    new_params = jax.tree.unflatten(treedef, new_p)
    new_state = {
        "m": jax.tree.unflatten(treedef, new_m),
        "v": jax.tree.unflatten(treedef, new_v),
        "step": step,
    }
    return new_params, new_state, norm


# ---------------------------------------------------------------------------
# Freezing
# ---------------------------------------------------------------------------


def freeze(params, trainable_mask):
    """stop_gradient on frozen leaves: their grads become structural zeros
    that XLA dead-code-eliminates, reproducing requires_grad_(False)
    (gpt2_linear/model.py:161-164) without touching the model code."""
    return _tmap(
        lambda p, m: p if m else jax.lax.stop_gradient(p), params, trainable_mask
    )
