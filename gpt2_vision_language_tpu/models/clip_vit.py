"""CLIP ViT image encoder (JAX) + fused on-device preprocessing.

The reference consumes PRECOMPUTED CLIP patch-token shards; its extraction
script is absent from the repo (SURVEY.md §6 defect c — README names CLIP
ViT-L/14 at README.md:44-46 while the bridges use enc_dim=768). This module
supplies the missing encoder natively:

  * ViT with quickGELU (x * sigmoid(1.702x)) — CLIP's activation — pre-LN
    blocks, CLS token, learned positional embeddings, ln_pre/ln_post;
  * the patch "conv" is a reshape+matmul (patchify -> (B, N, p*p*3) @ W):
    identical math, lands on the MXU without conv lowering;
  * blocks stacked + lax.scan like the decoder; bf16 compute/fp32 LN;
  * `features()` returns the full (B, 1+N, width) token sequence that the
    bridges' pooling consumes (197 for ViT-B/16, 257 for ViT-L/14);
  * fused jitted preprocessing: resize(shorter side)->center crop->
    normalize, all on device (BASELINE north star);
  * HF `CLIPVisionModel` weight importer for real checkpoints.
"""

from __future__ import annotations

import functools
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import CLIPConfig
from ..core.precision import Policy, DEFAULT_POLICY
from ..ops.layers import layer_norm, linear

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init(key, cfg: CLIPConfig):
    w = cfg.width
    n = cfg.grid * cfg.grid
    ks = iter(jax.random.split(key, 16))
    scale = w**-0.5
    nrm = lambda k, shape, s: jax.random.normal(k, shape, jnp.float32) * s
    L = cfg.layers
    return {
        "patch_w": nrm(next(ks), (cfg.patch_size * cfg.patch_size * 3, w), scale),
        "cls": nrm(next(ks), (w,), scale),
        "pos": nrm(next(ks), (n + 1, w), scale),
        "ln_pre": {"scale": jnp.ones((w,)), "bias": jnp.zeros((w,))},
        "blocks": {
            "ln1": {"scale": jnp.ones((L, w)), "bias": jnp.zeros((L, w))},
            "attn": {
                "wqkv": nrm(next(ks), (L, w, 3 * w), scale),
                "bqkv": jnp.zeros((L, 3 * w)),
                "wo": nrm(next(ks), (L, w, w), scale),
                "bo": jnp.zeros((L, w)),
            },
            "ln2": {"scale": jnp.ones((L, w)), "bias": jnp.zeros((L, w))},
            "mlp": {
                "wfc": nrm(next(ks), (L, w, 4 * w), scale),
                "bfc": jnp.zeros((L, 4 * w)),
                "wproj": nrm(next(ks), (L, 4 * w, w), scale),
                "bproj": jnp.zeros((L, w)),
            },
        },
        "ln_post": {"scale": jnp.ones((w,)), "bias": jnp.zeros((w,))},
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _attn(p, x, heads: int, policy: Policy):
    b, t, c = x.shape
    qkv = linear(x, p["wqkv"], p["bqkv"], policy=policy)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    split = lambda z: z.reshape(b, t, heads, c // heads).transpose(0, 2, 1, 3)
    q, k, v = split(q), split(k), split(v)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk",
        policy.cast_compute(q),
        policy.cast_compute(k),
        preferred_element_type=jnp.float32,
    ) / (c // heads) ** 0.5
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    y = jnp.einsum(
        "bhqk,bhkd->bhqd",
        probs.astype(policy.compute_dtype),
        policy.cast_compute(v),
        preferred_element_type=jnp.float32,
    )
    y = y.transpose(0, 2, 1, 3).reshape(b, t, c).astype(x.dtype)
    return linear(y, p["wo"], p["bo"], policy=policy)


def patchify(images, patch: int):
    """(B, H, W, 3) -> (B, N, patch*patch*3), raster order like conv."""
    b, h, w, c = images.shape
    gh, gw = h // patch, w // patch
    x = images.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, patch * patch * c)
    return x


def features(
    params,
    images,
    cfg: CLIPConfig,
    *,
    policy: Policy = DEFAULT_POLICY,
    apply_ln_post: bool = True,
):
    """(B, H, W, 3) preprocessed images -> (B, 1+N, width) token features."""
    x = patchify(images, cfg.patch_size)
    x = linear(x, params["patch_w"], policy=policy)  # no bias in CLIP conv
    cls = jnp.broadcast_to(
        params["cls"][None, None, :], (x.shape[0], 1, x.shape[-1])
    ).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos"][None].astype(x.dtype)
    x = layer_norm(x, params["ln_pre"]["scale"], params["ln_pre"]["bias"])
    x = x.astype(policy.compute_dtype)

    def body(carry, lp):
        y = carry + _attn(
            lp["attn"],
            layer_norm(carry, lp["ln1"]["scale"], lp["ln1"]["bias"]),
            cfg.heads,
            policy,
        )
        h = layer_norm(y, lp["ln2"]["scale"], lp["ln2"]["bias"])
        h = quick_gelu(linear(h, lp["mlp"]["wfc"], lp["mlp"]["bfc"], policy=policy))
        y = y + linear(h, lp["mlp"]["wproj"], lp["mlp"]["bproj"], policy=policy)
        return y, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    if apply_ln_post:
        x = layer_norm(x, params["ln_post"]["scale"], params["ln_post"]["bias"])
    return x


# ---------------------------------------------------------------------------
# On-device preprocessing (resize -> center crop -> normalize), jit-fused
# ---------------------------------------------------------------------------


def normalize_only(images_u8):
    """(B, S, S, 3) uint8 already resized/cropped -> CLIP-normalized float."""
    x = images_u8.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)


@functools.partial(jax.jit, static_argnames=("size",))
def preprocess(images_u8, size: int = 224):
    """(B, H, W, 3) uint8 -> (B, size, size, 3) float32, CLIP normalization.
    Resize shorter side to `size` (bilinear), center crop, scale to [0,1],
    normalize with CLIP mean/std — one fused XLA program on device."""
    b, h, w, _ = images_u8.shape
    x = images_u8.astype(jnp.float32) / 255.0
    if h < w:
        nh, nw = size, max(size, int(round(w * size / h)))
    else:
        nh, nw = max(size, int(round(h * size / w))), size
    x = jax.image.resize(x, (b, nh, nw, 3), method="bilinear")
    top = (nh - size) // 2
    left = (nw - size) // 2
    x = jax.lax.dynamic_slice(x, (0, top, left, 0), (b, size, size, 3))
    mean = jnp.asarray(CLIP_MEAN)
    std = jnp.asarray(CLIP_STD)
    return (x - mean) / std


# ---------------------------------------------------------------------------
# HF weight import
# ---------------------------------------------------------------------------


def from_hf_state_dict(sd: Mapping, cfg: CLIPConfig):
    """Import transformers CLIPVisionModel weights (vision_model.*)."""

    def g(name):
        x = sd[name]
        if hasattr(x, "detach"):
            x = x.detach().cpu().float().numpy()
        return np.array(x, dtype=np.float32, copy=True)

    pre = "vision_model."
    L = cfg.layers
    w = cfg.width
    conv = g(pre + "embeddings.patch_embedding.weight")  # (w, 3, p, p)
    # conv weight (out, in, kh, kw) -> patchify layout (p*p*3, w):
    # patchify flattens (ph, pw, channel) row-major
    patch_w = conv.transpose(2, 3, 1, 0).reshape(-1, w)

    def ln(name):
        return {"scale": jnp.asarray(g(name + ".weight")), "bias": jnp.asarray(g(name + ".bias"))}

    def stack(tmpl, transpose=False):
        arrs = []
        for i in range(L):
            a = g(tmpl.format(i))
            arrs.append(a.T if transpose else a)
        return jnp.asarray(np.stack(arrs))

    def stack_qkv():
        ws, bs = [], []
        for i in range(L):
            p = f"{pre}encoder.layers.{i}.self_attn."
            wq, wk, wv = g(p + "q_proj.weight"), g(p + "k_proj.weight"), g(p + "v_proj.weight")
            bq, bk, bv = g(p + "q_proj.bias"), g(p + "k_proj.bias"), g(p + "v_proj.bias")
            ws.append(np.concatenate([wq.T, wk.T, wv.T], axis=1))  # (w, 3w)
            bs.append(np.concatenate([bq, bk, bv]))
        return jnp.asarray(np.stack(ws)), jnp.asarray(np.stack(bs))

    wqkv, bqkv = stack_qkv()
    return {
        "patch_w": jnp.asarray(patch_w),
        "cls": jnp.asarray(g(pre + "embeddings.class_embedding").reshape(w)),
        "pos": jnp.asarray(g(pre + "embeddings.position_embedding.weight")),
        "ln_pre": ln(pre + "pre_layrnorm"),  # HF's historical typo
        "blocks": {
            "ln1": {
                "scale": stack(pre + "encoder.layers.{}.layer_norm1.weight"),
                "bias": stack(pre + "encoder.layers.{}.layer_norm1.bias"),
            },
            "attn": {
                "wqkv": wqkv,
                "bqkv": bqkv,
                "wo": stack(pre + "encoder.layers.{}.self_attn.out_proj.weight", True),
                "bo": stack(pre + "encoder.layers.{}.self_attn.out_proj.bias"),
            },
            "ln2": {
                "scale": stack(pre + "encoder.layers.{}.layer_norm2.weight"),
                "bias": stack(pre + "encoder.layers.{}.layer_norm2.bias"),
            },
            "mlp": {
                "wfc": stack(pre + "encoder.layers.{}.mlp.fc1.weight", True),
                "bfc": stack(pre + "encoder.layers.{}.mlp.fc1.bias"),
                "wproj": stack(pre + "encoder.layers.{}.mlp.fc2.weight", True),
                "bproj": stack(pre + "encoder.layers.{}.mlp.fc2.bias"),
            },
        },
        "ln_post": ln(pre + "post_layernorm"),
    }
