"""Vision->LM bridges: linear projection and BLIP-2-style Q-Former.

  * Linear_Bridge (gpt2_linear/model.py:114-129): one Linear enc_dim->d_lm.
  * BLIP2Bridge (gpt2_q_former/model.py:114-168): vis_proj + 32 learnable
    query tokens + 2 QFormerLayers (pre-LN query self-attention, query<->
    visual cross-attention with separate LNs, 4x MLP with EXACT erf GELU —
    unlike the decoder's tanh GELU — residual + dropout 0.1).

The Q-Former layers are stacked and scanned like the decoder blocks. torch
nn.MultiheadAttention semantics are reproduced (packed-QKV import is
handled by ckpt/torch_import.qformer_bridge_from_torch); dropout sites
match the reference (attention-weight dropout inside MHA, output dropout
after each sublayer) and are active only in training with an explicit rng.

Init matches the torch defaults the reference actually uses (the bridges
are NOT nanoGPT-initialized — GPT_Caption never calls _init_weights on
them): Linear = U(±1/sqrt(fan_in)), MHA in-proj = Xavier uniform,
query_tokens = N(0, 1).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import BridgeConfig
from ..core.precision import Policy, DEFAULT_POLICY
from ..ops.layers import gelu_exact, layer_norm, linear

# ---------------------------------------------------------------------------
# Init helpers (torch default distributions)
# ---------------------------------------------------------------------------


def _uniform(key, shape, bound):
    return jax.random.uniform(
        key, shape, jnp.float32, minval=-bound, maxval=bound
    )


def _torch_linear_init(key, fan_in, fan_out):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": _uniform(k1, (fan_in, fan_out), bound),
        "b": _uniform(k2, (fan_out,), bound),
    }


def _xavier_uniform(key, fan_in, fan_out):
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return _uniform(key, (fan_in, fan_out), bound)


def _mha_init(key, d):
    ks = jax.random.split(key, 5)
    # torch packs q,k,v rows into one (3d, d) xavier_uniform matrix; split
    # here but keep the joint fan statistics (fan_in=d, fan_out=3d).
    bound = math.sqrt(6.0 / (d + 3 * d))
    out = _torch_linear_init(ks[4], d, d)
    return {
        "wq": _uniform(ks[0], (d, d), bound),
        "bq": jnp.zeros((d,)),
        "wk": _uniform(ks[1], (d, d), bound),
        "bk": jnp.zeros((d,)),
        "wv": _uniform(ks[2], (d, d), bound),
        "bv": jnp.zeros((d,)),
        "wo": out["w"],
        "bo": jnp.zeros((d,)),  # torch MHA out_proj bias starts at 0
    }


def _ln_init(d):
    return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}


# ---------------------------------------------------------------------------
# Linear bridge
# ---------------------------------------------------------------------------


def linear_bridge_init(key, cfg: BridgeConfig, d_lm: int):
    return {"vis_proj": _torch_linear_init(key, cfg.enc_dim, d_lm)}


def linear_bridge_apply(params, patch_tokens, *, policy: Policy = DEFAULT_POLICY):
    p = params["vis_proj"]
    return linear(patch_tokens, p["w"], p["b"], policy=policy)


# ---------------------------------------------------------------------------
# Q-Former bridge
# ---------------------------------------------------------------------------


def qformer_bridge_init(key, cfg: BridgeConfig, d_lm: int):
    ks = jax.random.split(key, 2 + cfg.n_layers)
    layers = []
    for i in range(cfg.n_layers):
        lk = jax.random.split(ks[2 + i], 4)
        fc = _torch_linear_init(lk[2], d_lm, 4 * d_lm)
        proj = _torch_linear_init(lk[3], 4 * d_lm, d_lm)
        layers.append(
            {
                "ln1": _ln_init(d_lm),
                "self_attn": _mha_init(lk[0], d_lm),
                "ln2_q": _ln_init(d_lm),
                "ln2_v": _ln_init(d_lm),
                "cross_attn": _mha_init(lk[1], d_lm),
                "ln3": _ln_init(d_lm),
                "mlp": {
                    "wfc": fc["w"],
                    "bfc": fc["b"],
                    "wproj": proj["w"],
                    "bproj": proj["b"],
                },
            }
        )
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "vis_proj": _torch_linear_init(ks[0], cfg.enc_dim, d_lm),
        "query_tokens": jax.random.normal(ks[1], (cfg.n_queries, d_lm)),
        "layers": stacked,
    }


def _mha(p, q_in, kv_in, n_heads, *, policy, dropout, rng, train):
    """torch nn.MultiheadAttention (batch_first) semantics."""
    b, tq, d = q_in.shape
    hd = d // n_heads
    q = linear(q_in, p["wq"], p["bq"], policy=policy)
    k = linear(kv_in, p["wk"], p["bk"], policy=policy)
    v = linear(kv_in, p["wv"], p["bv"], policy=policy)
    split = lambda x: x.reshape(b, -1, n_heads, hd).transpose(0, 2, 1, 3)
    q, k, v = split(q), split(k), split(v)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk",
        policy.cast_compute(q),
        policy.cast_compute(k),
        preferred_element_type=jnp.float32,
    ) / math.sqrt(hd)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    if train and dropout > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - dropout, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout), 0.0)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd",
        probs.astype(policy.compute_dtype),
        policy.cast_compute(v),
        preferred_element_type=jnp.float32,
    )
    out = out.transpose(0, 2, 1, 3).reshape(b, tq, d).astype(q_in.dtype)
    return linear(out, p["wo"], p["bo"], policy=policy)


def _dropout(x, rate, rng, train):
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def qformer_layer_apply(
    lp, q, v, cfg: BridgeConfig, *, policy, rng=None, train=False
):
    """One QFormerLayer (gpt2_q_former/model.py:133-145)."""
    rngs = jax.random.split(rng, 6) if rng is not None else [None] * 6
    q2 = layer_norm(q, lp["ln1"]["scale"], lp["ln1"]["bias"])
    sa = _mha(
        lp["self_attn"], q2, q2, cfg.n_heads,
        policy=policy, dropout=cfg.dropout, rng=rngs[0], train=train,
    )
    q = q + _dropout(sa, cfg.dropout, rngs[1], train)
    q2 = layer_norm(q, lp["ln2_q"]["scale"], lp["ln2_q"]["bias"])
    v2 = layer_norm(v, lp["ln2_v"]["scale"], lp["ln2_v"]["bias"])
    ca = _mha(
        lp["cross_attn"], q2, v2, cfg.n_heads,
        policy=policy, dropout=cfg.dropout, rng=rngs[2], train=train,
    )
    q = q + _dropout(ca, cfg.dropout, rngs[3], train)
    q2 = layer_norm(q, lp["ln3"]["scale"], lp["ln3"]["bias"])
    h = gelu_exact(linear(q2, lp["mlp"]["wfc"], lp["mlp"]["bfc"], policy=policy))
    h = linear(h, lp["mlp"]["wproj"], lp["mlp"]["bproj"], policy=policy)
    q = q + _dropout(h, cfg.dropout, rngs[4], train)
    return q


def qformer_bridge_apply(
    params,
    patch_tokens,
    cfg: BridgeConfig,
    *,
    policy: Policy = DEFAULT_POLICY,
    rng=None,
    train: bool = False,
):
    """(B, N, enc_dim) -> (B, n_queries, d_lm) refined queries
    (gpt2_q_former/model.py:159-168)."""
    x = linear(
        patch_tokens, params["vis_proj"]["w"], params["vis_proj"]["b"], policy=policy
    )
    b = x.shape[0]
    q = jnp.broadcast_to(
        params["query_tokens"][None], (b,) + params["query_tokens"].shape
    ).astype(x.dtype)

    n_layers = jax.tree.leaves(params["layers"])[0].shape[0]
    rngs = (
        jax.random.split(rng, n_layers) if rng is not None else [None] * n_layers
    )

    # 2 layers: unrolled loop keeps per-layer rng plumbing simple (depth is
    # tiny; scan buys nothing here)
    for i in range(n_layers):
        lp = jax.tree.map(lambda a: a[i], params["layers"])
        q = qformer_layer_apply(
            lp, q, x, cfg, policy=policy, rng=rngs[i], train=train
        )
    return q


def bridge_decay_mask(params):
    """AdamW decay mask for bridge pytrees by NAME, not raw ndim: stacked
    layer leaves carry a leading layer axis, so torch-equivalent ndim>=2
    (configure_optimizers, gpt2_q_former/model.py:252-260) means: weights
    and query_tokens decay; biases and LayerNorm scales/biases do not."""
    import jax as _jax

    def per_path(path, leaf):
        names = [str(getattr(k, "key", getattr(k, "name", k))) for k in path]
        last = names[-1]
        if last == "query_tokens":
            return True
        if last.startswith("w"):
            return True
        return False

    return _jax.tree_util.tree_map_with_path(per_path, params)


def bridge_init(key, cfg: BridgeConfig, d_lm: int):
    if cfg.kind == "linear":
        return linear_bridge_init(key, cfg, d_lm)
    if cfg.kind == "qformer":
        return qformer_bridge_init(key, cfg, d_lm)
    raise ValueError(f"unknown bridge kind {cfg.kind!r} (xattn lives in gpt2.py)")


def bridge_apply(params, patch_tokens, cfg: BridgeConfig, **kw):
    if cfg.kind == "linear":
        kw.pop("rng", None)
        kw.pop("train", None)
        return linear_bridge_apply(params, patch_tokens, **kw)
    if cfg.kind == "qformer":
        return qformer_bridge_apply(params, patch_tokens, cfg, **kw)
    raise ValueError(cfg.kind)
