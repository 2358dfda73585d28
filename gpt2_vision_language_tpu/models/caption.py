"""Prefix-conditioning caption model: frozen GPT-2 + trainable bridge.

Re-design of GPT_Caption (gpt2_linear/model.py:134-211 and its byte-identical
q_former twin): bridge(pooled CLIP tokens) -> M visual embeddings that are
concatenated BEFORE the text embeddings. Subtleties reproduced exactly:

  * visual prefix gets NO positional embeddings; text positions restart at 0
    (gpt2_linear/model.py:197-200);
  * loss reads logits[:, M:M+T] against labels with ignore_index=-100
    (gpt2_linear/model.py:205-210);
  * the LM is frozen (requires_grad_(False), :161-164) — here by trainable
    masks + stop_gradient in the optimizer, keeping the model code pure;
  * text is truncated if M+T exceeds block_size (:189-196) — a static-shape
    assert here since T=32, M=32/33 in every reference workload.

Generation uses the KV-cached Decoder with `prefix_embeds` (the reference
re-forwards the full sequence per token — gpt2_linear/data.py:111-127).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import BridgeConfig, GPTConfig
from ..core.precision import Policy, DEFAULT_POLICY
from . import gpt2
from .bridges import bridge_apply, bridge_init


def init(key, cfg: GPTConfig, bridge_cfg: BridgeConfig):
    """Bridge params only — the LM params come from the pretrain checkpoint
    (gpt2_linear/train.py:100-104)."""
    return bridge_init(key, bridge_cfg, cfg.n_embd)


def embed_visual(
    bridge_params,
    patch_tokens,
    bridge_cfg: BridgeConfig,
    *,
    policy: Policy = DEFAULT_POLICY,
    rng=None,
    train: bool = False,
):
    """(B, N, enc_dim) pooled CLIP tokens -> (B, M, d) visual prefix."""
    if patch_tokens.ndim == 2:
        patch_tokens = patch_tokens[:, None, :]
    if bridge_cfg.use_cls_only:
        patch_tokens = patch_tokens[:, 0:1, :]
    return bridge_apply(
        bridge_params,
        patch_tokens,
        bridge_cfg,
        policy=policy,
        rng=rng,
        train=train,
    )


def apply(
    gpt_params,
    bridge_params,
    patch_tokens,
    input_ids,
    cfg: GPTConfig,
    bridge_cfg: BridgeConfig,
    *,
    labels=None,
    policy: Policy = DEFAULT_POLICY,
    rng=None,
    train: bool = False,
    remat: bool = False,
):
    """Forward. Returns (logits over [img, txt] positions, loss or None)."""
    b, t_txt = input_ids.shape
    img = embed_visual(
        bridge_params, patch_tokens, bridge_cfg, policy=policy, rng=rng, train=train
    )
    m = img.shape[1]
    assert m + t_txt <= cfg.block_size, (
        f"visual prefix {m} + text {t_txt} exceeds block_size {cfg.block_size}"
    )
    txt = gpt2.embed_tokens(gpt_params, input_ids, cfg, pos_offset=0)
    full = jnp.concatenate(
        [img.astype(policy.compute_dtype), txt.astype(policy.compute_dtype)],
        axis=1,
    )
    logits = gpt2.forward_embeds(gpt_params, full, cfg, policy=policy, remat=remat)
    loss = None
    if labels is not None:
        logits_txt = logits[:, m : m + t_txt, :]
        loss = gpt2.cross_entropy(logits_txt, labels)
    return logits, loss


def loss(
    gpt_params,
    bridge_params,
    patch_tokens,
    input_ids,
    cfg: GPTConfig,
    bridge_cfg: BridgeConfig,
    *,
    labels,
    policy: Policy = DEFAULT_POLICY,
    rng=None,
    train: bool = False,
    remat: bool = False,
    ce_chunks: int = 8,
):
    """Training loss via the fused chunked lm_head+CE (ops/fused_ce.py):
    identical semantics to apply(...)[1] — CE over the text positions
    against ignore_index=-100 labels (gpt2_linear/model.py:205-210) —
    without materializing (B, M+T, 50304) logits."""
    from ..ops.layers import layer_norm

    b, t_txt = input_ids.shape
    img = embed_visual(
        bridge_params, patch_tokens, bridge_cfg, policy=policy, rng=rng, train=train
    )
    m = img.shape[1]
    assert m + t_txt <= cfg.block_size
    txt = gpt2.embed_tokens(gpt_params, input_ids, cfg, pos_offset=0)
    full = jnp.concatenate(
        [img.astype(policy.compute_dtype), txt.astype(policy.compute_dtype)],
        axis=1,
    )
    x = gpt2.run_blocks(gpt_params, full, cfg, policy=policy, remat=remat)
    x = layer_norm(x, gpt_params["lnf"]["scale"], gpt_params["lnf"]["bias"])
    x_txt = x[:, m : m + t_txt, :]
    return gpt2.fused_ce_loss(
        x_txt, gpt_params["wte"], labels, policy=policy, ce_chunks=ce_chunks
    )


def loss_fn_factory(
    cfg: GPTConfig,
    bridge_cfg: BridgeConfig,
    *,
    policy: Policy = DEFAULT_POLICY,
    train: bool = True,
    remat: bool = False,
    fused_ce: bool = True,
):
    """loss_fn(params={'gpt','bridge'}, micro={'x','y','mask','z','rng'?})
    for train/step.py. labels = y masked to -100 outside the caption
    (gpt2_linear/train.py:305-306)."""

    def loss_fn(params, micro):
        labels = jnp.where(micro["mask"], micro["y"], -100)
        # per-micro dropout rng from a uint32 seed in the batch (present
        # only for training batches); Q-Former trains with dropout 0.1
        # (gpt2_q_former/model.py:116-131)
        rng = jax.random.PRNGKey(micro["seed"]) if "seed" in micro else None
        kwargs = dict(
            labels=labels,
            policy=policy,
            rng=rng,
            train=train and rng is not None,
            remat=remat,
        )
        if fused_ce:
            return loss(
                params["gpt"],
                params["bridge"],
                micro["z"],
                micro["x"],
                cfg,
                bridge_cfg,
                **kwargs,
            )
        _, l = apply(
            params["gpt"],
            params["bridge"],
            micro["z"],
            micro["x"],
            cfg,
            bridge_cfg,
            **kwargs,
        )
        return l

    return loss_fn


def generate_captions(
    gpt_params,
    bridge_params,
    patch_tokens,
    prompt_ids,
    cfg: GPTConfig,
    bridge_cfg: BridgeConfig,
    rng,
    *,
    max_new_tokens: int = 24,
    policy: Policy = DEFAULT_POLICY,
    decoder=None,
):
    """KV-cached nucleus-sampled caption generation (temperature 0.8,
    top-p 0.9 — gpt2_linear/data.py:108-127)."""
    # local import: infer.decode itself imports models.gpt2 (cycle otherwise)
    from ..infer.decode import Decoder
    from ..infer.sampling import sample_top_p_fast

    dec = decoder or Decoder(cfg, policy=policy, sample_fn=sample_top_p_fast)
    img = embed_visual(bridge_params, patch_tokens, bridge_cfg, policy=policy)
    toks, _ = dec.generate(
        gpt_params, prompt_ids, max_new_tokens, rng, prefix_embeds=img
    )
    return toks
