"""GPT-2 decoder as pure functions over a parameter pytree.

Re-design of the reference decoder (train_gpt2.py:21-144 and the
cross-attention variant gpt2_cross-att/model.py:9-206) for TPU:

  * parameters of all layers are STACKED along a leading layer axis and the
    block runs under `lax.scan` — one compiled block body regardless of
    depth, fast XLA compiles, and clean layer-sharding extension points;
  * fused QKV projection stays one (D, 3D) matmul onto the MXU;
  * attention dispatches to the Pallas flash kernel on TPU (ops/attention);
  * weight tying is structural: only `wte` exists, the LM head is
    `x @ wte.T` (reference ties tensors at train_gpt2.py:97);
  * init matches the reference exactly: normal(0, 0.02) everywhere, biases
    zero, residual output projections scaled by (2*n_layer)^-0.5
    (train_gpt2.py:100-109), cross-attention gates start at 0.0
    (gpt2_cross-att/model.py:97).

The gated cross-attention variant (cfg.cross_attention=True) prepends
`x += tanh(gate) * xattn(ln_x(x), z)` in every block
(gpt2_cross-att/model.py:99-104) with a shared vision projector
(gpt2_cross-att/model.py:78-84,124).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.ad_checkpoint
import jax.numpy as jnp

from ..core.config import GPTConfig
from ..core.precision import Policy, DEFAULT_POLICY
from ..ops.attention import sdpa
from ..ops.flash_attention import flash_attention_dt
from ..ops.layers import embed, gelu_tanh, layer_norm, linear

# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _normal(key, shape, std):
    return jax.random.normal(key, shape, dtype=jnp.float32) * std


def init(key, cfg: GPTConfig):
    """Initialize the parameter pytree (fp32).

    Keys are split deterministically per leaf; distributional parity with the
    reference init (same std / zeros pattern), not bitwise RNG parity.
    """
    d, L, vp = cfg.n_embd, cfg.n_layer, cfg.padded_vocab_size
    proj_std = 0.02 * (2 * L) ** -0.5  # NANOGPT_SCALE_INIT (train_gpt2.py:104)
    keys = iter(jax.random.split(key, 32))

    params = {
        "wte": _normal(next(keys), (vp, d), 0.02),
        "wpe": _normal(next(keys), (cfg.block_size, d), 0.02),
        "blocks": {
            "ln1": {"scale": jnp.ones((L, d)), "bias": jnp.zeros((L, d))},
            "attn": {
                "wqkv": _normal(next(keys), (L, d, 3 * d), 0.02),
                "bqkv": jnp.zeros((L, 3 * d)),
                "wo": _normal(next(keys), (L, d, d), proj_std),
                "bo": jnp.zeros((L, d)),
            },
            "ln2": {"scale": jnp.ones((L, d)), "bias": jnp.zeros((L, d))},
            "mlp": {
                "wfc": _normal(next(keys), (L, d, 4 * d), 0.02),
                "bfc": jnp.zeros((L, 4 * d)),
                "wproj": _normal(next(keys), (L, 4 * d, d), proj_std),
                "bproj": jnp.zeros((L, d)),
            },
        },
        "lnf": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
    }
    if cfg.cross_attention:
        assert cfg.img_embd > 0
        params["blocks"]["lnx"] = {
            "scale": jnp.ones((L, d)),
            "bias": jnp.zeros((L, d)),
        }
        params["blocks"]["xattn"] = {
            "wq": _normal(next(keys), (L, d, d), 0.02),
            "bq": jnp.zeros((L, d)),
            "wkv": _normal(next(keys), (L, d, 2 * d), 0.02),
            "bkv": jnp.zeros((L, 2 * d)),
            "wo": _normal(next(keys), (L, d, d), proj_std),
            "bo": jnp.zeros((L, d)),
        }
        # Flamingo-style scalar gate per block, init 0.0 so the pretrained
        # LM is untouched at step 0 (gpt2_cross-att/model.py:97).
        params["blocks"]["gate"] = jnp.zeros((L,))
        params["vis_proj"] = {
            "w": _normal(next(keys), (cfg.img_embd, d), 0.02),
            "b": jnp.zeros((d,)),
        }
    return params


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _split_heads(x, n_head):
    b, t, c = x.shape
    return x.reshape(b, t, n_head, c // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, t, hs = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * hs)


def _use_dt_attention(attn_impl: str, t: int, hs: int) -> bool:
    """Route to the zero-transpose dt flash path when the flash kernel
    would run anyway (sdpa's 'auto' rule) and the shape qualifies."""
    if attn_impl not in ("auto", "flash"):
        return False
    from ..ops import attention as _att
    from ..ops import flash_attention as _fa

    if not (_att._on_tpu() or _fa.FORCE_INTERPRET):
        return False
    if attn_impl == "auto" and t < 512:  # sdpa's measured flash threshold
        return False
    return _fa.dt_eligible(t, t, hs)


def _self_attention_dt(p, x, cfg: GPTConfig, *, policy: Policy):
    """Causal self-attention on the dt (head-major, time-in-lanes) path.

    The QKV projection is computed as dot_general(w_qkv, x) -> (3C, B, T),
    which reshapes for FREE into the (3, H, hs, B*T) layout the dt flash
    kernel consumes — the (B,T,H,hs)<->(B,H,T,hs) head transposes and
    their tile-padding copies (3.8 ms/micro at the 124M bench shape)
    disappear, and the kernel's tiles are 100% lane-dense (see
    ops/flash_attention.py dt section). The output projection consumes
    the (C, B*T) attention output the same way: dot_general(o, w_o) ->
    (B*T, C). Numerics match self_attention up to f32-accumulation
    reduction order (same dots, different operand orders).
    """
    b, t, c = x.shape
    hs = c // cfg.n_head
    # Merge (B, T) BEFORE the matmul: leading-dim merges are free on TPU
    # tiled layouts, trailing-dim merges are physical relayouts — emitting
    # (3C, B, T) and reshaping to (3C, B*T) after cost ~2.2 ms/micro in
    # copies (r4 trace). (3C, B*T) reshapes to (3, H, hs, B*T) for free
    # (leading split).
    xb = policy.cast_compute(x).reshape(b * t, c)
    qkv = jax.lax.dot_general(
        policy.cast_compute(p["wqkv"]), xb, (((0,), (1,)), ((), ())),
        preferred_element_type=policy.accum_dtype,
    )  # (3C, B*T)
    qkv = qkv + p["bqkv"].astype(policy.accum_dtype)[:, None]
    qkv = qkv.astype(policy.compute_dtype).reshape(3, cfg.n_head, hs, b * t)
    y = flash_attention_dt(qkv[0], qkv[1], qkv[2], b=b, causal=True)
    out = jax.lax.dot_general(
        y.reshape(c, b * t), policy.cast_compute(p["wo"]),
        (((0,), (0,)), ((), ())),
        preferred_element_type=policy.accum_dtype,
    )  # (B*T, C)
    out = out + p["bo"].astype(policy.accum_dtype)
    return out.astype(x.dtype).reshape(b, t, c)


def self_attention(p, x, cfg: GPTConfig, *, policy: Policy, attn_impl: str):
    """Causal self-attention with fused QKV (train_gpt2.py:33-43).

    Heads are kept in the (B, T, H, hs) layout the fused projection
    yields for free. The einsum path (caption/cross-attn/CPU) consumes it
    with no (B, H, T, hs) transpose; the flash path routes to the dt
    (head-major) kernels when the shape qualifies — zero head transposes
    AND denser tiles (see _self_attention_dt) — and otherwise transposes
    into the bhtd kernels."""
    b, t, c = x.shape
    hs = c // cfg.n_head
    if _use_dt_attention(attn_impl, t, hs):
        return _self_attention_dt(p, x, cfg, policy=policy)
    qkv = linear(x, p["wqkv"], p["bqkv"], policy=policy)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (a.reshape(b, t, cfg.n_head, hs) for a in (q, k, v))
    y = sdpa(
        policy.cast_compute(q),
        policy.cast_compute(k),
        policy.cast_compute(v),
        causal=True,
        impl=attn_impl,
        layout="bthd",
    ).astype(x.dtype)
    return linear(y.reshape(b, t, c), p["wo"], p["bo"], policy=policy)


def cross_attention(p, x, z, cfg: GPTConfig, *, policy: Policy):
    """Non-causal text->vision cross-attention (gpt2_cross-att/model.py:34-58).
    KV sequence is tiny (33 visual tokens) so the XLA path is optimal."""
    q = linear(x, p["wq"], p["bq"], policy=policy)
    kv = linear(z, p["wkv"], p["bkv"], policy=policy)
    k, v = jnp.split(kv, 2, axis=-1)
    q, k, v = (_split_heads(t, cfg.n_head) for t in (q, k, v))
    y = sdpa(
        policy.cast_compute(q),
        policy.cast_compute(k),
        policy.cast_compute(v),
        causal=False,
        impl="xla",
    ).astype(x.dtype)
    return linear(_merge_heads(y), p["wo"], p["bo"], policy=policy)


def mlp(p, x, *, policy: Policy):
    """c_fc -> tanh-GELU -> c_proj (train_gpt2.py:46-59). The (B, T, 4D)
    hiddens are named so remat policies can exclude exactly them (they are
    the dominant saved-activation cost: 6x larger than the residual)."""
    fc = jax.ad_checkpoint.checkpoint_name(
        linear(x, p["wfc"], p["bfc"], policy=policy), "mlp_hidden"
    )
    # the gelu output gets its own name: recomputing ONLY it in the backward
    # (policy "recompute_gelu") is an elementwise recompute off the saved fc
    # that frees a stacked (L, B, T, 4D) buffer (1.12 GB at 124M/B16)
    h = jax.ad_checkpoint.checkpoint_name(gelu_tanh(fc), "mlp_gelu")
    return linear(h, p["wproj"], p["bproj"], policy=policy)


def block(layer_params, x, z, cfg: GPTConfig, *, policy: Policy, attn_impl: str):
    """Pre-LN residual block (train_gpt2.py:62-74); with optional gated
    cross-attention prologue (gpt2_cross-att/model.py:99-104)."""
    p = layer_params
    if cfg.cross_attention and z is not None:
        xa = cross_attention(
            p["xattn"],
            layer_norm(x, p["lnx"]["scale"], p["lnx"]["bias"]),
            z,
            cfg,
            policy=policy,
        )
        # cast: the fp32 scalar gate must not promote the bf16 residual
        x = x + jnp.tanh(p["gate"]).astype(x.dtype) * xa
    attn_out = self_attention(
        p["attn"],
        layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"]),
        cfg,
        policy=policy,
        attn_impl=attn_impl,
    )
    # named for selective remat: saving attention outputs skips the flash
    # forward recompute in the backward pass at (L, B, T, D) bf16 cost
    x = x + jax.ad_checkpoint.checkpoint_name(attn_out, "attn_out")
    x = x + mlp(p["mlp"], layer_norm(x, p["ln2"]["scale"], p["ln2"]["bias"]), policy=policy)
    return x


def run_blocks(
    params,
    x,
    cfg: GPTConfig,
    *,
    z=None,
    policy: Policy = DEFAULT_POLICY,
    attn_impl: str = "auto",
    remat=False,
    act_sharding=None,
):
    """Scan the stacked blocks over the layer axis.

    remat: False = no remat; True = full block remat (min memory);
    "save_attn" = keep only the named attention outputs resident;
    "recompute_mlp" = save everything EXCEPT the (B, T, 4D) MLP hiddens.
    Measured on v5e-16GB at GPT-2 124M B=16 T=1024: full remat ~= save_attn
    ~= no-remat-at-B-8 (~97k tok/s; the step is not remat-bound) and
    recompute_mlp still exceeds HBM — these policies are the knobs for
    larger chips/models, not wins at this scale.

    act_sharding: optional NamedSharding for the (B, T, C) residual stream
    — sequence parallelism the GSPMD way. Constraining the residual to
    P("data", "model", None) between blocks makes XLA all-gather the
    sequence axis into each block's attention and reduce-scatter the
    block output, so the LN/residual segments compute and store only
    T/tp of the sequence per chip (Korthikanti et al.'s SP, expressed as
    a sharding hint instead of hand-written collectives). Numerics are
    unchanged; pure layout/communication."""
    constrain = (
        (lambda a: jax.lax.with_sharding_constraint(a, act_sharding))
        if act_sharding is not None
        else (lambda a: a)
    )
    x = constrain(x)

    def body(carry, layer_params):
        return (
            constrain(
                block(layer_params, carry, z, cfg, policy=policy, attn_impl=attn_impl)
            ),
            None,
        )

    if remat == "save_attn":
        body = jax.checkpoint(
            body,
            prevent_cse=False,
            policy=jax.checkpoint_policies.save_only_these_names("attn_out"),
        )
    elif remat == "recompute_mlp":
        body = jax.checkpoint(
            body,
            prevent_cse=False,
            policy=jax.checkpoint_policies.save_anything_except_these_names(
                "mlp_hidden", "mlp_gelu"
            ),
        )
    elif remat == "recompute_gelu":
        body = jax.checkpoint(
            body,
            prevent_cse=False,
            policy=jax.checkpoint_policies.save_anything_except_these_names(
                "mlp_gelu"
            ),
        )
    elif remat:
        body = jax.checkpoint(body, prevent_cse=False)
    elif remat is False and cfg.unroll_layers:
        # Python-unrolled layer loop (static slices of the stacked params).
        # Under value_and_grad, lax.scan saves each iteration's residuals by
        # stacking them through dynamic-update-slices in an HBM (L, ...)
        # buffer and re-slicing them in the backward while-loop; profiling
        # the no-remat 124M step showed those DUS/copy round-trips at ~30%
        # of step time (~6x the HBM roofline for the saved bytes).
        # Unrolling keeps residuals as plain values: nothing to stack.
        for i in range(cfg.n_layer):
            lp = jax.tree.map(lambda a: a[i], params["blocks"])
            x = constrain(
                block(lp, x, z, cfg, policy=policy, attn_impl=attn_impl)
            )
        return x
    x, _ = jax.lax.scan(body, x, params["blocks"])
    return x


def embed_tokens(params, idx, cfg: GPTConfig, *, pos_offset: int = 0):
    """wte + wpe embedding sum (train_gpt2.py:114-117)."""
    t = idx.shape[-1]
    pos = jnp.arange(pos_offset, pos_offset + t)
    return embed(params["wte"], idx) + embed(params["wpe"], pos)


def lm_head(params, x, cfg: GPTConfig, *, policy: Policy = DEFAULT_POLICY):
    """Tied unembedding: logits = ln_f(x) @ wte.T (train_gpt2.py:96-97,120-121).

    Returned in the COMPUTE dtype: the (B, T, 50304) logits tensor is the
    largest activation in the model (3.3 GB in fp32 at B=16, T=1024) and
    dominates HBM traffic through the loss; the MXU still accumulates in
    fp32 and the CE loss upcasts to fp32 before logsumexp. Under the fp32
    parity policy this is exact fp32.
    """
    x = layer_norm(x, params["lnf"]["scale"], params["lnf"]["bias"])
    logits = jnp.dot(
        policy.cast_compute(x),
        policy.cast_compute(params["wte"]).T,
        preferred_element_type=policy.accum_dtype,
    )
    return logits.astype(policy.compute_dtype)


def forward_embeds(
    params,
    embeds,
    cfg: GPTConfig,
    *,
    z=None,
    policy: Policy = DEFAULT_POLICY,
    attn_impl: str = "auto",
    remat: bool = False,
    act_sharding=None,
):
    """Run blocks + ln_f + lm_head over already-embedded inputs. Used by the
    prefix-conditioning caption wrapper (gpt2_linear/model.py:167-173)."""
    x = run_blocks(
        params, embeds, cfg, z=z, policy=policy, attn_impl=attn_impl,
        remat=remat, act_sharding=act_sharding,
    )
    return lm_head(params, x, cfg, policy=policy)


def apply(
    params,
    idx,
    cfg: GPTConfig,
    *,
    targets=None,
    target_mask=None,
    z=None,
    policy: Policy = DEFAULT_POLICY,
    attn_impl: str = "auto",
    remat: bool = False,
    act_sharding=None,
):
    """Full forward. Returns (logits, loss); loss is None without targets.

    Matches GPT.forward (train_gpt2.py:111-125) and the masked-mean CE of the
    cross-attention variant (gpt2_cross-att/model.py:169-186).
    """
    assert idx.shape[-1] <= cfg.block_size
    x = embed_tokens(params, idx, cfg).astype(policy.compute_dtype)
    if z is not None and cfg.cross_attention:
        z = linear(z, params["vis_proj"]["w"], params["vis_proj"]["b"], policy=policy)
        z = z.astype(x.dtype)
    logits = forward_embeds(
        params, x, cfg, z=z, policy=policy, attn_impl=attn_impl, remat=remat,
        act_sharding=act_sharding,
    )
    loss = None
    if targets is not None:
        loss = cross_entropy(logits, targets, mask=target_mask)
    return logits, loss


def loss(
    params,
    idx,
    cfg: GPTConfig,
    *,
    targets,
    target_mask=None,
    z=None,
    policy: Policy = DEFAULT_POLICY,
    attn_impl: str = "auto",
    remat: bool = False,
    ce_chunks: int = 8,
    act_sharding=None,
):
    """CE training loss WITHOUT materializing the (B, T, V) logits.

    Same semantics as apply(...)[1] — F.cross_entropy (train_gpt2.py:124)
    with ignore_index=-100 and optional masked mean
    (gpt2_cross-att/model.py:176-185) — but the lm_head + CE run through the
    chunked fused op (ops/fused_ce.py), saving ~6.6 GB of logits+dlogits HBM
    traffic per micro-step at the production shape. Per-row numerics are
    identical to the unfused path.
    """
    assert idx.shape[-1] <= cfg.block_size
    x = embed_tokens(params, idx, cfg).astype(policy.compute_dtype)
    if z is not None and cfg.cross_attention:
        z = linear(z, params["vis_proj"]["w"], params["vis_proj"]["b"], policy=policy)
        z = z.astype(x.dtype)
    x = run_blocks(
        params, x, cfg, z=z, policy=policy, attn_impl=attn_impl, remat=remat,
        act_sharding=act_sharding,
    )
    x = layer_norm(x, params["lnf"]["scale"], params["lnf"]["bias"])
    return fused_ce_loss(
        x, params["wte"], targets, mask=target_mask, policy=policy,
        ce_chunks=ce_chunks,
    )


def loss_grad_layerwise(
    params,
    idx,
    cfg: GPTConfig,
    *,
    targets,
    gsum,
    acc,
    target_mask=None,
    policy: Policy = DEFAULT_POLICY,
    attn_impl: str = "auto",
    ce_chunks: int = 8,
):
    """Loss + gradients accumulated layer-by-layer into `gsum` — the full
    stacked-grads tree is never materialized.

    `jax.grad` of the scanned/unrolled decoder must return d(params) for
    all L layers at once: at GPT-2 1558M that stacked tree is a 2.9 GiB
    bf16 temp inside every grad-accumulation program — the dominant term
    of the 4.05 GiB accum arena that kept the 0.5M-token single-chip step
    from fitting 16 GB HBM next to 8.75 GiB of resident state (ROUND_NOTES
    round-3 attempt ledger). Here the backward is written out as what the
    chain rule actually is: a reverse `lax.scan` over layers whose carry
    is (d_residual, gsum["blocks"]). Each iteration recomputes one block's
    forward from its saved input residual (full remat by construction),
    runs its VJP, and folds that single layer's gradients straight into
    the donated accumulator slices via in-place dynamic-update-slice —
    peak gradient temp = ONE layer (~60 MB at 1558M), not L.

    Semantically identical to `value_and_grad(loss)` + accumulate: same
    per-layer VJPs in the same order, and the slice adds commute with the
    stacked-tree add (pinned by tests/test_layerwise_grad.py). `acc` is
    the accumulator adapter built by train/step.py (fp32 adds, or
    stochastic-rounded bf16 keyed per (step, micro, leaf, layer)).

    Plain decoder only (the reference's pretrain workload,
    train_gpt2.py:456-476); the cross-attention variants freeze the
    decoder and never carry billion-parameter grad trees.
    """
    assert not cfg.cross_attention, "layerwise grad: plain decoder only"
    assert idx.shape[-1] <= cfg.block_size

    def embed_fn(wte, wpe):
        t = idx.shape[-1]
        pos = jnp.arange(t)
        return (embed(wte, idx) + embed(wpe, pos)).astype(policy.compute_dtype)

    x0, embed_vjp = jax.vjp(embed_fn, params["wte"], params["wpe"])

    def blk(lp, x):
        return block(lp, x, None, cfg, policy=policy, attn_impl=attn_impl)

    def fwd_body(x, lp):
        return blk(lp, x), x

    # forward scan emitting each block's INPUT residual — the same
    # (L, B, T, C) boundary stack full block remat saves (300 MB bf16 at
    # 1558M/B=2), written incrementally into one buffer by scan's ys
    xL, x_saved = jax.lax.scan(fwd_body, x0, params["blocks"])

    def tail_fn(x, wte, lnf):
        xn = layer_norm(x, lnf["scale"], lnf["bias"])
        return fused_ce_loss(
            xn, wte, targets, mask=target_mask, policy=policy,
            ce_chunks=ce_chunks,
        )

    loss, tail_vjp = jax.vjp(tail_fn, xL, params["wte"], params["lnf"])
    dxL, dwte_head, dlnf = tail_vjp(jnp.ones_like(loss))

    def bwd_body(carry, xs):
        dx, gb = carry
        lp, x_in, i = xs
        _, vjp_fn = jax.vjp(blk, lp, x_in)
        g_lp, dx_prev = vjp_fn(dx)
        return (dx_prev, acc.block_slice_add(gb, g_lp, i)), None

    (dx0, gblocks), _ = jax.lax.scan(
        bwd_body,
        (dxL, gsum["blocks"]),
        (params["blocks"], x_saved, jnp.arange(cfg.n_layer)),
        reverse=True,
    )
    dwte_embed, dwpe = embed_vjp(dx0)
    # tied wte: unembedding grad (fused CE VJP) + embedding scatter grad,
    # summed in fp32 before the single accumulate
    d_other = {
        "wte": dwte_head.astype(jnp.float32) + dwte_embed.astype(jnp.float32),
        "wpe": dwpe,
        "lnf": dlnf,
    }
    g_other = acc.tree_add(
        {k: gsum[k] for k in ("wte", "wpe", "lnf")}, d_other
    )
    new = dict(gsum)
    new["blocks"] = gblocks
    new.update(g_other)
    return loss, new


def fused_ce_loss(x, wte, targets, *, mask=None, policy=DEFAULT_POLICY, ce_chunks=8):
    """Masked-mean fused CE over final hiddens x (..., T, D) (shared by the
    decoder and the caption wrapper)."""
    from ..ops.fused_ce import fused_linear_ce

    d = x.shape[-1]
    flat_x = x.reshape(-1, d)
    flat_t = targets.reshape(-1)
    ignore = flat_t == -100
    safe_t = jnp.where(ignore, 0, flat_t)
    nll = fused_linear_ce(
        flat_x, wte, safe_t, n_chunks=ce_chunks, policy=policy
    )
    valid = jnp.logical_not(ignore)
    if mask is not None:
        valid = jnp.logical_and(valid, mask.reshape(-1))
    nll = nll * valid
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / denom


def cross_entropy(logits, targets, *, mask=None):
    """Token-level CE in fp32.

    mask=None: plain mean over all positions (F.cross_entropy,
    train_gpt2.py:124). With a mask: masked mean with sum clamped >= 1
    (gpt2_cross-att/model.py:176-185). Targets equal to -100 are ignored
    (ignore_index semantics, gpt2_linear/model.py:205-210).
    """
    logits = logits.astype(jnp.float32)
    ignore = targets == -100
    safe_targets = jnp.where(ignore, 0, targets)
    logz = jax.scipy.special.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(
        logits, safe_targets[..., None], axis=-1
    ).squeeze(-1)
    nll = logz - gold
    valid = jnp.logical_not(ignore)
    if mask is not None:
        valid = jnp.logical_and(valid, mask)
    nll = nll * valid
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / denom


# ---------------------------------------------------------------------------
# KV-cached decode path
# ---------------------------------------------------------------------------
# The reference has NO KV cache — generation re-forwards the whole growing
# sequence per token (train_gpt2.py:440-449; gpt2_linear/data.py:111-127).
# This cached path is our headline inference improvement (BASELINE north
# star). Caches are (L, B, H, maxT, hs) pytrees threaded through the same
# `lax.scan` over stacked layers as training.


def init_cache(cfg: GPTConfig, batch_size: int, max_len: int, dtype=jnp.bfloat16):
    shape = (cfg.n_layer, batch_size, cfg.n_head, max_len, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _cached_sdpa(q, k_cache, v_cache, slot, policy: Policy):
    """q rows i (at absolute positions slot+i) attend to cache[j] for
    j <= slot+i. Static maxT shapes; invalid slots masked."""
    out_dtype = q.dtype
    head_dim = q.shape[-1]
    scale = 1.0 / (head_dim**0.5)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk",
        policy.cast_compute(q),
        policy.cast_compute(k_cache),
        preferred_element_type=jnp.float32,
    )
    scores = scores * scale
    tq = q.shape[2]
    maxt = k_cache.shape[2]
    qpos = slot + jnp.arange(tq)[:, None]
    kpos = jnp.arange(maxt)[None, :]
    mask = kpos <= qpos  # causal within the written region; future slots are
    # all zeros but also all masked because kpos > slot+i there
    scores = jnp.where(mask[None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd",
        probs.astype(v_cache.dtype),
        v_cache,
        preferred_element_type=jnp.float32,
    )
    return out.astype(out_dtype)


def _self_attention_cached(p, x, k_cache, v_cache, slot, cfg: GPTConfig, policy):
    qkv = linear(x, p["wqkv"], p["bqkv"], policy=policy)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (_split_heads(t, cfg.n_head) for t in (q, k, v))
    k_cache = jax.lax.dynamic_update_slice(
        k_cache, k.astype(k_cache.dtype), (0, 0, slot, 0)
    )
    v_cache = jax.lax.dynamic_update_slice(
        v_cache, v.astype(v_cache.dtype), (0, 0, slot, 0)
    )
    y = _cached_sdpa(q, k_cache, v_cache, slot, policy)
    return linear(_merge_heads(y), p["wo"], p["bo"], policy=policy), k_cache, v_cache


def _self_attention_cached_inplace(p, x, ck, cv, layer, slot, cfg, policy):
    """Like _self_attention_cached but scatters the new K/V rows straight
    into the STACKED (L, B, H, maxT, hs) cache at a static layer index —
    writes (1, B, H, T, hs) per layer instead of round-tripping the whole
    layer cache through scan ys (see forward_cached)."""
    qkv = linear(x, p["wqkv"], p["bqkv"], policy=policy)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (_split_heads(t, cfg.n_head) for t in (q, k, v))
    ck = jax.lax.dynamic_update_slice(
        ck, k.astype(ck.dtype)[None], (layer, 0, 0, slot, 0)
    )
    cv = jax.lax.dynamic_update_slice(
        cv, v.astype(cv.dtype)[None], (layer, 0, 0, slot, 0)
    )
    y = _cached_sdpa(q, ck[layer], cv[layer], slot, policy)
    return linear(_merge_heads(y), p["wo"], p["bo"], policy=policy), ck, cv


def forward_cached(
    params,
    embeds,
    cfg: GPTConfig,
    cache,
    slot,
    *,
    z=None,
    policy: Policy = DEFAULT_POLICY,
    unroll: bool = False,
    last_only: bool = False,
):
    """Run blocks over already-embedded inputs, reading/writing the KV cache
    at [slot, slot+T). Returns (logits, new_cache) — logits over all T
    positions, or just the last one when last_only=True.

    Positional embeddings are the CALLER's responsibility (the caption
    prefix gets none — gpt2_linear/model.py:197-200 — while text restarts
    at position 0), which this split makes explicit.

    unroll=True replaces the layer scan with a static Python loop that
    threads the STACKED cache through in-place dynamic-update-slices of
    just the new (1, B, H, T, hs) rows. The scan version is forced by
    scan semantics to pass the cache through xs/ys — slicing every
    layer's cache out with a layout flip AND restacking both full cache
    halves into fresh (L, B, H, maxT, hs) buffers EVERY call: at the
    124M B=50 decode shape that is ~2.6 ms of a ~3.4 ms step (24 restack
    fusions x 0.86 ms + 2 x 0.44 ms flipped reads, profile_trace r4;
    the cache read for attention itself is only 0.14 ms at roofline).
    Unrolled + scatter-in-place, the carry buffers are updated where
    they live. Compile cost is per-layer but the decode body is tiny —
    serving (infer/decode.py Decoder) defaults to unrolled.
    """

    def xblock(x, lp):
        if cfg.cross_attention and z is not None:
            xa = cross_attention(
                lp["xattn"],
                layer_norm(x, lp["lnx"]["scale"], lp["lnx"]["bias"]),
                z,
                cfg,
                policy=policy,
            )
            x = x + jnp.tanh(lp["gate"]).astype(x.dtype) * xa
        return x

    def tail(x, lp, att):
        x = x + att
        return x + mlp(
            lp["mlp"], layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"]),
            policy=policy,
        )

    if unroll:
        x, ck, cv = embeds, cache["k"], cache["v"]
        for l in range(cfg.n_layer):
            lp = jax.tree.map(lambda a: a[l], params["blocks"])
            x = xblock(x, lp)
            att, ck, cv = _self_attention_cached_inplace(
                lp["attn"],
                layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"]),
                ck, cv, l, slot, cfg, policy,
            )
            x = tail(x, lp, att)
        ks, vs = ck, cv
    else:

        def body(x, xs):
            lp, kc, vc = xs
            x = xblock(x, lp)
            att, kc, vc = _self_attention_cached(
                lp["attn"],
                layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"]),
                kc,
                vc,
                slot,
                cfg,
                policy,
            )
            return tail(x, lp, att), (kc, vc)

        x, (ks, vs) = jax.lax.scan(
            body, embeds, (params["blocks"], cache["k"], cache["v"])
        )
    if last_only:
        # decode/prefill only ever consumes logits[:, -1]; slicing before
        # the lm_head drops (T-1)/T of the (T, C) x (C, V) matmul
        x = x[:, -1:, :]
    logits = lm_head(params, x, cfg, policy=policy)
    return logits, {"k": ks, "v": vs}


# ---------------------------------------------------------------------------
# Trainability masks (freezing)
# ---------------------------------------------------------------------------


def trainable_mask_all(params):
    return jax.tree.map(lambda _: True, params)


def trainable_mask_xattn(params):
    """Freeze everything except vis_proj, xattn (+lnx? no: reference keeps
    ln_x frozen... ln_x is created at construction and only xattn params,
    cross_gate, vis_proj are unfrozen — gpt2_cross-att/model.py:131-139; note
    ln_x is INSIDE the block but NOT unfrozen there, so it trains only via
    init values i.e. stays at identity)."""
    mask = jax.tree.map(lambda _: False, params)
    mask["vis_proj"] = jax.tree.map(lambda _: True, params["vis_proj"])
    mask["blocks"]["xattn"] = jax.tree.map(
        lambda _: True, params["blocks"]["xattn"]
    )
    mask["blocks"]["gate"] = True
    return mask


def decay_mask(params):
    """True where AdamW weight decay applies: torch-ndim >= 2
    (train_gpt2.py:130-135). In the stacked layout every blocks/ leaf carries
    a leading layer axis, so the torch-equivalent ndim is (ndim - 1) for
    block leaves and ndim for the rest. Rule by name: weights decay; biases,
    layernorm scale/bias, gates do not; embeddings (wte, wpe) decay."""

    def per_path(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
        last = names[-1]
        if last in ("wte", "wpe"):
            return True
        if last.startswith("w") and last not in ("gate",):
            return True
        return False

    return jax.tree_util.tree_map_with_path(per_path, params)
