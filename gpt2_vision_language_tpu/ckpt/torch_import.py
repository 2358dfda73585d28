"""Import PyTorch reference checkpoints into our parameter pytrees.

The reference saves `{"model": state_dict, "optimizer": ..., "step": ...}`
(train_gpt2.py:363-391). Names follow `transformer.h.N.attn.c_attn.weight`
etc. torch nn.Linear stores weights (out_features, in_features); our layout
is (in, out), so every weight is transposed. Tied wte/lm_head is
materialized once (`wte` only). Per-layer tensors are stacked along a new
leading layer axis to match the `lax.scan` layout in models/gpt2.py.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np
import jax.numpy as jnp

from ..core.config import GPTConfig


def _np(x):
    """Accept torch tensors or numpy arrays without importing torch here.

    Always copies: torch `.numpy()` shares memory with the live parameter
    and JAX-on-CPU can alias numpy buffers zero-copy, so without a copy a
    later torch `optimizer.step()` would silently mutate imported params.
    """
    if hasattr(x, "detach"):
        x = x.detach().to("cpu").float().numpy()
    return np.array(x, dtype=np.float32, copy=True)


def _stack(sd: Mapping, template: str, n_layer: int, transpose: bool):
    arrs = []
    for i in range(n_layer):
        a = _np(sd[template.format(i)])
        if transpose:
            a = a.T
        arrs.append(a)
    return jnp.asarray(np.stack(arrs))


def gpt2_from_torch_state_dict(sd: Mapping, cfg: GPTConfig) -> Dict:
    """Build our GPT-2 pytree from a reference state_dict.

    Handles the plain decoder (train_gpt2.py:85-97 / GPT_previous at
    gpt2_linear/model.py:67-79) and, when cfg.cross_attention, the gated
    cross-attention variant (gpt2_cross-att/model.py:116-129).
    """
    # Drop the unused causal-mask buffer registered as `...attn.bias`
    # (train_gpt2.py:31) — not the c_attn/c_proj bias vectors.
    sd = {k: v for k, v in sd.items() if k.split(".")[-2:] != ["attn", "bias"]}
    L = cfg.n_layer
    wte = _np(sd["transformer.wte.weight"])
    vp = cfg.padded_vocab_size
    if wte.shape[0] < vp:  # pad vocab rows with zeros if ckpt was unpadded
        wte = np.concatenate(
            [wte, np.zeros((vp - wte.shape[0], wte.shape[1]), np.float32)]
        )
    params = {
        "wte": jnp.asarray(wte),
        "wpe": jnp.asarray(_np(sd["transformer.wpe.weight"])),
        "blocks": {
            "ln1": {
                "scale": _stack(sd, "transformer.h.{}.ln_1.weight", L, False),
                "bias": _stack(sd, "transformer.h.{}.ln_1.bias", L, False),
            },
            "attn": {
                "wqkv": _stack(sd, "transformer.h.{}.attn.c_attn.weight", L, True),
                "bqkv": _stack(sd, "transformer.h.{}.attn.c_attn.bias", L, False),
                "wo": _stack(sd, "transformer.h.{}.attn.c_proj.weight", L, True),
                "bo": _stack(sd, "transformer.h.{}.attn.c_proj.bias", L, False),
            },
            "ln2": {
                "scale": _stack(sd, "transformer.h.{}.ln_2.weight", L, False),
                "bias": _stack(sd, "transformer.h.{}.ln_2.bias", L, False),
            },
            "mlp": {
                "wfc": _stack(sd, "transformer.h.{}.mlp.c_fc.weight", L, True),
                "bfc": _stack(sd, "transformer.h.{}.mlp.c_fc.bias", L, False),
                "wproj": _stack(sd, "transformer.h.{}.mlp.c_proj.weight", L, True),
                "bproj": _stack(sd, "transformer.h.{}.mlp.c_proj.bias", L, False),
            },
        },
        "lnf": {
            "scale": jnp.asarray(_np(sd["transformer.ln_f.weight"])),
            "bias": jnp.asarray(_np(sd["transformer.ln_f.bias"])),
        },
    }
    if cfg.cross_attention:
        params["blocks"]["lnx"] = {
            "scale": _stack(sd, "transformer.h.{}.ln_x.weight", L, False),
            "bias": _stack(sd, "transformer.h.{}.ln_x.bias", L, False),
        }
        params["blocks"]["xattn"] = {
            "wq": _stack(sd, "transformer.h.{}.xattn.q_proj.weight", L, True),
            "bq": _stack(sd, "transformer.h.{}.xattn.q_proj.bias", L, False),
            "wkv": _stack(sd, "transformer.h.{}.xattn.kv_proj.weight", L, True),
            "bkv": _stack(sd, "transformer.h.{}.xattn.kv_proj.bias", L, False),
            "wo": _stack(sd, "transformer.h.{}.xattn.c_proj.weight", L, True),
            "bo": _stack(sd, "transformer.h.{}.xattn.c_proj.bias", L, False),
        }
        params["blocks"]["gate"] = jnp.asarray(
            np.stack([_np(sd[f"transformer.h.{i}.cross_gate"]) for i in range(L)])
        ).reshape(L)
        params["vis_proj"] = {
            "w": jnp.asarray(_np(sd["transformer.vis_proj.z_proj.weight"]).T),
            "b": jnp.asarray(_np(sd["transformer.vis_proj.z_proj.bias"])),
        }
    return params


def gpt2_from_hf_state_dict(sd: Mapping, cfg: GPTConfig) -> Dict:
    """Import HuggingFace GPT2LMHeadModel weights (e.g. the original OpenAI
    gpt2 checkpoints) into our pytree.

    HF GPT-2 uses Conv1D modules whose weights are stored (in, out) — OUR
    layout — so unlike the reference's nn.Linear (out, in) no transpose is
    needed; LayerNorm/embedding names differ from the reference's
    (`h.N.ln_1.weight` vs `transformer.h.N...`). Accepts keys with or
    without the `transformer.` prefix.
    """
    sd = {k.removeprefix("transformer."): v for k, v in sd.items()}
    sd = {k: v for k, v in sd.items() if not k.endswith(".attn.bias")}
    L = cfg.n_layer
    wte = _np(sd["wte.weight"])
    vp = cfg.padded_vocab_size
    if wte.shape[0] < vp:
        wte = np.concatenate(
            [wte, np.zeros((vp - wte.shape[0], wte.shape[1]), np.float32)]
        )

    def stack(tmpl):
        return jnp.asarray(np.stack([_np(sd[tmpl.format(i)]) for i in range(L)]))

    return {
        "wte": jnp.asarray(wte),
        "wpe": jnp.asarray(_np(sd["wpe.weight"])),
        "blocks": {
            "ln1": {
                "scale": stack("h.{}.ln_1.weight"),
                "bias": stack("h.{}.ln_1.bias"),
            },
            "attn": {
                "wqkv": stack("h.{}.attn.c_attn.weight"),  # Conv1D: (in, out)
                "bqkv": stack("h.{}.attn.c_attn.bias"),
                "wo": stack("h.{}.attn.c_proj.weight"),
                "bo": stack("h.{}.attn.c_proj.bias"),
            },
            "ln2": {
                "scale": stack("h.{}.ln_2.weight"),
                "bias": stack("h.{}.ln_2.bias"),
            },
            "mlp": {
                "wfc": stack("h.{}.mlp.c_fc.weight"),
                "bfc": stack("h.{}.mlp.c_fc.bias"),
                "wproj": stack("h.{}.mlp.c_proj.weight"),
                "bproj": stack("h.{}.mlp.c_proj.bias"),
            },
        },
        "lnf": {
            "scale": jnp.asarray(_np(sd["ln_f.weight"])),
            "bias": jnp.asarray(_np(sd["ln_f.bias"])),
        },
    }


def load_torch_checkpoint(path: str):
    """Load a reference .pt checkpoint file -> (state_dict, meta)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    meta = {k: v for k, v in ckpt.items() if k != "model"} if isinstance(ckpt, dict) else {}
    return sd, meta


# ---------------------------------------------------------------------------
# Bridge importers
# ---------------------------------------------------------------------------


def linear_bridge_from_torch(sd: Mapping, prefix: str = "bridge.") -> Dict:
    """Linear_Bridge (gpt2_linear/model.py:114-129): one vis_proj Linear."""
    return {
        "vis_proj": {
            "w": jnp.asarray(_np(sd[prefix + "vis_proj.weight"]).T),
            "b": jnp.asarray(_np(sd[prefix + "vis_proj.bias"])),
        }
    }


def qformer_bridge_from_torch(sd: Mapping, n_layers: int, prefix: str = "bridge.") -> Dict:
    """BLIP2Bridge (gpt2_q_former/model.py:147-168).

    torch nn.MultiheadAttention packs QKV as `in_proj_weight` (3D, D) rows
    [q; k; v]; we split it into separate (D, D) in->out matrices.
    """

    def mha(p):
        in_w = _np(sd[p + "in_proj_weight"])  # (3D, D)
        in_b = _np(sd[p + "in_proj_bias"])  # (3D,)
        d = in_w.shape[1]
        wq, wk, wv = in_w[:d].T, in_w[d : 2 * d].T, in_w[2 * d :].T
        bq, bk, bv = in_b[:d], in_b[d : 2 * d], in_b[2 * d :]
        return {
            "wq": wq, "bq": bq, "wk": wk, "bk": bk, "wv": wv, "bv": bv,
            "wo": _np(sd[p + "out_proj.weight"]).T,
            "bo": _np(sd[p + "out_proj.bias"]),
        }

    def ln(p):
        return {"scale": _np(sd[p + "weight"]), "bias": _np(sd[p + "bias"])}

    layers = []
    for i in range(n_layers):
        p = f"{prefix}layers.{i}."
        layers.append(
            {
                "ln1": ln(p + "ln1."),
                "self_attn": mha(p + "self_attn."),
                "ln2_q": ln(p + "ln2_q."),
                "ln2_v": ln(p + "ln2_v."),
                "cross_attn": mha(p + "cross_attn."),
                "ln3": ln(p + "ln3."),
                "mlp": {
                    "wfc": _np(sd[p + "mlp.0.weight"]).T,
                    "bfc": _np(sd[p + "mlp.0.bias"]),
                    "wproj": _np(sd[p + "mlp.2.weight"]).T,
                    "bproj": _np(sd[p + "mlp.2.bias"]),
                },
            }
        )
    stacked = _stack_pytrees(layers)
    return {
        "vis_proj": {
            "w": jnp.asarray(_np(sd[prefix + "vis_proj.weight"]).T),
            "b": jnp.asarray(_np(sd[prefix + "vis_proj.bias"])),
        },
        "query_tokens": jnp.asarray(_np(sd[prefix + "query_tokens"])),
        "layers": stacked,
    }


def _stack_pytrees(trees):
    import jax

    return jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *trees)
