"""Export our GPT-2 pytrees back to reference-format PyTorch checkpoints.

Inverse of torch_import: un-stacks the layer axis, transposes weights back
to torch nn.Linear's (out, in), re-materializes the tied lm_head.weight,
and (for the xattn variant) emits the `transformer.h.N.xattn.*` /
`cross_gate` / `vis_proj.z_proj.*` names (gpt2_cross-att/model.py:116-139).
A user of the reference can resume/evaluate our checkpoints with their
existing scripts.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..core.config import GPTConfig


def gpt2_to_torch_state_dict(params, cfg: GPTConfig) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    np32 = lambda a: np.asarray(a, np.float32)
    wte = np32(params["wte"])[: cfg.padded_vocab_size]
    sd["transformer.wte.weight"] = wte
    sd["lm_head.weight"] = wte  # tied (train_gpt2.py:97)
    sd["transformer.wpe.weight"] = np32(params["wpe"])
    b = params["blocks"]
    for i in range(cfg.n_layer):
        pre = f"transformer.h.{i}."
        sd[pre + "ln_1.weight"] = np32(b["ln1"]["scale"][i])
        sd[pre + "ln_1.bias"] = np32(b["ln1"]["bias"][i])
        sd[pre + "attn.c_attn.weight"] = np32(b["attn"]["wqkv"][i]).T
        sd[pre + "attn.c_attn.bias"] = np32(b["attn"]["bqkv"][i])
        sd[pre + "attn.c_proj.weight"] = np32(b["attn"]["wo"][i]).T
        sd[pre + "attn.c_proj.bias"] = np32(b["attn"]["bo"][i])
        sd[pre + "ln_2.weight"] = np32(b["ln2"]["scale"][i])
        sd[pre + "ln_2.bias"] = np32(b["ln2"]["bias"][i])
        sd[pre + "mlp.c_fc.weight"] = np32(b["mlp"]["wfc"][i]).T
        sd[pre + "mlp.c_fc.bias"] = np32(b["mlp"]["bfc"][i])
        sd[pre + "mlp.c_proj.weight"] = np32(b["mlp"]["wproj"][i]).T
        sd[pre + "mlp.c_proj.bias"] = np32(b["mlp"]["bproj"][i])
        if cfg.cross_attention:
            sd[pre + "ln_x.weight"] = np32(b["lnx"]["scale"][i])
            sd[pre + "ln_x.bias"] = np32(b["lnx"]["bias"][i])
            sd[pre + "xattn.q_proj.weight"] = np32(b["xattn"]["wq"][i]).T
            sd[pre + "xattn.q_proj.bias"] = np32(b["xattn"]["bq"][i])
            sd[pre + "xattn.kv_proj.weight"] = np32(b["xattn"]["wkv"][i]).T
            sd[pre + "xattn.kv_proj.bias"] = np32(b["xattn"]["bkv"][i])
            sd[pre + "xattn.c_proj.weight"] = np32(b["xattn"]["wo"][i]).T
            sd[pre + "xattn.c_proj.bias"] = np32(b["xattn"]["bo"][i])
            sd[pre + "cross_gate"] = np32(b["gate"][i])
    sd["transformer.ln_f.weight"] = np32(params["lnf"]["scale"])
    sd["transformer.ln_f.bias"] = np32(params["lnf"]["bias"])
    if cfg.cross_attention:
        sd["transformer.vis_proj.z_proj.weight"] = np32(params["vis_proj"]["w"]).T
        sd["transformer.vis_proj.z_proj.bias"] = np32(params["vis_proj"]["b"])
    return sd


def save_torch_checkpoint(path: str, params, cfg: GPTConfig, meta=None) -> None:
    """Write a reference-format .pt: {"model": state_dict, ...meta}."""
    import torch

    sd = {
        k: torch.tensor(v) for k, v in gpt2_to_torch_state_dict(params, cfg).items()
    }
    ckpt = dict(meta or {})
    ckpt["model"] = sd
    tmp = path + ".tmp"
    torch.save(ckpt, tmp)
    import os

    os.replace(tmp, path)
