"""CLI: caption images end to end — JPEG -> CLIP -> bridge -> GPT-2 decode.

    python -m gpt2_vision_language_tpu.cli.caption IMG [IMG...] \
        --gpt-ckpt log/ckpts/model_best.npz --bridge-ckpt ft/ckpts/model_best.npz \
        [--clip-hf-ckpt /path/to/clip] [--bridge linear|qformer] [--variant vit-l-14]

The one-command inference path the reference never had (it only evaluates
from precomputed shards). Preprocessing (CLIP-canonical resize-shorter-side
+ center crop) happens HOST-side with PIL so arbitrary image sizes can be
batched; normalization + CLIP ViT + 33-token pooling + bridge + KV-cached
nucleus decode run on device. (clip_vit.preprocess is the fully on-device
variant for fixed-size uint8 batches.)
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("images", nargs="+", help="image files")
    p.add_argument("--gpt-ckpt", default=None, help=".npz (ours) or .pt (reference)")
    p.add_argument("--bridge-ckpt", default=None,
                   help="finetune checkpoint (.npz with params/bridge)")
    p.add_argument("--clip-hf-ckpt", default=None)
    p.add_argument("--bridge", default="linear", choices=["linear", "qformer"])
    p.add_argument("--variant", default="vit-l-14",
                   choices=["vit-l-14", "vit-b-16", "tiny"])
    p.add_argument("--prompt", default="A photo of")
    p.add_argument("--new-tokens", type=int, default=24)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ..core import config as C
    from ..core.config import BridgeConfig, GPTConfig
    from ..data.tokenizer import get_tokenizer
    from ..models import caption, clip_vit, gpt2
    from ..ops.pooling import pool_clip_tokens_to_33

    clip_cfg = getattr(
        C, {"vit-l-14": "CLIP_VIT_L14", "vit-b-16": "CLIP_VIT_B16", "tiny": "CLIP_TINY"}[args.variant]
    )
    cfg = GPTConfig()
    bridge_cfg = BridgeConfig(kind=args.bridge, enc_dim=clip_cfg.width)

    # --- weights ---
    if args.clip_hf_ckpt:
        from transformers import CLIPVisionModel

        clip_params = clip_vit.from_hf_state_dict(
            CLIPVisionModel.from_pretrained(args.clip_hf_ckpt).state_dict(), clip_cfg
        )
    else:
        print("[caption] WARNING: random CLIP weights (no --clip-hf-ckpt)")
        clip_params = clip_vit.init(jax.random.PRNGKey(0), clip_cfg)

    if args.gpt_ckpt:
        if args.gpt_ckpt.endswith(".pt"):
            from ..ckpt.torch_import import (
                gpt2_from_torch_state_dict,
                load_torch_checkpoint,
            )

            sd, _ = load_torch_checkpoint(args.gpt_ckpt)
            gpt_params = gpt2_from_torch_state_dict(sd, cfg)
        else:
            from ..ckpt.checkpoint import load_checkpoint

            tree, _ = load_checkpoint(args.gpt_ckpt)
            params = tree["params"]
            gpt_params = params.get("gpt", params)
            gpt_params = jax.tree.map(jnp.asarray, gpt_params)
    else:
        print("[caption] WARNING: random GPT-2 weights (no --gpt-ckpt)")
        gpt_params = gpt2.init(jax.random.PRNGKey(1), cfg)

    if args.bridge_ckpt:
        from ..ckpt.checkpoint import load_checkpoint

        tree, _ = load_checkpoint(args.bridge_ckpt)
        bridge_params = jax.tree.map(jnp.asarray, tree["params"]["bridge"])
    else:
        print("[caption] WARNING: random bridge weights (no --bridge-ckpt)")
        bridge_params = caption.init(jax.random.PRNGKey(2), cfg, bridge_cfg)

    # --- load + preprocess images (aspect-preserving, CLIP-canonical) ---
    size = clip_cfg.image_size
    batch = np.zeros((len(args.images), size, size, 3), np.uint8)
    for i, path in enumerate(args.images):
        img = Image.open(path).convert("RGB")
        w, h = img.size
        if w < h:
            nw, nh = size, max(size, round(h * size / w))
        else:
            nw, nh = max(size, round(w * size / h)), size
        img = img.resize((nw, nh), Image.BICUBIC)
        left, top = (nw - size) // 2, (nh - size) // 2
        batch[i] = np.asarray(img.crop((left, top, left + size, top + size)))

    # --- encode -> pool -> caption ---
    feats = clip_vit.features(
        clip_params, clip_vit.normalize_only(jnp.asarray(batch)), clip_cfg
    )
    z = pool_clip_tokens_to_33(feats)
    tok = get_tokenizer()
    prompt_ids = tok.encode(args.prompt)
    ids = jnp.asarray([prompt_ids] * len(args.images), jnp.int32)
    toks = caption.generate_captions(
        gpt_params,
        bridge_params,
        z,
        ids,
        cfg,
        bridge_cfg,
        jax.random.PRNGKey(args.seed),
        max_new_tokens=args.new_tokens,
    )
    toks = np.asarray(toks)
    for i, path in enumerate(args.images):
        text = tok.decode(toks[i].tolist())
        print(f"{os.path.basename(path)}: {args.prompt}{text}")


if __name__ == "__main__":
    main()
