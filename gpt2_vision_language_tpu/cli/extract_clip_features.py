"""CLI: precompute CLIP patch-token shards for COCO (the tool absent from
the reference repo — its bridges consume shards whose extraction script was
never checked in; SURVEY.md §6 defect c).

    python -m gpt2_vision_language_tpu.cli.extract_clip_features \
        --coco-root coco2017 --split train --out clip_feats_full/train \
        --hf-ckpt /path/to/clip-vit-large-patch14  [--variant vit-l-14]

Pipeline per batch, everything after JPEG decode on device: uint8 images ->
fused preprocess (resize/center-crop/normalize) -> ViT features
(B, 1+N, width) -> float16 .npy shard rows + index.json compatible with
CocoClipTokensDataset.
"""

from __future__ import annotations

import argparse
import json
import os


VARIANTS = {"vit-l-14": "CLIP_VIT_L14", "vit-b-16": "CLIP_VIT_B16", "tiny": "CLIP_TINY"}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--coco-root", required=True)
    p.add_argument("--split", default="train", choices=["train", "val"])
    p.add_argument("--out", required=True)
    p.add_argument("--variant", default="vit-l-14", choices=list(VARIANTS))
    p.add_argument("--hf-ckpt", default=None,
                   help="local HF CLIPVisionModel dir (offline); random init if absent")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--rows-per-shard", type=int, default=512)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ..core import config as C
    from ..data.coco import CocoCaptionsIndex
    from ..models import clip_vit

    cfg = getattr(C, VARIANTS[args.variant])
    ann = os.path.join(
        args.coco_root, "annotations", f"captions_{args.split}2017.json"
    )
    with open(ann) as f:
        images = sorted(json.load(f)["images"], key=lambda im: im["id"])
    if args.limit:
        images = images[: args.limit]
    img_dir = os.path.join(args.coco_root, f"{args.split}2017")

    if args.hf_ckpt:
        from transformers import CLIPVisionModel

        model = CLIPVisionModel.from_pretrained(args.hf_ckpt)
        params = clip_vit.from_hf_state_dict(model.state_dict(), cfg)
        del model
    else:
        print("[extract] WARNING: no --hf-ckpt, using random CLIP init")
        params = clip_vit.init(jax.random.PRNGKey(0), cfg)

    # host side does the aspect-preserving resize + center crop exactly
    # like CLIP's canonical preprocessing (device preprocess would need
    # per-image shapes); device does normalize + the ViT
    feat_fn = jax.jit(
        lambda p, im: clip_vit.features(
            p, clip_vit.normalize_only(im), cfg
        )
    )

    os.makedirs(args.out, exist_ok=True)

    def load_batch(metas):
        size = cfg.image_size
        out = np.zeros((len(metas), size, size, 3), np.uint8)
        for i, meta in enumerate(metas):
            name = meta.get("file_name", f"{meta['id']:012d}.jpg")
            img = Image.open(os.path.join(img_dir, name)).convert("RGB")
            w, h = img.size
            # resize shorter side to `size` (bicubic, CLIP-canonical),
            # then center crop — aspect ratio preserved
            if w < h:
                nw, nh = size, max(size, round(h * size / w))
            else:
                nw, nh = max(size, round(w * size / h)), size
            img = img.resize((nw, nh), Image.BICUBIC)
            left = (nw - size) // 2
            top = (nh - size) // 2
            out[i] = np.asarray(img.crop((left, top, left + size, top + size)))
        return out

    index = []
    buffer = []  # feature rows awaiting a full shard
    buffered = 0
    shard_id = 0
    total = 0

    def write_shard(rows):
        nonlocal shard_id
        name = f"clip_tokens_{shard_id:05d}.npy"
        np.save(os.path.join(args.out, name), rows.astype(np.float16))
        shard_id += 1
        return name

    for s in range(0, len(images), args.batch):
        metas = images[s : s + args.batch]
        feats = np.asarray(
            feat_fn(params, jnp.asarray(load_batch(metas))), np.float16
        )
        for i in range(len(metas)):
            index.append(
                {
                    "shard": f"clip_tokens_{total // args.rows_per_shard:05d}.npy",
                    "row": total % args.rows_per_shard,
                }
            )
            total += 1
        buffer.append(feats)
        buffered += len(feats)
        while buffered >= args.rows_per_shard:
            rows = np.concatenate(buffer)
            write_shard(rows[: args.rows_per_shard])
            buffer = [rows[args.rows_per_shard :]]
            buffered = len(buffer[0])
        print(f"[extract] {min(s + args.batch, len(images))}/{len(images)}")

    if buffered:
        write_shard(np.concatenate(buffer))
    with open(os.path.join(args.out, "index.json"), "w") as f:
        json.dump(index, f)
    print(f"[extract] wrote {shard_id} shards + index.json to {args.out}")


if __name__ == "__main__":
    main()
