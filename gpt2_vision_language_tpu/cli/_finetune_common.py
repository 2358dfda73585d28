"""Shared argparse plumbing for the three fine-tune CLIs."""

from __future__ import annotations

import argparse
import dataclasses
import os


def build_parser(doc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=doc)
    p.add_argument("--steps", type=int, default=None, help="override max_steps")
    p.add_argument("--init-ckpt", type=str, default=None,
                   help="pretrained GPT-2 checkpoint (.npz ours, .pt torch)")
    p.add_argument("--coco-root", type=str, default=None)
    p.add_argument("--clip-feats", type=str, default=None)
    p.add_argument("--log-dir", type=str, default=None)
    p.add_argument("--micro-batch", type=int, default=None)
    p.add_argument("--devices", type=int, default=None)
    p.add_argument(
        "--synthetic", action="store_true",
        help="generate a synthetic COCO+CLIP dataset in a temp dir",
    )
    return p


def apply_common(cfg, args):
    updates = {}
    if args.init_ckpt:
        updates["init_ckpt"] = args.init_ckpt
    if args.coco_root:
        updates["coco_root"] = args.coco_root
    if args.clip_feats:
        updates["clip_feats_dir"] = args.clip_feats
    if args.log_dir:
        updates["log_dir"] = args.log_dir
    if args.micro_batch:
        updates["micro_batch_size"] = args.micro_batch
    if args.synthetic:
        import tempfile

        from ..data.coco import write_synthetic_coco

        root = tempfile.mkdtemp(prefix="coco_synthetic_")
        write_synthetic_coco(root, split="train", n_images=256,
                             n_tokens=197, enc_dim=768)
        write_synthetic_coco(root, split="val", n_images=64,
                             n_tokens=197, enc_dim=768)
        updates["coco_root"] = root
        updates["clip_feats_dir"] = os.path.join(root, "clip_feats")
    return dataclasses.replace(cfg, **updates)


def run(cfg, args):
    from ..train.finetune import run_finetune

    run_finetune(cfg, max_steps_override=args.steps, num_devices=args.devices)
