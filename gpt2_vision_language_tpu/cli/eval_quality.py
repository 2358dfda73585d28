"""CLI: one-command quality reproduction — checkpoint in, metrics out.

    # HellaSwag accuracy of a reference pretrain checkpoint
    python -m gpt2_vision_language_tpu.cli.eval_quality \
        --gpt-ckpt model_best.pt --hellaswag --hellaswag-dir hellaswag

    # HellaSwag of an original-OpenAI HF GPT2LMHeadModel checkpoint
    python -m gpt2_vision_language_tpu.cli.eval_quality \
        --hf-ckpt /path/to/gpt2 --hellaswag

    # CIDEr / METEOR of a captioning bridge over COCO val features
    python -m gpt2_vision_language_tpu.cli.eval_quality \
        --gpt-ckpt model_best.pt --bridge linear --bridge-ckpt bridge.pt \
        --coco-tokens val_tokens/ --coco-ann captions_val2017.json --meteor

Prints ONE JSON line with every computed metric. This is the repo-side
half of reproducing the reference's published numbers — HellaSwag ≈30%
(/root/reference/README.md:26,40,59; eval loop train_gpt2.py:393-426) and
CIDEr 0.32–0.60 / METEOR 0.33–0.41 (README.md:194-196; evaluate_cider
gpt2_linear/data.py:68-135): the moment an environment has the assets
(real BPE data, a trained checkpoint, COCO + CLIP features), the numbers
are one command away. Checkpoint formats accepted:

  * ours (.npz, ckpt/checkpoint.py) — pretrain ({params: gpt tree}) and
    finetune ({params: {gpt, bridge}} or the xattn full tree) layouts;
  * the reference's torch .pt — pretrain (transformer.* keys,
    train_gpt2.py:363-391), GPT_Caption finetunes (gpt.* + bridge.* keys,
    gpt2_linear/train.py:170-216), and the cross-attention GPT
    (transformer.h.N.xattn.*, gpt2_cross-att/model.py:116-129);
  * HuggingFace GPT2LMHeadModel (dir with pytorch_model.bin /
    model.safetensors, or either file directly) — the original OpenAI
    GPT-2 weights path.

The GPT architecture is derived from the state dict itself (n_layer from
the h.N keys, n_embd/vocab from wte, block_size from wpe, n_head from the
standard GPT-2 family map) so no --model flag is needed for imports.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# n_embd -> n_head for the published GPT-2 family (train_gpt2.py:76-83
# parameterizes but only ships 124M; the rest follow the GPT-2 paper)
_FAMILY_HEADS = {768: 12, 1024: 16, 1280: 20, 1600: 25}


def _derive_cfg(sd, *, cross_attention: bool, n_head: int | None):
    """GPTConfig from a torch/HF state dict's own shapes."""
    from ..core.config import GPTConfig

    keys = {k.removeprefix("transformer.") for k in sd}
    layers = {
        int(k.split(".")[1])
        for k in keys
        if k.startswith("h.") and k.split(".")[1].isdigit()
    }
    wte = sd.get("transformer.wte.weight", sd.get("wte.weight"))
    wpe = sd.get("transformer.wpe.weight", sd.get("wpe.weight"))
    n_embd = int(wte.shape[1])
    vocab = int(wte.shape[0])
    if vocab == 50304:
        # padded-vocab checkpoint (train_gpt2.py:260 pads 50257 -> 50304);
        # keep the logical vocab at 50257 so padded_vocab_size matches
        vocab = 50257
    return GPTConfig(
        block_size=int(wpe.shape[0]),
        vocab_size=vocab,
        n_layer=max(layers) + 1,
        n_head=n_head or _FAMILY_HEADS.get(n_embd, max(1, n_embd // 64)),
        n_embd=n_embd,
        cross_attention=cross_attention,
    )


def _load_hf_state_dict(path: str):
    """HF checkpoint dir or weights file -> state dict of numpy/torch."""
    if os.path.isdir(path):
        for name in ("pytorch_model.bin", "model.safetensors"):
            p = os.path.join(path, name)
            if os.path.exists(p):
                path = p
                break
        else:
            raise FileNotFoundError(
                f"no pytorch_model.bin / model.safetensors in {path}"
            )
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def load_gpt(args):
    """-> (gpt_params, cfg, bridge_params_from_same_ckpt_or_None, source)."""
    import jax
    import jax.numpy as jnp

    from ..core.config import GPTConfig
    from ..ckpt.torch_import import (
        gpt2_from_hf_state_dict,
        gpt2_from_torch_state_dict,
        linear_bridge_from_torch,
        load_torch_checkpoint,
        qformer_bridge_from_torch,
    )

    xattn = args.bridge == "xattn"
    if args.hf_ckpt:
        sd = _load_hf_state_dict(args.hf_ckpt)
        cfg = _derive_cfg(sd, cross_attention=False, n_head=args.n_head)
        return gpt2_from_hf_state_dict(sd, cfg), cfg, None, "hf"
    if not args.gpt_ckpt:
        raise SystemExit("one of --gpt-ckpt / --hf-ckpt is required")
    if args.gpt_ckpt.endswith(".pt"):
        sd, _ = load_torch_checkpoint(args.gpt_ckpt)
        bridge = None
        if any(k.startswith("gpt.") for k in sd):
            # GPT_Caption finetune ckpt: gpt.* (frozen LM) + bridge.*
            gsd = {
                k.removeprefix("gpt."): v
                for k, v in sd.items()
                if k.startswith("gpt.")
            }
            if args.bridge == "qformer":
                nl = 1 + max(
                    int(k.split(".")[2])
                    for k in sd
                    if k.startswith("bridge.layers.")
                )
                bridge = qformer_bridge_from_torch(sd, nl)
            elif any(k.startswith("bridge.") for k in sd):
                bridge = linear_bridge_from_torch(sd)
            sd = gsd
        cfg = _derive_cfg(sd, cross_attention=xattn, n_head=args.n_head)
        return gpt2_from_torch_state_dict(sd, cfg), cfg, bridge, "reference-pt"
    from ..ckpt.checkpoint import load_checkpoint

    tree, _ = load_checkpoint(args.gpt_ckpt)
    params = tree["params"]
    bridge = params.get("bridge")
    gpt_params = params.get("gpt", params)
    gpt_params = jax.tree.map(jnp.asarray, gpt_params)
    if bridge is not None:
        bridge = jax.tree.map(jnp.asarray, bridge)
    wte, wpe = gpt_params["wte"], gpt_params["wpe"]
    blocks_ln1 = gpt_params["blocks"]["ln1"]["scale"]
    vocab = int(wte.shape[0])
    cfg = GPTConfig(
        block_size=int(wpe.shape[0]),
        vocab_size=50257 if vocab == 50304 else vocab,
        n_layer=int(blocks_ln1.shape[0]),
        n_head=args.n_head
        or _FAMILY_HEADS.get(int(wte.shape[1]), max(1, int(wte.shape[1]) // 64)),
        n_embd=int(wte.shape[1]),
        cross_attention="xattn" in gpt_params.get("blocks", {}),
    )
    return gpt_params, cfg, bridge, "npz"


def main(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    src = p.add_argument_group("checkpoint")
    src.add_argument("--gpt-ckpt", default=None, help=".npz (ours) or .pt (reference)")
    src.add_argument("--hf-ckpt", default=None,
                     help="HF GPT2LMHeadModel dir or weights file")
    src.add_argument("--bridge-ckpt", default=None,
                     help="bridge weights: .npz (ours) or reference GPT_Caption .pt")
    src.add_argument("--bridge", default=None,
                     choices=["linear", "xattn", "qformer"],
                     help="bridge kind for caption eval (xattn: weights live "
                     "inside --gpt-ckpt)")
    src.add_argument("--n-head", type=int, default=None,
                     help="override the family-derived head count")

    hs = p.add_argument_group("hellaswag")
    hs.add_argument("--hellaswag", action="store_true",
                    help="compute HellaSwag accuracy (README.md:26 ≈30%%)")
    hs.add_argument("--hellaswag-dir", default=None,
                    help="dir with hellaswag_{split}.jsonl (default $HELLASWAG_DIR)")
    hs.add_argument("--hellaswag-split", default="val")
    hs.add_argument("--hellaswag-limit", type=int, default=None)

    cc = p.add_argument_group("captioning")
    cc.add_argument("--coco-tokens", default=None,
                    help="CLIP feature shards dir (with index.json) for COCO val")
    cc.add_argument("--coco-ann", default=None,
                    help="COCO captions annotation json (val split)")
    cc.add_argument("--meteor", action="store_true")
    cc.add_argument("--cider-samples", type=int, default=500,
                    help="images to caption (reference: first 500, "
                    "gpt2_linear/data.py:95)")
    cc.add_argument("--new-tokens", type=int, default=24)
    cc.add_argument("--batch-size", type=int, default=50)
    cc.add_argument("--prompt", default="A photo of")
    cc.add_argument("--seed", type=int, default=0)

    p.add_argument("--policy", default="fp32", choices=["fp32", "bf16"],
                   help="fp32 for score comparability; bf16 for speed")
    p.add_argument("--out", default=None, help="also write the JSON line here")
    args = p.parse_args(argv)

    import jax

    from ..core.precision import DEFAULT_POLICY, FP32_POLICY
    from ..data.tokenizer import get_tokenizer

    policy = FP32_POLICY if args.policy == "fp32" else DEFAULT_POLICY
    tokenizer = get_tokenizer()
    gpt_params, cfg, inline_bridge, source = load_gpt(args)

    result = {
        "ckpt": args.gpt_ckpt or args.hf_ckpt,
        "ckpt_format": source,
        "model": {
            "n_layer": cfg.n_layer,
            "n_head": cfg.n_head,
            "n_embd": cfg.n_embd,
            "block_size": cfg.block_size,
        },
        "tokenizer": tokenizer.name,
        "policy": args.policy,
    }
    if tokenizer.name == "byte-fallback":
        # still runs (plumbing tests use it) but scores are not comparable
        # to the reference's tiktoken-tokenized published numbers
        result["tokenizer_warning"] = (
            "byte-fallback tokenizer: scores NOT comparable to published "
            "numbers; provision GPT2_BPE_DIR or tiktoken data"
        )

    if args.hellaswag:
        from ..eval.hellaswag import HellaSwagEvaluator

        ev = HellaSwagEvaluator(cfg, policy=policy)
        correct, total = ev.evaluate(
            gpt_params,
            tokenizer,
            split=args.hellaswag_split,
            data_dir=args.hellaswag_dir,
            limit=args.hellaswag_limit,
        )
        result["hellaswag_correct"] = correct
        result["hellaswag_total"] = total
        result["hellaswag_acc"] = correct / max(total, 1)
        if ev.skipped_too_long:
            result["hellaswag_skipped_too_long"] = ev.skipped_too_long

    if args.coco_tokens or args.coco_ann:
        if not (args.coco_tokens and args.coco_ann):
            raise SystemExit("--coco-tokens and --coco-ann go together")
        if not args.bridge:
            raise SystemExit("--bridge is required for caption eval")
        import jax.numpy as jnp

        from ..core.config import BridgeConfig
        from ..data.coco import CocoClipTokensDataset
        from ..eval.caption_eval import evaluate_captions

        ds = CocoClipTokensDataset(
            args.coco_tokens, args.coco_ann, tokenizer, max_len=args.new_tokens + 8
        )
        enc_dim = int(ds.features(0).shape[-1])
        bridge_params = inline_bridge
        if args.bridge_ckpt:
            if args.bridge_ckpt.endswith(".pt"):
                from ..ckpt.torch_import import (
                    linear_bridge_from_torch,
                    load_torch_checkpoint,
                    qformer_bridge_from_torch,
                )

                bsd, _ = load_torch_checkpoint(args.bridge_ckpt)
                if args.bridge == "qformer":
                    nl = 1 + max(
                        int(k.split(".")[2])
                        for k in bsd
                        if k.startswith("bridge.layers.")
                    )
                    bridge_params = qformer_bridge_from_torch(bsd, nl)
                else:
                    bridge_params = linear_bridge_from_torch(bsd)
            else:
                from ..ckpt.checkpoint import load_checkpoint

                tree, _ = load_checkpoint(args.bridge_ckpt)
                bp = tree["params"]
                bridge_params = jax.tree.map(
                    jnp.asarray, bp.get("bridge", bp)
                )
        if args.bridge == "xattn":
            bridge_cfg = None
            assert cfg.cross_attention, (
                "--bridge xattn needs a cross-attention GPT checkpoint "
                "(transformer.h.N.xattn.* keys)"
            )
            bridge_params = None
        else:
            if bridge_params is None:
                raise SystemExit(
                    f"--bridge {args.bridge} needs --bridge-ckpt (or a "
                    "GPT_Caption .pt as --gpt-ckpt)"
                )
            n_queries = (
                int(bridge_params["query_tokens"].shape[0])
                if args.bridge == "qformer"
                else 32
            )
            n_layers = (
                int(
                    jax.tree.leaves(bridge_params["layers"])[0].shape[0]
                )
                if args.bridge == "qformer"
                else 2
            )
            bridge_cfg = BridgeConfig(
                kind=args.bridge,
                enc_dim=enc_dim,
                n_queries=n_queries,
                n_layers=n_layers,
            )
        out = evaluate_captions(
            gpt_params,
            bridge_params,
            ds,
            cfg,
            bridge_cfg,
            tokenizer,
            max_samples=args.cider_samples,
            max_new_tokens=args.new_tokens,
            batch_size=args.batch_size,
            prompt=args.prompt,
            policy=policy,
            seed=args.seed,
            compute_meteor=args.meteor,
        )
        result["cider"] = out["cider"]
        result["cider_samples"] = min(args.cider_samples, len(ds))
        if args.meteor:
            result["meteor"] = out["meteor"]
            result["meteor_synonyms"] = out["meteor_synonyms"]

    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return result


if __name__ == "__main__":
    main()
