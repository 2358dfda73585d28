"""CLI: GPT-2 124M FineWeb-Edu pretraining (reference: source/gpt2/train_gpt2.py).

    python -m gpt2_vision_language_tpu.cli.pretrain [--steps N] [--synthetic]

Env: FW_OUT_DIR (token shards), LOG_DIR, HELLASWAG_DIR, GPT2_BPE_DIR.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import tempfile

# --fit-1chip: the measured per-preset memory-mechanism stack that fits
# each GPT-2 preset's full 0.5M-token batch on one 16 GB v5e chip
# (ROUND_NOTES r2/r3; README "GPT-2 1558M on one 16 GB chip"). Explicit
# flags always win — these only fill defaults the user left unset.
FIT_1CHIP = {
    "124M": {},  # fits natively; no-remat unrolled is fastest
    "350M": {},  # fits no-remat (preset already sets unroll_layers)
    "774M": {"opt_state_dtype": "bfloat16", "remat": "full"},
    "1558M": {
        "param_dtype": "bfloat16",
        "opt_state_dtype": "int8",
        "grad_accum_dtype": "bfloat16",
        "remat": "full",
        "pin_layouts": True,
        "split_accum": 4,
        "layerwise_grad": True,
        "micro_batch": 4,  # measured sweet spot (8,482/9,296/9,008 at 2/4/8)
    },
}


def parse_and_build(argv=None):
    """Parse argv into (PretrainConfig, remat, args) without running
    anything — split from main() so tests can pin flag expansion."""
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=None, help="override max_steps")
    p.add_argument(
        "--model", choices=["124M", "350M", "774M", "1558M"], default="124M",
        help="GPT-2 family preset (core/config.py); 124M is the reference "
        "workload. 350M fits a 16GB chip no-remat; 774M needs "
        "--opt-state-dtype bfloat16 and --remat full",
    )
    p.add_argument("--micro-batch", type=int, default=None)
    p.add_argument("--seq-len", type=int, default=None)
    p.add_argument(
        "--block-size", type=int, default=None,
        help="model context length (wpe rows); the reference is fixed at "
        "1024 (train_gpt2.py:79) — larger values are the long-context "
        "extension (streamed-KV flash kernel). Defaults to --seq-len when "
        "that exceeds the preset's 1024",
    )
    p.add_argument("--total-batch", type=int, default=None)
    p.add_argument("--no-hellaswag", action="store_true")
    p.add_argument(
        "--val-every", type=int, default=None,
        help="0 disables validation (and its checkpoint save) entirely — "
        "the eval executable's reserved temp arena matters on HBM-edge "
        "configs",
    )
    p.add_argument(
        "--no-ckpt", action="store_true",
        help="disable checkpointing (and its device->host gather) entirely",
    )
    p.add_argument(
        "--no-nan-guard", action="store_true",
        help="drop the NaN-rollback guard. Only relevant to ONE-JIT steps "
        "(in-graph rollback selects keep old-state live); --split-accum "
        "configs guard host-side at zero HBM cost, so the 1558M recipe no "
        "longer needs this. The loop still halts on non-finite either way",
    )
    p.add_argument(
        "--pin-layouts", action="store_true",
        help="pin train/eval param+opt layouts to the default "
        "major-to-minor layout (no bulk re-layout program — required to "
        "fit 1558M whole-model-bf16 on one 16GB chip)",
    )
    p.add_argument(
        "--split-accum", nargs="?", type=int, const=1, default=0,
        metavar="N",
        help="dispatch grad accumulation as small jitted programs of N "
        "micros each (default N=1) + one optimizer program, instead of "
        "one jit holding the whole scan (with the bf16 flags + "
        "--pin-layouts: fits 1558M's 0.5M-token batch on one 16GB chip). "
        "Numerically identical for every N, throughput equal to one-jit",
    )
    p.add_argument(
        "--sync-accum", nargs="?", type=int, const=1, default=0,
        metavar="N",
        help="host-sync the accum carry every N --split-accum dispatches "
        "(default N=1) so at most one in-flight execution's temp arena "
        "is resident — async-enqueued executions each reserve their own "
        "arena and the overlap OOMs HBM-edge configs (1558M). 0 = async",
    )
    p.add_argument(
        "--layerwise-grad", action="store_true",
        help="stream per-layer grads into the accumulators (reverse-scan "
        "VJP) instead of materializing the stacked grads tree — cuts the "
        "accum program's temp arena ~4x at 1558M. tp=sp=1 only",
    )
    p.add_argument("--save-every", type=int, default=None)
    p.add_argument(
        "--log-dir", default=None,
        help="CSV/checkpoint output directory (default: ./log, the "
        "reference's layout — train_gpt2.py:369)",
    )
    p.add_argument(
        "--sample-every", type=int, default=None,
        help="0 disables sampling entirely (incl. the final step)",
    )
    p.add_argument(
        "--synthetic",
        action="store_true",
        help="generate a synthetic token corpus in a temp dir (smoke runs)",
    )
    p.add_argument(
        "--synthetic-kind", choices=["zipf", "markov"], default="zipf",
        help="zipf: i.i.d. tokens (smoke); markov: learnable pair structure "
        "(sustained-training loss-curve evidence)",
    )
    p.add_argument(
        "--synthetic-shards", type=int, default=2,
        help="number of 1M-token train shards to generate",
    )
    p.add_argument("--devices", type=int, default=None)
    p.add_argument(
        "--tp", type=int, default=1,
        help="model-axis size: builds a 2-D (data, model) mesh and applies "
        "Megatron column/row parameter shardings (parallel/sharding.py). "
        "1 = pure DP (the reference's only mode)",
    )
    p.add_argument(
        "--seq-parallel", action="store_true",
        help="with --tp > 1: T-shard the residual stream over the model "
        "axis between blocks (reduce-scatter + all-gather instead of "
        "all-reduce; Korthikanti et al.)",
    )
    p.add_argument(
        "--attn-impl", choices=["auto", "xla", "flash", "ring"],
        default="auto",
        help="attention path; 'ring' rotates K/V over the model axis "
        "(requires --tp > 1 and seq_len %% tp == 0)",
    )
    p.add_argument(
        "--pp", type=int, default=1,
        help="pipeline stages: builds a 2-D (data, pipe) mesh and runs "
        "the blocks through the GPipe schedule with layers stage-sharded "
        "on the pipe axis (parallel/pipeline.py). Requires n_layer %% pp "
        "== 0; composes with --tp (Megatron sharding inside each stage)",
    )
    p.add_argument(
        "--pp-micro", type=int, default=0,
        help="GPipe microbatches per grad-accum micro (0 = pp); larger "
        "values shrink the (pp-1)/(pp_micro+pp-1) bubble",
    )
    p.add_argument(
        "--opt-state-dtype", choices=["float32", "bfloat16", "int8"],
        default=None,
        help="AdamW m/v storage dtype; bfloat16 halves optimizer HBM "
        "(fits 774M on a 16GB chip), int8 block-quantizes the moments "
        "(Dettmers-style; with bf16 params+accum it fits 1558M on one "
        "chip with room for micro-batch > 1). Update math stays fp32",
    )
    p.add_argument(
        "--param-dtype", choices=["float32", "bfloat16"], default=None,
        help="master parameter dtype; bfloat16 = the torch reference's "
        "whole-model CUDA cast (train_gpt2.py:264). With "
        "--opt-state-dtype bfloat16 and --grad-accum-dtype bfloat16 this "
        "fits GPT-2 1558M on one 16GB chip",
    )
    p.add_argument(
        "--grad-accum-dtype", choices=["float32", "bfloat16"], default=None,
        help="grad accumulator dtype; bfloat16 halves accumulator HBM via "
        "unbiased stochastic rounding (the 1558M-on-one-chip enabler)",
    )
    p.add_argument(
        "--remat",
        choices=["none", "full", "save_attn", "recompute_gelu", "recompute_mlp"],
        default=None,
        help="activation rematerialization policy (none is fastest at 124M "
        "on 16GB chips; use full for larger presets). Default: none",
    )
    p.add_argument(
        "--fit-1chip", action="store_true",
        help="apply the measured memory-mechanism stack that fits the "
        "chosen --model preset's full batch on one 16 GB chip (774M: bf16 "
        "opt states + remat; 1558M: bf16 params, int8 moments, SR-bf16 "
        "accumulators, layout pinning, split accum, layerwise grads). "
        "Explicit flags override",
    )
    args = p.parse_args(argv)
    if args.fit_1chip:
        for k, v in FIT_1CHIP[args.model].items():
            if not getattr(args, k):  # user's explicit flag wins
                setattr(args, k, v)
    if args.remat is None:
        args.remat = "none"

    from ..core.config import (
        GPT2_124M,
        GPT2_350M,
        GPT2_774M,
        GPT2_1558M,
        PretrainConfig,
    )

    cfg = PretrainConfig()
    updates = {}
    if args.model != "124M":
        preset = {
            "350M": GPT2_350M, "774M": GPT2_774M, "1558M": GPT2_1558M
        }[args.model]
        updates["model"] = preset.replace(unroll_layers=args.model == "350M")
    if args.micro_batch:
        updates["micro_batch_size"] = args.micro_batch
    if args.seq_len:
        updates["seq_len"] = args.seq_len
    block = args.block_size
    if block is None and args.seq_len and args.seq_len > 1024:
        block = args.seq_len
    if block:
        model = updates.get("model", cfg.model)
        updates["model"] = model.replace(block_size=block)
    if args.total_batch:
        updates["total_batch_size"] = args.total_batch
    if args.no_hellaswag:
        updates["run_hellaswag"] = False
    if args.val_every is not None:
        updates["val_every"] = args.val_every
    if args.no_ckpt:
        updates["save_ckpt"] = False
    if args.no_nan_guard:
        updates["nan_guard"] = False
    if args.pin_layouts:
        updates["pin_layouts"] = True
    if args.split_accum:
        updates["split_accum"] = args.split_accum
    if args.sync_accum:
        updates["sync_accum"] = args.sync_accum
    if args.layerwise_grad:
        updates["layerwise_grad"] = True
    if args.save_every is not None:
        updates["save_every"] = args.save_every
    if args.log_dir:
        updates["log_dir"] = args.log_dir
    if args.sample_every is not None:
        updates["sample_every"] = args.sample_every
    if args.opt_state_dtype:
        updates["opt_state_dtype"] = args.opt_state_dtype
    if args.grad_accum_dtype:
        updates["grad_accum_dtype"] = args.grad_accum_dtype
    if args.param_dtype:
        updates["param_dtype"] = args.param_dtype
    if args.tp != 1:
        updates["tp"] = args.tp
    if args.pp != 1:
        updates["pp"] = args.pp
    if args.pp_micro:
        updates["pp_micro"] = args.pp_micro
    if args.seq_parallel:
        updates["seq_parallel"] = True
    if args.attn_impl != "auto":
        updates["attn_impl"] = args.attn_impl
    if args.synthetic:
        from ..data.fineweb import write_synthetic_corpus

        d = tempfile.mkdtemp(prefix="fineweb_synthetic_")
        write_synthetic_corpus(
            d, kind=args.synthetic_kind, n_train=args.synthetic_shards
        )
        updates["data_dir"] = d
    cfg = dataclasses.replace(cfg, **updates)
    remat = {"none": False, "full": True}.get(args.remat, args.remat)
    return cfg, remat, args


def main(argv=None):
    cfg, remat, args = parse_and_build(argv)

    from ..train.pretrain import run_pretrain

    run_pretrain(
        cfg, max_steps_override=args.steps, num_devices=args.devices, remat=remat
    )


if __name__ == "__main__":
    main()
