"""One process of a multi-process (jax.distributed) CPU pretrain run.

The reference's distributed mechanism is inherently multi-PROCESS — torchrun
spawns one process per GPU and DDP/NCCL ties them together
(/root/reference/source/gpt2/train_gpt2.py:216-236). This framework's SPMD
equivalent (`jax.distributed.initialize` + a global mesh) had only ever run
with `jax.process_count() == 1` until round 4; this worker is how the
multi-host branches actually get executed: spawn N of these with the same
coordinator port and they form one SPMD job over N x local_devices virtual
CPU devices with gloo cross-process collectives.

Exercised per run (the branches that are dead code under a single process):
  * per-process loader striding (`TokenShardLoader(rank, world_size)`),
  * global-batch assembly via `make_array_from_process_local_data`
    (`parallel/mesh.py shard_batch`),
  * HellaSwag round-robin example sharding + lockstep dummy flushes +
    the correct/total count allgather (`eval/hellaswag.py`,
    `train/pretrain.py`),
  * every-process SPMD sampling with master-only printing,
  * checkpoint save (master-only write) and on a second invocation the
    auto-resume path incl. the resumed-step allgather consistency check
    (`ckpt/checkpoint.py maybe_resume`) and the train-loader `seek`.

Round 5 (VERDICT r4 #4): `config.json` may set `"workload": "finetune"` to
drive `run_finetune` instead — the LAST multi-process surface that had
never executed with process_count > 1. That exercises the finetune-only
rules: per-process `CocoBatcher(rank, world)` striding, bridge-only grads
on a multi-process mesh (frozen GPT leaves carry scalar placeholder
moments), the every-process-must-decode CIDEr rule
(train/finetune.py:284-310 — the jitted decode reads global params, so a
non-master process skipping it would deadlock the next collective), and
master-only scoring/logging. Reference analog: the three bridge trainers
run under the same torchrun/DDP pattern as pretrain
(/root/reference/source/gpt2_linear/train.py:23-43).

Driven by tests/test_distributed_2proc.py; also runnable by hand:

  python tools/dist_worker.py --pid 0 --nproc 2 --port 29800 --workdir /tmp/w &
  python tools/dist_worker.py --pid 1 --nproc 2 --port 29800 --workdir /tmp/w
"""

import argparse
import json
import os
import sys


def _run_finetune_worker(args, c) -> None:
    """One process of a 2-process linear-bridge finetune on synthetic COCO
    (jax.distributed already initialized by main)."""
    import jax
    import numpy as np

    from gpt2_vision_language_tpu.core.config import (
        BridgeConfig,
        FinetuneConfig,
        GPTConfig,
        ScheduleConfig,
    )
    from gpt2_vision_language_tpu.core.precision import FP32_POLICY
    from gpt2_vision_language_tpu.train.finetune import run_finetune

    coco_root = c["coco_root"]
    cfg = FinetuneConfig(
        model=GPTConfig(
            block_size=64, vocab_size=50257, n_layer=2, n_head=2, n_embd=32
        ),
        bridge=BridgeConfig(
            kind=c.get("bridge", "linear"), enc_dim=24, n_queries=8,
            n_layers=2, n_heads=2,
        ),
        micro_batch_size=c.get("micro_batch_size", 1),
        seq_len=16,
        total_batch_size=c["total_batch_size"],
        schedule=ScheduleConfig(
            max_lr=1e-3, min_lr=1e-4, warmup_steps=1,
            max_steps=c["max_steps"],
        ),
        val_every=c.get("val_every", 2),
        val_steps=2,
        cider_every=c.get("cider_every", 2),
        cider_samples=c.get("cider_samples", 4),
        cider_max_new_tokens=c.get("cider_max_new_tokens", 4),
        save_every=c.get("save_every", 100),
        coco_root=coco_root,
        clip_feats_dir=os.path.join(coco_root, "clip_feats"),
        log_dir=c["log_dir"],
    )
    out = run_finetune(cfg, policy=FP32_POLICY)

    # frozen GPT must be bitwise the fresh init on every process; the
    # bridge (the only trainable subtree) must agree bitwise across
    # processes (replicated state after bridge-only updates)
    bridge = np.concatenate([
        np.asarray(leaf, np.float64).ravel()
        for leaf in jax.tree.leaves(out["params"]["bridge"])
    ])
    wte = np.asarray(out["params"]["gpt"]["wte"], np.float64)
    result = {
        "process_index": int(jax.process_index()),
        "process_count": int(jax.process_count()),
        "global_devices": int(jax.device_count()),
        "val_loss": float(out["val_loss"]),
        "bridge_sum": float(bridge.sum()),
        "bridge_abs_sum": float(np.abs(bridge).sum()),
        "wte_sum": float(wte.sum()),
    }
    tag = c.get("tag", "ft")
    with open(
        os.path.join(args.workdir, f"result_{tag}_p{args.pid}.json"), "w"
    ) as f:
        json.dump(result, f)
    print(f"[p{args.pid}] done: {result}", flush=True)
    jax.distributed.shutdown()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--port", required=True)
    ap.add_argument("--workdir", required=True, help="shared scratch dir holding config.json")
    ap.add_argument("--local-devices", type=int, default=4)
    args = ap.parse_args()

    # CPU platform with N virtual local devices, pinned BEFORE backend init
    # (the axon TPU plugin prepends itself to jax_platforms regardless of the
    # env var — the config.update below is what actually wins).
    os.environ["JAX_PLATFORMS"] = "cpu"
    if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.local_devices}"
        ).strip()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax

    jax.config.update("jax_platforms", "cpu")
    # XLA:CPU's in-process collectives cannot cross process boundaries; gloo
    # is the CPU analogue of the TPU runtime's ICI transport here.
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.nproc,
        process_id=args.pid,
    )
    assert jax.process_count() == args.nproc, jax.process_count()
    assert jax.local_device_count() == args.local_devices

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from gpt2_vision_language_tpu.core.config import (
        GPTConfig,
        PretrainConfig,
        ScheduleConfig,
    )
    from gpt2_vision_language_tpu.core.precision import FP32_POLICY
    from gpt2_vision_language_tpu.train.pretrain import run_pretrain

    with open(os.path.join(args.workdir, "config.json")) as f:
        c = json.load(f)

    if c.get("hellaswag_dir"):
        os.environ["HELLASWAG_DIR"] = c["hellaswag_dir"]

    if c.get("workload") == "finetune":
        _run_finetune_worker(args, c)
        return

    cfg = PretrainConfig(
        model=GPTConfig(
            block_size=32, vocab_size=256, n_layer=2, n_head=2, n_embd=32
        ),
        total_batch_size=c["total_batch_size"],
        micro_batch_size=c["micro_batch_size"],
        seq_len=32,
        schedule=ScheduleConfig(
            max_lr=1e-3,
            min_lr=1e-4,
            warmup_steps=2,
            max_steps=c["max_steps"],
        ),
        val_every=c.get("val_every", 2),
        val_steps=2,
        hellaswag_every=c.get("hellaswag_every", 0),
        run_hellaswag=bool(c.get("hellaswag_dir")),
        sample_every=c.get("sample_every", 0),
        save_every=c.get("save_every", 2),
        data_dir=c["data_dir"],
        log_dir=c["log_dir"],
    )

    out = run_pretrain(cfg, policy=FP32_POLICY)

    # Every process reports: the trained state is replicated over the DP
    # mesh, so the two reports must agree bitwise — a cheap cross-process
    # consistency pin on top of the master CSV's loss trajectory.
    wte = np.asarray(out["params"]["wte"], np.float64)
    result = {
        "process_index": int(jax.process_index()),
        "process_count": int(jax.process_count()),
        "global_devices": int(jax.device_count()),
        "val_loss": float(out["val_loss"]),
        "wte_sum": float(wte.sum()),
        "wte_abs_sum": float(np.abs(wte).sum()),
        "opt_step": int(np.asarray(out["opt_state"]["step"])),
    }
    tag = c.get("tag", "run")
    with open(os.path.join(args.workdir, f"result_{tag}_p{args.pid}.json"), "w") as f:
        json.dump(result, f)
    print(f"[p{args.pid}] done: {result}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
