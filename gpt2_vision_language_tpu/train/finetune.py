"""COCO captioning fine-tune workloads: linear / Q-Former / cross-attention.

Re-design of the three bridge trainers (gpt2_linear/train.py,
gpt2_q_former/train.py — byte-identical scripts — and
gpt2_cross-att/train.py): frozen CLIP features from precomputed shards,
frozen GPT-2 from the pretrain checkpoint, only the bridge trains.

Reference semantics kept: cadences (val every 20 incl. step 0, CIDEr after
val, rolling/best/final ckpts), masked labels (y masked to -100 outside the
caption), grad accumulation 524288/(B*T*world) for linear/qformer vs 1 for
xattn, LR schedules per preset (core/config.py), CSV logging, CIDEr
swallowed on failure so training survives eval crashes
(gpt2_linear/train.py:253-272).

TPU re-design: 33-token pooling fused on device inside the jitted loss;
frozen params excluded from grads via stop_gradient masks; the whole
grad-accum window ships in one host->device transfer; CIDEr runs batched
through the KV-cached decoder.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import FinetuneConfig
from ..core.precision import Policy, DEFAULT_POLICY
from ..models import caption, gpt2
from ..data.coco import (
    CocoBatcher,
    CocoClipTokensDataset,
    build_pooled_feature_bank,
)
from ..data.pipeline import HostPrefetcher
from ..data.tokenizer import get_tokenizer
from ..eval.caption_eval import evaluate_captions
from ..obs.csvlog import MetricsLogger
from ..ckpt.checkpoint import CheckpointManager
from ..ckpt.torch_import import gpt2_from_torch_state_dict
from ..ops.pooling import pool_clip_tokens_to_33
from ..parallel.mesh import make_mesh, shard_batch, is_master, maybe_init_distributed
from .optimizer import adamw_init
from .step import make_train_step, make_eval_step


def load_pretrained_gpt(cfg, init_ckpt: Optional[str], *, seed: int = 0):
    """Bootstrap the LM from a checkpoint, strict=False semantics: params
    missing from the checkpoint (e.g. xattn leaves) keep their fresh init
    (gpt2_cross-att/train.py:89-91)."""
    params = gpt2.init(jax.random.PRNGKey(seed), cfg)
    if not init_ckpt:
        return params
    if init_ckpt.endswith(".pt"):
        from ..ckpt.torch_import import load_torch_checkpoint

        sd, _ = load_torch_checkpoint(init_ckpt)
        try:
            imported = gpt2_from_torch_state_dict(sd, cfg)
        except KeyError:
            # checkpoint lacks the xattn keys: import as plain decoder and
            # merge into the fresh init
            plain_cfg = cfg.replace(cross_attention=False, img_embd=0)
            imported = gpt2_from_torch_state_dict(sd, plain_cfg)
    else:
        from ..ckpt.checkpoint import load_checkpoint

        tree, _ = load_checkpoint(init_ckpt)
        imported = jax.tree.map(jnp.asarray, tree["params"])

    def merge(dst, src):
        out = {}
        for k, v in dst.items():
            if isinstance(v, dict):
                out[k] = merge(v, src.get(k, {})) if isinstance(src, dict) else v
            else:
                out[k] = (
                    jnp.asarray(src[k])
                    if isinstance(src, dict) and k in src
                    else v
                )
        return out

    return merge(params, imported)


def run_finetune(
    cfg: FinetuneConfig,
    *,
    policy: Policy = DEFAULT_POLICY,
    max_steps_override: Optional[int] = None,
    num_devices: Optional[int] = None,
) -> dict:
    maybe_init_distributed()
    mesh = make_mesh(num_devices)
    world = mesh.devices.size
    master = is_master()
    accum = cfg.grad_accum_steps(world)
    kind = cfg.bridge.kind
    model_cfg = cfg.model
    if master:
        print(f"[finetune:{kind}] accum={accum} world={world}")

    tokenizer = get_tokenizer()
    coco_root = cfg.coco_root or os.environ.get("COCO_ROOT", "coco2017")
    feats_dir = cfg.clip_feats_dir or os.environ.get(
        "CLIP_FULL_DIR", "clip_feats_full"
    )
    train_ds = CocoClipTokensDataset(
        os.path.join(feats_dir, "train"),
        os.path.join(coco_root, "annotations", "captions_train2017.json"),
        tokenizer,
        cfg.seq_len,
        seed=cfg.seed,
    )
    val_ds = CocoClipTokensDataset(
        os.path.join(feats_dir, "val"),
        os.path.join(coco_root, "annotations", "captions_val2017.json"),
        tokenizer,
        cfg.seq_len,
        seed=cfg.seed,
    )
    gb = cfg.micro_batch_size * world
    procs = jax.process_count()
    prank = jax.process_index()
    assert gb % procs == 0
    train_batcher = CocoBatcher(
        train_ds, gb // procs, shuffle=True, drop_last=True, seed=cfg.seed,
        rank=prank, world=procs,
    )
    val_batcher = CocoBatcher(
        val_ds, gb // procs, shuffle=False, drop_last=False, seed=cfg.seed,
        rank=prank, world=procs,
    )

    # Device-resident pooled feature banks: pay the CLIP-feature transfer
    # once, gather rows on device per step (measured: streaming the full
    # 197-token features per sample costs ~GBs per optimizer step over the
    # host link and dominated step time by >100x).
    pool_jit = jax.jit(pool_clip_tokens_to_33)
    t_bank = time.time()
    train_bank = build_pooled_feature_bank(
        train_ds, pool_jit, dtype=policy.compute_dtype
    )
    val_bank = build_pooled_feature_bank(
        val_ds, pool_jit, dtype=policy.compute_dtype
    )
    if master:
        gb_bytes = train_bank.size * train_bank.dtype.itemsize / 1e9
        print(
            f"[feats] pooled banks on device: train {train_bank.shape} "
            f"({gb_bytes:.2f} GB), val {val_bank.shape} "
            f"in {time.time() - t_bank:.1f}s"
        )

    # --- params: frozen LM (+ trainable bridge or xattn leaves) ---
    gpt_params = load_pretrained_gpt(model_cfg, cfg.init_ckpt, seed=cfg.seed)
    if kind == "xattn":
        params = gpt_params
        trainable = gpt2.trainable_mask_xattn(params)
        decay = gpt2.decay_mask(params)

        def loss_fn(p, micro, bank):
            z = jnp.take(bank, micro["idx"], axis=0)
            return gpt2.loss(
                p,
                micro["x"],
                model_cfg,
                z=z,
                targets=micro["y"],
                target_mask=micro["mask"],
                policy=policy,
            )

    else:
        bridge_params = caption.init(
            jax.random.PRNGKey(cfg.seed + 1), model_cfg, cfg.bridge
        )
        params = {"gpt": gpt_params, "bridge": bridge_params}
        trainable = {
            "gpt": jax.tree.map(lambda _: False, gpt_params),
            "bridge": jax.tree.map(lambda _: True, bridge_params),
        }
        from ..models.bridges import bridge_decay_mask

        decay = {
            "gpt": gpt2.decay_mask(gpt_params),
            # name-based: stacked-layer leaves make raw ndim wrong (LN
            # params are (L, D) but must NOT decay)
            "bridge": bridge_decay_mask(bridge_params),
        }
        # train=True: Q-Former dropout active when a seed is in the batch
        base_loss = caption.loss_fn_factory(
            model_cfg, cfg.bridge, policy=policy, train=True
        )

        def loss_fn(p, micro, bank):
            micro = dict(micro)
            micro["z"] = jnp.take(bank, micro["idx"], axis=0)
            return base_loss(p, micro)

    if master:
        n_train = sum(
            int(p.size)
            for p, m in zip(jax.tree.leaves(params), jax.tree.leaves(trainable))
            if m
        )
        n_total = gpt2.param_count(params)
        print(f"[init] trainable params: {n_train}/{n_total}")

    # scalar moment placeholders for the frozen decoder (~1 GB HBM +
    # checkpoint size saved at 124M; optimizer.adamw_init docstring)
    opt_state = adamw_init(params, trainable_mask=trainable)
    train_step = make_train_step(
        loss_fn,
        cfg.optimizer,
        cfg.schedule,
        decay_mask=decay,
        trainable_mask=trainable,
    )
    eval_step = make_eval_step(loss_fn)

    log = MetricsLogger(cfg.log_dir, is_master=master)
    log.meta("tokenizer", tokenizer.name)
    log.meta("argv", " ".join(sys.argv))
    manager = CheckpointManager(
        os.path.join(log.log_dir, "ckpts"),
        save_every=cfg.save_every,
        is_master=master,
    )
    from ..infer.decode import Decoder
    from ..infer.sampling import sample_top_p_fast

    cider_decoder = Decoder(model_cfg, policy=policy, sample_fn=sample_top_p_fast)

    max_steps = max_steps_override or cfg.schedule.max_steps
    val_loss = float("nan")
    tokens_per_step = gb * cfg.seq_len * accum
    avg_dt = None

    seed_counter = [cfg.seed * 1000003]

    def batch_to_device(raw, leading_accum, with_dropout_seed=False):
        x, y, m, idx = raw
        tree = {
            "x": jnp.asarray(x),
            "y": jnp.asarray(y),
            "mask": jnp.asarray(m),
            "idx": jnp.asarray(idx),
        }
        out = shard_batch(mesh, tree, leading_accum_axis=leading_accum)
        if with_dropout_seed:
            # per-micro scalar seeds: replicated, not data-sharded
            k = x.shape[0]
            seeds = np.arange(seed_counter[0], seed_counter[0] + k, dtype=np.uint32)
            seed_counter[0] += k
            out["seed"] = jnp.asarray(seeds)
        return out

    def run_validation(step, last_step):
        nonlocal val_loss
        # fixed comparable val window every time (reference iterates a fresh
        # val_loader each validation, gpt2_linear/train.py:225)
        val_batcher.reset()
        raw = val_batcher.next_accum_index_batch(cfg.val_steps)
        val_loss = float(eval_step(params, batch_to_device(raw, True), val_bank))
        log.val(step, val_loss)
        # every process (collective gather for model-parallel shardings;
        # master-only write — see CheckpointManager.is_master)
        manager.save_step(step, params, opt_state, val_loss, last_step=last_step)
        # cider_every gates the expensive generation eval independently of
        # the val loss (0 disables; the reference couples both at 20 steps,
        # gpt2_linear/train.py:218-273). The same-condition-on-every-process
        # rule below still holds: the gate is pure host arithmetic.
        if not (
            cfg.cider_every and (step % cfg.cider_every == 0 or last_step)
        ):
            return
        # CIDEr runs on EVERY process: the jitted decode reads the global
        # (non-addressable on multi-host) params, so skipping it on
        # non-master processes would deadlock the next collective program.
        # All processes decode the same samples (redundant but safe);
        # only the master logs.
        try:
            if kind == "xattn":
                gp, bp, bc = params, None, None
            else:
                gp, bp, bc = params["gpt"], params["bridge"], cfg.bridge
            out = evaluate_captions(
                gp,
                bp,
                val_ds,
                model_cfg,
                bc,
                tokenizer,
                max_samples=cfg.cider_samples,
                max_new_tokens=cfg.cider_max_new_tokens,
                policy=policy,
                feature_bank=val_bank,
                decoder=cider_decoder,
            )
            log.cider(step, out["cider"])
        except Exception as e:  # noqa: BLE001 — reference parity:
            # training survives eval crashes (gpt2_linear/train.py:271)
            print(f"[CIDEr] evaluation failed at step {step}: {e}")

    use_dropout = kind == "qformer"  # only the Q-Former has dropout sites
    prefetch = HostPrefetcher(
        lambda: train_batcher.next_accum_index_batch(accum),
        stage=lambda raw: batch_to_device(raw, True, with_dropout_seed=use_dropout),
    )

    final_step = -1  # last step actually run (guard may halt early)
    for step in range(max_steps):
        t0 = time.time()
        last_step = step == max_steps - 1
        # val_every=0 disables validation (same convention as pretrain)
        if cfg.val_every and (step % cfg.val_every == 0 or last_step):
            run_validation(step, last_step)

        batch = prefetch.next()
        params, opt_state, metrics = train_step(
            params, opt_state, batch, jnp.int32(step), train_bank
        )
        loss = float(metrics["loss"])
        if not (np.isfinite(loss) and np.isfinite(float(metrics["grad_norm"]))):
            print(f"[guard] non-finite loss/grad at step {step}; halting")
            final_step = step
            break
        final_step = step
        dt = time.time() - t0
        avg_dt = dt if avg_dt is None else 0.9 * avg_dt + 0.1 * dt
        log.train(
            step,
            loss,
            float(metrics["lr"]),
            float(metrics["grad_norm"]),
            dt * 1000,
            tokens_per_step / dt,
            eta_sec=(max_steps - step - 1) * avg_dt,
        )

    prefetch.close()
    # record the last step actually run, not the scheduled end
    manager.save_final(final_step, params, opt_state, val_loss)
    if master:
        log.export_xlsx()
    return {"params": params, "opt_state": opt_state, "val_loss": val_loss}
