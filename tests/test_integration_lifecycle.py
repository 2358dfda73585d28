"""Full lifecycle: pretrain -> checkpoint -> bootstrap fine-tune -> captions.

The workflow a reference user runs across its four scripts, end to end on
tiny shapes: pretrain a decoder, save model_best, fine-tune a linear bridge
from that checkpoint on synthetic COCO, and generate scored captions with
the KV-cached decoder.
"""

import dataclasses
import os

import numpy as np
import pytest

from gpt2_vision_language_tpu.core.config import (
    BridgeConfig,
    FinetuneConfig,
    GPTConfig,
    PretrainConfig,
    ScheduleConfig,
)
from gpt2_vision_language_tpu.core.precision import FP32_POLICY

# full GPT-2 id space: the offline tokenizer emits EOT=50256, so tiny-vocab
# models would get out-of-range caption targets
TINY = GPTConfig(block_size=64, vocab_size=50257, n_layer=2, n_head=2, n_embd=32)


def test_pretrain_then_finetune_then_caption(tmp_path):
    from gpt2_vision_language_tpu.data.coco import write_synthetic_coco
    from gpt2_vision_language_tpu.data.fineweb import write_synthetic_corpus
    from gpt2_vision_language_tpu.train.finetune import run_finetune
    from gpt2_vision_language_tpu.train.pretrain import run_pretrain

    # 1. pretrain
    data_dir = str(tmp_path / "fineweb")
    write_synthetic_corpus(
        data_dir, vocab_size=50257, shard_tokens=1 << 14, n_train=1, n_val=1
    )
    pre_log = str(tmp_path / "pre_log")
    pre_cfg = PretrainConfig(
        model=TINY,
        total_batch_size=2 * 2 * 16,
        micro_batch_size=2,
        seq_len=16,
        schedule=ScheduleConfig(max_lr=1e-3, min_lr=1e-4, warmup_steps=1, max_steps=4),
        val_every=2,
        val_steps=1,
        run_hellaswag=False,
        sample_every=1000,
        save_every=100,
        data_dir=data_dir,
        log_dir=pre_log,
    )
    run_pretrain(pre_cfg, policy=FP32_POLICY, num_devices=1)
    best = os.path.join(pre_log, "ckpts", "model_best.npz")
    assert os.path.exists(best)

    # 2. fine-tune a linear bridge bootstrapped from the pretrain best ckpt
    coco = str(tmp_path / "coco")
    write_synthetic_coco(coco, split="train", n_images=24, n_tokens=197, enc_dim=24)
    write_synthetic_coco(coco, split="val", n_images=12, n_tokens=197, enc_dim=24)
    ft_log = str(tmp_path / "ft_log")
    ft_cfg = FinetuneConfig(
        model=TINY,
        bridge=BridgeConfig(kind="linear", enc_dim=24),
        micro_batch_size=4,
        seq_len=12,
        total_batch_size=4 * 12 * 2,
        schedule=ScheduleConfig(max_lr=1e-3, min_lr=1e-4, warmup_steps=1, max_steps=3),
        val_every=2,
        val_steps=1,
        cider_samples=5,
        cider_max_new_tokens=5,
        save_every=100,
        init_ckpt=best,
        coco_root=coco,
        clip_feats_dir=os.path.join(coco, "clip_feats"),
        log_dir=ft_log,
    )
    out = run_finetune(ft_cfg, policy=FP32_POLICY, num_devices=1)
    assert np.isfinite(out["val_loss"])

    # the bootstrapped LM must equal the pretrain best checkpoint, untouched
    from gpt2_vision_language_tpu.ckpt.checkpoint import load_checkpoint

    pre_tree, _ = load_checkpoint(best)
    np.testing.assert_array_equal(
        np.asarray(out["params"]["gpt"]["wte"]),
        np.asarray(pre_tree["params"]["wte"]),
    )

    # 3. generate captions from the fine-tuned bridge
    import jax
    import jax.numpy as jnp

    from gpt2_vision_language_tpu.data.coco import CocoClipTokensDataset
    from gpt2_vision_language_tpu.data.tokenizer import ByteFallbackTokenizer
    from gpt2_vision_language_tpu.eval.caption_eval import evaluate_captions

    ds = CocoClipTokensDataset(
        os.path.join(coco, "clip_feats", "val"),
        os.path.join(coco, "annotations", "captions_val2017.json"),
        ByteFallbackTokenizer(),
        max_len=12,
    )
    res = evaluate_captions(
        out["params"]["gpt"],
        out["params"]["bridge"],
        ds,
        TINY,
        ft_cfg.bridge,
        ByteFallbackTokenizer(),
        max_samples=4,
        max_new_tokens=5,
        batch_size=4,
        policy=FP32_POLICY,
    )
    assert "cider" in res and np.isfinite(res["cider"])
    assert len(res["captions"]) == 4
    # CSV artifacts for both phases exist with cider rows in the finetune log
    ft_csv = [f for f in os.listdir(ft_log) if f.endswith(".csv")][0]
    assert ",cider," in open(os.path.join(ft_log, ft_csv)).read()
