"""End-to-end fine-tune workload tests for all three bridges (synthetic COCO)."""

import dataclasses
import os

import numpy as np
import pytest

from gpt2_vision_language_tpu.core.config import (
    BridgeConfig,
    FinetuneConfig,
    GPTConfig,
    ScheduleConfig,
)
from gpt2_vision_language_tpu.core.precision import FP32_POLICY
from gpt2_vision_language_tpu.data.coco import write_synthetic_coco

SMALL = GPTConfig(block_size=64, vocab_size=50257, n_layer=2, n_head=2, n_embd=32)
SMALL_X = SMALL.replace(img_embd=24, cross_attention=True)  # = CLIP enc_dim


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("coco"))
    write_synthetic_coco(root, split="train", n_images=32, n_tokens=197, enc_dim=24)
    write_synthetic_coco(root, split="val", n_images=16, n_tokens=197, enc_dim=24)
    return root


def _cfg(coco_root, tmp_path, kind, model):
    return FinetuneConfig(
        model=model,
        bridge=BridgeConfig(kind=kind, enc_dim=24, n_queries=8, n_layers=2, n_heads=2),
        micro_batch_size=4,
        seq_len=16,
        total_batch_size=4 * 16 * 2,
        schedule=ScheduleConfig(max_lr=1e-3, min_lr=1e-4, warmup_steps=1, max_steps=3),
        val_every=2,
        val_steps=2,
        cider_samples=6,
        cider_max_new_tokens=6,
        save_every=100,
        coco_root=coco_root,
        clip_feats_dir=os.path.join(coco_root, "clip_feats"),
        log_dir=str(tmp_path / "log"),
    )


@pytest.mark.parametrize("kind", ["linear", "qformer", "xattn"])
def test_finetune_runs(coco_root, tmp_path, kind):
    from gpt2_vision_language_tpu.train.finetune import run_finetune

    model = SMALL_X if kind == "xattn" else SMALL
    cfg = _cfg(coco_root, tmp_path, kind, model)
    out = run_finetune(cfg, policy=FP32_POLICY, num_devices=1)
    assert np.isfinite(out["val_loss"])
    csvs = [f for f in os.listdir(cfg.log_dir) if f.endswith(".csv")]
    content = open(os.path.join(cfg.log_dir, csvs[0])).read()
    assert ",train," in content and ",val," in content
    assert ",cider," in content, "CIDEr eval did not log"


def test_frozen_lm_unchanged_linear(coco_root, tmp_path):
    """The frozen GPT-2 must be bit-identical after fine-tuning; the bridge
    must have moved (freeze-correctness, gpt2_linear/train.py:126-128)."""
    import jax

    from gpt2_vision_language_tpu.models import caption, gpt2
    from gpt2_vision_language_tpu.train.finetune import run_finetune, load_pretrained_gpt

    cfg = _cfg(coco_root, tmp_path, "linear", SMALL)
    before_gpt = load_pretrained_gpt(SMALL, None, seed=cfg.seed)
    before_bridge = caption.init(
        jax.random.PRNGKey(cfg.seed + 1), SMALL, cfg.bridge
    )
    out = run_finetune(cfg, policy=FP32_POLICY, num_devices=1)
    after = out["params"]
    for a, b in zip(jax.tree.leaves(after["gpt"]), jax.tree.leaves(before_gpt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(after["bridge"]), jax.tree.leaves(before_bridge)
        )
    )
    assert moved, "bridge did not train"


def test_xattn_freeze_mask(coco_root, tmp_path):
    """xattn: only vis_proj, xattn.*, gate move; wte/attn/mlp stay frozen."""
    import jax

    from gpt2_vision_language_tpu.train.finetune import run_finetune, load_pretrained_gpt

    cfg = _cfg(coco_root, tmp_path, "xattn", SMALL_X)
    before = load_pretrained_gpt(SMALL_X, None, seed=cfg.seed)
    out = run_finetune(cfg, policy=FP32_POLICY, num_devices=1)
    after = out["params"]
    np.testing.assert_array_equal(np.asarray(after["wte"]), np.asarray(before["wte"]))
    np.testing.assert_array_equal(
        np.asarray(after["blocks"]["attn"]["wqkv"]),
        np.asarray(before["blocks"]["attn"]["wqkv"]),
    )
    assert not np.allclose(
        np.asarray(after["blocks"]["xattn"]["wq"]),
        np.asarray(before["blocks"]["xattn"]["wq"]),
    )
    assert not np.allclose(
        np.asarray(after["vis_proj"]["w"]), np.asarray(before["vis_proj"]["w"])
    )


def test_bank_build_reorder_and_val_caption_stability(coco_root):
    """(1) build_pooled_feature_bank must return rows in dataset-index
    order even when index.json interleaves shards (the no-gather fast path
    only applies to already-sorted indices); (2) a reset() validation
    batcher must draw the SAME captions every eval (model_best must not be
    won by caption-draw noise)."""
    import jax.numpy as jnp

    from gpt2_vision_language_tpu.data.coco import (
        CocoBatcher,
        CocoClipTokensDataset,
        build_pooled_feature_bank,
    )
    from gpt2_vision_language_tpu.data.tokenizer import get_tokenizer

    ds = CocoClipTokensDataset(
        os.path.join(coco_root, "clip_feats", "train"),
        os.path.join(coco_root, "annotations", "captions_train2017.json"),
        get_tokenizer(),
        max_len=16,
    )
    # force a non-trivial reorder: reverse the index
    ds.index = list(reversed(ds.index))
    pool = lambda z: z[:, :5, :]  # cheap stand-in "pooling"
    bank = np.asarray(build_pooled_feature_bank(ds, pool))
    for i in [0, 7, len(ds) - 1]:
        np.testing.assert_allclose(
            bank[i], ds.features(i)[:5], rtol=1e-6,
            err_msg=f"bank row {i} not in dataset order",
        )

    vb = CocoBatcher(ds, 4, shuffle=False, seed=3)
    vb.reset()
    first = vb.next_index_batch()
    vb.reset()
    second = vb.next_index_batch()
    np.testing.assert_array_equal(first[0], second[0])  # same caption ids
    np.testing.assert_array_equal(first[3], second[3])  # same image rows
