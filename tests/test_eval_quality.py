"""cli.eval_quality: one-command quality reproduction (VERDICT r3 next #2).

The reference's published numbers (HellaSwag ≈30%, README.md:26; CIDEr
0.32–0.60 / METEOR 0.33–0.41, README.md:194-196) need assets this
environment lacks; these tests pin the PLUMBING with tiny synthetic
checkpoints and data so the command is known-good the day assets exist:
checkpoint -> import -> eval -> one JSON line, for every accepted
checkpoint format (reference .pt, GPT_Caption .pt, HF state dict, our
.npz) and both metric families (HellaSwag; CIDEr/METEOR over COCO).
"""

import json
import os

import jax
import numpy as np
import pytest

from gpt2_vision_language_tpu.cli.eval_quality import main
from gpt2_vision_language_tpu.core.config import BridgeConfig, GPTConfig
from gpt2_vision_language_tpu.models import caption, gpt2

TINY = GPTConfig(block_size=64, vocab_size=256, n_layer=2, n_head=2, n_embd=32)


def _write_hellaswag(path, n=6):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "hellaswag_val.jsonl"), "w") as f:
        for i in range(n):
            f.write(
                json.dumps(
                    {
                        "ctx": f"Number {i} is",
                        "endings": ["small", "big", "word", "none"],
                        "label": i % 4,
                    }
                )
                + "\n"
            )


def test_reference_pt_hellaswag(tmp_path):
    """Reference-format .pt -> HellaSwag accuracy, config self-derived."""
    torch = pytest.importorskip("torch")  # noqa: F841
    from gpt2_vision_language_tpu.ckpt.torch_export import save_torch_checkpoint

    params = gpt2.init(jax.random.PRNGKey(0), TINY)
    ckpt = tmp_path / "model_best.pt"
    save_torch_checkpoint(str(ckpt), params, TINY, meta={"step": 7})
    hs = tmp_path / "hs"
    _write_hellaswag(hs)

    out = main(
        [
            "--gpt-ckpt", str(ckpt),
            "--n-head", "2",
            "--hellaswag",
            "--hellaswag-dir", str(hs),
            "--out", str(tmp_path / "m.json"),
        ]
    )
    assert out["ckpt_format"] == "reference-pt"
    assert out["model"] == {
        "n_layer": 2, "n_head": 2, "n_embd": 32, "block_size": 64,
    }
    assert out["hellaswag_total"] == 6
    assert 0.0 <= out["hellaswag_acc"] <= 1.0
    # the --out file holds the same single JSON line
    assert json.loads((tmp_path / "m.json").read_text()) == out


def test_hf_state_dict_hellaswag(tmp_path):
    """HF GPT2LMHeadModel weights file -> HellaSwag, Conv1D layout honored."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.GPT2Config(
        vocab_size=256, n_positions=64, n_embd=32, n_layer=2, n_head=2
    )
    torch.manual_seed(0)
    model = transformers.GPT2LMHeadModel(hf_cfg).eval()
    ckpt = tmp_path / "pytorch_model.bin"
    torch.save(model.state_dict(), str(ckpt))
    hs = tmp_path / "hs"
    _write_hellaswag(hs, n=4)

    out = main(
        [
            "--hf-ckpt", str(ckpt),
            "--n-head", "2",
            "--hellaswag",
            "--hellaswag-dir", str(hs),
        ]
    )
    assert out["ckpt_format"] == "hf"
    assert out["model"]["n_layer"] == 2 and out["model"]["block_size"] == 64
    assert out["hellaswag_total"] == 4

    # the import itself must be the parity-tested one: logits of the
    # imported params match the HF model
    from gpt2_vision_language_tpu.ckpt.torch_import import gpt2_from_hf_state_dict
    from gpt2_vision_language_tpu.core.precision import FP32_POLICY

    cfg = GPTConfig(block_size=64, vocab_size=256, n_layer=2, n_head=2, n_embd=32)
    params = gpt2_from_hf_state_dict(model.state_dict(), cfg)
    idx = np.random.RandomState(0).randint(0, 256, (2, 16))
    ours, _ = gpt2.apply(
        params, np.asarray(idx, np.int32), cfg, policy=FP32_POLICY
    )
    with torch.no_grad():
        ref = model(torch.tensor(idx, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(
        np.asarray(ours)[..., :256], ref, rtol=2e-4, atol=2e-4
    )


def test_caption_metrics_from_npz_finetune_ckpt(tmp_path):
    """Our finetune .npz ({params: {gpt, bridge}}) -> CIDEr + METEOR."""
    from gpt2_vision_language_tpu.ckpt.checkpoint import save_checkpoint
    from gpt2_vision_language_tpu.data.coco import write_synthetic_coco

    tokens_dir, ann_path = write_synthetic_coco(
        str(tmp_path), split="val", n_images=6, n_tokens=197, enc_dim=24
    )
    bcfg = BridgeConfig(kind="linear", enc_dim=24)
    gpt_params = gpt2.init(jax.random.PRNGKey(0), TINY)
    bridge_params = caption.init(jax.random.PRNGKey(1), TINY, bcfg)
    ckpt = tmp_path / "model_best.npz"
    save_checkpoint(
        str(ckpt),
        {"params": {"gpt": gpt_params, "bridge": bridge_params}},
        meta={"step": 3},
    )

    out = main(
        [
            "--gpt-ckpt", str(ckpt),
            "--n-head", "2",
            "--bridge", "linear",
            "--coco-tokens", tokens_dir,
            "--coco-ann", ann_path,
            "--cider-samples", "4",
            "--batch-size", "2",
            "--new-tokens", "4",
            "--meteor",
        ]
    )
    assert out["ckpt_format"] == "npz"
    assert out["cider_samples"] == 4
    assert np.isfinite(out["cider"]) and out["cider"] >= 0.0
    assert 0.0 <= out["meteor"] <= 1.0


def test_caption_metrics_from_reference_gpt_caption_pt(tmp_path):
    """Reference GPT_Caption .pt (gpt.* + bridge.* keys,
    gpt2_linear/train.py:170-216 save format) -> CIDEr, bridge imported
    from the same file."""
    torch = pytest.importorskip("torch")
    from gpt2_vision_language_tpu.ckpt.torch_export import gpt2_to_torch_state_dict
    from gpt2_vision_language_tpu.data.coco import write_synthetic_coco

    tokens_dir, ann_path = write_synthetic_coco(
        str(tmp_path), split="val", n_images=4, n_tokens=197, enc_dim=24
    )
    gpt_params = gpt2.init(jax.random.PRNGKey(0), TINY)
    rng = np.random.RandomState(0)
    sd = {
        f"gpt.{k}": torch.tensor(v)
        for k, v in gpt2_to_torch_state_dict(gpt_params, TINY).items()
    }
    # Linear_Bridge: nn.Linear(enc_dim -> d_lm), torch (out, in) layout
    sd["bridge.vis_proj.weight"] = torch.tensor(
        rng.randn(32, 24).astype(np.float32) * 0.02
    )
    sd["bridge.vis_proj.bias"] = torch.zeros(32)
    ckpt = tmp_path / "model_best_caption.pt"
    torch.save({"model": sd, "step": 5}, str(ckpt))

    out = main(
        [
            "--gpt-ckpt", str(ckpt),
            "--n-head", "2",
            "--bridge", "linear",
            "--coco-tokens", tokens_dir,
            "--coco-ann", ann_path,
            "--cider-samples", "2",
            "--batch-size", "2",
            "--new-tokens", "4",
        ]
    )
    assert out["ckpt_format"] == "reference-pt"
    assert np.isfinite(out["cider"])
