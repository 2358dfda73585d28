"""End-to-end CLIP feature extraction CLI -> dataset consumption."""

import json
import os

import numpy as np
import pytest

from gpt2_vision_language_tpu.data.coco import CocoClipTokensDataset
from gpt2_vision_language_tpu.data.tokenizer import ByteFallbackTokenizer


def _make_fake_coco(root, n=10):
    from PIL import Image

    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, "val2017"), exist_ok=True)
    images, anns = [], []
    rng = np.random.RandomState(0)
    for i in range(n):
        img_id = 500 + i
        fname = f"{img_id:012d}.jpg"
        arr = rng.randint(0, 255, (40, 52, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(root, "val2017", fname))
        images.append({"id": img_id, "file_name": fname})
        anns.append({"image_id": img_id, "id": i, "caption": f"image number {i}"})
    with open(os.path.join(root, "annotations", "captions_val2017.json"), "w") as f:
        json.dump({"images": images, "annotations": anns}, f)


def test_extract_and_consume(tmp_path):
    from gpt2_vision_language_tpu.cli.extract_clip_features import main

    root = str(tmp_path / "coco")
    out = str(tmp_path / "feats" / "val")
    _make_fake_coco(root, n=10)
    main(
        [
            "--coco-root", root,
            "--split", "val",
            "--out", out,
            "--variant", "tiny",
            "--batch", "4",
            "--rows-per-shard", "3",
        ]
    )
    with open(os.path.join(out, "index.json")) as f:
        index = json.load(f)
    assert len(index) == 10
    shards = sorted(f for f in os.listdir(out) if f.endswith(".npy"))
    assert len(shards) == 4  # 3+3+3+1
    # consumable by the dataset
    ds = CocoClipTokensDataset(
        out,
        os.path.join(root, "annotations", "captions_val2017.json"),
        ByteFallbackTokenizer(),
        max_len=16,
    )
    x, y, m, z = ds[7]
    assert z.shape == (5, 32)  # tiny CLIP: CLS + 2x2 grid, width 32
    assert x.shape == (15,)
    # deterministic features: same row fetched twice is identical
    np.testing.assert_array_equal(ds.features(7), ds.features(7))
