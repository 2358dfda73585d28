"""prepare_fineweb CLI -> TokenShardLoader end to end."""

import json
import os

import numpy as np

from gpt2_vision_language_tpu.data.fineweb import TokenShardLoader
from gpt2_vision_language_tpu.data.tokenizer import get_tokenizer


def test_prepare_and_load(tmp_path):
    from gpt2_vision_language_tpu.cli.prepare_fineweb import main

    src = tmp_path / "docs.jsonl"
    with open(src, "w") as f:
        for i in range(30):
            f.write(json.dumps({"text": f"document number {i} with some words"}) + "\n")
    out = str(tmp_path / "shards")
    main(["--input", str(src), "--out", out, "--shard-tokens", "128",
          "--val-shards", "1"])

    names = sorted(os.listdir(out))
    assert any("_val_" in n for n in names)
    assert any("_train_" in n for n in names)

    loader = TokenShardLoader(2, 8, split="train", data_dir=out)
    x, y = loader.next_batch()
    assert x.shape == (2, 8)
    np.testing.assert_array_equal(x[0, 1:], y[0, :-1])  # shifted pair

    # EOT terminators present between documents
    tok = get_tokenizer()
    arr = np.load(os.path.join(out, [n for n in names if "_train_" in n][0]))
    assert (arr == tok.eot_token % (1 << 16)).any()
