"""End-to-end image->caption CLI (random weights, tiny CLIP) on CPU."""

import numpy as np
import pytest


def test_caption_cli_end_to_end(tmp_path, capsys):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    rng = np.random.RandomState(0)
    paths = []
    for i, (w, h) in enumerate([(50, 40), (32, 64)]):  # non-square on purpose
        p = str(tmp_path / f"img{i}.jpg")
        Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(p)
        paths.append(p)

    from gpt2_vision_language_tpu.cli.caption import main

    # tiny CLIP variant keeps this fast; random weights everywhere
    main(paths + ["--variant", "tiny", "--new-tokens", "4"])
    out = capsys.readouterr().out
    assert "img0.jpg: A photo of" in out
    assert "img1.jpg: A photo of" in out
