"""Tokenizer + FineWeb shard loader tests."""

import os

import numpy as np
import pytest

from gpt2_vision_language_tpu.data.tokenizer import (
    ByteFallbackTokenizer,
    LocalBpeTokenizer,
    get_tokenizer,
)
from gpt2_vision_language_tpu.data.fineweb import (
    TokenShardLoader,
    write_synthetic_corpus,
    write_token_shard,
)


def test_byte_fallback_roundtrip():
    tok = ByteFallbackTokenizer()
    s = "Hello, I'm a language model, éàç 你好"
    assert tok.decode(tok.encode(s)) == s
    assert tok.eot_token == 50256
    assert tok.n_vocab == 50257


def test_get_tokenizer_offline():
    tok = get_tokenizer()
    ids = tok.encode("Hello world")
    assert all(0 <= i < 50257 for i in ids)
    assert "Hello world" in tok.decode(ids)


def test_local_bpe(tmp_path):
    """Miniature encoder/merges exercising the BPE algorithm end to end."""
    import json

    # byte-unicode table for ascii letters used below
    b2u = LocalBpeTokenizer._bytes_to_unicode()
    enc = {}
    for tok in ["h", "e", "l", "o", "he", "ll", "hell", "hello", " ", "w",
                "r", "d", "wo", "lo", "<|endoftext|>"]:
        mapped = "".join(b2u[b] for b in tok.encode()) if tok != "<|endoftext|>" else tok
        enc[mapped] = len(enc)
    merges = ["#version 0.2", "h e", "l l", "he ll", "hell o", "w o", "l o"]
    ep = tmp_path / "encoder.json"
    vp = tmp_path / "vocab.bpe"
    ep.write_text(json.dumps(enc))
    vp.write_text("\n".join(merges))
    tok = LocalBpeTokenizer(str(ep), str(vp))
    ids = tok.encode("hello")
    assert len(ids) == 1  # fully merged
    assert tok.decode(ids) == "hello"


def _synthetic_tiktoken():
    tiktoken = pytest.importorskip("tiktoken")
    ranks = {bytes([b]): b for b in range(256)}
    for tok in (b"he", b"ll", b"hell", b"hello", b" w", b"or", b" wor",
                b"ld", b" world"):
        ranks[tok] = len(ranks)
    return tiktoken.Encoding(
        name="synthetic",
        pat_str=r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""",
        mergeable_ranks=ranks,
        special_tokens={"<|endoftext|>": len(ranks)},
    )


def test_bpe_export_recovers_merges():
    """merges_from_mergeable_ranks must reconstruct the exact ordered merge
    list from tiktoken's token->rank map."""
    from gpt2_vision_language_tpu.data.bpe_export import (
        merges_from_mergeable_ranks,
    )

    enc = _synthetic_tiktoken()
    merges = merges_from_mergeable_ranks(enc._mergeable_ranks)
    assert merges == [
        (b"h", b"e"),
        (b"l", b"l"),
        (b"he", b"ll"),
        (b"hell", b"o"),
        (b" ", b"w"),
        (b"o", b"r"),
        (b" w", b"or"),
        (b"l", b"d"),
        (b" wor", b"ld"),
    ]


def test_bpe_export_local_equivalence(tmp_path):
    """export_bpe -> LocalBpeTokenizer must encode identically to the
    tiktoken Encoding it was exported from (the offline proof that the
    exporter + local BPE reproduce tiktoken; the same path serializes the
    real GPT-2 tables on an online machine)."""
    from gpt2_vision_language_tpu.data.bpe_export import export_bpe

    enc = _synthetic_tiktoken()
    export_bpe(str(tmp_path), encoding=enc)
    local = LocalBpeTokenizer(
        str(tmp_path / "encoder.json"), str(tmp_path / "vocab.bpe")
    )
    for s in ("hello", "hello world", "hell or hello", "xyz hello!"):
        assert local.encode(s) == enc.encode(s), s
        assert local.decode(local.encode(s)) == s
    assert local.eot_token == enc._special_tokens["<|endoftext|>"]


def test_bpe_export_from_hf_sources(tmp_path):
    """export_bpe_from_hf must reproduce the tiktoken-derived export from
    both HF formats (tokenizer.json and vocab.json+merges.txt), yielding a
    LocalBpeTokenizer that encodes identically."""
    import json as _json

    from gpt2_vision_language_tpu.data.bpe_export import (
        export_bpe,
        export_bpe_from_hf,
    )

    enc = _synthetic_tiktoken()
    ref_dir = tmp_path / "ref"
    export_bpe(str(ref_dir), encoding=enc)
    ref = LocalBpeTokenizer(
        str(ref_dir / "encoder.json"), str(ref_dir / "vocab.bpe")
    )
    vocab = _json.loads((ref_dir / "encoder.json").read_text())
    merges = [
        ln
        for ln in (ref_dir / "vocab.bpe").read_text().splitlines()
        if ln and not ln.startswith("#")
    ]

    # HF fast-tokenizer format
    tj = tmp_path / "hf1" / "tokenizer.json"
    tj.parent.mkdir()
    eot = vocab["<|endoftext|>"]
    tj.write_text(
        _json.dumps(
            {
                "model": {
                    "type": "BPE",
                    "vocab": {
                        k: v for k, v in vocab.items() if k != "<|endoftext|>"
                    },
                    "merges": merges,
                },
                "added_tokens": [{"content": "<|endoftext|>", "id": eot}],
            }
        )
    )
    out1 = tmp_path / "out1"
    assert export_bpe_from_hf(str(tj), str(out1)) == "hf-tokenizer-json"

    # classic vocab.json + merges.txt directory
    hf2 = tmp_path / "hf2"
    hf2.mkdir()
    (hf2 / "vocab.json").write_text(_json.dumps(vocab))
    (hf2 / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(merges) + "\n"
    )
    out2 = tmp_path / "out2"
    assert export_bpe_from_hf(str(hf2), str(out2)) == "hf-vocab-merges"

    for out in (out1, out2):
        local = LocalBpeTokenizer(
            str(out / "encoder.json"), str(out / "vocab.bpe")
        )
        for s in ("hello", "hello world", "hell or hello"):
            assert local.encode(s) == ref.encode(s), (out, s)
        assert local.eot_token == ref.eot_token


def test_bpe_export_real_gpt2_equivalence(tmp_path):
    """Full-vocab equivalence vs tiktoken's real GPT-2 (needs network or a
    warm tiktoken cache; skipped air-gapped)."""
    tiktoken = pytest.importorskip("tiktoken")
    try:
        enc = tiktoken.get_encoding("gpt2")
    except Exception:
        pytest.skip("tiktoken gpt2 data unavailable (no network)")
    from gpt2_vision_language_tpu.data.bpe_export import export_bpe

    export_bpe(str(tmp_path), encoding=enc)
    local = LocalBpeTokenizer(
        str(tmp_path / "encoder.json"), str(tmp_path / "vocab.bpe")
    )
    assert local.n_vocab == 50257
    for s in (
        "Hello, I'm a language model,",
        "The quick brown fox jumps over 1234 lazy dogs!",
        "  multiple   spaces\nand newlines",
    ):
        assert local.encode(s) == enc.encode(s), s


def test_shard_loader_parity_semantics(tmp_path):
    """Striding/wrapping must match DataLoaderLite (train_gpt2.py:154-187)."""
    d = str(tmp_path)
    toks0 = np.arange(0, 1000, dtype=np.uint16)
    toks1 = np.arange(1000, 2000, dtype=np.uint16)
    write_token_shard(os.path.join(d, "x_train_0"), toks0)
    write_token_shard(os.path.join(d, "x_train_1"), toks1)

    B, T = 2, 10
    loader = TokenShardLoader(B, T, rank=0, world_size=2, split="train", data_dir=d)
    x, y = loader.next_batch()
    np.testing.assert_array_equal(x.ravel(), np.arange(0, 20))
    np.testing.assert_array_equal(y.ravel(), np.arange(1, 21))

    r1 = TokenShardLoader(B, T, rank=1, world_size=2, split="train", data_dir=d)
    x1, _ = r1.next_batch()
    np.testing.assert_array_equal(x1.ravel(), np.arange(20, 40))

    # second batch advances by B*T*world = 40
    x, _ = loader.next_batch()
    np.testing.assert_array_equal(x.ravel(), np.arange(40, 60))

    # wrap: shard 0 holds 1000 tokens; stride 40/step, wrap when pos+41 > 1000,
    # i.e. after the batch at pos=920 (the 24th overall). The 25th batch reads
    # shard 1 from pos = B*T*rank = 0.
    for _ in range(23):
        x, _ = loader.next_batch()
    assert x.ravel()[0] == 1000  # first token of shard 1


def test_accum_batch(tmp_path):
    d = str(tmp_path)
    write_token_shard(os.path.join(d, "t_train_0"), np.arange(5000, dtype=np.uint16))
    loader = TokenShardLoader(2, 8, split="train", data_dir=d)
    xs, ys = loader.next_accum_batch(3)
    assert xs.shape == (3, 2, 8)
    l2 = TokenShardLoader(2, 8, split="train", data_dir=d)
    for i in range(3):
        x, y = l2.next_batch()
        np.testing.assert_array_equal(xs[i], x)
        np.testing.assert_array_equal(ys[i], y)


def test_synthetic_corpus(tmp_path):
    write_synthetic_corpus(str(tmp_path), shard_tokens=4096, n_train=2, n_val=1)
    loader = TokenShardLoader(4, 32, split="val", data_dir=str(tmp_path))
    x, y = loader.next_batch()
    assert x.shape == (4, 32)
    assert x.max() < 50257


def test_synthetic_corpus_markov_structure(tmp_path):
    """markov corpus: odd positions are a deterministic function of the
    preceding even position (the learnable structure the sustained-run
    loss curve demonstrates), consistent across train and val shards."""
    import numpy as np

    write_synthetic_corpus(
        str(tmp_path), shard_tokens=8192, n_train=1, n_val=1, kind="markov"
    )
    mapping = {}
    for split in ("train", "val"):
        toks = np.load(tmp_path / f"edufineweb_{split}_000000.npy")
        pairs = toks.reshape(-1, 2)
        for a, b in pairs:
            assert mapping.setdefault(int(a), int(b)) == int(b)
    # injective on the observed support (restriction of a permutation)
    vals = list(mapping.values())
    assert len(set(vals)) == len(vals)


def test_coco_batcher_determinism(tmp_path):
    """Same seeds -> identical epoch order and caption choices (input
    pipeline determinism, SURVEY.md §7 hard parts)."""
    from gpt2_vision_language_tpu.data.coco import (
        CocoBatcher,
        CocoClipTokensDataset,
        write_synthetic_coco,
    )
    from gpt2_vision_language_tpu.data.tokenizer import ByteFallbackTokenizer

    root = str(tmp_path)
    write_synthetic_coco(root, split="val", n_images=12, n_tokens=5, enc_dim=8)
    mk = lambda: CocoBatcher(
        CocoClipTokensDataset(
            os.path.join(root, "clip_feats", "val"),
            os.path.join(root, "annotations", "captions_val2017.json"),
            ByteFallbackTokenizer(),
            max_len=8,
            seed=3,
        ),
        batch_size=4,
        seed=11,
    )
    b1, b2 = mk(), mk()
    for _ in range(6):  # crosses an epoch boundary (reshuffle)
        r1 = b1.next_index_batch()
        r2 = b2.next_index_batch()
        for a, b in zip(r1, r2):
            np.testing.assert_array_equal(a, b)


def test_coco_batcher_fixed_size_tail(tmp_path):
    """drop_last=False epoch tails wrap into the next epoch so every batch
    is exactly B rows (static shapes; real COCO val 5000 % 128 != 0)."""
    from gpt2_vision_language_tpu.data.coco import (
        CocoBatcher,
        CocoClipTokensDataset,
        write_synthetic_coco,
    )
    from gpt2_vision_language_tpu.data.tokenizer import ByteFallbackTokenizer

    root = str(tmp_path)
    write_synthetic_coco(root, split="val", n_images=10, n_tokens=5, enc_dim=8)
    ds = CocoClipTokensDataset(
        os.path.join(root, "clip_feats", "val"),
        os.path.join(root, "annotations", "captions_val2017.json"),
        ByteFallbackTokenizer(),
        max_len=8,
    )
    b = CocoBatcher(ds, 4, shuffle=False, drop_last=False)
    shapes = [b.next_index_batch()[0].shape for _ in range(5)]
    assert all(s == (4, 7) for s in shapes)
    # accum stacking over the tail boundary must not crash
    xs, ys, ms, idx = b.next_accum_index_batch(3)
    assert xs.shape == (3, 4, 7)
    # reset() rewinds to epoch start: same leading window every validation
    b2 = CocoBatcher(ds, 4, shuffle=False, drop_last=False)
    first = b2.next_index_batch()[3]
    b2.next_index_batch()
    b2.reset()
    np.testing.assert_array_equal(b2.next_index_batch()[3], first)


def test_flash_block_fit():
    """Block picking pads T up instead of hunting for divisors: any T works,
    block <= wanted, always a 128 multiple."""
    from gpt2_vision_language_tpu.ops.flash_attention import (
        _pick_block,
        _round_up,
    )

    assert _pick_block(1024, 512) == 512
    assert _pick_block(768, 512) == 512  # padded 768 -> 1024, two blocks
    assert _pick_block(65, 512) == 128  # caption path: one padded block
    assert _pick_block(640, 512) == 512
    assert _round_up(65, 128) == 128 and _round_up(1000, 512) == 1024


def test_loader_skips_undersized_shards(tmp_path):
    """Shards smaller than one read window (incl. the FIRST one) are skipped
    instead of crashing the reshape mid-run; all-undersized raises."""
    d = str(tmp_path)
    write_token_shard(os.path.join(d, "a_train_0"), np.arange(10, dtype=np.uint16))
    write_token_shard(os.path.join(d, "b_train_1"), np.arange(500, dtype=np.uint16))
    loader = TokenShardLoader(2, 10, split="train", data_dir=d)
    for _ in range(50):  # rotates; must never enter the 10-token shard
        x, _ = loader.next_batch()
        assert x.shape == (2, 10)
    import pytest as _pytest

    d2 = str(tmp_path / "allsmall")
    os.makedirs(d2)
    write_token_shard(os.path.join(d2, "t_train_0"), np.arange(5, dtype=np.uint16))
    with _pytest.raises(ValueError, match="full window"):
        TokenShardLoader(2, 10, split="train", data_dir=d2)


@pytest.mark.parametrize("rank,world", [(0, 1), (1, 2)])
def test_loader_seek_matches_replay(tmp_path, rank, world):
    """seek(n) must land exactly where n next_batch() calls would: within a
    shard, across the shard wrap, and across whole-epoch wraps (resume
    fast-forward — the reference restarts its loader at shard 0)."""
    d = str(tmp_path / "corpus")
    write_synthetic_corpus(
        d, vocab_size=64, shard_tokens=1 << 12, n_train=3, n_val=1
    )
    mk = lambda: TokenShardLoader(
        2, 8, rank=rank, world_size=world, split="train", data_dir=d,
        use_native=False,
    )
    # per-shard capacity at world=2/rank=1: (4096-16-33)//32+1 = 127
    for n in [0, 1, 126, 127, 128, 380, 381, 500]:
        ref = mk()
        for _ in range(n):
            ref.next_batch()
        ref_state = (ref.current_shard, ref.pos)
        xr, yr = ref.next_batch()
        fast = mk()
        fast.seek(n)
        assert (fast.current_shard, fast.pos) == ref_state
        xf, yf = fast.next_batch()
        np.testing.assert_array_equal(xf, xr, err_msg=f"n={n}")
        np.testing.assert_array_equal(yf, yr, err_msg=f"n={n}")
