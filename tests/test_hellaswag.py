"""HellaSwag renderer + scorer tests with a synthetic dataset."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt2_vision_language_tpu.core.config import GPTConfig
from gpt2_vision_language_tpu.core.precision import FP32_POLICY
from gpt2_vision_language_tpu.data.tokenizer import ByteFallbackTokenizer
from gpt2_vision_language_tpu.eval.hellaswag import (
    HellaSwagEvaluator,
    iterate_examples,
    most_likely_row,
    render_example,
)
from gpt2_vision_language_tpu.models import gpt2

SMALL = GPTConfig(block_size=64, vocab_size=128, n_layer=2, n_head=2, n_embd=32)


def _write_dataset(path, n=6):
    exs = []
    for i in range(n):
        exs.append(
            {
                "ctx": f"The number {i} is",
                "endings": ["small", "large!", "a word", "nothing at all"],
                "label": i % 4,
            }
        )
    with open(path, "w") as f:
        for e in exs:
            f.write(json.dumps(e) + "\n")


def test_render_example():
    tok = ByteFallbackTokenizer()
    ex = {"ctx": "ab", "endings": ["c", "de", "f", "ghi"], "label": 2}
    tokens, mask, label = render_example(ex, tok)
    assert tokens.shape == (4, 2 + 1 + 3)  # ctx + " x" of longest ending
    assert label == 2
    # mask covers only the ending region (leading-space token included)
    assert mask[0].sum() == 2  # " c"
    assert mask[3].sum() == 4  # " ghi"
    assert not mask[:, :2].any()


def test_most_likely_row_picks_highest_likelihood():
    """Give candidate 1's tokens high logits in its completion region."""
    tokens = np.zeros((4, 6), np.int32)
    tokens[1, :] = [1, 2, 3, 4, 5, 6]
    mask = np.zeros((4, 6), bool)
    mask[:, 2:] = True
    logits = np.full((4, 6, 16), -5.0, np.float32)
    for t in range(5):
        logits[1, t, tokens[1, t + 1]] = 10.0  # row 1 predicts itself
    pred = most_likely_row(
        jnp.asarray(tokens), jnp.asarray(mask), jnp.asarray(logits)
    )
    assert int(pred) == 1


def test_evaluator_runs(tmp_path):
    _write_dataset(tmp_path / "hellaswag_val.jsonl")
    tok = ByteFallbackTokenizer()
    params = gpt2.init(jax.random.PRNGKey(0), SMALL)
    ev = HellaSwagEvaluator(SMALL, policy=FP32_POLICY, max_len=48, batch_examples=4)
    correct, total = ev.evaluate(params, tok, data_dir=str(tmp_path))
    assert total == 6
    assert 0 <= correct <= 6


def test_evaluator_scores_long_examples_full_length(tmp_path):
    """A >256-token example must be scored unclipped (the reference forwards
    each example at full length, train_gpt2.py:398-409) and batch padding
    must not change the prediction."""
    cfg = GPTConfig(block_size=512, vocab_size=128, n_layer=1, n_head=2, n_embd=32)
    tok = ByteFallbackTokenizer()
    params = gpt2.init(jax.random.PRNGKey(0), cfg)
    ex = {"ctx": "x" * 300, "endings": ["aa", "bb", "cc", "dd"], "label": 0}
    tokens, mask, _ = render_example(ex, tok)
    assert tokens.shape[1] > 256
    logits, _ = gpt2.apply(params, jnp.asarray(tokens), cfg, policy=FP32_POLICY)
    pred = int(most_likely_row(jnp.asarray(tokens), jnp.asarray(mask), logits))
    ex["label"] = pred
    with open(tmp_path / "hellaswag_val.jsonl", "w") as f:
        f.write(json.dumps(ex) + "\n")
    ev = HellaSwagEvaluator(cfg, policy=FP32_POLICY, batch_examples=2)
    correct, total = ev.evaluate(params, tok, data_dir=str(tmp_path))
    assert (correct, total) == (1, 1)
    assert ev.skipped_too_long == 0


def test_evaluator_skips_overlong_examples(tmp_path):
    """Examples longer than max_len are excluded from (correct, total), not
    scored truncated (truncation can flip predictions)."""
    _write_dataset(tmp_path / "hellaswag_val.jsonl", n=3)
    with open(tmp_path / "hellaswag_val.jsonl", "a") as f:
        f.write(
            json.dumps(
                {"ctx": "y" * 200, "endings": ["a", "b", "c", "d"], "label": 1}
            )
            + "\n"
        )
    tok = ByteFallbackTokenizer()
    params = gpt2.init(jax.random.PRNGKey(0), SMALL)
    ev = HellaSwagEvaluator(SMALL, policy=FP32_POLICY, batch_examples=4)
    correct, total = ev.evaluate(params, tok, data_dir=str(tmp_path))
    assert total == 3
    assert ev.skipped_too_long == 1


def test_evaluator_rank_sharding(tmp_path):
    _write_dataset(tmp_path / "hellaswag_val.jsonl")
    tok = ByteFallbackTokenizer()
    params = gpt2.init(jax.random.PRNGKey(0), SMALL)
    ev = HellaSwagEvaluator(SMALL, policy=FP32_POLICY, max_len=48, batch_examples=4)
    totals = 0
    corrects = 0
    for rank in range(3):
        c, t = ev.evaluate(
            params, tok, data_dir=str(tmp_path), rank=rank, world_size=3
        )
        totals += t
        corrects += c
    c0, t0 = ev.evaluate(params, tok, data_dir=str(tmp_path))
    assert totals == t0 == 6
    assert corrects == c0
