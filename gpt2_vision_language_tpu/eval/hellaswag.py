"""HellaSwag multiple-choice evaluation.

The reference imports `render_example, iterate_examples` from a hellaswag
module that is NOT in its repo (train_gpt2.py:10; SURVEY.md §6 defect c) —
it is Karpathy build-nanogpt's downloader/renderer. This module provides the
equivalent, reading a local jsonl (`$HELLASWAG_DIR/hellaswag_{split}.jsonl`,
no network), and a TPU-native scorer:

  * rendering: context tokens + " " + ending tokens per candidate, bool mask
    over the ending region, 4 rows padded to a common length;
  * scoring: per-token CE on shifted logits, masked mean over the completion,
    argmin over the 4 candidates (reference get_most_likely_row,
    train_gpt2.py:190-202);
  * execution: examples are padded into fixed-size batches and scored by ONE
    jitted function (static shapes) instead of a Python loop of one
    4-row forward per example (train_gpt2.py:398-409);
  * multi-host sharding round-robin by rank with summed counts
    (train_gpt2.py:399,410-416) — here a simple index stride + psum-free
    host-side sum since each process sees its own slice.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import GPTConfig
from ..core.precision import Policy, DEFAULT_POLICY
from ..models import gpt2


def iterate_examples(split: str, data_dir: Optional[str] = None) -> Iterator[dict]:
    data_dir = data_dir or os.environ.get("HELLASWAG_DIR", "hellaswag")
    path = os.path.join(data_dir, f"hellaswag_{split}.jsonl")
    with open(path) as f:
        for line in f:
            if line.strip():
                yield json.loads(line)


def render_example(example: dict, tokenizer):
    """-> (tokens (4, L) int32, mask (4, L) bool, label int). Rows padded to
    the longest candidate; pad tokens are masked out."""
    ctx = tokenizer.encode(example["ctx"])
    rows, masks = [], []
    for end in example["endings"]:
        end_tok = tokenizer.encode(" " + end)
        rows.append(ctx + end_tok)
        masks.append([0] * len(ctx) + [1] * len(end_tok))
    maxlen = max(len(r) for r in rows)
    tokens = np.zeros((4, maxlen), np.int32)
    mask = np.zeros((4, maxlen), bool)
    for i, (r, m) in enumerate(zip(rows, masks)):
        tokens[i, : len(r)] = r
        mask[i, : len(m)] = m
    return tokens, mask, int(example["label"])


def most_likely_row(tokens, mask, logits):
    """Masked-mean shifted CE argmin (train_gpt2.py:190-202). tokens (N, L),
    mask (N, L) over completion tokens, logits (N, L, V)."""
    shift_logits = logits[:, :-1, :]
    shift_tokens = tokens[:, 1:]
    # upcast inside the reduce / after the gather: a gather OPERAND must be
    # materialized, so gathering from the f32 upcast makes XLA write a full
    # f32 copy of the logits first (r5 trace finding in ops/fused_ce.py);
    # f32-of-bf16 is exact, so this is bitwise-identical
    logz = jax.scipy.special.logsumexp(
        shift_logits.astype(jnp.float32), axis=-1
    )
    gold = jnp.take_along_axis(
        shift_logits, shift_tokens[..., None], axis=-1
    ).squeeze(-1).astype(jnp.float32)
    losses = logz - gold
    shift_mask = mask[:, 1:]
    avg = jnp.sum(losses * shift_mask, axis=-1) / jnp.maximum(
        jnp.sum(shift_mask, axis=-1), 1
    )
    return jnp.argmin(avg)


class HellaSwagEvaluator:
    """Batched jitted evaluation over bucketed (batch, 4, L) shapes.

    Examples are scored at FULL length (the reference forwards each example
    unclipped, train_gpt2.py:398-409): each batch is padded to the smallest
    width bucket >= its longest row, so the jit compiles at most
    len(buckets) programs. Examples longer than max_len (default: the
    model's block_size, the hard ceiling) are SKIPPED and counted — never
    scored truncated, which could flip predictions."""

    def __init__(
        self,
        cfg: GPTConfig,
        *,
        policy: Policy = DEFAULT_POLICY,
        max_len: Optional[int] = None,
        batch_examples: int = 8,
    ):
        self.cfg = cfg
        self.policy = policy
        self.max_len = max_len or cfg.block_size
        self.batch = batch_examples
        self.skipped_too_long = 0  # examples whose tokens exceeded max_len
        self.buckets = sorted(
            {b for b in (64, 128, 256, 512) if b < self.max_len}
            | {self.max_len}
        )
        self._predict = jax.jit(self._predict_impl)

    def _predict_impl(self, params, tokens, mask):
        """tokens (N, 4, L) -> predicted candidate per example (N,)."""
        n = tokens.shape[0]
        flat = tokens.reshape(n * 4, -1)
        logits, _ = gpt2.apply(params, flat, self.cfg, policy=self.policy)
        logits = logits.reshape(n, 4, flat.shape[1], -1)

        def per_example(tok4, m4, lg4):
            return most_likely_row(tok4, m4, lg4)

        return jax.vmap(per_example)(tokens, mask, logits)

    def evaluate(
        self,
        params,
        tokenizer,
        *,
        split: str = "val",
        data_dir: Optional[str] = None,
        rank: int = 0,
        world_size: int = 1,
        limit: Optional[int] = None,
    ):
        """-> (num_correct, num_total) on this rank's shard of examples.

        Multi-host (world_size > 1): params are global (non-addressable)
        arrays, so every process MUST execute the same jitted programs the
        same number of times — the evaluator uses one fixed width and pads
        each rank's flush count to a common upper bound with dummy batches
        (discarded), the SPMD analogue of the reference's round-robin shard
        + all-reduce (train_gpt2.py:399,410-416). The caller sums
        (correct, total) across processes."""
        tok_buf, mask_buf, labels = [], [], []
        correct = total = 0
        # per-eval counter: the evaluator is reused across the training
        # run, and a cumulative count would over-report in every warning
        # after the first eval
        self.skipped_too_long = 0
        lockstep = world_size > 1

        def flush():
            nonlocal correct, total
            n = len(tok_buf)
            if lockstep or n == 0:
                width = self.max_len
            else:
                lmax = max(t.shape[1] for t in tok_buf)
                width = next(b for b in self.buckets if b >= lmax)
            tokens = np.zeros((self.batch, 4, width), np.int32)
            mask = np.zeros((self.batch, 4, width), bool)
            for i, (t, m) in enumerate(zip(tok_buf, mask_buf)):
                L = t.shape[1]
                tokens[i, :, :L] = t
                mask[i, :, :L] = m
            preds = np.asarray(self._predict(params, tokens, mask))
            for i in range(n):
                total += 1
                correct += int(preds[i] == labels[i])
            tok_buf.clear()
            mask_buf.clear()
            labels.clear()

        n_examples = 0
        flushes = 0
        for i, ex in enumerate(iterate_examples(split, data_dir)):
            if limit is not None and i >= limit:
                break
            n_examples += 1
            if i % world_size != rank:
                continue
            t, m, label = render_example(ex, tokenizer)
            if t.shape[1] > self.max_len:
                self.skipped_too_long += 1
                continue
            tok_buf.append(t)
            mask_buf.append(m)
            labels.append(label)
            if len(tok_buf) == self.batch:
                flush()
                flushes += 1
        if tok_buf:
            flush()
            flushes += 1
        if lockstep:
            # upper bound on ANY rank's flush count (skips only reduce it)
            per_rank = -(-n_examples // world_size)
            need = -(-per_rank // self.batch)
            while flushes < need:
                flush()  # dummy: empty buffers, results discarded
                flushes += 1
        if self.skipped_too_long:
            print(
                f"[hellaswag] WARNING: {self.skipped_too_long} examples "
                f"exceeded max_len={self.max_len} and were skipped "
                "(not scored)"
            )
        return correct, total
