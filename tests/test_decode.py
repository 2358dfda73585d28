"""KV-cached decode must reproduce full-re-forward generation bitwise."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt2_vision_language_tpu.core.config import GPTConfig
from gpt2_vision_language_tpu.core.precision import FP32_POLICY
from gpt2_vision_language_tpu.infer.decode import Decoder
from gpt2_vision_language_tpu.infer.sampling import (
    greedy,
    sample_top_k,
    sample_top_p,
)
from gpt2_vision_language_tpu.models import gpt2

SMALL = GPTConfig(block_size=64, vocab_size=128, n_layer=2, n_head=2, n_embd=32)


def _uncached_generate(params, prompt, n_new, rng, sample_fn):
    """Reference loop: full re-forward per token (train_gpt2.py:440-449),
    consuming rng exactly like Decoder."""
    seq = prompt
    for _ in range(n_new):
        logits, _ = gpt2.apply(params, seq, SMALL, policy=FP32_POLICY)
        rng, sub = jax.random.split(rng)
        nxt = sample_fn(sub, logits[:, -1, :])
        seq = jnp.concatenate([seq, nxt[:, None]], axis=1)
    return seq[:, prompt.shape[1]:]


@pytest.mark.parametrize(
    "sample_fn", [greedy, sample_top_k, sample_top_p], ids=["greedy", "topk", "topp"]
)
def test_cached_equals_uncached(sample_fn):
    params = gpt2.init(jax.random.PRNGKey(0), SMALL)
    prompt = jnp.asarray([[5, 10, 15], [7, 3, 1]], jnp.int32)
    rng = jax.random.PRNGKey(123)

    ref = _uncached_generate(params, prompt, 8, rng, sample_fn)
    dec = Decoder(SMALL, policy=FP32_POLICY, sample_fn=sample_fn)
    out, _ = dec.generate(params, prompt, 8, rng)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_cached_with_visual_prefix():
    """Prefix embeds occupy cache slots but no wpe positions — text positions
    restart at 0 (gpt2_linear/model.py:197-200)."""
    params = gpt2.init(jax.random.PRNGKey(1), SMALL)
    b, m, d = 2, 5, SMALL.n_embd
    prefix = jax.random.normal(jax.random.PRNGKey(2), (b, m, d), jnp.float32)
    prompt = jnp.asarray([[4, 9], [11, 2]], jnp.int32)
    rng = jax.random.PRNGKey(7)

    # uncached reference: concat [prefix, wte(ids)+wpe(0..T)] then run blocks
    def uncached_logits(seq_ids):
        t = seq_ids.shape[1]
        txt = gpt2.embed(params["wte"], seq_ids) + gpt2.embed(
            params["wpe"], jnp.arange(t)
        )
        full = jnp.concatenate([prefix, txt], axis=1)
        return gpt2.forward_embeds(params, full, SMALL, policy=FP32_POLICY)

    seq = prompt
    rng_ref = rng
    for _ in range(6):
        logits = uncached_logits(seq)
        rng_ref, sub = jax.random.split(rng_ref)
        nxt = greedy(sub, logits[:, -1, :])
        seq = jnp.concatenate([seq, nxt[:, None]], axis=1)
    ref = seq[:, prompt.shape[1]:]

    dec = Decoder(SMALL, policy=FP32_POLICY, sample_fn=greedy)
    out, _ = dec.generate(params, prompt, 6, rng, prefix_embeds=prefix)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_topk_matches_reference_distribution():
    """top-k sampler restricted support: all samples must come from the
    top-50 ids (train_gpt2.py:446-448)."""
    rng = jax.random.PRNGKey(0)
    logits = jax.random.normal(rng, (4, 128)) * 3
    top50 = set(np.asarray(jax.lax.top_k(logits, 50)[1]).ravel().tolist())
    for i in range(20):
        s = sample_top_k(jax.random.PRNGKey(i), logits)
        assert all(int(x) in top50 for x in np.asarray(s))


def test_topp_cutoff_semantics():
    """With one dominant token, nucleus p=0.9 must nearly always pick it;
    the shifted cutoff keeps the first token beyond the boundary eligible."""
    logits = jnp.asarray([[10.0] + [0.0] * 63])
    picks = {int(sample_top_p(jax.random.PRNGKey(i), logits)[0]) for i in range(20)}
    assert picks == {0}
