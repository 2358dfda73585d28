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


def test_topp_fast_kept_set_matches_sorted():
    """sample_top_p_fast (bisection threshold, no sort) must keep exactly
    the sorted path's nucleus on random logits and on exact ties; a single
    boundary-token difference is tolerated only when the cumulative mass
    lands within float rounding of p (documented in sampling.py)."""
    from gpt2_vision_language_tpu.infer.sampling import sample_top_p_fast

    def kept_sorted(probs, p):
        neg, idx = jax.lax.sort_key_val(
            -probs,
            jnp.broadcast_to(jnp.arange(probs.shape[-1]), probs.shape),
            dimension=-1,
            is_stable=True,
        )
        cum = jnp.cumsum(-neg, axis=-1)
        cut = jnp.concatenate(
            [jnp.zeros_like(cum[..., :1], bool), (cum > p)[..., :-1]], -1
        )
        return [
            frozenset(
                int(i)
                for i, c in zip(np.asarray(idx[b]), np.asarray(cut[b]))
                if not c
            )
            for b in range(probs.shape[0])
        ]

    def kept_fast(probs, p):
        # the PRODUCTION mask (8-way bisection since r4 decode round 4)
        from gpt2_vision_language_tpu.infer.sampling import top_p_keep_mask

        keep = top_p_keep_mask(probs, p)
        return [
            frozenset(np.nonzero(np.asarray(keep[i]))[0].tolist())
            for i in range(probs.shape[0])
        ]

    rng = np.random.RandomState(7)
    for trial in range(30):
        v = int(rng.choice([16, 257, 2048]))
        logits = rng.randn(2, v).astype(np.float32) * float(
            rng.choice([0.1, 1.0, 5.0])
        )
        if trial % 3 == 0:
            logits = np.round(logits * 2) / 2  # exact ties
        p = float(rng.choice([0.1, 0.9, 0.99]))
        probs = jax.nn.softmax(jnp.asarray(logits) / 0.8, axis=-1)
        for a, b in zip(kept_sorted(probs, p), kept_fast(probs, p)):
            assert len(a ^ b) <= 1, (trial, len(a), len(b), a ^ b)

    # the dominant-token corner: identical picks to sample_top_p
    logits = jnp.asarray([[10.0] + [0.0] * 63])
    picks = {
        int(sample_top_p_fast(jax.random.PRNGKey(i), logits)[0])
        for i in range(20)
    }
    assert picks == {0}


def test_topp_fast_under_jit():
    """EVERY production caller runs the fast sampler under jit
    (infer/decode.py jits _first_sample/_decode_loop) — the r4 snapshot
    regression (a traced `.view(int32)` feeding a Python `int()`) passed
    the eager-only pin and crashed all jitted callers. Pin: (a) the
    jitted mask is bit-identical to the eager mask, (b) the jitted
    sampler draws the same tokens as the eager sampler, across p values
    including the boundary-heavy 0.999."""
    from gpt2_vision_language_tpu.infer.sampling import (
        sample_top_p_fast,
        top_p_keep_mask,
    )

    rng = np.random.RandomState(11)
    logits = jnp.asarray(rng.randn(4, 1024).astype(np.float32) * 2.0)
    probs = jax.nn.softmax(logits / 0.8, axis=-1)
    for p in (0.5, 0.9, 0.999):
        eager = top_p_keep_mask(probs, p)
        jitted = jax.jit(top_p_keep_mask, static_argnums=1)(probs, p)
        np.testing.assert_array_equal(np.asarray(jitted), np.asarray(eager))
        key = jax.random.PRNGKey(42)
        tok_e = sample_top_p_fast(key, logits, p=p)
        tok_j = jax.jit(
            lambda k, lg, p=p: sample_top_p_fast(k, lg, p=p)
        )(key, logits)
        np.testing.assert_array_equal(np.asarray(tok_j), np.asarray(tok_e))


def test_decoder_with_fast_topp_smoke():
    """The production configuration: Decoder(sample_fn=sample_top_p_fast)
    exactly as eval/caption_eval.py:59 builds it — generate must run
    (this jits the sampler inside _first_sample and the scan decode loop)
    and must match the uncached re-forward reference stream."""
    from gpt2_vision_language_tpu.infer.sampling import sample_top_p_fast

    params = gpt2.init(jax.random.PRNGKey(0), SMALL)
    prompt = jnp.asarray([[5, 10, 15], [7, 3, 1]], jnp.int32)
    rng = jax.random.PRNGKey(123)
    ref = _uncached_generate(params, prompt, 8, rng, sample_top_p_fast)
    dec = Decoder(SMALL, policy=FP32_POLICY, sample_fn=sample_top_p_fast)
    out, _ = dec.generate(params, prompt, 8, rng)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


# ---- round-4: compute-dtype (bf16) weight storage for serving ----


def test_cast_decode_params_noop_at_fp32_policy():
    from gpt2_vision_language_tpu.infer.decode import cast_decode_params

    params = gpt2.init(jax.random.PRNGKey(0), SMALL)
    cast = cast_decode_params(params, FP32_POLICY)
    for a, b in zip(
        jax.tree_util.tree_leaves(cast), jax.tree_util.tree_leaves(params)
    ):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cast_decode_params_matrix_only_and_logit_parity():
    """bf16 storage casts matrices (incl. wte/wpe), keeps LN/biases fp32,
    and produces prefill logits within bf16 rounding of the fp32-stored
    run under the bf16 compute policy (matmuls are bit-identical — only
    the embedding add rounds per-operand)."""
    from gpt2_vision_language_tpu.core.precision import DEFAULT_POLICY
    from gpt2_vision_language_tpu.infer.decode import cast_decode_params

    params = gpt2.init(jax.random.PRNGKey(0), SMALL)
    cast = cast_decode_params(params, DEFAULT_POLICY)
    assert cast["wte"].dtype == jnp.bfloat16
    assert cast["wpe"].dtype == jnp.bfloat16
    assert cast["blocks"]["attn"]["wqkv"].dtype == jnp.bfloat16
    assert cast["blocks"]["attn"]["bqkv"].dtype == jnp.float32
    assert cast["blocks"]["ln1"]["scale"].dtype == jnp.float32
    assert cast["lnf"]["bias"].dtype == jnp.float32

    ids = jnp.asarray([[5, 10, 15, 2], [7, 3, 1, 9]], jnp.int32)
    ref, _ = gpt2.apply(params, ids, SMALL, policy=DEFAULT_POLICY)
    got, _ = gpt2.apply(cast, ids, SMALL, policy=DEFAULT_POLICY)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=5e-2, rtol=5e-2,
    )


def test_bf16_stored_generation_matches_fp32_stored():
    """Greedy token streams under the bf16 compute policy: bf16-stored
    weights must reproduce the fp32-stored stream (tiny model, short
    horizon — embedding-add rounding is far below argmax margins here)."""
    from gpt2_vision_language_tpu.core.precision import DEFAULT_POLICY
    from gpt2_vision_language_tpu.infer.decode import cast_decode_params

    params = gpt2.init(jax.random.PRNGKey(1), SMALL)
    prompt = jnp.asarray([[5, 10, 15]], jnp.int32)
    dec = Decoder(SMALL, policy=DEFAULT_POLICY, sample_fn=greedy)
    ref, _ = dec.generate(params, prompt, 8, jax.random.PRNGKey(0))
    got, _ = dec.generate(
        cast_decode_params(params, DEFAULT_POLICY), prompt, 8,
        jax.random.PRNGKey(0),
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
