"""Fused chunked lm_head+CE (ops/fused_ce.py): value + gradient parity with
the unfused logits path, ignore_index and mask semantics, model-level loss."""

import jax
import jax.numpy as jnp
import numpy as np

from gpt2_vision_language_tpu.core.config import GPTConfig
from gpt2_vision_language_tpu.core.precision import FP32_POLICY
from gpt2_vision_language_tpu.models import gpt2
from gpt2_vision_language_tpu.ops.fused_ce import fused_linear_ce

SMALL = GPTConfig(block_size=32, vocab_size=96, n_layer=2, n_head=2, n_embd=32)


def _naive_nll(x, w, t):
    logits = (x @ w.T).astype(jnp.float32)
    logz = jax.scipy.special.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, t[:, None], axis=-1)[:, 0]
    return logz - gold


def test_nll_matches_naive():
    rng = np.random.RandomState(0)
    n, d, v = 24, 16, 40
    x = jnp.asarray(rng.randn(n, d), jnp.float32)
    w = jnp.asarray(rng.randn(v, d), jnp.float32) * 0.1
    t = jnp.asarray(rng.randint(0, v, n), jnp.int32)
    for chunks in (1, 3, 8):  # incl. non-divisible (24 % 8 == 0, 24 % 3 == 0,
        # and 5 below pads)
        nll = fused_linear_ce(x, w, t, n_chunks=chunks, policy=FP32_POLICY)
        np.testing.assert_allclose(
            np.asarray(nll), np.asarray(_naive_nll(x, w, t)), rtol=1e-5
        )
    nll = fused_linear_ce(x, w, t, n_chunks=5, policy=FP32_POLICY)  # 24 % 5 != 0
    np.testing.assert_allclose(
        np.asarray(nll), np.asarray(_naive_nll(x, w, t)), rtol=1e-5
    )


def test_grads_match_naive():
    rng = np.random.RandomState(1)
    n, d, v = 20, 16, 40
    x = jnp.asarray(rng.randn(n, d), jnp.float32)
    w = jnp.asarray(rng.randn(v, d), jnp.float32) * 0.1
    t = jnp.asarray(rng.randint(0, v, n), jnp.int32)
    valid = jnp.asarray(rng.rand(n) > 0.3)

    def fused(x, w):
        nll = fused_linear_ce(x, w, t, n_chunks=3, policy=FP32_POLICY)
        return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)

    def naive(x, w):
        nll = _naive_nll(x, w, t)
        return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)

    lf, (gx_f, gw_f) = jax.value_and_grad(fused, argnums=(0, 1))(x, w)
    ln, (gx_n, gw_n) = jax.value_and_grad(naive, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(float(lf), float(ln), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_n), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_n), rtol=1e-4, atol=1e-6)


def test_model_loss_matches_apply():
    """gpt2.loss (fused) == gpt2.apply loss (unfused) incl. -100 ignore and
    target masks; grads agree too."""
    params = gpt2.init(jax.random.PRNGKey(0), SMALL)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randint(0, 96, (2, 16)), jnp.int32)
    y = np.roll(np.asarray(x), -1, axis=-1)
    y[0, :5] = -100  # ignore_index region
    y = jnp.asarray(y)
    mask = jnp.asarray(rng.rand(2, 16) > 0.2)

    def fused(p):
        return gpt2.loss(
            p, x, SMALL, targets=y, target_mask=mask, policy=FP32_POLICY,
            ce_chunks=4,
        )

    def unfused(p):
        _, l = gpt2.apply(
            p, x, SMALL, targets=y, target_mask=mask, policy=FP32_POLICY
        )
        return l

    lf, gf = jax.value_and_grad(fused)(params)
    lu, gu = jax.value_and_grad(unfused)(params)
    np.testing.assert_allclose(float(lf), float(lu), rtol=1e-6)
    for kf, ku in zip(jax.tree.leaves(gf), jax.tree.leaves(gu)):
        np.testing.assert_allclose(
            np.asarray(kf), np.asarray(ku), rtol=1e-4, atol=1e-6
        )


def test_all_ignored_gives_zero_loss():
    params = gpt2.init(jax.random.PRNGKey(0), SMALL)
    x = jnp.zeros((1, 8), jnp.int32)
    y = jnp.full((1, 8), -100, jnp.int32)
    l = gpt2.loss(params, x, SMALL, targets=y, policy=FP32_POLICY)
    assert float(l) == 0.0
    g = jax.grad(lambda p: gpt2.loss(p, x, SMALL, targets=y, policy=FP32_POLICY))(
        params
    )
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in jax.tree.leaves(g))


def test_caption_loss_fused_matches_unfused():
    from gpt2_vision_language_tpu.core.config import BridgeConfig
    from gpt2_vision_language_tpu.models import caption

    cfg = SMALL
    bcfg = BridgeConfig(kind="linear", enc_dim=24, n_queries=4)
    gp = gpt2.init(jax.random.PRNGKey(0), cfg)
    bp = caption.init(jax.random.PRNGKey(1), cfg, bcfg)
    rng = np.random.RandomState(3)
    z = jnp.asarray(rng.randn(2, 4, 24), jnp.float32)
    ids = jnp.asarray(rng.randint(0, 96, (2, 8)), jnp.int32)
    mask = jnp.asarray(rng.rand(2, 8) > 0.3)
    y = jnp.asarray(rng.randint(0, 96, (2, 8)), jnp.int32)
    micro = {"x": ids, "y": y, "mask": mask, "z": z}
    params = {"gpt": gp, "bridge": bp}

    lf = caption.loss_fn_factory(cfg, bcfg, policy=FP32_POLICY, fused_ce=True)
    lu = caption.loss_fn_factory(cfg, bcfg, policy=FP32_POLICY, fused_ce=False)
    np.testing.assert_allclose(
        float(lf(params, micro)), float(lu(params, micro)), rtol=1e-6
    )
    gf = jax.grad(lambda p: lf(p, micro))(params)
    gu = jax.grad(lambda p: lu(p, micro))(params)
    for a, b in zip(jax.tree.leaves(gf["bridge"]), jax.tree.leaves(gu["bridge"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


# ---- round-4: Pallas stats-in-epilogue forward (interpret mode) ----


def test_pallas_fwd_matches_xla_fwd():
    """The Pallas forward (logits never reach HBM) must match the XLA
    chunked forward in value and in grads through the shared XLA
    backward — fp32 exact-ish, bf16 within loss ulps."""
    from unittest import mock

    from gpt2_vision_language_tpu.core.precision import DEFAULT_POLICY
    from gpt2_vision_language_tpu.ops import fused_ce

    rng = np.random.RandomState(3)
    n, d, v = 512, 128, 384  # (bn, bv) = (512, 384): single + multi tile
    x = jnp.asarray(rng.randn(n, d), jnp.float32) * 0.3
    w = jnp.asarray(rng.randn(v, d), jnp.float32) * 0.05
    t = jnp.asarray(rng.randint(0, v, n), jnp.int32)

    with mock.patch.object(fused_ce, "FORCE_INTERPRET", True):
        for policy, tol in ((FP32_POLICY, 1e-5), (DEFAULT_POLICY, 2e-2)):
            ref = fused_linear_ce(x, w, t, n_chunks=4, policy=policy, impl="xla")
            got = fused_linear_ce(
                x, w, t, n_chunks=4, policy=policy, impl="pallas"
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=tol, atol=tol
            )

            def loss(x, w, impl):
                return jnp.mean(
                    fused_linear_ce(
                        x, w, t, n_chunks=4, policy=policy, impl=impl
                    )
                )

            gx_r, gw_r = jax.grad(lambda a, b: loss(a, b, "xla"), (0, 1))(x, w)
            gx_p, gw_p = jax.grad(lambda a, b: loss(a, b, "pallas"), (0, 1))(x, w)
            np.testing.assert_allclose(
                np.asarray(gx_p), np.asarray(gx_r), rtol=tol, atol=tol
            )
            np.testing.assert_allclose(
                np.asarray(gw_p), np.asarray(gw_r), rtol=tol, atol=tol
            )


def test_pallas_fwd_gold_across_tiles():
    """Targets land in every vocab tile (V=640 -> bv=128, 5 tiles); the
    per-tile gold pick must find each row's target exactly once."""
    from unittest import mock

    from gpt2_vision_language_tpu.ops import fused_ce

    rng = np.random.RandomState(4)
    n, d, v = 256, 128, 640
    assert fused_ce._ce_block_sizes(n, d, v) == (256, 128)
    x = jnp.asarray(rng.randn(n, d), jnp.float32) * 0.3
    w = jnp.asarray(rng.randn(v, d), jnp.float32) * 0.05
    # hit every tile, including boundaries
    t = jnp.asarray(
        np.concatenate([
            np.arange(0, 256) % v,
            np.asarray([0, 127, 128, 255, 256, 511, 512, 639] * 32),
        ])[:n],
        jnp.int32,
    )
    with mock.patch.object(fused_ce, "FORCE_INTERPRET", True):
        ref = fused_linear_ce(x, w, t, policy=FP32_POLICY, impl="xla")
        got = fused_linear_ce(x, w, t, policy=FP32_POLICY, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)


def test_pallas_eligibility_gate():
    from gpt2_vision_language_tpu.ops.fused_ce import ce_pallas_eligible

    assert ce_pallas_eligible(8192, 768, 50304)  # the bench shape
    # 1558M: d=1600 is NOT a multiple of 128 — the d axis is not
    # grid-split, so Mosaic lane-pads the (bn, 1600) blocks to 1664 and
    # the gate only requires sublane alignment (d % 16 bf16 / d % 8 fp32;
    # ADVICE r4 #1 — the r4 gate wrongly required d % 128 == 0 here)
    assert ce_pallas_eligible(4096, 1600, 50304)
    assert ce_pallas_eligible(4096, 1280, 50304)  # 774M
    assert not ce_pallas_eligible(100, 768, 50304)  # ragged rows
    assert not ce_pallas_eligible(8192, 100, 50304)  # ragged depth
    assert not ce_pallas_eligible(8192, 768, 50000)  # no 128-divisor tiling
    # fp32 policy: itemsize=4 doubles the VMEM working set (ADVICE r4 #3)
    from gpt2_vision_language_tpu.ops.fused_ce import _ce_block_sizes

    bn_bf16, _ = _ce_block_sizes(4096, 1600, 50304, itemsize=2)
    bn_fp32, _ = _ce_block_sizes(4096, 1600, 50304, itemsize=4)
    assert bn_fp32 <= bn_bf16


def test_pallas_fwd_nonmultiple_depth():
    """d % 128 != 0 (the 1558M class): kernel math must still be exact —
    interpret mode pins the semantics; the on-chip Mosaic lane-padding
    path is validated by tools/ab_ce.py --d 1600 (ROUND_NOTES r5)."""
    from unittest import mock

    from gpt2_vision_language_tpu.ops import fused_ce

    rng = np.random.RandomState(5)
    n, d, v = 256, 144, 384  # 144 % 128 = 16, 144 % 16 = 0 — eligible
    assert fused_ce._ce_block_sizes(n, d, v) == (256, 384)
    x = jnp.asarray(rng.randn(n, d), jnp.float32) * 0.3
    w = jnp.asarray(rng.randn(v, d), jnp.float32) * 0.05
    t = jnp.asarray(rng.randint(0, v, n), jnp.int32)
    with mock.patch.object(fused_ce, "FORCE_INTERPRET", True):
        ref = fused_linear_ce(x, w, t, policy=FP32_POLICY, impl="xla")
        got = fused_linear_ce(x, w, t, policy=FP32_POLICY, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)


def test_auto_routes_pallas_primal_xla_vjp():
    """impl="auto" (r5): the Pallas forward runs only for plain calls;
    under differentiation the custom-vjp forward stays XLA so its logits
    matmul CSEs with the backward recompute (in-context bench A/B: XLA
    fwd 165.1k tok/s vs Pallas fwd 158.8k inside the train step, while
    isolated the kernel wins 0.73x — ROUND_NOTES r5)."""
    from unittest import mock

    from gpt2_vision_language_tpu.core.precision import DEFAULT_POLICY
    from gpt2_vision_language_tpu.ops import fused_ce

    rng = np.random.RandomState(5)
    n, d, v = 512, 128, 384
    x = jnp.asarray(rng.randn(n, d), jnp.float32) * 0.3
    w = jnp.asarray(rng.randn(v, d), jnp.float32) * 0.05
    t = jnp.asarray(rng.randint(0, v, n), jnp.int32)

    with mock.patch.object(fused_ce, "FORCE_INTERPRET", True):
        kw = dict(n_chunks=4, policy=DEFAULT_POLICY)
        # primal call == forced-pallas value (bitwise: same code path)
        auto = fused_linear_ce(x, w, t, impl="auto", **kw)
        pal = fused_linear_ce(x, w, t, impl="pallas", **kw)
        np.testing.assert_array_equal(np.asarray(auto), np.asarray(pal))

        # differentiated call == forced-xla (loss AND grads bitwise: the
        # vjp forward routes XLA, whose logz feeds the shared backward)
        def loss(x, w, impl):
            return jnp.mean(fused_linear_ce(x, w, t, impl=impl, **kw))

        for impl_a, impl_b in [("auto", "xla")]:
            la, (gxa, gwa) = jax.value_and_grad(
                lambda a, b: loss(a, b, impl_a), (0, 1)
            )(x, w)
            lb, (gxb, gwb) = jax.value_and_grad(
                lambda a, b: loss(a, b, impl_b), (0, 1)
            )(x, w)
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
            np.testing.assert_array_equal(np.asarray(gxa), np.asarray(gxb))
            np.testing.assert_array_equal(np.asarray(gwa), np.asarray(gwb))
