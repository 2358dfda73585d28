"""Train-step tests: loss decreases, full-step parity vs torch, DP sharding."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import requires_reference

from gpt2_vision_language_tpu.core.config import (
    GPTConfig,
    OptimizerConfig,
    ScheduleConfig,
)
from gpt2_vision_language_tpu.core.precision import FP32_POLICY
from gpt2_vision_language_tpu.models import gpt2
from gpt2_vision_language_tpu.train import make_train_step, make_eval_step
from gpt2_vision_language_tpu.train.optimizer import adamw_init
from gpt2_vision_language_tpu.parallel import make_mesh, shard_batch

SMALL = GPTConfig(block_size=32, vocab_size=128, n_layer=2, n_head=2, n_embd=32)
SCHED = ScheduleConfig(max_lr=1e-3, min_lr=1e-4, warmup_steps=2, max_steps=10)


def _loss_fn(params, micro):
    _, loss = gpt2.apply(
        params, micro["x"], SMALL, targets=micro["y"], policy=FP32_POLICY
    )
    return loss


def _batch(rng, accum, b, t):
    x = rng.randint(0, SMALL.vocab_size, size=(accum, b, t))
    y = np.roll(x, -1, axis=-1)
    return {"x": jnp.asarray(x), "y": jnp.asarray(y)}


def test_loss_decreases():
    params = gpt2.init(jax.random.PRNGKey(0), SMALL)
    state = adamw_init(params)
    step = make_train_step(
        _loss_fn,
        OptimizerConfig(),
        SCHED,
        decay_mask=gpt2.decay_mask(params),
        use_fused_adamw=False,
        donate=False,
    )
    rng = np.random.RandomState(0)
    batch = _batch(rng, 2, 4, 16)  # fixed batch -> loss must fall fast
    losses = []
    for i in range(8):
        params, state, metrics = step(params, state, batch, jnp.int32(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] - 0.2, losses


@pytest.mark.parametrize(
    "accum_dtype,chunk",
    [(None, 1), (None, 3), ("bfloat16", 1), ("bfloat16", 3)],
)
def test_split_accum_matches_scan(accum_dtype, chunk):
    """split_accum (small programs of `chunk` micros + one update program —
    the 1558M single-chip runtime-HBM enabler) must reproduce the one-jit
    scan step: same micro order, same SR keys; tolerances only for the
    float reassociation of separately-compiled programs. chunk=3 with
    accum=4 exercises the remainder program (3+1)."""
    params = gpt2.init(jax.random.PRNGKey(0), SMALL)
    if accum_dtype:
        params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    state = adamw_init(params)
    kw = dict(
        decay_mask=gpt2.decay_mask(params),
        use_fused_adamw=False,
        grad_accum_dtype=accum_dtype,
    )
    scan_step = make_train_step(
        _loss_fn, OptimizerConfig(), SCHED, donate=False, **kw
    )
    split_step = make_train_step(
        _loss_fn, OptimizerConfig(), SCHED, donate=False, split_accum=chunk,
        **kw
    )
    # sync_every host-syncs between dispatches (the 1558M arena-overlap
    # guard) — a pure scheduling knob; results must be bitwise identical
    # to the async split path
    sync_step = make_train_step(
        _loss_fn, OptimizerConfig(), SCHED, donate=False, split_accum=chunk,
        sync_every=1, **kw
    )
    rng = np.random.RandomState(1)
    p1, s1, p2, s2, p3, s3 = params, state, params, state, params, state
    for i in range(3):
        batch = _batch(rng, 4, 2, 16)
        p1, s1, m1 = scan_step(p1, s1, batch, jnp.int32(i))
        p2, s2, m2 = split_step(p2, s2, batch, jnp.int32(i))
        p3, s3, m3 = sync_step(p3, s3, batch, jnp.int32(i))
    assert float(m2["loss"]) == float(m3["loss"])
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        p2,
        p3,
    )
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-6, atol=1e-6,
        ),
        p1,
        p2,
    )


def test_split_accum_commit_ownership():
    """split_step's first-call commit must CONSUME the caller's trees
    when donate=True (each source leaf deleted right after its copy —
    the 1558M OOM root cause: the caller's frame otherwise keeps the
    whole pre-commit params+opt alive, +5.85 GiB at 1558M) and must NOT
    touch them when donate=False (callers legitimately reuse trees)."""
    from gpt2_vision_language_tpu.train.step import default_formats

    def build():
        params = gpt2.init(jax.random.PRNGKey(0), SMALL)
        return params, adamw_init(params)

    rng = np.random.RandomState(2)
    batch = _batch(rng, 2, 4, 16)

    # donate=False: original trees stay usable after the step
    params, state = build()
    step = make_train_step(
        _loss_fn, OptimizerConfig(), SCHED,
        decay_mask=gpt2.decay_mask(params), use_fused_adamw=False,
        donate=False, split_accum=1,
        io_formats=(default_formats(params), default_formats(state)),
    )
    step(params, state, batch, jnp.int32(0))
    assert not any(x.is_deleted() for x in jax.tree.leaves(params))
    assert not any(
        x.is_deleted() for x in jax.tree.leaves(state)
        if hasattr(x, "is_deleted")
    )

    # donate=True: the caller's leaves are consumed (either deleted by
    # the commit copy, or donated to update_jit) — reuse must fail
    params, state = build()
    step = make_train_step(
        _loss_fn, OptimizerConfig(), SCHED,
        decay_mask=gpt2.decay_mask(params), use_fused_adamw=False,
        donate=True, split_accum=1,
        io_formats=(default_formats(params), default_formats(state)),
    )
    p2, s2, _ = step(params, state, batch, jnp.int32(0))
    assert all(x.is_deleted() for x in jax.tree.leaves(params))
    # the returned trees are live and train on
    p3, s3, m = step(p2, s2, batch, jnp.int32(1))
    assert np.isfinite(float(m["loss"]))


@requires_reference
def test_full_train_step_parity_vs_torch():
    """3 optimizer steps with grad accumulation, clipping, cosine LR and
    weight decay must track the torch reference loop (train_gpt2.py:456-476)
    at matched weights and data."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_parity_reference import _load_ref_module

    ref = _load_ref_module("gpt2_linear")
    tcfg = ref.GPTConfig(
        block_size=32, vocab_size=128, n_layer=2, n_head=2, n_embd=32
    )
    torch.manual_seed(0)
    tmodel = ref.GPT_previous(tcfg)
    # same grouping as configure_optimizers (train_gpt2.py:127-144)
    decay_p = [p for p in tmodel.parameters() if p.requires_grad and p.dim() >= 2]
    nodecay_p = [p for p in tmodel.parameters() if p.requires_grad and p.dim() < 2]
    topt = torch.optim.AdamW(
        [
            {"params": decay_p, "weight_decay": 0.1},
            {"params": nodecay_p, "weight_decay": 0.0},
        ],
        lr=1e-3,
        betas=(0.9, 0.95),
        eps=1e-8,
    )

    from gpt2_vision_language_tpu.ckpt.torch_import import gpt2_from_torch_state_dict

    params = gpt2_from_torch_state_dict(tmodel.state_dict(), SMALL)
    state = adamw_init(params)
    step = make_train_step(
        _loss_fn,
        OptimizerConfig(),
        SCHED,
        decay_mask=gpt2.decay_mask(params),
        use_fused_adamw=False,
        donate=False,
    )

    import math

    def ref_lr(it):
        if it < SCHED.warmup_steps:
            return SCHED.max_lr * (it + 1) / SCHED.warmup_steps
        r = (it - SCHED.warmup_steps) / (SCHED.max_steps - SCHED.warmup_steps)
        return SCHED.min_lr + 0.5 * (1 + math.cos(math.pi * r)) * (
            SCHED.max_lr - SCHED.min_lr
        )

    rng = np.random.RandomState(42)
    accum = 2
    for it in range(3):
        batch = _batch(rng, accum, 4, 16)
        # torch side
        topt.zero_grad()
        tl_sum = 0.0
        for a in range(accum):
            tx = torch.tensor(np.asarray(batch["x"][a]), dtype=torch.long)
            ty = torch.tensor(np.asarray(batch["y"][a]), dtype=torch.long)
            _, tloss = tmodel(tx, ty)
            (tloss / accum).backward()
            tl_sum += float(tloss.detach()) / accum
        torch.nn.utils.clip_grad_norm_(tmodel.parameters(), 1.0)
        for group in topt.param_groups:
            group["lr"] = ref_lr(it)
        topt.step()
        # jax side
        params, state, metrics = step(params, state, batch, jnp.int32(it))
        np.testing.assert_allclose(
            float(metrics["loss"]), tl_sum, rtol=1e-4, err_msg=f"loss step {it}"
        )

    jwte = np.asarray(params["wte"])
    twte = tmodel.transformer.wte.weight.detach().numpy()
    np.testing.assert_allclose(jwte, twte, rtol=1e-3, atol=2e-5)
    jw = np.asarray(params["blocks"]["attn"]["wqkv"][0])
    tw = tmodel.transformer.h[0].attn.c_attn.weight.detach().numpy().T
    np.testing.assert_allclose(jw, tw, rtol=1e-3, atol=2e-5)


def test_dp_sharded_matches_single_device():
    """The same step on an 8-device data-parallel mesh must produce the same
    params as single-device (the TPU analogue of testing DDP on a fake
    backend)."""
    assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
    params = gpt2.init(jax.random.PRNGKey(0), SMALL)
    state = adamw_init(params)
    step = make_train_step(
        _loss_fn,
        OptimizerConfig(),
        SCHED,
        decay_mask=gpt2.decay_mask(params),
        use_fused_adamw=False,
        donate=False,
    )
    rng = np.random.RandomState(7)
    batch = _batch(rng, 2, 8, 16)

    p1, s1, m1 = step(params, state, batch, jnp.int32(0))

    mesh = make_mesh(8, ("data",))
    sharded = shard_batch(mesh, batch, leading_accum_axis=True)
    p2, s2, m2 = step(params, state, sharded, jnp.int32(0))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p1["wte"]), np.asarray(p2["wte"]), rtol=1e-5, atol=1e-6
    )


def test_frozen_leaves_get_zero_grads():
    """Regression: the freeze must sit INSIDE the differentiated function —
    stop_gradient applied to value_and_grad's own argument does nothing, and
    frozen leaves would receive full nonzero grads (wasted backward matmuls
    + fp32 accumulator HBM for the frozen decoder in finetunes)."""
    from gpt2_vision_language_tpu.train.optimizer import freeze

    params = gpt2.init(jax.random.PRNGKey(0), SMALL)
    tmask = jax.tree.map(lambda _: False, params)
    tmask["lnf"] = jax.tree.map(lambda _: True, params["lnf"])

    rng = np.random.RandomState(1)
    batch = _batch(rng, 1, 2, 16)
    micro = jax.tree.map(lambda a: a[0], batch)

    grads = jax.grad(lambda p: _loss_fn(freeze(p, tmask), micro))(params)
    assert float(jnp.abs(grads["wte"]).max()) == 0.0
    assert float(jnp.abs(grads["blocks"]["attn"]["wqkv"]).max()) == 0.0
    assert float(jnp.abs(grads["lnf"]["scale"]).max()) > 0.0

    # and through make_train_step: frozen params must not move, trainable must
    step = make_train_step(
        _loss_fn,
        OptimizerConfig(),
        SCHED,
        decay_mask=gpt2.decay_mask(params),
        trainable_mask=tmask,
        donate=False,
    )
    p2, _, _ = step(params, adamw_init(params), batch, jnp.int32(0))
    np.testing.assert_array_equal(np.asarray(p2["wte"]), np.asarray(params["wte"]))
    assert float(jnp.abs(p2["lnf"]["scale"] - params["lnf"]["scale"]).max()) > 0.0


def test_eval_step():
    params = gpt2.init(jax.random.PRNGKey(0), SMALL)
    ev = make_eval_step(_loss_fn)
    rng = np.random.RandomState(3)
    batch = _batch(rng, 4, 2, 16)
    loss = float(ev(params, batch))
    assert np.isfinite(loss) and 3.0 < loss < 7.0
