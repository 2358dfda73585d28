"""Production-precision training evidence (VERDICT round-1 item 7).

The parity suite pins FP32_POLICY; these tests exercise the *production*
bf16 path over a 50-step horizon:

- bf16-policy vs fp32-policy training on identical data quantifies the
  drift our precision policy (fp32 params, bf16 MXU compute, fp32 accum —
  core/precision.py) introduces over a realistic optimization stretch.
- bf16-policy vs the torch reference trained the way the reference ships
  (whole model cast to bf16 + bf16 autocast + AdamW on the bf16 params,
  train_gpt2.py:238-239,263-264,463) shows our production path tracks the
  reference's production path within tolerance — and drifts LESS from the
  fp32 truth, since our params/optimizer stay fp32.
"""

import os
import sys

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
from gpt2_vision_language_tpu.core.precision import DEFAULT_POLICY, FP32_POLICY
from gpt2_vision_language_tpu.models import gpt2
from gpt2_vision_language_tpu.train import make_train_step
from gpt2_vision_language_tpu.train.optimizer import adamw_init

SMALL = GPTConfig(block_size=32, vocab_size=128, n_layer=2, n_head=2, n_embd=32)
SCHED = ScheduleConfig(max_lr=2e-3, min_lr=2e-4, warmup_steps=5, max_steps=50)
STEPS = 50


def _data(seed=123, pool=4):
    """STEPS batches cycling a small fixed pool: uniform-random tokens have
    no learnable structure (loss floor ln(V)), so repetition is what makes
    the loss actually move over the horizon."""
    rng = np.random.RandomState(seed)
    uniq = []
    for _ in range(pool):
        x = rng.randint(0, SMALL.vocab_size, size=(1, 8, 16))
        uniq.append({"x": x, "y": np.roll(x, -1, axis=-1)})
    return [uniq[i % pool] for i in range(STEPS)]


def _run_jax(policy, batches, params):
    def loss_fn(p, micro):
        _, l = gpt2.apply(p, micro["x"], SMALL, targets=micro["y"], policy=policy)
        return l

    state = adamw_init(params)
    step = make_train_step(
        loss_fn,
        OptimizerConfig(),
        SCHED,
        decay_mask=gpt2.decay_mask(params),
        donate=False,
    )
    losses = []
    for i, b in enumerate(batches):
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        params, state, m = step(params, state, jb, jnp.int32(i))
        losses.append(float(m["loss"]))
    return np.asarray(losses)


def test_bf16_policy_drift_vs_fp32_is_small():
    """50 training steps under the production bf16 policy track the fp32
    trajectory closely: per-step drift stays well under the loss drop."""
    batches = _data()
    params = gpt2.init(jax.random.PRNGKey(0), SMALL)
    l32 = _run_jax(FP32_POLICY, batches, params)
    l16 = _run_jax(DEFAULT_POLICY, batches, params)
    assert l32[-1] < l32[0] - 0.3, "fp32 run did not learn"
    drift = np.abs(l16 - l32)
    drop = l32[0] - l32[-1]
    assert drift.max() < 0.05 * drop + 0.02, (
        f"bf16 drift {drift.max():.4f} vs loss drop {drop:.3f}\n"
        f"fp32 tail {l32[-3:]}, bf16 tail {l16[-3:]}"
    )


@requires_reference
def test_bf16_policy_tracks_torch_bf16_reference():
    """50 steps of our bf16-policy training vs the torch reference trained
    exactly as shipped on CUDA: model cast to bf16, bf16 autocast forward,
    AdamW on the bf16 params (train_gpt2.py:263-264,463)."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, os.path.dirname(__file__))
    from test_parity_reference import _load_ref_module
    from gpt2_vision_language_tpu.ckpt.torch_import import gpt2_from_torch_state_dict

    ref = _load_ref_module("gpt2_linear")
    tcfg = ref.GPTConfig(
        block_size=32, vocab_size=128, n_layer=2, n_head=2, n_embd=32
    )
    torch.manual_seed(0)
    tmodel = ref.GPT_previous(tcfg)
    params = gpt2_from_torch_state_dict(tmodel.state_dict(), SMALL)

    import math

    def ref_lr(it):
        if it < SCHED.warmup_steps:
            return SCHED.max_lr * (it + 1) / SCHED.warmup_steps
        r = (it - SCHED.warmup_steps) / (SCHED.max_steps - SCHED.warmup_steps)
        return SCHED.min_lr + 0.5 * (1 + math.cos(math.pi * r)) * (
            SCHED.max_lr - SCHED.min_lr
        )

    tmodel = tmodel.to(torch.bfloat16)  # train_gpt2.py:264
    decay_p = [p for p in tmodel.parameters() if p.requires_grad and p.dim() >= 2]
    nodecay_p = [p for p in tmodel.parameters() if p.requires_grad and p.dim() < 2]
    topt = torch.optim.AdamW(
        [
            {"params": decay_p, "weight_decay": 0.1},
            {"params": nodecay_p, "weight_decay": 0.0},
        ],
        lr=SCHED.max_lr,
        betas=(0.9, 0.95),
        eps=1e-8,
    )

    batches = _data()
    tlosses = []
    for it, b in enumerate(batches):
        topt.zero_grad()
        tx = torch.tensor(b["x"][0], dtype=torch.long)
        ty = torch.tensor(b["y"][0], dtype=torch.long)
        with torch.autocast("cpu", torch.bfloat16):  # train_gpt2.py:463
            _, tloss = tmodel(tx, ty)
        tloss.backward()
        torch.nn.utils.clip_grad_norm_(tmodel.parameters(), 1.0)
        for g in topt.param_groups:
            g["lr"] = ref_lr(it)
        topt.step()
        tlosses.append(float(tloss.detach().float()))
    tlosses = np.asarray(tlosses)

    jlosses = _run_jax(DEFAULT_POLICY, batches, params)
    drop = tlosses[0] - tlosses[-1]
    assert drop > 0.3, "torch bf16 run did not learn"
    drift = np.abs(jlosses - tlosses)
    # bf16 weights quantize the torch side from step 0; tolerance reflects
    # that the reference's production path is itself noisier than ours.
    assert drift.max() < 0.15 * drop + 0.05, (
        f"drift {drift.max():.4f} vs drop {drop:.3f}\n"
        f"torch tail {tlosses[-3:]}, jax tail {jlosses[-3:]}"
    )


def test_stochastic_round_bf16_unbiased():
    """E[stochastic_round_bf16(x)] must equal x (the property that keeps
    bf16 grad accumulation drift-free over 64 micro-steps), and values
    already representable in bf16 must round exactly."""
    from gpt2_vision_language_tpu.train.step import stochastic_round_bf16

    # exactness on representable values (incl. negatives and zero)
    exact = jnp.asarray([0.0, 1.0, -1.0, 0.5, -3.140625], jnp.float32)
    got = stochastic_round_bf16(exact, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(exact)
    )

    # unbiasedness: mean over many independent roundings converges to x
    x = jnp.asarray([1.00390625, -2.0078125, 3.3e-5, -7.77], jnp.float32)
    n = 4096
    keys = jax.random.split(jax.random.PRNGKey(42), n)
    rounds = jax.vmap(lambda k: stochastic_round_bf16(x, k))(keys)
    mean = np.asarray(rounds.astype(jnp.float32)).mean(axis=0)
    # bf16 spacing near |x| is ~2^-8 * 2^ceil(log2 x); the SE of the mean
    # over 4096 draws is spacing/sqrt(n) ~ spacing/64
    spacing = np.asarray(
        [np.spacing(np.abs(v).astype(np.float32)) * 2**13 for v in np.asarray(x)]
    )
    err = np.abs(mean - np.asarray(x))
    assert np.all(err < spacing / 8), (err, spacing)

    # and it must NOT be deterministic truncation: both neighbors occur
    vals = np.unique(np.asarray(rounds[:, 0], np.float32))
    assert len(vals) == 2, vals


def test_bf16_grad_accum_trajectory():
    """50 steps with bf16 stochastic-rounded grad accumulators (accum=4)
    track the exact-fp32-accumulator trajectory: the 1558M memory enabler
    must not change what the optimizer learns."""
    batches = [
        {
            "x": (x := np.random.RandomState(100 + i % 4).randint(
                0, SMALL.vocab_size, size=(4, 4, 16)
            )),
            "y": np.roll(x, -1, axis=-1),
        }
        for i in range(STEPS)
    ]

    def run(accum_dtype):
        params = gpt2.init(jax.random.PRNGKey(3), SMALL)

        def loss_fn(p, micro):
            _, l = gpt2.apply(
                p, micro["x"], SMALL, targets=micro["y"], policy=FP32_POLICY
            )
            return l

        state = adamw_init(params)
        step = make_train_step(
            loss_fn,
            OptimizerConfig(),
            SCHED,
            decay_mask=gpt2.decay_mask(params),
            donate=False,
            grad_accum_dtype=accum_dtype,
        )
        losses = []
        for i, b in enumerate(batches):
            jb = {k: jnp.asarray(v) for k, v in b.items()}
            params, state, m = step(params, state, jb, jnp.int32(i))
            losses.append(float(m["loss"]))
        return np.asarray(losses)

    l32 = run(None)
    l16 = run("bfloat16")
    assert l32[-1] < l32[0] - 0.3, "fp32-accum run did not learn"
    drift = np.abs(l16 - l32)
    drop = l32[0] - l32[-1]
    assert drift.max() < 0.05 * drop + 0.02, (
        f"bf16-accum drift {drift.max():.4f} vs drop {drop:.3f}\n"
        f"fp32 tail {l32[-3:]}, bf16 tail {l16[-3:]}"
    )
