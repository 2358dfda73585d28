"""Block-wise 8-bit optimizer state (train/optimizer.py q8_*).

The scheme is Dettmers et al.'s block-wise absmax quantization (public
algorithm; the reference keeps fp32 AdamW state, train_gpt2.py:127-144).
These tests pin (1) the quantizer's error bound and exactness properties,
(2) that an int8-state training trajectory tracks the fp32-state one over
a 50-step horizon, and (3) that the full 1558M single-chip recipe
(int8 moments + bf16 params/accum + pin_layouts + split_accum) runs
through the workload loop.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gpt2_vision_language_tpu.core.config import (
    GPTConfig,
    OptimizerConfig,
    ScheduleConfig,
)
from gpt2_vision_language_tpu.core.precision import FP32_POLICY
from gpt2_vision_language_tpu.models import gpt2
from gpt2_vision_language_tpu.train import make_train_step
from gpt2_vision_language_tpu.train import optimizer as opt_mod
from gpt2_vision_language_tpu.train.optimizer import (
    Q8_BLOCK,
    adamw_init,
    q8_dequantize,
    q8_quantize,
)

SMALL = GPTConfig(block_size=32, vocab_size=128, n_layer=2, n_head=2, n_embd=32)
SCHED = ScheduleConfig(max_lr=2e-3, min_lr=2e-4, warmup_steps=5, max_steps=50)
STEPS = 50


def test_q8_roundtrip_error_bound():
    """Per-block error <= absmax/254 (half a signed step), zeros exact,
    arbitrary (padded) shapes reconstruct at the right positions."""
    rng = np.random.RandomState(0)
    x = rng.randn(7, 333).astype(np.float32) * np.exp(rng.randn(7, 333))
    q = q8_quantize(jnp.asarray(x))
    back = np.asarray(q8_dequantize(q, x.shape))
    flat = x.reshape(-1)
    npad = -(-flat.size // Q8_BLOCK) * Q8_BLOCK
    blocks = np.pad(flat, (0, npad - flat.size)).reshape(-1, Q8_BLOCK)
    bound = (np.abs(blocks).max(axis=1, keepdims=True) / 127.0) * 0.5 + 1e-12
    err = np.abs(np.pad(flat - back.reshape(-1), (0, npad - flat.size)))
    assert np.all(err.reshape(-1, Q8_BLOCK) <= bound), err.max()

    z = q8_quantize(jnp.zeros((4, 300)))
    np.testing.assert_array_equal(np.asarray(q8_dequantize(z, (4, 300))), 0.0)


def test_q8_unsigned_roundtrip():
    """sqrt(v) storage: non-negative inputs on the full uint8 range."""
    rng = np.random.RandomState(1)
    r = np.abs(rng.randn(512).astype(np.float32))
    q = q8_quantize(jnp.asarray(r), unsigned=True)
    assert q["q"].dtype == jnp.uint8
    back = np.asarray(q8_dequantize(q, r.shape))
    bound = np.abs(r).max() / 255.0 * 0.5 + 1e-12
    assert np.abs(back - r).max() <= bound


def test_q8_chunked_update_matches_whole_leaf(monkeypatch):
    """The in-place chunked leaf update (the 1558M update-program-arena
    fix) must reproduce the whole-leaf q8 path: same math and same block
    grouping — only instruction scheduling differs, so results may differ
    by 1 ulp of fp32 (which can flip a quantized code by at most 1)."""
    from gpt2_vision_language_tpu.train.optimizer import adamw_update

    monkeypatch.setattr(opt_mod, "Q8_MIN_SIZE", 0)
    rng = np.random.RandomState(7)
    params = {
        "w": jnp.asarray(rng.randn(8, 64, 64), jnp.float32),
        "b": jnp.asarray(rng.randn(64), jnp.float32),
    }
    grads = jax.tree.map(
        lambda p: jnp.asarray(rng.randn(*p.shape), jnp.float32), params
    )
    decay = {"w": True, "b": False}

    def run_update(chunked):
        monkeypatch.setattr(
            opt_mod, "Q8_CHUNK_MIN", 0 if chunked else 1 << 60
        )
        monkeypatch.setattr(opt_mod, "Q8_CHUNK_TARGET", 4096)
        state = adamw_init(params, state_dtype=jnp.int8)
        return adamw_update(
            params, grads, state, jnp.float32(1e-3),
            OptimizerConfig(), decay_mask=decay,
        )

    p_c, s_c, n_c = run_update(True)
    p_w, s_w, n_w = run_update(False)
    assert float(n_c) == float(n_w)
    np.testing.assert_allclose(
        np.asarray(p_c["w"]), np.asarray(p_w["w"]), rtol=0, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(p_c["b"]), np.asarray(p_w["b"]))
    for mom in ("m", "v"):
        qc = np.asarray(s_c[mom]["w"]["q"], np.int32)
        qw = np.asarray(s_w[mom]["w"]["q"], np.int32)
        assert np.abs(qc - qw).max() <= 1, (mom, np.abs(qc - qw).max())
        np.testing.assert_allclose(
            np.asarray(s_c[mom]["w"]["s"]),
            np.asarray(s_w[mom]["w"]["s"]),
            rtol=1e-5,
        )


def _run(batches, params, state_dtype):
    def loss_fn(p, micro):
        _, l = gpt2.apply(
            p, micro["x"], SMALL, targets=micro["y"], policy=FP32_POLICY
        )
        return l

    state = adamw_init(params, state_dtype=state_dtype)
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


def test_int8_state_trajectory_tracks_fp32(monkeypatch):
    """50 steps with int8 block-quantized moments track the fp32-state
    trajectory (every ndim>=2 leaf quantized via Q8_MIN_SIZE=0 — harsher
    than production, where small leaves stay fp32)."""
    monkeypatch.setattr(opt_mod, "Q8_MIN_SIZE", 0)
    rng = np.random.RandomState(123)
    pool = []
    for _ in range(4):
        x = rng.randint(0, SMALL.vocab_size, size=(1, 8, 16))
        pool.append({"x": x, "y": np.roll(x, -1, axis=-1)})
    batches = [pool[i % 4] for i in range(STEPS)]
    params = gpt2.init(jax.random.PRNGKey(0), SMALL)
    l32 = _run(batches, params, None)
    l8 = _run(batches, params, jnp.int8)
    assert l32[-1] < l32[0] - 0.3, "fp32 run did not learn"
    drop = l32[0] - l32[-1]
    drift = np.abs(l8 - l32)
    # 8-bit moments are noisier than bf16 state; the trajectory must still
    # land within ~15% of the loss drop at every step
    assert drift.max() < 0.15 * drop + 0.05, (
        f"int8-state drift {drift.max():.4f} vs drop {drop:.3f}\n"
        f"fp32 tail {l32[-3:]}, int8 tail {l8[-3:]}"
    )


def test_int8_state_frozen_leaves_and_ckpt_roundtrip(tmp_path, monkeypatch):
    """int8 moments compose with freezing (frozen leaves keep scalar fp32
    placeholders) and survive a checkpoint save/load with dtypes intact."""
    from gpt2_vision_language_tpu.ckpt.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from gpt2_vision_language_tpu.train.optimizer import adamw_update

    monkeypatch.setattr(opt_mod, "Q8_MIN_SIZE", 0)
    params = {
        "w": jnp.ones((4, 64, 64), jnp.float32),
        "frozen": jnp.ones((8, 8), jnp.float32),
    }
    tmask = {"w": True, "frozen": False}
    state = adamw_init(params, state_dtype=jnp.int8, trainable_mask=tmask)
    assert isinstance(state["m"]["w"], dict)
    assert state["m"]["frozen"].shape == ()  # scalar placeholder
    assert state["m"]["frozen"].dtype == jnp.float32

    grads = jax.tree.map(lambda p: jnp.full(p.shape, 0.01, jnp.float32), params)
    p1, s1, _ = adamw_update(
        params, grads, state, jnp.float32(1e-3),
        OptimizerConfig(), decay_mask={"w": True, "frozen": False},
        trainable_mask=tmask,
    )
    np.testing.assert_array_equal(np.asarray(p1["frozen"]), 1.0)  # untouched
    assert np.any(np.asarray(s1["m"]["w"]["q"]) != 0)

    path = str(tmp_path / "opt.npz")
    save_checkpoint(path, {"opt": s1}, meta={"step": 1})
    loaded, meta = load_checkpoint(path)
    assert meta["step"] == 1
    jax.tree.map(
        lambda a, b: (
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            # dtypes must survive (int8/uint8 codes, fp32 scales)
            np.testing.assert_equal(
                np.asarray(a).dtype, np.asarray(b).dtype
            ),
        ),
        loaded["opt"],
        s1,
    )


def test_int8_recipe_through_workload(tmp_path, monkeypatch):
    """The 1558M single-chip knobs together — int8 moments + bf16
    params/accum + pin_layouts + split_accum — run the pretrain workload
    loop end-to-end and learn."""
    monkeypatch.setattr(opt_mod, "Q8_MIN_SIZE", 0)
    from gpt2_vision_language_tpu.core.config import PretrainConfig
    from gpt2_vision_language_tpu.data.fineweb import write_synthetic_corpus
    from gpt2_vision_language_tpu.train.pretrain import run_pretrain

    data_dir = tmp_path / "data"
    write_synthetic_corpus(
        str(data_dir), vocab_size=256, shard_tokens=1 << 15, n_train=1, n_val=1
    )
    cfg = PretrainConfig(
        model=GPTConfig(
            block_size=32, vocab_size=256, n_layer=2, n_head=2, n_embd=32
        ),
        total_batch_size=2 * 2 * 32,
        micro_batch_size=2,
        seq_len=32,
        schedule=ScheduleConfig(
            max_lr=1e-3, min_lr=1e-4, warmup_steps=2, max_steps=6
        ),
        val_every=0,
        sample_every=0,
        run_hellaswag=False,
        save_ckpt=False,
        data_dir=str(data_dir),
        log_dir=str(tmp_path / "log_q8"),
        param_dtype="bfloat16",
        opt_state_dtype="int8",
        grad_accum_dtype="bfloat16",
        pin_layouts=True,
        split_accum=2,
    )
    run_pretrain(cfg, policy=FP32_POLICY, num_devices=1)
    import csv
    import os

    csvs = [f for f in os.listdir(cfg.log_dir) if f.endswith(".csv")]
    with open(os.path.join(cfg.log_dir, csvs[0])) as f:
        losses = [
            float(row["loss"]) for row in csv.DictReader(f)
            if row["phase"] == "train"
        ]
    assert len(losses) == 6 and np.all(np.isfinite(losses)), losses


def test_convert_moments_formats_and_values():
    """convert_moments (resume under a different --opt-state-dtype) must
    re-encode values into the configured storage: fp32 <-> bf16 <-> int8
    blocks, v's int8 form on the sqrt grid, same-format passthrough
    untouched, frozen leaves as scalar placeholders."""
    from gpt2_vision_language_tpu.train.optimizer import convert_moments

    rng = np.random.RandomState(0)
    params = {
        "w": jnp.asarray(rng.randn(512, 256), jnp.float32),  # q8-eligible
        "b": jnp.asarray(rng.randn(64), jnp.float32),        # too small
    }
    m32 = jax.tree.map(lambda p: jnp.asarray(
        np.random.RandomState(1).standard_normal(p.shape), jnp.float32), params)
    v32 = jax.tree.map(lambda p: jnp.asarray(
        np.random.RandomState(2).standard_normal(p.shape) ** 2, jnp.float32),
        params)
    st = {"m": m32, "v": v32, "step": jnp.int32(7)}

    q8 = convert_moments(params, st, jnp.int8)
    assert isinstance(q8["m"]["w"], dict) and isinstance(q8["v"]["w"], dict)
    assert q8["m"]["b"].dtype == jnp.float32  # ineligible leaf stays fp32
    assert int(q8["step"]) == 7
    mw = q8_dequantize(q8["m"]["w"], (512, 256))
    np.testing.assert_allclose(np.asarray(mw), np.asarray(m32["w"]),
                               atol=float(jnp.abs(m32["w"]).max()) / 100)
    vw = q8_dequantize(q8["v"]["w"], (512, 256)) ** 2  # sqrt grid
    np.testing.assert_allclose(np.asarray(vw), np.asarray(v32["w"]),
                               atol=float(v32["w"].max()) / 25)

    # passthrough: same format -> the very same leaves, no requant loss
    again = convert_moments(params, q8, jnp.int8)
    assert again["m"]["w"] is q8["m"]["w"] and again["v"]["w"] is q8["v"]["w"]

    # int8 -> fp32 round trip recovers values to quantization error
    back = convert_moments(params, q8, None)
    assert back["m"]["w"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(back["v"]["w"]),
                               np.asarray(vw), rtol=1e-6)

    # fp32 -> bf16 cast path
    b16 = convert_moments(params, st, jnp.bfloat16)
    assert b16["m"]["w"].dtype == jnp.bfloat16
    assert b16["v"]["b"].dtype == jnp.bfloat16

    # frozen leaves become scalar placeholders
    froz = convert_moments(params, st, jnp.int8,
                           trainable_mask={"w": False, "b": True})
    assert froz["m"]["w"].shape == () and froz["v"]["w"].shape == ()
