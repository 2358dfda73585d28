"""Pipeline parallelism vs single-device decoder on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from gpt2_vision_language_tpu.core.config import GPTConfig
from gpt2_vision_language_tpu.core.precision import FP32_POLICY
from gpt2_vision_language_tpu.models import gpt2
from gpt2_vision_language_tpu.parallel.mesh import make_mesh
from gpt2_vision_language_tpu.parallel.pipeline import pipeline_run_blocks

CFG = GPTConfig(block_size=16, vocab_size=128, n_layer=4, n_head=2, n_embd=32)


def _setup(seed=0):
    params = gpt2.init(jax.random.PRNGKey(seed), CFG)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (4, 16, 32))
    return params, x


def test_pipeline_matches_run_blocks():
    assert jax.device_count() >= 4
    mesh = make_mesh(4, ("pipe",))
    params, x = _setup()
    ref = gpt2.run_blocks(params, x, CFG, policy=FP32_POLICY, attn_impl="xla")
    got = jax.jit(
        lambda bp, x: pipeline_run_blocks(
            bp, x, CFG, mesh, n_micro=2, policy=FP32_POLICY
        )
    )(params["blocks"], x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_pipeline_grads_match():
    """The GPipe schedule is differentiable end-to-end: parameter grads of a
    pipelined scalar loss match the single-device decoder's."""
    assert jax.device_count() >= 4
    mesh = make_mesh(4, ("pipe",))
    params, x = _setup(seed=3)

    def loss_ref(bp, x):
        out = gpt2.run_blocks(
            {"blocks": bp}, x, CFG, policy=FP32_POLICY, attn_impl="xla"
        )
        return jnp.sum(out**2)

    def loss_pp(bp, x):
        out = pipeline_run_blocks(
            bp, x, CFG, mesh, n_micro=2, policy=FP32_POLICY
        )
        return jnp.sum(out**2)

    gr = jax.jit(jax.grad(loss_ref))(params["blocks"], x)
    gp = jax.jit(jax.grad(loss_pp))(params["blocks"], x)
    flat_r = jax.tree.leaves(gr)
    flat_p = jax.tree.leaves(gp)
    for a, b in zip(flat_p, flat_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        )


def _pp_train_setup(mesh, axis_name="pipe", n_micro=2, tp=False):
    from jax.sharding import NamedSharding
    from gpt2_vision_language_tpu.core.config import (
        OptimizerConfig,
        ScheduleConfig,
    )
    from gpt2_vision_language_tpu.parallel.pipeline import (
        make_pipeline_loss_fn,
        pipeline_param_pspecs,
    )
    from gpt2_vision_language_tpu.train import make_train_step
    from gpt2_vision_language_tpu.train.optimizer import adamw_init

    params = gpt2.init(jax.random.PRNGKey(7), CFG)
    sched = ScheduleConfig(max_lr=1e-3, min_lr=1e-4, warmup_steps=2, max_steps=10)

    def ref_loss(p, micro):
        return gpt2.loss(
            p, micro["x"], CFG, targets=micro["y"], policy=FP32_POLICY,
            ce_chunks=1,
        )

    pp_loss = make_pipeline_loss_fn(
        CFG, mesh, axis_name=axis_name, n_micro=n_micro, policy=FP32_POLICY
    )
    mk = lambda lf: make_train_step(
        lf, OptimizerConfig(), sched, decay_mask=gpt2.decay_mask(params),
        donate=False,
    )
    pspecs = pipeline_param_pspecs(params, axis_name, tp=tp)
    place = jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, pspecs
    )
    rng = np.random.RandomState(11)
    x = rng.randint(0, CFG.vocab_size, size=(2, 4, CFG.block_size))
    batch = {"x": jnp.asarray(x), "y": jnp.asarray(np.roll(x, -1, axis=-1))}
    return params, place, batch, mk(ref_loss), mk(pp_loss)


def test_pipeline_train_step_parity():
    """THE pipelined train step: 3 steps of grad-accum + AdamW with layers
    stage-sharded over a 4-way pipe axis must reproduce the single-device
    step's parameter trajectory (the reference's hot loop,
    train_gpt2.py:456-476, parallelized over stages)."""
    assert jax.device_count() >= 4
    mesh = make_mesh(4, ("pipe",))
    params, place, batch, ref_step, pp_step = _pp_train_setup(mesh)
    from gpt2_vision_language_tpu.train.optimizer import adamw_init

    s_ref, s_pp = adamw_init(params), adamw_init(place)
    p_ref, p_pp = params, place
    for i in range(3):
        p_ref, s_ref, m_ref = ref_step(p_ref, s_ref, batch, jnp.int32(i))
        p_pp, s_pp, m_pp = pp_step(p_pp, s_pp, batch, jnp.int32(i))
        np.testing.assert_allclose(
            float(m_pp["loss"]), float(m_ref["loss"]), rtol=2e-5
        )
        np.testing.assert_allclose(
            float(m_pp["grad_norm"]), float(m_ref["grad_norm"]), rtol=1e-3
        )
    for a, b in zip(jax.tree.leaves(p_pp), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


def test_pipeline_train_step_pp_x_dp():
    """pp x dp: same trajectory on a ('data', 'pipe') = (2, 2) mesh with the
    batch sharded on data and the layers on pipe."""
    assert jax.device_count() >= 4
    mesh = make_mesh(4, ("data", "pipe"), shape=(2, 2))
    params, place, batch, ref_step, pp_step = _pp_train_setup(mesh, n_micro=2)
    from jax.sharding import NamedSharding, PartitionSpec as P
    from gpt2_vision_language_tpu.train.optimizer import adamw_init

    batch = jax.tree.map(
        lambda a: jax.device_put(
            a, NamedSharding(mesh, P(None, "data"))
        ),
        batch,
    )
    s_ref, s_pp = adamw_init(params), adamw_init(place)
    p_ref, s_ref, m_ref = ref_step(params, s_ref, batch, jnp.int32(0))
    p_pp, s_pp, m_pp = pp_step(place, s_pp, batch, jnp.int32(0))
    np.testing.assert_allclose(
        float(m_pp["loss"]), float(m_ref["loss"]), rtol=2e-5
    )
    for a, b in zip(jax.tree.leaves(p_pp), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


def test_pipeline_train_step_pp_x_tp():
    """pp x tp x dp (VERDICT r3 #9): a ('data', 'pipe', 'model') = (2, 2, 2)
    mesh with layers stage-sharded on pipe AND Megatron column/row sharding
    on model inside each stage (shard_map manual over pipe only; GSPMD
    auto-inserts the TP all-reduces per tick). Trajectory must match the
    single-device step."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from gpt2_vision_language_tpu.train.optimizer import adamw_init

    assert jax.device_count() >= 8
    mesh = make_mesh(8, ("data", "pipe", "model"), shape=(2, 2, 2))
    params, place, batch, ref_step, pp_step = _pp_train_setup(
        mesh, n_micro=2, tp=True
    )
    # block weights really carry BOTH axes: (L, C, 3C) wqkv splits L on
    # pipe and 3C on model
    w = place["blocks"]["attn"]["wqkv"]
    ss = w.sharding.shard_shape(w.shape)
    assert ss[0] == w.shape[0] // 2 and ss[2] == w.shape[2] // 2
    batch = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P(None, "data"))),
        batch,
    )
    s_ref, s_pp = adamw_init(params), adamw_init(place)
    p_ref, p_pp = params, place
    for i in range(2):
        p_ref, s_ref, m_ref = ref_step(p_ref, s_ref, batch, jnp.int32(i))
        p_pp, s_pp, m_pp = pp_step(p_pp, s_pp, batch, jnp.int32(i))
        np.testing.assert_allclose(
            float(m_pp["loss"]), float(m_ref["loss"]), rtol=2e-5
        )
        np.testing.assert_allclose(
            float(m_pp["grad_norm"]), float(m_ref["grad_norm"]), rtol=1e-3
        )
    for a, b in zip(jax.tree.leaves(p_pp), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


def test_pipeline_int8_moments_parity():
    """int8 (q8) moments compose with PIPELINE parallelism (VERDICT r4 #5):
    the flat {q, s} buffers shard over ("pipe", "model") on their single
    axis (parallel/sharding.py moment_specs flat_axes) while the params
    ride pipeline_param_pspecs. Same global 256-block grid as the
    single-device q8 recipe, so a 2-step quantized trajectory must match
    the single-device int8 run up to fp32 reduction order."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from gpt2_vision_language_tpu.core.config import (
        OptimizerConfig,
        ScheduleConfig,
    )
    from gpt2_vision_language_tpu.parallel.pipeline import (
        make_pipeline_loss_fn,
        pipeline_param_pspecs,
    )
    from gpt2_vision_language_tpu.parallel.sharding import shard_moments
    from gpt2_vision_language_tpu.train import make_train_step
    from gpt2_vision_language_tpu.train.optimizer import adamw_init

    assert jax.device_count() >= 4
    # q8-eligible shapes (>= 64k elements, ndim >= 2): wte 512x128,
    # wqkv (2,128,384), wfc (2,128,512) quantize — same as the TP pin
    cfg = GPTConfig(
        block_size=32, vocab_size=512, n_layer=2, n_head=4, n_embd=128
    )
    mesh = make_mesh(4, ("data", "pipe"), shape=(2, 2))
    params = gpt2.init(jax.random.PRNGKey(0), cfg)
    assert isinstance(
        adamw_init(params, state_dtype=jnp.int8)["m"]["blocks"]["attn"]["wqkv"],
        dict,
    ), "test config must exercise q8 leaves"
    sched = ScheduleConfig(max_lr=1e-3, min_lr=1e-4, warmup_steps=2, max_steps=10)

    def ref_loss(p, micro):
        return gpt2.loss(
            p, micro["x"], cfg, targets=micro["y"], policy=FP32_POLICY,
            ce_chunks=1,
        )

    pp_loss = make_pipeline_loss_fn(
        cfg, mesh, n_micro=2, policy=FP32_POLICY
    )
    mk = lambda lf: make_train_step(
        lf, OptimizerConfig(), sched, decay_mask=gpt2.decay_mask(params),
        donate=False,
    )
    ref_step, pp_step = mk(ref_loss), mk(pp_loss)

    rng = np.random.RandomState(13)
    x = rng.randint(0, cfg.vocab_size, size=(2, 4, cfg.block_size))
    batch = {"x": jnp.asarray(x), "y": jnp.asarray(np.roll(x, -1, axis=-1))}

    p_ref = params
    s_ref = adamw_init(p_ref, state_dtype=jnp.int8)
    for i in range(2):  # step 2 dequantizes non-zero codes
        p_ref, s_ref, m_ref = ref_step(p_ref, s_ref, batch, jnp.int32(i))

    pspecs = pipeline_param_pspecs(params)
    p_pp = jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, pspecs
    )
    s_pp = adamw_init(p_pp, state_dtype=jnp.int8)
    s_pp["m"] = shard_moments(
        p_pp, s_pp["m"], mesh, pspecs=pspecs, flat_axes=("pipe", "model")
    )
    s_pp["v"] = shard_moments(
        p_pp, s_pp["v"], mesh, pspecs=pspecs, flat_axes=("pipe", "model")
    )
    # the big q8 buffers must actually be pipe-sharded in HBM
    q = s_pp["m"]["blocks"]["attn"]["wqkv"]["q"]
    assert q.sharding.shard_shape(q.shape)[0] == q.shape[0] // 2
    sbatch = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P(None, "data"))),
        batch,
    )
    for i in range(2):
        p_pp, s_pp, m_pp = pp_step(p_pp, s_pp, sbatch, jnp.int32(i))

    np.testing.assert_allclose(
        float(m_pp["loss"]), float(m_ref["loss"]), rtol=2e-5
    )
    np.testing.assert_allclose(
        float(m_pp["grad_norm"]), float(m_ref["grad_norm"]), rtol=1e-3
    )
    for path in (("wte",), ("blocks", "attn", "wqkv"), ("blocks", "mlp", "wfc")):
        a, b = p_pp, p_ref
        for k in path:
            a, b = a[k], b[k]
        # atol covers one quantization step (the sharded clip norm differs
        # in its last fp32 ulp from the single-device one)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=3e-5
        )


def test_pipeline_microbatch_counts():
    """More microbatches (smaller bubbles) must not change the result."""
    assert jax.device_count() >= 4
    mesh = make_mesh(4, ("pipe",))
    params, x = _setup(seed=5)
    a = pipeline_run_blocks(
        params["blocks"], x, CFG, mesh, n_micro=2, policy=FP32_POLICY
    )
    b = pipeline_run_blocks(
        params["blocks"], x, CFG, mesh, n_micro=4, policy=FP32_POLICY
    )
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
    )


def test_pipeline_bf16_policy_compiles_and_grads():
    """Regression: under the production bf16 policy, the pipelined loss
    used to crash XLA:CPU's SPMD partitioner ('Invalid binary instruction
    opcode copy') — bf16 collectives under the partial-manual shard_map,
    both the output psum and the transpose-inserted cotangent psums. The
    fp32 transport keeps every pipe collective off bf16; fwd+grad must
    compile and produce finite values."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding
    from gpt2_vision_language_tpu.core.precision import DEFAULT_POLICY
    from gpt2_vision_language_tpu.parallel.pipeline import (
        make_pipeline_loss_fn,
        pipeline_param_pspecs,
    )

    mesh = make_mesh(8, ("data", "pipe"), shape=(4, 2))
    params = gpt2.init(jax.random.PRNGKey(0), CFG)
    place = jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)),
        params,
        pipeline_param_pspecs(params),
    )
    lf = make_pipeline_loss_fn(CFG, mesh, n_micro=2, policy=DEFAULT_POLICY)
    rng = np.random.RandomState(3)
    x = jnp.asarray(
        rng.randint(0, CFG.vocab_size, size=(4, CFG.block_size))
    )
    micro = {"x": x, "y": x}
    loss = float(jax.jit(lf)(place, micro))
    assert np.isfinite(loss)
    g = jax.jit(jax.grad(lf))(place, micro)
    assert all(np.all(np.isfinite(np.asarray(l, np.float32)))
               for l in jax.tree.leaves(g))


def test_transport_dtype_selection():
    """Platform-conditional transport (VERDICT r3 #8): CPU meshes upcast
    bf16 transport to fp32 (partitioner crash workaround), TPU meshes ride
    the compute dtype (halving stage-to-stage ICI bytes), and an explicit
    override wins everywhere."""
    import jax.numpy as jnp
    from gpt2_vision_language_tpu.parallel.pipeline import transport_dtype

    assert transport_dtype(jnp.bfloat16, "cpu") == jnp.float32
    assert transport_dtype(jnp.bfloat16, "tpu") == jnp.bfloat16
    assert transport_dtype(jnp.float32, "cpu") == jnp.float32
    assert transport_dtype(jnp.float32, "tpu") == jnp.float32
    assert transport_dtype(jnp.bfloat16, "tpu", "float32") == jnp.float32
    assert transport_dtype(jnp.bfloat16, "cpu", "bfloat16") == jnp.bfloat16
