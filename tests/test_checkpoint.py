"""Checkpoint round-trip, atomicity, last/best/final triad."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from gpt2_vision_language_tpu.ckpt.checkpoint import (
    CheckpointManager,
    load_checkpoint,
    save_checkpoint,
)


def _tree():
    return {
        "a": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
        "nested": {"b": jnp.ones((2,), jnp.bfloat16), "step": jnp.int32(7)},
    }


def test_roundtrip(tmp_path):
    p = str(tmp_path / "ck.npz")
    tree = _tree()
    save_checkpoint(p, tree, {"step": 5, "val_loss": 1.25})
    loaded, meta = load_checkpoint(p)
    assert meta == {"step": 5, "val_loss": 1.25}
    np.testing.assert_array_equal(loaded["a"], np.asarray(tree["a"]))
    np.testing.assert_array_equal(
        loaded["nested"]["b"].astype(np.float32),
        np.asarray(tree["nested"]["b"], np.float32),
    )
    assert loaded["nested"]["b"].dtype == jnp.bfloat16  # dtype preserved
    assert int(loaded["nested"]["step"]) == 7


def test_overwrite_is_atomic_no_tmp_left(tmp_path):
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, _tree(), {})
    save_checkpoint(p, _tree(), {"step": 2})
    _, meta = load_checkpoint(p)
    assert meta["step"] == 2
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]


def test_manager_triad_and_resume(tmp_path):
    m = CheckpointManager(str(tmp_path), save_every=2)
    params = {"w": jnp.zeros((4,))}
    opt = {"m": jnp.zeros((4,)), "step": jnp.int32(0)}
    assert m.maybe_resume() is None

    m.save_step(0, params, opt, val_loss=3.0, last_step=False)  # best only
    m.wait()  # async writes land on join
    assert os.path.exists(m.best_path) and not os.path.exists(m.last_path)
    m.save_step(2, params, opt, val_loss=4.0, last_step=False)  # rolling only
    m.wait()
    assert os.path.exists(m.last_path)
    m.save_step(3, params, opt, val_loss=2.0, last_step=True)  # both
    tree, meta = m.maybe_resume()
    assert meta["step"] == 3
    _, best_meta = load_checkpoint(m.best_path)
    assert best_meta["val_loss"] == 2.0
    m.save_final(3, params, opt, val_loss=2.0)
    assert os.path.exists(m.final_path)
