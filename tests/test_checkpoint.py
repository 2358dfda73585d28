"""Checkpoint round-trip, atomicity, last/best/final triad."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_save_mesh_sharded_tree(tmp_path):
    """TP-sharded leaves round-trip: tree_to_host reassembles the global
    array before writing (multi-host meshes would take the allgather path;
    here all shards are addressable so device_get suffices)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gpt2_vision_language_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, ("data", "model"), shape=(2, 4))
    w = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    sharded = jax.device_put(w, NamedSharding(mesh, P(None, "model")))
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, {"w": sharded}, {})
    loaded, _ = load_checkpoint(p)
    np.testing.assert_array_equal(loaded["w"], np.asarray(w))


def test_manager_non_master_never_writes(tmp_path):
    """Multi-host discipline: non-master managers participate in the host
    gather but never touch the filesystem."""
    d = str(tmp_path / "ckpts")
    m = CheckpointManager(d, save_every=1, is_master=False)
    m.save_step(1, _tree(), {"s": jnp.zeros(())}, 0.5, last_step=True)
    m.save_final(1, _tree(), {"s": jnp.zeros(())}, 0.5)
    m.wait()
    assert not os.path.exists(d)


def test_resume_preserves_best_val(tmp_path):
    """After a restart, maybe_resume must re-seed best_val from
    model_best's metadata so a worse post-resume val loss cannot clobber
    the historic best checkpoint."""
    d = str(tmp_path / "ckpts")
    m1 = CheckpointManager(d, save_every=1, async_save=False)
    m1.save_step(1, _tree(), {"s": jnp.zeros(())}, 3.1, last_step=True)
    assert os.path.isfile(m1.best_path)

    m2 = CheckpointManager(d, save_every=1, async_save=False)
    resumed = m2.maybe_resume()
    assert resumed is not None and m2.best_val == 3.1
    # a worse val loss must NOT overwrite best
    m2.save_step(2, _tree(), {"s": jnp.zeros(())}, 3.4, last_step=True)
    _, meta = load_checkpoint(m2.best_path)
    assert meta["val_loss"] == 3.1
    # a better one must
    m2.save_step(3, _tree(), {"s": jnp.zeros(())}, 2.9, last_step=True)
    _, meta = load_checkpoint(m2.best_path)
    assert meta["val_loss"] == 2.9


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


def test_disabled_manager_neither_writes_nor_resumes(tmp_path):
    """enabled=False means no writes AND no silent auto-resume: bring-up
    runs with --no-ckpt must not load a prior run's multi-GB tree."""
    params = {"w": jnp.zeros((4,))}
    opt = {"m": jnp.zeros((4,)), "step": jnp.int32(0)}
    live = CheckpointManager(str(tmp_path), save_every=1)
    live.save_step(1, params, opt, val_loss=1.0, last_step=True)
    live.wait()
    assert os.path.exists(live.last_path)

    off = CheckpointManager(str(tmp_path), save_every=1, enabled=False)
    assert off.maybe_resume() is None  # files exist, still no resume
    off.save_step(2, params, opt, val_loss=0.5, last_step=True)
    off.save_final(2, params, opt, val_loss=0.5)
    off.wait()
    _, meta = load_checkpoint(live.last_path)
    assert meta["step"] == 1  # disabled manager never touched the files
    assert not os.path.exists(live.final_path)


def test_save_every_zero_suppresses_rolling(tmp_path):
    """save_every=0: no rolling/last checkpoints (best-on-improvement and
    final still write — 'final only' bring-up mode)."""
    m = CheckpointManager(str(tmp_path), save_every=0)
    params = {"w": jnp.zeros((4,))}
    opt = {"m": jnp.zeros((4,)), "step": jnp.int32(0)}
    m.save_step(2, params, opt, val_loss=float("inf"), last_step=False)
    m.save_step(4, params, opt, val_loss=float("inf"), last_step=True)
    m.wait()
    assert not os.path.exists(m.last_path)
    m.save_step(5, params, opt, val_loss=1.0, last_step=False)  # best
    m.wait()
    assert os.path.exists(m.best_path) and not os.path.exists(m.last_path)


def test_async_write_failure_surfaces(tmp_path, monkeypatch):
    """A failed background checkpoint write must raise on the training
    thread (next save_step or wait), not scroll by on stderr while the
    run finishes 'successfully' with stale checkpoints."""
    import gpt2_vision_language_tpu.ckpt.checkpoint as ck

    m = CheckpointManager(str(tmp_path), save_every=1)
    params = {"w": jnp.zeros((4,))}
    opt = {"m": jnp.zeros((4,)), "step": jnp.int32(0)}

    def boom(*a, **k):
        raise OSError(28, "No space left on device")

    monkeypatch.setattr(ck, "save_checkpoint", boom)
    m.save_step(1, params, opt, val_loss=1.0, last_step=False)
    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        m.wait()
    # the error is consumed once; the manager is usable again
    monkeypatch.undo()
    m.save_step(2, params, opt, val_loss=0.5, last_step=False)
    m.wait()
    assert os.path.exists(m.last_path)
