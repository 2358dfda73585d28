"""Atomic rolling checkpoints with last/best/final triad and auto-resume.

Reproduces the reference checkpoint manager semantics
(train_gpt2.py:307-329,363-391,494-508):
  * write to a `.tmp` file then `os.replace` -> atomic rolling `last`
  * `best` written whenever val loss improves
  * `final` at end of training
  * auto-resume restores params, optimizer state and start_step.

Format: a single `.npz` per checkpoint holding every pytree leaf under a
"/"-joined path key, plus a JSON metadata blob. Device arrays are fetched
to host first; loading restores plain numpy which JAX re-shards lazily on
first use (device placement is owned by the train step's shardings, not by
the checkpoint).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax


_BF16_TAG = "::bfloat16"


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(k, "key", getattr(k, "idx", getattr(k, "name", k))))
            for k in path
        )
        arr = np.asarray(leaf)
        if arr.dtype == _bf16():
            # np.savez cannot round-trip ml_dtypes.bfloat16; store the raw
            # bits as uint16 with a dtype tag in the key
            key += _BF16_TAG
            arr = arr.view(np.uint16)
        flat[key] = arr
    return flat


def _bf16():
    import ml_dtypes

    return np.dtype(ml_dtypes.bfloat16)


def _set_path(tree: dict, parts, value):
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: dict = {}
    for key, val in flat.items():
        if key.endswith(_BF16_TAG):
            key = key[: -len(_BF16_TAG)]
            val = val.view(_bf16())
        _set_path(tree, key.split("/"), val)
    return tree


def tree_to_host(tree) -> Any:
    """Fetch a (possibly mesh-sharded) pytree to host numpy.

    Fully-addressable arrays (single-process, any sharding) come back via
    device_get. On multi-host meshes, TP/SP-sharded leaves are not fully
    addressable: they are reassembled with a process_allgather — a
    COLLECTIVE, so this must be called on every process (the reference's
    master-only `torch.save` works because DDP replicates everything,
    train_gpt2.py:363-375; with model parallelism the gather has to happen
    everywhere and only the WRITE is master-only)."""

    def leaf(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            if x.is_fully_replicated:
                return np.asarray(x.addressable_data(0))
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(jax.device_get(x))

    return jax.tree.map(leaf, tree)


def save_checkpoint(path: str, tree: Any, meta: Optional[dict] = None) -> None:
    """Atomically write `tree` (+ JSON-able `meta`) to `path` (.npz)."""
    tree = tree_to_host(tree)
    flat = _flatten(tree)
    meta_json = json.dumps(meta or {})
    directory = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(directory, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, __meta__=np.frombuffer(meta_json.encode(), dtype=np.uint8), **flat)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_checkpoint(path: str) -> Tuple[Any, dict]:
    """Load a checkpoint -> (tree, meta)."""
    with np.load(path, allow_pickle=False) as z:
        meta_raw = z["__meta__"].tobytes().decode() if "__meta__" in z else "{}"
        flat = {k: z[k] for k in z.files if k != "__meta__"}
    return _unflatten(flat), json.loads(meta_raw)


class CheckpointManager:
    """last/best/final triad with the reference's cadence and atomicity.

    Async mode (default): the device->host snapshot happens on the caller's
    thread (cheap, and consistent with the step it belongs to), while the
    ~GB npz serialization + atomic rename runs on a background thread so
    training never stalls on disk. `wait()` joins outstanding writes;
    final save always waits.
    """

    LAST = "model_last.npz"
    BEST = "model_best.npz"
    FINAL = "model_final.npz"

    def __init__(
        self,
        ckpt_dir: str,
        save_every: int = 2500,
        async_save: bool = True,
        is_master: bool = True,
        enabled: bool = True,
    ):
        """is_master: multi-host runs construct the manager on EVERY process
        and call save_step/save_final on every process (the host gather is
        a collective for model-parallel shardings — see tree_to_host); only
        the master process touches the filesystem.

        enabled=False turns every save into a no-op (skipping the gather
        too) — for runs where the multi-GB device->host fetch itself is the
        risk or the bottleneck (e.g. benchmarking 1.5B-param configs over
        a thin host link)."""
        self.dir = ckpt_dir
        self.save_every = save_every
        self.best_val = float("inf")
        self.async_save = async_save
        self.is_master = is_master
        self.enabled = enabled
        self._inflight = {}  # path -> last writer thread (ordering)
        self._async_error = None  # first background write failure
        if is_master and enabled:
            os.makedirs(ckpt_dir, exist_ok=True)

    def _write(self, path, host_tree, meta):
        """Write an ALREADY-GATHERED host tree (callers run tree_to_host
        once per step — it is the expensive, blocking device->host fetch
        and, on multi-host model-parallel shardings, a collective)."""
        if not self.is_master:
            return
        if not self.async_save:
            save_checkpoint(path, host_tree, meta)
            return
        import threading
        prev = self._inflight.get(path)

        def run():
            # chain on the previous write to the SAME path so an older
            # snapshot can never land after a newer one
            if prev is not None:
                prev.join()
            try:
                save_checkpoint(path, host_tree, meta)
            except BaseException as e:  # noqa: BLE001 — re-raised on the
                # training thread below: a daemon thread's traceback alone
                # would let a run finish "successfully" with hours of state
                # silently unsaved (e.g. ENOSPC mid-run)
                if self._async_error is None:
                    self._async_error = e

        th = threading.Thread(target=run, daemon=True)
        th.start()
        self._inflight[path] = th

    def _raise_async_error(self):
        if self._async_error is not None:
            e, self._async_error = self._async_error, None
            raise RuntimeError(
                "async checkpoint write failed (checkpoints on disk are "
                "stale); see chained exception"
            ) from e

    def wait(self):
        for t in list(self._inflight.values()):
            t.join()
        self._inflight = {}
        self._raise_async_error()

    @property
    def last_path(self) -> str:
        return os.path.join(self.dir, self.LAST)

    @property
    def best_path(self) -> str:
        return os.path.join(self.dir, self.BEST)

    @property
    def final_path(self) -> str:
        return os.path.join(self.dir, self.FINAL)

    def maybe_resume(self) -> Optional[Tuple[Any, dict]]:
        """Auto-resume from rolling `last` if present (train_gpt2.py:319-325).

        Also re-seeds best_val from model_best's metadata so a resumed run
        cannot clobber the historic best checkpoint with a worse model
        (best_val would otherwise restart at +inf). Multi-host: every
        process must see the same checkpoint files (shared or synced
        filesystem) — verified with an allgather of the resumed step.

        enabled=False disables resume too: 'no checkpointing' means the
        run neither writes NOR auto-loads a prior run's multi-GB tree
        (over a thin host link the silent load is exactly the cost the
        flag exists to avoid, and resuming at step N from a bring-up
        flag is surprising semantics)."""
        if not self.enabled:
            return None
        self.wait()
        if os.path.isfile(self.best_path):
            try:
                _, best_meta = load_checkpoint(self.best_path)
                if best_meta.get("val_loss") is not None:
                    self.best_val = float(best_meta["val_loss"])
            except Exception:
                pass  # unreadable best: keep +inf, never block resume
        found = os.path.isfile(self.last_path)
        resumed = load_checkpoint(self.last_path) if found else None
        if jax.process_count() > 1:
            import numpy as _np
            from jax.experimental import multihost_utils

            step = int(resumed[1].get("step", -1)) if resumed else -1
            steps = multihost_utils.process_allgather(
                _np.asarray([step], _np.int64)
            )
            assert int(steps.min()) == int(steps.max()), (
                "checkpoint resume state differs across processes "
                f"(steps {steps.ravel().tolist()}): every process needs "
                "the same shared/synced checkpoint directory"
            )
        return resumed

    def state_tree(self, params, opt_state) -> dict:
        return {"params": params, "opt_state": opt_state}

    def save_step(
        self, step: int, params, opt_state, val_loss: float, *, last_step: bool, meta=None
    ) -> None:
        """Rolling + best writes on the reference cadence
        (train_gpt2.py:363-391)."""
        if not self.enabled:
            return
        self._raise_async_error()  # surface a failed background write NOW
        m = dict(meta or {})
        m.update({"step": step, "val_loss": float(val_loss)})
        rolling = (
            self.save_every > 0
            and step > 0
            and (step % self.save_every == 0 or last_step)
        )
        best = val_loss < self.best_val
        if not (rolling or best):
            return
        # one device->host gather per step, shared by both writes (and on
        # multi-host a collective — val_loss is replicated, so every
        # process takes this branch identically)
        host_tree = tree_to_host(self.state_tree(params, opt_state))
        if rolling:
            self._write(self.last_path, host_tree, m)
        if best:
            self.best_val = float(val_loss)
            self._write(self.best_path, host_tree, m)

    def save_final(self, step: int, params, opt_state, val_loss=None, meta=None) -> None:
        if not self.enabled:
            return
        m = dict(meta or {})
        m.update({"step": step, "val_loss": val_loss})
        # gather is collective (all processes), write is master-only, sync
        host_tree = tree_to_host(self.state_tree(params, opt_state))
        if self.is_master:
            save_checkpoint(self.final_path, host_tree, m)
        self.wait()
