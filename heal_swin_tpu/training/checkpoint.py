"""Checkpoint management: top-k by monitored metric + last + best pointer.

Mirrors the reference's ModelCheckpoint behavior (reference heal_swin/train.py:83-90,
231-235): save_top_k=3 on ``ckpt_metric``, save_last=True, filenames
``epoch={e}_{metric}={value:.4f}.ckpt``, rank-0 copies the best to ``best.ckpt`` after
fit.  Checkpoints embed run_id + experiment (reference logging_callbacks.py:195-200).

Format: a single msgpack file (flax.serialization) holding params, opt_state, epoch,
global_step, rng key, scheduler state and metadata.  Restore targets a matching pytree
structure.  Params are device-replicated on load by the trainer.
"""

from __future__ import annotations

import os
import re
import shutil
import threading
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def _to_numpy_tree(tree):
    # jax.device_get issues copy_to_host_async on every buffer before blocking,
    # so the per-leaf transfer latency overlaps (vs a serial np.asarray per leaf
    # — ~1800 round trips for params+opt_state at paper scale).
    return jax.device_get(tree)


def serialize_checkpoint(params, opt_state, meta: Dict[str, Any]) -> bytes:
    state = {
        "params": serialization.to_state_dict(_to_numpy_tree(params)),
        "opt_state": serialization.to_state_dict(_to_numpy_tree(opt_state)),
        "meta": meta,
    }
    return serialization.msgpack_serialize(state)


def _write_bytes(path, data: bytes):
    tmp = str(path) + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def save_checkpoint(path, params, opt_state, meta: Dict[str, Any]):
    _write_bytes(path, serialize_checkpoint(params, opt_state, meta))


def _link_or_copy(src: Path, dst: Path):
    """Hardlink dst to src's current inode (instant, no extra I/O); copy as a
    fallback for filesystems without hardlinks.  A later atomic os.replace of
    src swaps its directory entry only, so dst keeps the linked content."""
    dst = Path(dst)
    dst.unlink(missing_ok=True)
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy(src, dst)


@jax.jit
def _snapshot_jit(tree):
    # jnp.copy inserts a real copy primitive, so the jaxpr is not an identity and
    # the outputs are fresh buffers (jit of a pure identity would return the input
    # arrays themselves, which the caller is about to donate).
    return jax.tree.map(jnp.copy, tree)


def _device_snapshot(tree):
    """Device-side copy of a pytree (one jitted HBM->HBM pass, ~ms at paper scale)
    so a background thread can fetch it to host while the caller keeps training —
    the train step donates params/opt_state, so the original buffers are invalid
    as soon as the next step is dispatched.  Pure-numpy trees pass through."""
    if not any(isinstance(x, jax.Array) for x in jax.tree_util.tree_leaves(tree)):
        return tree
    return _snapshot_jit(tree)


def load_checkpoint(path, params_like=None, opt_state_like=None):
    """Returns (params, opt_state, meta).  If *_like pytrees are given, restores into
    their structure (so jnp dtypes/shardings can be re-applied by the caller)."""
    with open(path, "rb") as f:
        state = serialization.msgpack_restore(f.read())
    params, opt_state, meta = state["params"], state["opt_state"], state.get("meta", {})
    if params_like is not None:
        params = serialization.from_state_dict(params_like, params)
    if opt_state_like is not None:
        opt_state = serialization.from_state_dict(opt_state_like, opt_state)
    return params, opt_state, meta


class CheckpointManager:
    """Top-k + last checkpointing, with asynchronous saves by default.

    ``save_epoch`` snapshots the state on DEVICE (one jitted HBM copy — the caller
    is free to keep training into donated buffers immediately) and hands the fetch
    + serialize + write to a background thread, overlapping the next epoch's
    compute.  At most one save is in flight: a new save (or ``flush``/
    ``finalize_best``/fit end) joins the previous one first, so top-k bookkeeping
    stays single-threaded and ordered.  The thread is non-daemon — if the process
    dies mid-epoch the pending write still completes (writes are tmp+rename
    atomic either way)."""

    def __init__(self, ckpt_dir, monitor: str, mode: str = "max", save_top_k: int = 3,
                 async_save: bool = True):
        self.dir = Path(ckpt_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.save_top_k = save_top_k
        self.async_save = async_save
        self.saved: List[tuple] = []  # (value, path)
        self._pending: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

    def _is_better(self, a, b):
        return a > b if self.mode == "max" else a < b

    def flush(self):
        """Wait for the in-flight save (if any); re-raise its error."""
        if self._pending is not None:
            self._pending.join()
            self._pending = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def save_epoch(self, epoch: int, metrics: Dict[str, float], params, opt_state,
                   meta: Dict[str, Any]):
        """Save last.ckpt always; save epoch ckpt if in top-k of the monitored metric.

        The state is fetched from device and serialized ONCE; the epoch file is a
        hardlink to last.ckpt's bytes (at paper scale the state is ~400 MB — a second
        fetch+write per epoch dominated wall time on slow disks)."""
        meta = dict(meta, epoch=epoch, metrics=metrics)
        if not self.async_save:
            self._save_job(epoch, params, opt_state, meta)
            return
        self.flush()
        params, opt_state = _device_snapshot((params, opt_state))
        self._pending = threading.Thread(
            target=self._save_job_guarded, args=(epoch, params, opt_state, meta),
            name=f"ckpt-save-epoch-{epoch}", daemon=False,
        )
        self._pending.start()

    def _save_job_guarded(self, epoch, params, opt_state, meta):
        try:
            self._save_job(epoch, params, opt_state, meta)
        except BaseException as e:  # surfaced by the next flush()
            self._error = e

    def _save_job(self, epoch, params, opt_state, meta):
        last = self.dir / "last.ckpt"
        _write_bytes(last, serialize_checkpoint(params, opt_state, meta))

        value = meta["metrics"].get(self.monitor)
        if value is None:
            return
        fname = f"epoch={epoch}_{self.monitor}={value:.4f}.ckpt"
        if len(self.saved) < self.save_top_k or any(
            self._is_better(value, v) for v, _ in self.saved
        ):
            path = self.dir / fname
            _link_or_copy(last, path)
            self.saved.append((value, path))
            self.saved.sort(key=lambda t: t[0], reverse=(self.mode == "max"))
            while len(self.saved) > self.save_top_k:
                _, worst = self.saved.pop()
                worst.unlink(missing_ok=True)

    def finalize_best(self) -> Optional[Path]:
        """Copy the best checkpoint to best.ckpt (reference train.py:231-235)."""
        self.flush()
        if not self.saved:
            return None
        best = self.saved[0][1]
        if best.exists():
            _link_or_copy(best, self.dir / "best.ckpt")
            return self.dir / "best.ckpt"
        return None


_EPOCH_RE = re.compile(r"epoch=(\d+)_.*\.ckpt$")


def find_checkpoint(artifacts_dir, epoch: Optional[str] = "best",
                    epoch_number: Optional[str] = None) -> Path:
    """Resolve a checkpoint inside an artifacts dir by selector
    best/last/number (reference utils.check_and_get_ckpt_paths, utils.py:141-198)."""
    d = Path(artifacts_dir)
    candidates = list(d.glob("**/*.ckpt"))
    if not candidates:
        raise FileNotFoundError(f"no checkpoints under {d}")
    base = candidates[0].parent
    if epoch == "best":
        p = base / "best.ckpt"
        if p.exists():
            return p
        epoch = "last"
    if epoch == "last":
        p = base / "last.ckpt"
        if p.exists():
            return p
        raise FileNotFoundError(f"last.ckpt not found under {base}")
    if epoch == "number":
        for c in candidates:
            m = _EPOCH_RE.match(c.name)
            if m and m.group(1) == str(epoch_number):
                return c
        raise FileNotFoundError(f"epoch={epoch_number} checkpoint not found under {base}")
    raise ValueError(f"unknown epoch selector: {epoch}")
