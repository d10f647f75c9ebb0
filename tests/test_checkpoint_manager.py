"""Unit tests for the checkpoint manager (async saves, top-k rotation, hardlinks).

The trainer e2e tests exercise the manager through full runs; these pin the unit
semantics: device snapshots survive donation of the original buffers, async saves
are ordered and flushed by finalize_best, worker errors surface, and rotation
keeps top-k by the monitored metric (reference ModelCheckpoint semantics,
heal_swin/train.py:83-90).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heal_swin_tpu.training import checkpoint as ckpt


def _state(val):
    params = {"w": jnp.full((4, 4), val, jnp.float32), "b": jnp.zeros((4,))}
    opt = {"mu": jnp.full((4, 4), val * 2, jnp.float32), "count": jnp.zeros((), jnp.int32)}
    return params, opt


def test_device_snapshot_survives_donation():
    params, opt = _state(1.0)
    snap_p, snap_o = ckpt._device_snapshot((params, opt))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def consume(p):
        return jax.tree.map(lambda x: x * 0, p)

    consume(params)  # invalidates the original buffers
    with pytest.raises(RuntimeError):
        np.asarray(params["w"])
    np.testing.assert_array_equal(np.asarray(snap_p["w"]), np.full((4, 4), 1.0))
    np.testing.assert_array_equal(np.asarray(snap_o["mu"]), np.full((4, 4), 2.0))


def test_async_rotation_and_hardlinks(tmp_path):
    mgr = ckpt.CheckpointManager(tmp_path, monitor="m", mode="max", save_top_k=2)
    for epoch, m in enumerate([0.1, 0.5, 0.3, 0.7]):
        params, opt = _state(float(epoch))
        mgr.save_epoch(epoch, {"m": m}, params, opt, {"run_id": "r"})
    best = mgr.finalize_best()

    names = sorted(p.name for p in tmp_path.glob("*.ckpt"))
    assert names == [
        "best.ckpt",
        "epoch=1_m=0.5000.ckpt",
        "epoch=3_m=0.7000.ckpt",
        "last.ckpt",
    ]
    # best points at epoch 3 (highest m); last is also epoch 3 (chronologically last)
    p, o, meta = ckpt.load_checkpoint(best)
    assert meta["epoch"] == 3 and meta["metrics"]["m"] == 0.7
    assert np.asarray(p["w"]).flat[0] == 3.0
    # the epoch file shares last.ckpt's bytes via hardlink (or equal copy)
    p2, _, meta2 = ckpt.load_checkpoint(tmp_path / "epoch=3_m=0.7000.ckpt")
    assert meta2 == meta


def test_async_last_not_clobbered_by_later_epochs(tmp_path):
    """os.replace of last.ckpt must not mutate earlier hardlinked epoch files."""
    mgr = ckpt.CheckpointManager(tmp_path, monitor="m", mode="max", save_top_k=3)
    for epoch in range(3):
        params, opt = _state(float(epoch))
        mgr.save_epoch(epoch, {"m": 1.0 - 0.1 * epoch}, params, opt, {})
    mgr.flush()
    p, _, meta = ckpt.load_checkpoint(tmp_path / "epoch=0_m=1.0000.ckpt")
    assert meta["epoch"] == 0 and np.asarray(p["w"]).flat[0] == 0.0
    _, _, meta_last = ckpt.load_checkpoint(tmp_path / "last.ckpt")
    assert meta_last["epoch"] == 2


def test_worker_error_surfaces_on_flush(tmp_path, monkeypatch):
    mgr = ckpt.CheckpointManager(tmp_path, monitor="m")

    def boom(*a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(ckpt, "_write_bytes", boom)
    params, opt = _state(0.0)
    mgr.save_epoch(0, {"m": 0.1}, params, opt, {})
    with pytest.raises(OSError, match="disk full"):
        mgr.flush()


def test_sync_mode(tmp_path):
    mgr = ckpt.CheckpointManager(tmp_path, monitor="m", async_save=False)
    params, opt = _state(5.0)
    mgr.save_epoch(0, {"m": 0.9}, params, opt, {})
    assert (tmp_path / "last.ckpt").exists()
    assert (tmp_path / "epoch=0_m=0.9000.ckpt").exists()
