"""Multi-host (multi-process) data parallelism without a cluster.

Launches 2 coordinator-connected CPU processes x 4 virtual devices each
(tests/multihost_worker.py) — the same 8-device data mesh the rest of the suite
uses in one process — runs the real train_model, and asserts the loss/metric
trajectories match the single-process 8-device run exactly.  This is the DCN
analogue of the 1-vs-8-device equivalence test (SURVEY.md §4; reference DDP
semantics train.py:187, num_nodes train_config.py:68)."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # two coordinator-connected subprocess trainings, ~8 min (fast tier: run.py test-repo)

REPO = Path(__file__).resolve().parent.parent
EPOCHS = 2


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _history(mlruns, run_id, metric):
    from heal_swin_tpu.tracking.mlflow_store import MlflowFileStore

    run = MlflowFileStore(mlruns).get_run(run_id)
    return [(step, v) for _, v, step in run.get_metric_history(metric)]


def _spawn_workers(mh_mlruns, sp=1):
    """2 coordinator-connected processes x 4 virtual devices; returns the MH run id."""
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            HEAL_SWIN_MLRUNS=str(mh_mlruns),
            HEAL_SWIN_TEST_SP=str(sp),
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "tests/multihost_worker.py", str(EPOCHS)],
                cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
    assert "MH_OK process=1" in outs[1]
    run_id = [ln for ln in outs[0].splitlines() if ln.startswith("MH_RUN_ID=")][0]
    return run_id.split("=", 1)[1]


def _reference_run(tmp_path, monkeypatch, sp=1):
    """The same config on the in-process 8-device mesh."""
    from heal_swin_tpu.train import train_model

    sys.path.insert(0, str(REPO / "tests"))
    from multihost_worker import tiny_run_config

    ref_mlruns = tmp_path / f"mlruns_ref_sp{sp}"
    monkeypatch.setenv("HEAL_SWIN_MLRUNS", str(ref_mlruns))
    monkeypatch.setenv("HEAL_SWIN_TEST_SP", str(sp))
    run_config, pl_config = tiny_run_config(max_epochs=EPOCHS)
    ref_run_id, _ = train_model(run_config, pl_config)
    return ref_mlruns, ref_run_id


def test_two_process_training_matches_single_process(tmp_path, monkeypatch):
    mh_mlruns = tmp_path / "mlruns_mh"
    run_id = _spawn_workers(mh_mlruns)
    ref_mlruns, ref_run_id = _reference_run(tmp_path, monkeypatch)

    for metric in ["train_loss", "val_loss", "val_iou_global", "train_acc"]:
        mh = _history(mh_mlruns, run_id, metric)
        ref = _history(ref_mlruns, ref_run_id, metric)
        assert len(mh) == len(ref) and len(mh) >= 1, metric
        for (s1, v1), (s2, v2) in zip(mh, ref):
            assert s1 == s2, metric
            np.testing.assert_allclose(v1, v2, rtol=1e-4, atol=1e-5, err_msg=metric)

    # rank 0 owned checkpoints: top-k + last written once, loadable
    ckpts = list((mh_mlruns).glob("**/checkpoints/*.ckpt"))
    assert any(c.name == "last.ckpt" for c in ckpts)
    assert any(c.name == "best.ckpt" for c in ckpts)


def test_two_process_seq_parallel_matches_single_process(tmp_path, monkeypatch):
    """DCN data parallelism x ICI sequence parallelism: 2 processes x 4 devices
    with seq_parallel_devices=2 (a global dp4 x sp2 mesh whose sequence groups are
    host-local) reproduces the single-process dp4 x sp2 run exactly — the shard_map
    step, the per-host batch slicing, and the psum'd loss/metrics all compose
    across the process boundary."""
    mh_mlruns = tmp_path / "mlruns_mh_sp"
    run_id = _spawn_workers(mh_mlruns, sp=2)
    ref_mlruns, ref_run_id = _reference_run(tmp_path, monkeypatch, sp=2)

    for metric in ["train_loss", "val_loss", "val_iou_global", "train_acc"]:
        mh = _history(mh_mlruns, run_id, metric)
        ref = _history(ref_mlruns, ref_run_id, metric)
        assert len(mh) == len(ref) and len(mh) >= 1, metric
        for (s1, v1), (s2, v2) in zip(mh, ref):
            assert s1 == s2, metric
            np.testing.assert_allclose(v1, v2, rtol=1e-4, atol=1e-5, err_msg=metric)
