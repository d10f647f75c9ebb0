"""Single- vs multi-device numerical equivalence (SURVEY §4).

The reference's DDP semantics (train.py:187: gradients all-reduce-averaged across
ranks, same model on every rank) translate to: a run on a 1-device mesh and a run on
an 8-device mesh with the SAME global batch, seed and data must produce the same loss
trajectory, the same psum-reduced validation metrics, and the same final parameters
(up to reduction-order float noise).  The trainer uses per-device batch semantics
(trainer.py: loader batch = batch_size * n_devices), so the configs compensate:
batch_size=8 on 1 device vs batch_size=1 on 8 devices.

A metric double-psum, per-device RNG divergence, or sharded-gather bug would fail
this test."""

import dataclasses

import jax
import numpy as np

from heal_swin_tpu.data.data import get_data_module
from heal_swin_tpu.models.tasks import MODEL_FROM_CONFIG_NAME
from heal_swin_tpu.tracking.mlflow_store import MlflowFileStore
from heal_swin_tpu.training.train_config import PLConfig
from heal_swin_tpu.training.trainer import Trainer
from heal_swin_tpu.utils.utils import get_config_from_config_path

CONFIG = "run_configs/swin_hp_test_run_config.py"
GLOBAL_BATCH = 8


def _train(tmp_path, n_devices, epochs=2):
    run_config = get_config_from_config_path(CONFIG, "get_train_run_config")
    data = dataclasses.replace(
        run_config.data,
        common=dataclasses.replace(
            run_config.data.common,
            batch_size=GLOBAL_BATCH // n_devices,
            val_batch_size=max(GLOBAL_BATCH // n_devices // 2, 1),
        ),
    )
    run_config = dataclasses.replace(run_config, data=data)

    dm, data_spec = get_data_module(run_config.data)
    task_cls = MODEL_FROM_CONFIG_NAME[type(run_config.model).__name__]
    task = task_cls(run_config.model, data_spec, run_config.data)

    store = MlflowFileStore(tmp_path / f"mlruns_{n_devices}")
    run = store.create_run("equivalence")
    pl = PLConfig(
        max_epochs=epochs, limit_train_batches=1, limit_val_batches=1,
        num_sanity_val_steps=0, log_every_n_steps=1, gpus=n_devices,
    )
    trainer = Trainer(pl, run_config.train, run=run, ckpt_dir=None)
    trainer.fit(task, dm)
    losses = [h[1] for h in run.get_metric_history("train_loss")]
    val_losses = [h[1] for h in run.get_metric_history("val_loss")]
    val_ious = [h[1] for h in run.get_metric_history("val_iou_global")]
    return losses, val_losses, val_ious, jax.device_get(trainer._params)


def test_1_vs_8_device_equivalence(tmp_path):
    assert len(jax.devices()) >= 8, "conftest must provide the 8-device CPU mesh"
    losses_1, vloss_1, viou_1, params_1 = _train(tmp_path, 1)
    losses_8, vloss_8, viou_8, params_8 = _train(tmp_path, 8)

    assert len(losses_1) == len(losses_8) == 2
    np.testing.assert_allclose(losses_1, losses_8, rtol=1e-5, atol=1e-6)
    assert len(vloss_1) == len(vloss_8) == 2
    np.testing.assert_allclose(vloss_1, vloss_8, rtol=1e-4, atol=1e-6)
    # iou is argmax-derived: all-reduce reduction-order noise (~1e-7/step) flips
    # near-tied pixels of the untrained model, so compare loosely — a padding
    # double-count or psum bug would shift it by far more than this tolerance
    # (exact mask semantics are pinned in tests/test_metric_oracle.py)
    assert len(viou_1) == len(viou_8) == 2
    np.testing.assert_allclose(viou_1, viou_8, rtol=0.05, atol=0.005)

    flat_1, _ = jax.tree_util.tree_flatten(params_1)
    flat_8, treedef = jax.tree_util.tree_flatten(params_8)
    assert len(flat_1) == len(flat_8)
    for a, b in zip(flat_1, flat_8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=str(treedef),
        )
