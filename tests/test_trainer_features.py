"""Trainer feature tests: max_steps, terminate_on_nan, early stopping and gradient
accumulation (the PLConfig passthroughs the reference inherits from Lightning —
train_config.py:104 terminate_on_nan, trainer flags max_steps / accumulate_grad_batches;
early stopping per reference train.py:106-114)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heal_swin_tpu.data.data import get_data_module
from heal_swin_tpu.models.tasks import MODEL_FROM_CONFIG_NAME
from heal_swin_tpu.tracking.mlflow_store import MlflowFileStore
from heal_swin_tpu.training.train_config import PLConfig
from heal_swin_tpu.training.trainer import Trainer
from heal_swin_tpu.utils.utils import get_config_from_config_path

CONFIG = "run_configs/swin_hp_test_run_config.py"


def _fit(tmp_path, pl_config, train_tweaks=None, model_tweaks=None, nan_loss=False):
    run_config = get_config_from_config_path(CONFIG, "get_train_run_config")
    if train_tweaks:
        run_config = dataclasses.replace(
            run_config, train=dataclasses.replace(run_config.train, **train_tweaks)
        )
    if model_tweaks:
        mc = run_config.model
        inner = dataclasses.replace(mc.swin_hp_transformer_config, **model_tweaks)
        run_config = dataclasses.replace(
            run_config, model=dataclasses.replace(mc, swin_hp_transformer_config=inner)
        )

    dm, data_spec = get_data_module(run_config.data)
    task_cls = MODEL_FROM_CONFIG_NAME[type(run_config.model).__name__]
    task = task_cls(run_config.model, data_spec, run_config.data)
    if nan_loss:
        orig = task.loss_fn

        def bad_loss(*a, **kw):
            loss, outputs = orig(*a, **kw)
            return loss * jnp.nan, outputs

        task.loss_fn = bad_loss

    store = MlflowFileStore(tmp_path / "mlruns")
    run = store.create_run("trainer_features")
    trainer = Trainer(pl_config, run_config.train, run=run,
                      ckpt_dir=run.artifact_dir / "checkpoints")
    result = trainer.fit(task, dm)
    return trainer, result


def test_max_steps_stops_mid_training(tmp_path):
    pl = PLConfig(max_epochs=5, max_steps=3, limit_train_batches=2,
                  limit_val_batches=1, num_sanity_val_steps=0, log_every_n_steps=1)
    trainer, result = _fit(tmp_path, pl)
    assert trainer.global_step == 3
    assert result.epochs_run < 5  # stopped by max_steps, not max_epochs


def test_terminate_on_nan_raises(tmp_path):
    pl = PLConfig(max_epochs=1, limit_train_batches=2, limit_val_batches=1,
                  num_sanity_val_steps=0, terminate_on_nan=True, log_every_n_steps=1)
    with pytest.raises(FloatingPointError, match="non-finite train loss"):
        _fit(tmp_path, pl, nan_loss=True)


def test_early_stopping_patience(tmp_path):
    # min_delta so large no epoch can ever "improve" -> stop after patience epochs
    pl = PLConfig(max_epochs=6, limit_train_batches=1, limit_val_batches=1,
                  num_sanity_val_steps=0, log_every_n_steps=1)
    trainer, result = _fit(
        tmp_path, pl,
        train_tweaks=dict(
            early_stopping=True, early_stopping_monitor="val_loss",
            early_stopping_mode="min", early_stopping_patience=1,
            early_stopping_min_delta=1e9, eval_after_train=False,
        ),
    )
    assert result.epochs_run == 2  # epoch 0 sets the baseline, epoch 1 trips patience


@pytest.mark.slow
def test_min_epochs_defers_early_stopping(tmp_path):
    """min_epochs keeps training past a tripped early-stopping patience
    (Lightning semantics)."""
    pl = PLConfig(max_epochs=6, min_epochs=4, limit_train_batches=1,
                  limit_val_batches=1, num_sanity_val_steps=0, log_every_n_steps=1)
    trainer, result = _fit(
        tmp_path, pl,
        train_tweaks=dict(
            early_stopping=True, early_stopping_monitor="val_loss",
            early_stopping_mode="min", early_stopping_patience=1,
            early_stopping_min_delta=1e9, eval_after_train=False,
        ),
    )
    assert result.epochs_run == 4  # patience trips at epoch 1 but min_epochs=4 holds


@pytest.mark.slow
def test_val_check_interval_mid_epoch(tmp_path):
    """val_check_interval=0.5 validates mid-epoch AND at epoch end (Lightning
    fraction semantics) — previously the field was accepted and silently ignored."""
    pl = PLConfig(max_epochs=1, limit_train_batches=4, limit_val_batches=1,
                  val_check_interval=0.5, num_sanity_val_steps=0,
                  log_every_n_steps=10**6, gpus=1)  # 1 device: 4 real train batches
    trainer, _ = _fit(tmp_path, pl, train_tweaks=dict(eval_after_train=False))
    hist = trainer.run.get_metric_history("val_loss")
    assert len(hist) == 2  # after batch 2 (50%) and at epoch end


def test_warn_on_ignored_pl_fields():
    """Non-default values on accepted-and-ignored PLConfig fields warn once;
    honored fields stay silent (training/train_config.py warn_ignored_fields)."""
    import warnings

    from heal_swin_tpu.training.train_config import warn_ignored_fields

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        bad = warn_ignored_fields(PLConfig(num_processes=4, sync_batchnorm=True))
    assert sorted(bad) == ["num_processes", "sync_batchnorm"]
    assert len(w) == 1 and "num_processes" in str(w[0].message)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ok = warn_ignored_fields(
            PLConfig(max_steps=5, val_check_interval=0.5, gradient_clip_val=1.0)
        )
    assert ok == [] and len(w) == 0


@pytest.mark.slow
def test_lr_find_range_test(tmp_path):
    """LR range test (reference auto_lr_find, train.py:204-217): sweeps lr
    exponentially and suggests a finite lr inside the sweep range."""
    run_config = get_config_from_config_path(CONFIG, "get_train_run_config")
    dm, data_spec = get_data_module(run_config.data)
    task_cls = MODEL_FROM_CONFIG_NAME[type(run_config.model).__name__]
    task = task_cls(run_config.model, data_spec, run_config.data)
    store = MlflowFileStore(tmp_path / "mlruns")
    run = store.create_run("lr_find")
    pl = PLConfig(max_epochs=1, num_sanity_val_steps=0, log_every_n_steps=1)
    trainer = Trainer(pl, run_config.train, run=run, ckpt_dir=None)

    suggestion, lrs, losses = trainer.lr_find(task, dm, min_lr=1e-6, max_lr=1e-1,
                                              num_training=25)
    assert len(lrs) == len(losses) > 5
    assert all(np.isfinite(l) for l in losses)
    assert suggestion is not None and 1e-6 <= suggestion <= 1e-1
    # the sweep is exponential: lrs strictly increasing
    assert all(b > a for a, b in zip(lrs, lrs[1:]))


@pytest.mark.slow
def test_lr_find_under_seq_parallel(tmp_path):
    """lr_find on a (data=4, seq=2) mesh: the jit sweep replicates over 'seq' and
    must match the dp-only sweep's losses exactly (same global batches, same rng)."""
    run_config = get_config_from_config_path(CONFIG, "get_train_run_config")
    dm, data_spec = get_data_module(run_config.data)
    task_cls = MODEL_FROM_CONFIG_NAME[type(run_config.model).__name__]
    task = task_cls(run_config.model, data_spec, run_config.data)
    store = MlflowFileStore(tmp_path / "mlruns")

    def sweep(gpus, sp):
        pl = PLConfig(max_epochs=1, num_sanity_val_steps=0, log_every_n_steps=1,
                      gpus=gpus, seq_parallel_devices=sp)
        trainer = Trainer(pl, run_config.train, run=store.create_run("lr"),
                          ckpt_dir=None)
        return trainer.lr_find(task, dm, min_lr=1e-6, max_lr=1e-1, num_training=8)

    sug_dp, lrs_dp, losses_dp = sweep(gpus=4, sp=1)
    sug_sp, lrs_sp, losses_sp = sweep(gpus=8, sp=2)
    np.testing.assert_allclose(losses_sp, losses_dp, rtol=1e-5, atol=1e-7)
    assert lrs_sp == lrs_dp


@pytest.mark.slow
def test_grad_accumulation_matches_bigger_batch(tmp_path):
    """accumulate_grad_batches=2 @ batch 2 must equal one optimizer step @ batch 4
    (optax.MultiSteps averages the micro-batch gradients; losses are batch means)."""
    det = dict(drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0)

    def final_params(batch_size, accum, n_batches):
        run_config = get_config_from_config_path(CONFIG, "get_train_run_config")
        data = dataclasses.replace(
            run_config.data,
            common=dataclasses.replace(run_config.data.common, batch_size=batch_size),
        )
        run_config = dataclasses.replace(run_config, data=data)
        pl = PLConfig(max_epochs=1, limit_train_batches=n_batches, limit_val_batches=1,
                      num_sanity_val_steps=0, accumulate_grad_batches=accum,
                      gpus=1, log_every_n_steps=100)
        trainer, _ = _fit_with_config(tmp_path, run_config, pl, det)
        return trainer._params

    def _fit_with_config(tmp_path, run_config, pl, model_tweaks):
        mc = run_config.model
        inner = dataclasses.replace(mc.swin_hp_transformer_config, **model_tweaks)
        run_config = dataclasses.replace(
            run_config, model=dataclasses.replace(mc, swin_hp_transformer_config=inner)
        )
        dm, data_spec = get_data_module(run_config.data)
        task_cls = MODEL_FROM_CONFIG_NAME[type(run_config.model).__name__]
        task = task_cls(run_config.model, data_spec, run_config.data)
        store = MlflowFileStore(tmp_path / "mlruns")
        run = store.create_run("trainer_features")
        trainer = Trainer(pl, run_config.train, run=run,
                          ckpt_dir=run.artifact_dir / "checkpoints")
        result = trainer.fit(task, dm)
        return trainer, result

    p_accum = final_params(batch_size=2, accum=2, n_batches=2)
    p_big = final_params(batch_size=4, accum=1, n_batches=1)

    flat_a = jax.tree.leaves(p_accum)
    flat_b = jax.tree.leaves(p_big)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


def test_precision_16_maps_to_bfloat16():
    """PLConfig.precision=16 (the reference's Lightning AMP flag) sets bfloat16 compute
    on the inner transformer config unless a dtype is already pinned."""
    from heal_swin_tpu.train import apply_precision

    run_config = get_config_from_config_path(CONFIG, "get_train_run_config")
    out = apply_precision(run_config, PLConfig(precision=16))
    assert out.model.swin_hp_transformer_config.dtype == "bfloat16"
    # precision=32 leaves it alone
    out32 = apply_precision(run_config, PLConfig(precision=32))
    assert out32.model.swin_hp_transformer_config.dtype is None
    # an explicit dtype wins
    pinned = dataclasses.replace(
        run_config,
        model=dataclasses.replace(
            run_config.model,
            swin_hp_transformer_config=dataclasses.replace(
                run_config.model.swin_hp_transformer_config, dtype="float32"
            ),
        ),
    )
    outp = apply_precision(pinned, PLConfig(precision=16))
    assert outp.model.swin_hp_transformer_config.dtype == "float32"


def test_make_optimizer_clipped_still_clips(tmp_path):
    """make_optimizer with gradient_clip_val>0: huge synthetic grads come out
    globally clipped (update magnitude bounded) and the injected lr stays
    adjustable."""
    from heal_swin_tpu.training.optimizer import (
        OptimizerConfig, get_learning_rate, make_optimizer, set_learning_rate,
    )

    params = {"w": jnp.zeros((8, 8), jnp.float32)}
    tx = make_optimizer(OptimizerConfig(learning_rate=1.0), gradient_clip_val=1.0)
    state = tx.init(params)
    grads = {"w": jnp.full((8, 8), 1e6, jnp.float32)}
    updates, state = jax.jit(tx.update)(grads, state, params)
    # after global-norm clip to 1.0 the adam step is ~ -lr * sign-ish; bounded
    assert float(jnp.abs(updates["w"]).max()) < 10.0
    state = set_learning_rate(state, 0.5)
    assert get_learning_rate(state) == 0.5
