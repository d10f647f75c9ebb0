"""Training entry point: mirrors reference ``heal_swin/train.py``.

``train_model(run_config, pl_config, config_path)`` builds the datamodule, task and
trainer, snapshots all configs into the run's artifacts (dill + verbatim config file,
reference train.py:122-146), logs flattened hyperparameters with the reference's
prefixes (:219-227), fits, copies the best checkpoint, optionally evaluates, and prints
``This run has id <id>`` (the string the reference's tests parse).
"""

from __future__ import annotations

import argparse
import shutil
import sys
import traceback
from dataclasses import asdict
from pathlib import Path

import numpy as np

from heal_swin_tpu.data.data import get_data_module
from heal_swin_tpu.models.tasks import MODEL_FROM_CONFIG_NAME
from heal_swin_tpu.tracking.mlflow_store import MlflowFileStore
from heal_swin_tpu.training.train_config import PLConfig, SingleModelTrainRun
from heal_swin_tpu.training.trainer import Trainer
from heal_swin_tpu.utils import serialize, utils


def get_effective_batch_size(run_config, pl_config, n_devices: int) -> int:
    """effective batch = batch * devices * nodes * accumulation (reference :34-41)."""
    accum = pl_config.accumulate_grad_batches
    accum = accum if isinstance(accum, int) else 1
    return run_config.data.common.batch_size * n_devices * pl_config.num_nodes * accum


def apply_precision(run_config: SingleModelTrainRun, pl_config: PLConfig):
    """Honor PLConfig.precision (reference Lightning AMP flag): 16 -> bfloat16 compute
    on the inner transformer config unless the config already pins a dtype."""
    if pl_config.precision not in (16, "16", "bf16", "bfloat16"):
        return run_config
    import dataclasses

    mc = run_config.model
    for field in ("swin_hp_transformer_config", "swin_transformer_config"):
        inner = getattr(mc, field, None)
        if inner is not None and inner.dtype is None:
            mc = dataclasses.replace(mc, **{field: dataclasses.replace(inner, dtype="bfloat16")})
    return dataclasses.replace(run_config, model=mc)


def save_config(artifacts_dir: Path, run_config, pl_config, task, data_spec, config_path=None):
    """Dill-pickle the 6 config objects + verbatim config file (reference :122-146)."""
    d = Path(artifacts_dir)
    serialize.save(run_config.train, d / "train_config")
    serialize.save(pl_config, d / "pl_config")
    serialize.save(run_config.model, d / "model_config")
    serialize.save(data_spec, d / "data_spec")
    serialize.save(run_config.data, d / "data_config")
    serialize.save(run_config, d / "run_config")
    if config_path is not None and Path(config_path).exists():
        shutil.copy(config_path, d / Path(config_path).name)


def train_model(
    run_config: SingleModelTrainRun,
    pl_config: PLConfig,
    config_path=None,
    store: MlflowFileStore = None,
):
    run_config = apply_precision(run_config, pl_config)
    train_config = run_config.train

    # multi-host rendezvous (replaces the reference's MASTER_ADDR/MASTER_PORT DDP
    # setup, run.py:38-41); no-op for single-host runs
    from heal_swin_tpu.parallel import maybe_initialize_distributed

    maybe_initialize_distributed(pl_config.num_nodes)
    import jax

    is_global_zero = jax.process_index() == 0

    if train_config.seed is not None:
        np.random.seed(train_config.seed)

    dm, data_spec = get_data_module(run_config.data)

    # rank 0 owns tracking + checkpoints (reference MLFlowLogging deactivates on
    # non-zero ranks, logging_callbacks.py:134)
    run = None
    if is_global_zero:
        # a running tracking server (lockfile) captures the logging over HTTP,
        # like the reference's get_tracking_uri routing (mlflow_utils.py:8-19)
        from heal_swin_tpu import tracking

        store = store or tracking.get_store()
        run = store.create_run(train_config.mlflow_expmt, run_name=train_config.job_id)
        print(f"This run has id {run.run_id}")

    task_cls = MODEL_FROM_CONFIG_NAME[type(run_config.model).__name__]
    task = task_cls(run_config.model, data_spec, run_config.data)

    ckpt_dir = run.artifact_dir / "checkpoints" if run is not None else None
    trainer = Trainer(pl_config, train_config, run=run, ckpt_dir=ckpt_dir)

    if run is not None:
        save_config(run.artifact_dir, run_config, pl_config, task, data_spec, config_path)

    if pl_config.auto_lr_find:
        # LR range test before the real fit (reference train.py:204-217 via the
        # Lightning tuner); replaces the configured lr and stores the sweep plot
        import dataclasses

        suggestion, lrs, losses = trainer.lr_find(task, dm)
        if suggestion is not None:
            task.optimizer_config = dataclasses.replace(
                task.optimizer_config, learning_rate=suggestion
            )
            if run is not None:
                run.log_param("auto_lr_find.lr", suggestion)
            print(f"auto_lr_find suggested lr={suggestion:.3e}")
            try:
                import matplotlib

                matplotlib.use("Agg")
                import matplotlib.pyplot as plt

                fig, ax = plt.subplots()
                ax.plot(lrs, losses)
                ax.axvline(suggestion, color="red", ls="--", label=f"lr={suggestion:.2e}")
                ax.set_xscale("log")
                ax.set_xlabel("learning rate")
                ax.set_ylabel("smoothed loss")
                ax.legend()
                if run is not None:
                    fig.savefig(run.artifact_dir / "lr_find_plot.png",
                                bbox_inches="tight")
                plt.close(fig)
            except Exception:
                pass  # plotting is best-effort (headless images without matplotlib)

    # hyperparameters with the reference's prefixes (train.py:219-227)
    params = {}
    params.update(serialize.flatten_config(train_config, "train."))
    params.update(serialize.flatten_config(run_config.model, "model."))
    params.update(serialize.flatten_config(run_config.data, "data."))
    params.update(serialize.flatten_config(data_spec, "data_spec."))
    params["batch_size"] = run_config.data.common.batch_size
    params["effective_batch_size"] = get_effective_batch_size(
        run_config, pl_config, trainer.n_devices
    )
    params["n_devices"] = trainer.n_devices
    try:
        from heal_swin_tpu.models.flops import model_flops

        params["model_flops"] = model_flops(run_config.model, data_spec)["total"]
    except Exception:
        pass  # analytic counter only supports the two SWIN families
    if run is not None:
        run.log_params(params)
        run.set_tag("cmd", " ".join(sys.argv))
        if train_config.description:
            run.set_tag("mlflow.note.content", train_config.description)

    try:
        result = trainer.fit(task, dm)
        # total parameter count (reference logging_callbacks.py:47-59)
        import jax

        if run is not None:
            n_params = sum(int(p.size) for p in jax.tree.leaves(trainer._params))
            run.log_param("total_params", n_params)
            # per-top-level-module decomposition (reference logging_callbacks.py:47-59)
            tree = trainer._params.get("params", trainer._params)
            if isinstance(tree, dict):
                for mod, sub in tree.items():
                    run.log_param(
                        f"total_params.{mod}",
                        sum(int(p.size) for p in jax.tree.leaves(sub)),
                    )

        if (train_config.eval_after_train and not pl_config.fast_dev_run
                and run is not None and trainer.n_processes == 1):
            # (multi-host runs skip in-process eval: writers are single-host —
            # run `run.py evaluate` on one host afterwards)
            # run the full evaluation with a default EvaluateConfig, like the
            # reference (train.py:250-269); metrics land in this run with the
            # evaluate_best_ prefix
            from heal_swin_tpu.evaluate import evaluate as run_evaluate
            from heal_swin_tpu.evaluation.evaluate_config import EvaluateConfig

            eval_config = EvaluateConfig(
                path=run.run_id,
                epoch="best",
                data_config=run_config.data,
                train_config=train_config,
            )
            run_evaluate(eval_config, pl_config)

        if run is not None:
            run.set_status("FINISHED")
        return (run.run_id if run is not None else None), result
    except BaseException:
        if run is not None:
            run.set_status("KILLED")
        traceback.print_exc()
        raise
    finally:
        if trainer.n_processes > 1:
            # Non-zero ranks have no post-fit work (checkpoints/eval/tracking are
            # rank-0-only) and would otherwise reach jax.distributed's atexit
            # shutdown barrier minutes before rank 0 on a loaded host — the
            # barrier then times out and the coordination service kills every
            # task.  Hold all ranks here until rank 0's writes are done so the
            # processes exit together.  In a finally so ranks also converge when
            # one of them raises (the coordination service kills the group if a
            # peer died before reaching the barrier — same outcome as before,
            # but the common both-alive failure path now exits cleanly).
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("train_model_done")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", required=True)
    args = parser.parse_args()
    run_config = utils.get_config_from_config_path(args.config_path, "get_train_run_config")
    pl_config = utils.get_config_from_config_path(args.config_path, "get_pl_config")
    train_model(run_config, pl_config, config_path=args.config_path)


if __name__ == "__main__":
    main()
