"""The training engine: replaces pytorch-lightning's Trainer with a jit/pjit loop.

TPU-native design (SURVEY.md §7.1 step 4, §5.8):
- one ``jax.sharding.Mesh`` over the data axis; params/optimizer state replicated,
  batches sharded on axis 0 (XLA inserts the gradient all-reduce over ICI);
- ``batch_size`` keeps the reference's per-device meaning: the loader produces global
  batches of ``batch_size * n_devices`` (reference effective-batch accounting,
  train.py:34-59);
- ONE jitted train step (donated params/opt/metric state) and one jitted eval step;
  metrics accumulate on device as confusion-matrix / sum states — no per-step host sync
  (loss is fetched at epoch end or every ``log_every_n_steps``);
- LR schedulers run host-side between epochs through an injected optax hyperparameter
  (no recompiles);
- ragged validation batches are padded to the mesh size with a sample mask, instead of
  the reference's forced single-device evaluation (evaluate.py:98-105);
- optional sequence parallelism (``PLConfig.seq_parallel_devices``): a 2-D
  (data, seq) mesh where each sample's HEALPix token sequence shards across devices;
  the steps then run under ``jax.shard_map`` with explicit psum'd loss terms and
  metric increments (parallel/sequence.py).

Honored PLConfig flags are documented in training/train_config.py.
"""

from __future__ import annotations

import itertools
import math
import time
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from heal_swin_tpu.parallel import (batch_sharded, local_batch_rows, make_data_mesh,
                                    put_replicated, replicated)
from heal_swin_tpu.training import checkpoint as ckpt_lib
from heal_swin_tpu.training.optimizer import (
    get_learning_rate,
    make_optimizer,
    make_scheduler,
    set_learning_rate,
)
from heal_swin_tpu.training.train_config import PLConfig, TrainConfig


def _limit(n_batches: int, limit) -> int:
    if isinstance(limit, bool):
        return n_batches
    if isinstance(limit, float):
        return max(1, int(n_batches * limit)) if limit < 1.0 else n_batches
    return min(n_batches, int(limit))


@dataclass
class FitResult:
    epochs_run: int
    global_step: int
    best_ckpt_path: Optional[str]
    last_metrics: Dict[str, float]


class Trainer:
    def __init__(
        self,
        pl_config: PLConfig,
        train_config: Optional[TrainConfig] = None,
        run=None,  # tracking.mlflow_store.MlflowRun or None
        ckpt_dir=None,
    ):
        self.pl = pl_config
        self.tc = train_config or TrainConfig()
        self.run = run
        # surface silently-ignored reference flags once per run
        from heal_swin_tpu.training.train_config import warn_ignored_fields

        warn_ignored_fields(pl_config)

        # sequence parallelism (TPU extension, parallel/sequence.py): a 2-D
        # (data, seq) mesh; the token axis shards over 'seq' and the train/eval
        # steps run under jax.shard_map instead of jit+GSPMD
        self.sp = max(int(getattr(pl_config, "seq_parallel_devices", 1) or 1), 1)
        self.mesh = make_data_mesh(pl_config.num_devices(), seq_parallel=self.sp)
        self.devices = list(self.mesh.devices.flat)
        self.n_devices = len(self.devices)
        self.dp = self.n_devices // self.sp  # data-parallel groups
        self.repl = replicated(self.mesh)
        self.batch_sharding = batch_sharded(self.mesh)
        self.n_processes = jax.process_count()
        self.is_global_zero = jax.process_index() == 0
        if self.sp > 1 and self.n_processes > 1:
            # DCN data parallelism composes with ICI sequence parallelism as long
            # as each sequence group stays on ONE host: the mesh layout is
            # process-major (parallel/__init__.py), so the trailing 'seq' axis is
            # host-local iff sp divides the per-host device count.  Batch slicing
            # is then unchanged — each host ships its data-groups' rows and the
            # 'seq' replication happens host-locally in make_array_from_
            # process_local_data.
            n_local = jax.local_device_count()
            assert n_local % self.sp == 0, (
                f"seq_parallel_devices={self.sp} must divide the {n_local} local "
                "devices so each sequence group rides one host's ICI"
            )
        # shard_map instead of jit+GSPMD: required for sequence parallelism, and
        # preferred on multi-chip TPU (the Pallas kernels then always see per-shard
        # operands).  HEAL_SWIN_FORCE_SHMAP=1 forces it (CI coverage of the path on
        # the CPU mesh); single-chip keeps the measured jit path.
        import os as _os

        self._use_shmap = (
            self.sp > 1
            or (self.n_devices > 1 and jax.default_backend() == "tpu")
            or _os.environ.get("HEAL_SWIN_FORCE_SHMAP") == "1"
        )

        if self.n_processes > 1:
            self._warm_collective_contexts()

        self.ckpt_manager = None
        if ckpt_dir is not None and pl_config.checkpoint_callback and not pl_config.fast_dev_run:
            self.ckpt_manager = ckpt_lib.CheckpointManager(
                ckpt_dir, monitor=self.tc.ckpt_metric, mode=self.tc.ckpt_mode, save_top_k=3
            )

        self.global_step = 0
        self.current_epoch = 0

    def _warm_collective_contexts(self):
        """Create every collective communicator the steps will use while all
        processes are still in lockstep.

        XLA CPU's gloo backend builds a context per participant set LAZILY, at
        the first collective over that set, with a hard 30 s rendezvous
        timeout — but the first such collective sits inside the multi-minute
        train-step compile, and processes compiling at different speeds (a
        loaded single-core host) blow the window: 'Gloo context initialization
        failed: GetKeyValue() timed out'.  Running every collective clique the
        run will use right after distributed init creates all contexts when the
        inter-process skew is milliseconds; the real steps then reuse them
        (contexts are cached process-wide per clique key).  No-op cost on TPU
        pods (ICI needs no rendezvous), so it runs for any multi-process mesh.

        Clique keys are (flattened replica groups, local participant count), so
        the warm set must cover every GROUP FLATTENING the run produces, not
        just every participant set: a multi-axis psum's groups flatten in axis-
        tuple order (("data","seq") != ("seq","data") — measured distinct gloo
        keys), hence both orders below; all_gather/all_to_all over an axis share
        the single-axis psum's clique.  The final sync_global_devices warms the
        one-device-per-process clique used by multihost_utils.process_allgather
        and the exit barrier (train.py) — the r5 red-test failure key."""
        from jax.sharding import PartitionSpec as P

        axes = tuple(self.mesh.axis_names)
        multi = [a for a in axes if self.mesh.shape[a] > 1]
        groups = []
        if len(axes) > 1:
            groups += [axes, tuple(reversed(axes)), tuple(sorted(axes))]
        groups += [(a,) for a in multi]
        # dedupe, preserving order
        groups = list(dict.fromkeys(groups))

        def warm():
            # operand varies across every device (axis_index products): XLA
            # must keep each psum as a real all-reduce (a provably replica-
            # invariant operand could legally fold away)
            v = jnp.float32(1.0)
            for a in axes:
                v = v * (jnp.float32(jax.lax.axis_index(a)) + 1.0)
            v = v.reshape(1, 1)
            out = jnp.zeros((1, 1), jnp.float32)
            for g in groups:
                out = out + jax.lax.psum(v, g)
            for a in multi:
                # one instance of each collective KIND the SP step uses, in
                # case a backend ever keys contexts by kind as well
                ag = jax.lax.all_gather(v, a, axis=0, tiled=True)  # (n, 1)
                out = out + jnp.sum(ag)
                a2a = jax.lax.all_to_all(ag[None], a, split_axis=1, concat_axis=0)
                out = out + jnp.sum(a2a)
            return out

        # check_vma off: mixing axis-subset reductions of the same operand is a
        # rendezvous exercise, not a computation strict vma typing would accept
        f = jax.jit(jax.shard_map(warm, mesh=self.mesh, in_specs=(), out_specs=P(),
                                  check_vma=False))
        np.asarray(f())  # fetch = the synchronization point

        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("warm_collective_contexts")

    # ------------------------------------------------------------------ util
    def _log(self, metrics: Dict[str, float], step: Optional[int] = None):
        if self.run is not None:
            s = (step if step is not None else self.global_step) + self.tc.logging_step_offset
            self.run.log_metrics(metrics, step=s)

    def _device_memory_stats(self):
        """Accelerator memory metrics (mlflow-safe names) — the TPU analogue of the
        reference's MLFlowGPUStatsMonitor (logging_callbacks.py:218-232)."""
        out = {}
        for i, d in enumerate(self.devices):
            try:
                stats = d.memory_stats() or {}
            except Exception:
                continue
            if "bytes_in_use" in stats:
                out[f"device{i} memory.used in MB"] = stats["bytes_in_use"] / 2**20
            if "peak_bytes_in_use" in stats:
                out[f"device{i} memory.peak in MB"] = stats["peak_bytes_in_use"] / 2**20
            if "bytes_limit" in stats:
                out[f"device{i} memory.limit in MB"] = stats["bytes_limit"] / 2**20
        return out

    def _put_batch(self, arrays):
        # np.asarray (NOT jnp.asarray): jnp would first ship the array to the
        # default device unsharded — a second full copy over the (slow) host
        # link before the sharded placement
        if self.n_processes > 1:
            # multi-host: every process iterates the same deterministically
            # shuffled global batch and ships only its rows; the device order of
            # the 1-D mesh is process-major, so the local rows are contiguous
            def put(a):
                a = np.asarray(a)
                local = a[local_batch_rows(a.shape[0])]
                return jax.make_array_from_process_local_data(self.batch_sharding, local)

            return jax.tree.map(put, arrays)
        return jax.tree.map(
            lambda a: jax.device_put(np.asarray(a), self.batch_sharding), arrays
        )

    def _device_prefetch(self, batches, depth=2):
        """Double-buffered host->device staging: a daemon thread pulls host
        batches and device_puts them ``depth`` ahead so the transfer (the
        bottleneck on bandwidth-limited hosts, e.g. the remote-TPU tunnel)
        overlaps the previous step's compute.  ``batches`` yields
        (host_batch_pytree, extras...) tuples; yields (device_pytree, extras...).
        """
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=depth)
        end = object()
        stop = threading.Event()

        def put(item):
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    pass
            return False

        def worker():
            try:
                for batch, *extras in batches:
                    if stop.is_set() or not put((self._put_batch(batch), *extras)):
                        return
            except BaseException as e:  # re-raised on the consumer side
                put((end, e))
                return
            put((end, None))

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item[0] is end:
                    if item[1] is not None:
                        raise item[1]
                    return
                yield item
        finally:
            stop.set()  # early exit (batch limit / max_steps): stop staging

    def _pad_batch(self, imgs, targets):
        """Pad a ragged batch up to a multiple of n_devices; returns sample mask.
        ``targets`` may be an arbitrary pytree of per-sample arrays (e.g. the
        (mask, cal_id) tuples of the on-device projection pipeline)."""
        imgs = np.asarray(imgs)
        b = imgs.shape[0]
        target_b = -(-b // self.dp) * self.dp
        mask = np.zeros(target_b, dtype=bool)
        mask[:b] = True

        def pad(a):
            a = np.asarray(a)
            if target_b == b:
                return a
            return np.pad(a, [(0, target_b - b)] + [(0, 0)] * (a.ndim - 1), mode="edge")

        return pad(imgs), jax.tree.map(pad, targets), mask

    # --------------------------------------------------------------- lr find
    def lr_find(self, task, datamodule, min_lr=1e-8, max_lr=1.0, num_training=100,
                early_stop_threshold=4.0):
        """Exponential LR range test (the reference's Lightning ``auto_lr_find`` tune,
        train.py:204-217): sweep lr over ``num_training`` steps, record the
        exponentially-smoothed loss, stop when it diverges (> threshold * best), and
        suggest the lr at the steepest descent of the smoothed curve.

        Returns ``(suggested_lr or None, lrs, losses)``; training state is thrown away.
        """
        tc = self.tc
        if tc.seed is not None:
            np.random.seed(tc.seed)
        rng = jax.random.PRNGKey(tc.seed if tc.seed is not None else 0)

        # under sequence parallelism this jit/GSPMD sweep simply REPLICATES the
        # computation over the 'seq' axis (params and per-data-shard batches are
        # invariant along it) — numerically identical to the dp-only sweep and
        # fine for a short tuning pass; the real training steps use shard_map
        loader = datamodule.train_dataloader()
        loader.batch_size = loader.batch_size * self.dp
        loader.drop_last = True
        avail = loader.indices if loader.indices is not None else np.arange(len(loader.dataset))
        if len(avail) < loader.batch_size:
            loader.indices = np.resize(avail, loader.batch_size)

        transform = getattr(datamodule, "device_batch_transform", None)
        init_rng, rng = jax.random.split(rng)
        sample_imgs, sample_targets = next(iter(loader))
        init_imgs = jnp.asarray(sample_imgs[:1])
        if transform is not None:
            init_imgs, _ = jax.jit(transform)(
                init_imgs, jax.tree.map(lambda a: jnp.asarray(a[:1]), sample_targets)
            )
        params = jax.jit(task.init_variables)(init_rng, init_imgs)
        tx = make_optimizer(task.optimizer_config, gradient_clip_val=self.pl.gradient_clip_val)
        opt_state = jax.jit(tx.init)(params)
        params = put_replicated(params, self.repl)
        opt_state = put_replicated(opt_state, self.repl)

        rng_host = np.asarray(rng)  # constant inside the jit (multi-host safe)

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, imgs, targets, step_idx):
            step_rng = jax.random.fold_in(rng_host, step_idx)
            if transform is not None:
                imgs, targets = transform(imgs, targets)

            def lf(p):
                return task.loss_fn(p, imgs, targets, rng=step_rng, deterministic=False)

            (loss, _), grads = jax.value_and_grad(lf, has_aux=True)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss

        lrs, losses = [], []
        smoothed, best = None, math.inf
        beta = 0.98
        i = 0
        epoch = 0
        while i < num_training:
            loader.set_epoch(epoch)
            epoch += 1
            for imgs, targets in loader:
                if i >= num_training:
                    break
                lr = min_lr * (max_lr / min_lr) ** (i / max(num_training - 1, 1))
                opt_state = set_learning_rate(opt_state, lr)
                imgs_d, targets_d = self._put_batch((imgs, targets))
                params, opt_state, loss = step(
                    params, opt_state, imgs_d, targets_d, np.int32(i)
                )
                loss_val = float(loss)
                i += 1
                if not math.isfinite(loss_val):
                    break
                smoothed = loss_val if smoothed is None else beta * smoothed + (1 - beta) * loss_val
                debiased = smoothed / (1 - beta**i)
                lrs.append(lr)
                losses.append(debiased)
                best = min(best, debiased)
                if debiased > early_stop_threshold * best and i > 10:
                    i = num_training  # diverged
            else:
                continue
            break

        if len(lrs) < 5:
            return None, lrs, losses
        # steepest descent of the smoothed curve, skipping the unstable edges
        grads = np.gradient(np.asarray(losses))
        lo, hi = max(1, len(lrs) // 10), len(lrs) - max(1, len(lrs) // 20)
        idx = lo + int(np.argmin(grads[lo:hi]))
        return float(lrs[idx]), lrs, losses

    # ------------------------------------------------------------------- fit
    def fit(self, task, datamodule, resume_state: Optional[dict] = None):
        pl = self.pl
        tc = self.tc

        if tc.seed is not None:
            np.random.seed(tc.seed)
        root_rng = jax.random.PRNGKey(tc.seed if tc.seed is not None else 0)

        # data
        train_loader = datamodule.train_dataloader()
        per_dev_bs = train_loader.batch_size
        # reference per-device batch semantics; sequence-parallel groups share samples,
        # so the global batch scales with the number of DATA-parallel groups
        train_loader.batch_size = per_dev_bs * self.dp
        train_loader.drop_last = True
        # tiny subsets (manual-overfit) must still fill one global batch
        avail = (
            train_loader.indices
            if train_loader.indices is not None
            else np.arange(len(train_loader.dataset))
        )
        if len(avail) < train_loader.batch_size:
            train_loader.indices = np.resize(avail, train_loader.batch_size)

        # optional on-device input transform (e.g. the datamodule's fisheye->HEALPix
        # projection, data/segmentation/hp_datamodule.py) — traced into the jitted step
        transform = getattr(datamodule, "device_batch_transform", None)

        # params / optimizer
        init_rng, rng = jax.random.split(root_rng)
        sample_imgs, sample_targets = next(iter(train_loader))
        init_imgs = jnp.asarray(sample_imgs[:1])
        if transform is not None:
            init_imgs, _ = jax.jit(transform)(
                init_imgs, jax.tree.map(lambda a: jnp.asarray(a[:1]), sample_targets)
            )
        params = jax.jit(task.init_variables)(init_rng, init_imgs)

        accum = pl.accumulate_grad_batches if isinstance(pl.accumulate_grad_batches, int) else 1
        tx = make_optimizer(task.optimizer_config, gradient_clip_val=pl.gradient_clip_val)
        if accum > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=accum)
        opt_state = jax.jit(tx.init)(params)

        scheduler = make_scheduler(task.optimizer_config)

        start_epoch = 0
        if tc.load_checkpoint:  # warm start, weights only (reference train.py:193-200)
            p, _, _ = ckpt_lib.load_checkpoint(tc.load_checkpoint, params_like=params)
            params = p
        if pl.resume_from_checkpoint:  # full resume (reference resume.py)
            params, opt_state, meta = ckpt_lib.load_checkpoint(
                pl.resume_from_checkpoint, params_like=params, opt_state_like=opt_state
            )
            start_epoch = int(meta.get("epoch", -1)) + 1
            self.global_step = int(meta.get("global_step", 0))
            if scheduler is not None and meta.get("scheduler"):
                scheduler.load_state_dict(meta["scheduler"])
                opt_state = set_learning_rate(opt_state, scheduler.lr)
        if resume_state:
            params = resume_state.get("params", params)

        params = put_replicated(params, self.repl)
        opt_state = put_replicated(opt_state, self.repl)

        # jitted steps (rebuilt when the task switches its loss, e.g.
        # train_uncertainty_after).  The per-step rng is folded INSIDE the jit
        # from a constant host key + the step index operand: no per-step host
        # dispatch, and no committed single-device key to clash with the global
        # mesh on multi-host runs.
        rng_host = np.asarray(rng)

        def build_train_step():
            if self._use_shmap:
                return self._build_train_step_shmap(task, transform, tx, rng_host)

            @partial(
                jax.jit,
                donate_argnums=(0, 1, 2, 3),
                out_shardings=(self.repl, self.repl, self.repl, self.repl, self.repl),
            )
            def train_step(params, opt_state, mstate, loss_acc, imgs, targets, step_idx):
                step_rng = jax.random.fold_in(rng_host, step_idx)
                if transform is not None:
                    imgs, targets = transform(imgs, targets)

                def lf(p):
                    return task.loss_fn(p, imgs, targets, rng=step_rng, deterministic=False)

                (loss, outputs), grads = jax.value_and_grad(lf, has_aux=True)(params)
                updates, opt_state2 = tx.update(grads, opt_state, params)
                params2 = optax.apply_updates(params, updates)
                mstate2 = task.metric_update(mstate, outputs, targets)
                return params2, opt_state2, mstate2, loss_acc + loss, loss

            return train_step

        train_step = build_train_step()
        self._train_step = train_step
        self._get_eval_step(task, transform)  # build + cache

        max_epochs = pl.max_epochs if pl.max_epochs is not None else 1000
        if pl.fast_dev_run:
            max_epochs = 1

        # sanity validation (Lightning num_sanity_val_steps)
        if pl.num_sanity_val_steps and not pl.fast_dev_run:
            self._run_validation(
                task, datamodule, params, max_batches=pl.num_sanity_val_steps, log=False
            )

        best_metrics: Dict[str, float] = {}
        es_best = -math.inf if tc.early_stopping_mode == "max" else math.inf
        es_bad_epochs = 0
        stop = False
        saved_any_ckpt = False

        epoch = start_epoch
        last_metrics: Dict[str, float] = {}
        for epoch in range(start_epoch, max_epochs):
            self.current_epoch = epoch
            if hasattr(task, "set_epoch") and task.set_epoch(epoch):
                train_step = build_train_step()  # loss changed -> recompile once
                self._eval_steps.pop((id(task), id(transform)), None)
                self._get_eval_step(task, transform)
            train_loader.set_epoch(epoch)
            n_train_batches = _limit(len(train_loader), pl.limit_train_batches)
            if pl.fast_dev_run:
                n_train_batches = 1

            # val_check_interval (Lightning semantics): float < 1.0 -> validate
            # every that fraction of the epoch (plus the epoch-end check below);
            # int -> every N train batches.  Only on epochs where validation is
            # due per check_val_every_n_epoch.
            val_epoch_due = (epoch + 1) % pl.check_val_every_n_epoch == 0 or pl.fast_dev_run
            vci = pl.val_check_interval
            if isinstance(vci, float):
                vci_batches = None if vci >= 1.0 else max(1, int(n_train_batches * vci))
            else:
                vci_batches = max(1, int(vci))

            mstate = put_replicated(jax.device_get(jax.jit(task.metric_init)()), self.repl)
            loss_acc = put_replicated(np.zeros((), np.float32), self.repl)
            n_steps_epoch = 0
            t0 = time.time()
            samples_seen = 0
            mid_val_time = 0.0  # mid-epoch validation excluded from the epoch timer
            val_metrics: Dict[str, float] = {}

            def staged_train_batches():
                for imgs, targets in itertools.islice(iter(train_loader), n_train_batches):
                    yield (imgs, targets), imgs.shape[0]

            for (imgs_d, targets_d), bsz in self._device_prefetch(staged_train_batches()):
                params, opt_state, mstate, loss_acc, loss = train_step(
                    params, opt_state, mstate, loss_acc, imgs_d, targets_d,
                    np.int32(self.global_step)
                )
                self.global_step += 1
                n_steps_epoch += 1
                samples_seen += bsz

                if pl.terminate_on_nan or (self.global_step % pl.log_every_n_steps == 0):
                    loss_val = float(loss)
                    if pl.terminate_on_nan and not math.isfinite(loss_val):
                        raise FloatingPointError(
                            f"non-finite train loss {loss_val} at step {self.global_step}"
                        )
                    if self.global_step % pl.log_every_n_steps == 0:
                        self._log({"train_loss_step": loss_val})
                if pl.max_steps is not None and self.global_step >= pl.max_steps:
                    stop = True
                    break

                if (
                    val_epoch_due
                    and vci_batches is not None
                    and n_steps_epoch % vci_batches == 0
                    and n_steps_epoch < n_train_batches
                ):
                    # mid-epoch validation (val_check_interval); the epoch-end
                    # check below still runs, so float intervals match Lightning's
                    # "at each fraction boundary including 100%" cadence
                    float(loss)  # drain queued compute before timing validation
                    tv = time.time()
                    val_metrics = self._run_validation(task, datamodule, params)
                    last_metrics.update(val_metrics)
                    mid_val_time += time.time() - tv

            if n_steps_epoch:
                # sync on the last step's loss BEFORE stopping the timer: dispatch
                # is async, so without this the epoch time would exclude whatever
                # compute is still queued (params chain step-to-step, so one fetch
                # drains everything; block_until_ready is not reliable on axon)
                float(loss)
            epoch_time = time.time() - t0 - mid_val_time
            train_metrics = task.metric_compute(mstate, "train_")
            if n_steps_epoch:
                train_metrics["train_loss"] = float(loss_acc) / n_steps_epoch
            train_metrics["epoch"] = epoch
            train_metrics["train_time_per_sample in ms"] = (
                epoch_time * 1000.0 / max(samples_seen, 1)
            )
            opt_name = task.optimizer_config.optimizer_name
            train_metrics[f"lr-{opt_name}"] = get_learning_rate(opt_state)
            if tc.log_gpu_stats:
                train_metrics.update(self._device_memory_stats())
            self._log(train_metrics)
            last_metrics.update(train_metrics)

            # epoch-end validation (mid-epoch checks — val_check_interval — may
            # already have populated val_metrics; this refresh supersedes them)
            if val_epoch_due:
                n_val = 1 if pl.fast_dev_run else None
                val_metrics = self._run_validation(task, datamodule, params, max_batches=n_val)
                last_metrics.update(val_metrics)

            all_metrics = {**train_metrics, **val_metrics}

            # checkpointing
            if self.ckpt_manager is not None:
                meta = {
                    "run_id": self.run.run_id if self.run else None,
                    "experiment": tc.mlflow_expmt,
                    "global_step": self.global_step,
                    "scheduler": scheduler.state_dict() if scheduler else None,
                }
                self.ckpt_manager.save_epoch(epoch, all_metrics, params, opt_state, meta)
                saved_any_ckpt = True

            # scheduler
            if scheduler is not None:
                new_lr = scheduler.step(all_metrics)
                opt_state = set_learning_rate(opt_state, new_lr)

            # early stopping (reference train.py:106-114)
            if tc.early_stopping and tc.early_stopping_monitor in all_metrics:
                cur = all_metrics[tc.early_stopping_monitor]
                better = (
                    cur > es_best + tc.early_stopping_min_delta
                    if tc.early_stopping_mode == "max"
                    else cur < es_best - tc.early_stopping_min_delta
                )
                if better:
                    es_best = cur
                    es_bad_epochs = 0
                else:
                    es_bad_epochs += 1
                    if es_bad_epochs >= tc.early_stopping_patience and (
                        pl.min_epochs is None or epoch + 1 >= pl.min_epochs
                    ):
                        stop = True

            best_metrics = all_metrics
            if stop:
                break

        if self.ckpt_manager is not None and not saved_any_ckpt and start_epoch > 0:
            # zero epochs ran on a RESUMED run (resume of an already-finished run):
            # save the restored state as last.ckpt so the new run is self-contained
            # and eval_after_train / later resumes resolve a checkpoint.  A fresh
            # run with max_epochs=0 saves nothing: recording epoch=0 for untrained
            # params would make a later resume skip epoch 0 entirely.
            meta = {
                "run_id": self.run.run_id if self.run else None,
                "experiment": tc.mlflow_expmt,
                "global_step": self.global_step,
                "scheduler": scheduler.state_dict() if scheduler else None,
            }
            self.ckpt_manager.save_epoch(
                start_epoch - 1, last_metrics, params, opt_state, meta
            )

        best_path = None
        if self.ckpt_manager is not None:
            p = self.ckpt_manager.finalize_best()
            best_path = str(p) if p else None

        self._params = params  # for eval_after_train
        return FitResult(
            epochs_run=epoch - start_epoch + 1,
            global_step=self.global_step,
            best_ckpt_path=best_path,
            last_metrics=best_metrics,
        )

    # ------------------------------------------------ sequence-parallel steps
    def _seq_slice_tokens(self, tree, dim_in):
        """This sequence shard's token slice of every token-indexed array in the
        batch pytree (axis 1 == the model's global pixel count; per-sample scalars
        like calibration ids pass through).  Inputs ship replicated over 'seq'
        (P('data')), so the slice is local."""
        from heal_swin_tpu.parallel.sequence import seq_local_slice

        def f(a):
            if hasattr(a, "ndim") and a.ndim >= 2 and a.shape[1] == dim_in:
                return seq_local_slice(a, "seq", self.sp, axis=1)
            return a

        return jax.tree.map(f, tree)

    def _build_train_step_shmap(self, task, transform, tx, rng_host):
        """Train step under ``jax.shard_map`` over the mesh (parallel/sequence.py):
        params/optimizer/metric state replicated, batches sharded over 'data' and
        token-sliced over 'seq' (when sequence-parallel) inside the step; the loss
        psums its mean over the mesh axes and metric increments psum explicitly
        (the shard_map analogue of GSPMD's inserted all-reduce).

        Used whenever the mesh has a 'seq' axis, and for MULTI-CHIP TPU data
        parallelism: under shard_map the Pallas kernels always see per-shard
        operands, whereas jit+GSPMD treats a pallas_call as an opaque call whose
        operands it may gather."""
        from jax.sharding import PartitionSpec as P

        from heal_swin_tpu.parallel.sequence import psum_tree

        axes = tuple(self.mesh.axis_names)
        seq = ("seq", self.sp) if self.sp > 1 else None
        dim_in = task.data_spec.dim_in

        def step_body(params, opt_state, mstate, loss_acc, imgs, targets, step_idx):
            step_rng = jax.random.fold_in(rng_host, step_idx)
            # distinct dropout draws per data shard; sequence shards of the same
            # samples share the key (DropPath's per-sample mask must agree across
            # token shards)
            step_rng = jax.random.fold_in(step_rng, jax.lax.axis_index("data"))
            if transform is not None:
                imgs, targets = transform(imgs, targets)
            if seq is not None:
                imgs = self._seq_slice_tokens(imgs, dim_in)
                targets = self._seq_slice_tokens(targets, dim_in)

            def lf(p):
                return task.loss_fn(
                    p, imgs, targets, rng=step_rng, deterministic=False,
                    axis_names=axes, seq=seq,
                )

            (loss, outputs), grads = jax.value_and_grad(lf, has_aux=True)(params)
            # grads arrive ALREADY globally reduced: params enter invariant (P()),
            # and shard_map's vma-typed transpose of the invariant->varying cast IS
            # the cross-device psum.  An explicit psum here would multiply by the
            # device count (caught by tests/test_sequence_parallel.py
            # test_sp_gradient_equivalence — Adam hides pure scale errors).
            updates, opt_state2 = tx.update(grads, opt_state, params)
            params2 = optax.apply_updates(params, updates)
            inc = psum_tree(
                task.metric_update(task.metric_init(), outputs, targets), axes
            )
            mstate2 = jax.tree.map(jnp.add, mstate, inc)
            return params2, opt_state2, mstate2, loss_acc + loss, loss

        shmapped = jax.shard_map(
            step_body,
            mesh=self.mesh,
            in_specs=(P(), P(), P(), P(), P("data"), P("data"), P()),
            out_specs=(P(), P(), P(), P(), P()),
            check_vma=True,
        )
        return jax.jit(shmapped, donate_argnums=(0, 1, 2, 3))

    def _build_eval_step_shmap(self, task, transform):
        from jax.sharding import PartitionSpec as P

        from heal_swin_tpu.parallel.sequence import psum_tree

        axes = tuple(self.mesh.axis_names)
        seq = ("seq", self.sp) if self.sp > 1 else None
        dim_in = task.data_spec.dim_in

        def eval_body(params, mstate, imgs, targets, sample_mask):
            if transform is not None:
                imgs, targets = transform(imgs, targets)
            if seq is not None:
                imgs = self._seq_slice_tokens(imgs, dim_in)
                targets = self._seq_slice_tokens(targets, dim_in)
            loss, outputs = task.loss_fn(
                params, imgs, targets, deterministic=True, sample_mask=sample_mask,
                axis_names=axes, seq=seq,
            )
            inc = psum_tree(
                task.metric_update(
                    task.metric_init(), outputs, targets, sample_mask=sample_mask
                ),
                axes,
            )
            mstate2 = jax.tree.map(jnp.add, mstate, inc)
            # sample_mask shards over 'data' only (identical across 'seq')
            valid = jax.lax.psum(jnp.sum(sample_mask.astype(jnp.float32)), "data")
            return mstate2, loss * valid, valid

        shmapped = jax.shard_map(
            eval_body,
            mesh=self.mesh,
            in_specs=(P(), P(), P("data"), P("data"), P("data")),
            out_specs=(P(), P(), P()),
            check_vma=True,
        )
        return jax.jit(shmapped, donate_argnums=(1,))

    # ------------------------------------------------------------- validation
    def _get_eval_step(self, task, transform=None):
        cache = getattr(self, "_eval_steps", None)
        if cache is None:
            cache = self._eval_steps = {}
        key = (id(task), id(transform))
        if key not in cache:
            if self._use_shmap:
                cache[key] = self._build_eval_step_shmap(task, transform)
                return cache[key]

            @partial(jax.jit, donate_argnums=(1,))
            def eval_step(params, mstate, imgs, targets, sample_mask):
                if transform is not None:
                    imgs, targets = transform(imgs, targets)
                loss, outputs = task.loss_fn(
                    params, imgs, targets, deterministic=True, sample_mask=sample_mask
                )
                mstate2 = task.metric_update(mstate, outputs, targets, sample_mask=sample_mask)
                valid = jnp.sum(sample_mask.astype(jnp.float32))
                return mstate2, loss * valid, valid

            cache[key] = eval_step
        return cache[key]

    def _run_validation(self, task, datamodule, params, max_batches=None, log=True,
                        metrics_prefix="val_", with_per_class=True):
        loader = datamodule.val_dataloader()
        n = _limit(len(loader), self.pl.limit_val_batches)
        if max_batches is not None:
            n = min(n, max_batches)

        mstate = put_replicated(jax.device_get(jax.jit(task.metric_init)()), self.repl)
        loss_sum, count = 0.0, 0.0
        eval_step = self._get_eval_step(
            task, getattr(datamodule, "device_batch_transform", None)
        )

        def staged_val_batches():
            for imgs, targets in itertools.islice(iter(loader), n):
                yield (self._pad_batch(imgs, targets),)

        # steady-state throughput excludes the first batch's compile (this
        # environment's remote compile is not cached across processes); the
        # per-batch float() fetch is the sync point, so the timer is honest
        t_steady, count_at_steady = None, 0.0
        for ((imgs_d, targets_d, mask_d),) in self._device_prefetch(staged_val_batches()):
            mstate, batch_loss, valid = eval_step(params, mstate, imgs_d, targets_d, mask_d)
            loss_sum += float(batch_loss)
            count += float(valid)
            if t_steady is None:
                t_steady, count_at_steady = time.perf_counter(), count

        metrics = task.metric_compute(mstate, metrics_prefix, with_per_class=with_per_class)
        if count:
            metrics[f"{metrics_prefix}loss"] = loss_sum / count
        # for eval-throughput reporting (evaluate.py)
        self.last_eval_samples = count
        self.last_eval_steady_samples = count - count_at_steady
        self.last_eval_steady_time = (
            time.perf_counter() - t_steady if t_steady is not None else 0.0
        )
        if log:
            self._log(metrics)
        return metrics

    def validate(self, task, datamodule, params, metrics_prefix="val_"):
        """Standalone validation (reference trainer.validate path in evaluate.py)."""
        return self._run_validation(
            task, datamodule, params, metrics_prefix=metrics_prefix, with_per_class=True
        )

    # ---------------------------------------------------------------- predict
    def predict(self, task, datamodule, params, writer=None):
        """Iterate the predict loader; feed predictions to the writer
        (reference trainer.predict + BasePredictionWriter protocol)."""
        if self.n_processes > 1:
            # prediction writers are host-side, per-sample consumers; run them on a
            # single host (the reference forces single-device evaluation for the
            # same reason, evaluate.py:98-105)
            raise NotImplementedError(
                "trainer.predict is single-host; run run.py evaluate on one host"
            )
        loader = datamodule.predict_dataloader()
        n = _limit(len(loader), self.pl.limit_predict_batches)

        predict_fn = jax.jit(task.predict)
        if writer is not None and hasattr(writer, "set_predict_fn"):
            # best/worst writers re-predict individual samples (reference :226-364)
            writer.set_predict_fn(lambda imgs: np.asarray(predict_fn(params, jnp.asarray(imgs))))
        outputs = []
        # for eval-throughput reporting (evaluate.py); steady-state excludes the
        # first batch (compile) — the np.asarray fetch is the sync point
        self.last_predict_samples = 0
        t_steady, at_steady = None, 0
        self.predict_device_time = 0.0  # host blocked on the device fetch
        self.predict_writer_time = 0.0  # host writer work (overlaps device compute)

        def consume(preds_dev, batch, i):
            nonlocal t_steady, at_steady
            t0 = time.perf_counter()
            preds = np.asarray(preds_dev)  # sync point
            t1 = time.perf_counter()
            self.predict_device_time += t1 - t0
            self.last_predict_samples += len(preds)
            if writer is not None:
                writer.write_on_batch_end(preds, batch, i)
                self.predict_writer_time += time.perf_counter() - t1
            else:
                outputs.append(preds)
            if t_steady is None:
                t_steady, at_steady = time.perf_counter(), self.last_predict_samples

        # one batch in flight: batch i+1's predict is DISPATCHED (async) before
        # batch i is fetched/written, so the device computes the next batch while
        # the host runs the writer (back-projection fetch, metric updates,
        # overlay PNGs) — measured 1.5-2x on writer-heavy predicts
        pending = None
        for i, batch in enumerate(loader):
            if i >= n:
                break
            preds_dev = predict_fn(params, jnp.asarray(batch[task.input_key]))
            if pending is not None:
                consume(*pending)
            pending = (preds_dev, batch, i)
        if pending is not None:
            consume(*pending)
        self.last_predict_steady_samples = self.last_predict_samples - at_steady
        self.last_predict_steady_time = (
            time.perf_counter() - t_steady if t_steady is not None else 0.0
        )
        if writer is not None:
            writer.on_predict_epoch_end()
            return None
        return outputs
