"""Optimizer factory (optax) + host-side LR schedulers.

Mirrors reference ``heal_swin/training/optimizer.py``: Adam / AdamW with optional
ReduceLROnPlateau or ExponentialLR.  Scheduler names in :class:`OptimizerConfig` are
strings ("reduce_on_plateau" | "exponential") instead of the reference's class objects.

TPU design: the learning rate is an injected hyperparameter of the optax chain
(``optax.inject_hyperparams``), so the host-side scheduler can change it between epochs
without recompiling the jitted train step — the schedule logic (incl. the metric-driven
plateau scheduler) lives outside the graph, exactly as torch's epoch-boundary schedulers
do.

torch.optim.Adam applies weight decay as L2 on the gradient before the moments;
optax.adam does not — we chain ``add_decayed_weights`` first for parity.  AdamW uses the
decoupled form (optax.adamw).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import optax


@dataclass
class OptimizerConfig:
    optimizer_name: str = "Adam"  # "Adam" | "AdamW"
    learning_rate: float = 0.001
    weight_decay: float = 0.0
    scheduler: Optional[str] = None  # None | "reduce_on_plateau" | "exponential"
    scheduler_mode: str = "min"
    scheduler_patience: int = 10
    scheduler_threshold: float = 1e-4
    scheduler_factor: float = 0.5
    scheduler_min_lr: float = 1e-5
    scheduler_monitor: str = "train_loss"


def make_optimizer(config: OptimizerConfig, gradient_clip_val: float = 0.0):
    """Returns an optax GradientTransformation with injected `learning_rate`.

    The chained ``clip_by_global_norm`` costs ~1.8 ms/update at paper scale —
    but that is the global-norm reduce pass + its barrier, not the scaled-grad
    materialization: a hand-fused clip-into-adam single-pass transform measured
    IDENTICAL (benchmarks/opt_update_probe.py, docs/PERFORMANCE.md rejected
    log), so the plain optax chain stays."""

    @optax.inject_hyperparams
    def _make(learning_rate):
        txs = []
        if gradient_clip_val and gradient_clip_val > 0:
            txs.append(optax.clip_by_global_norm(gradient_clip_val))
        if config.optimizer_name == "Adam":
            if config.weight_decay:
                txs.append(optax.add_decayed_weights(config.weight_decay))
            txs.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
            txs.append(optax.scale_by_learning_rate(learning_rate))
        elif config.optimizer_name == "AdamW":
            txs.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
            txs.append(optax.add_decayed_weights(config.weight_decay))
            txs.append(optax.scale_by_learning_rate(learning_rate))
        else:
            raise ValueError(f"unknown optimizer: {config.optimizer_name}")
        return optax.chain(*txs)

    return _make(config.learning_rate)


def _hyperparams(opt_state):
    """Locate the inject_hyperparams dict, unwrapping optax.MultiSteps if present."""
    if hasattr(opt_state, "hyperparams"):
        return opt_state.hyperparams
    if hasattr(opt_state, "inner_opt_state") and hasattr(opt_state.inner_opt_state, "hyperparams"):
        return opt_state.inner_opt_state.hyperparams
    raise AttributeError("opt_state has no injected hyperparams")


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning rate in-place (same pytree structure)."""
    import jax.numpy as jnp

    _hyperparams(opt_state)["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(_hyperparams(opt_state)["learning_rate"])


class ReduceLROnPlateau:
    """Host-side mirror of torch.optim.lr_scheduler.ReduceLROnPlateau (rel threshold)."""

    def __init__(self, config: OptimizerConfig):
        self.cfg = config
        self.lr = config.learning_rate
        self.best = math.inf if config.scheduler_mode == "min" else -math.inf
        self.num_bad_epochs = 0

    def _is_better(self, current):
        t = self.cfg.scheduler_threshold
        if self.cfg.scheduler_mode == "min":
            return current < self.best * (1.0 - t)
        return current > self.best * (1.0 + t)

    def step(self, metrics: dict) -> float:
        current = metrics.get(self.cfg.scheduler_monitor)
        if current is None:
            return self.lr
        if self._is_better(current):
            self.best = current
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.cfg.scheduler_patience:
            self.lr = max(self.lr * self.cfg.scheduler_factor, self.cfg.scheduler_min_lr)
            self.num_bad_epochs = 0
        return self.lr

    def state_dict(self):
        return {"lr": self.lr, "best": self.best, "num_bad_epochs": self.num_bad_epochs}

    def load_state_dict(self, d):
        self.lr, self.best, self.num_bad_epochs = d["lr"], d["best"], d["num_bad_epochs"]


class ExponentialLR:
    """lr <- lr * factor each epoch (reference LightningExponentialLR uses
    scheduler_factor as gamma)."""

    def __init__(self, config: OptimizerConfig):
        self.cfg = config
        self.lr = config.learning_rate

    def step(self, metrics: dict) -> float:
        self.lr = self.lr * self.cfg.scheduler_factor
        return self.lr

    def state_dict(self):
        return {"lr": self.lr}

    def load_state_dict(self, d):
        self.lr = d["lr"]


def make_scheduler(config: OptimizerConfig):
    if config.scheduler is None or config.scheduler == "None":
        return None
    if config.scheduler == "reduce_on_plateau":
        return ReduceLROnPlateau(config)
    if config.scheduler == "exponential":
        return ExponentialLR(config)
    raise ValueError(f"unknown scheduler: {config.scheduler}")
