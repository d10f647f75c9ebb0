"""Loss functions (pure JAX).

- Class-weighted cross entropy with torch.nn.CrossEntropyLoss semantics
  (weighted mean normalized by the sum of target-class weights), used by the
  segmentation tasks (reference model_lightning_swin_hp.py:39-45).
- Depth regression losses with inf-masked targets (reference
  heal_swin/training/loss_depth_regression.py).  Masked positions (target == inf)
  contribute zero and are excluded from the mean.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def weighted_cross_entropy(logits, targets, class_weights=None, sample_mask=None,
                           axis_names=None):
    """logits: (..., C) float; targets: (...) int.  torch CrossEntropyLoss(weight=w):
    sum_i w[y_i] * nll_i / sum_i w[y_i].  ``sample_mask``: optional (B,) or
    element-shaped bool excluding padded samples from the mean.  ``axis_names``:
    mesh axes to psum the weighted sum AND the weight total over before dividing —
    required for an exact global mean when logits/targets are device-local shards
    inside ``shard_map`` (the data/sequence-parallel trainer path)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # one-hot contraction instead of take_along_axis: the gather compiles to a slow
    # TPU custom fusion (~13 ms/step at paper scale); the masked sum fuses into the
    # softmax elementwise chain
    n_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(targets, n_classes, dtype=logp.dtype)
    nll = -jnp.sum(logp * onehot, axis=-1)
    if class_weights is None:
        w = jnp.ones_like(nll)
    else:
        w = jnp.sum(onehot * jnp.asarray(class_weights, dtype=jnp.float32), axis=-1)
    if sample_mask is not None:
        m = jnp.reshape(sample_mask, sample_mask.shape + (1,) * (nll.ndim - sample_mask.ndim))
        w = w * m.astype(w.dtype)
    num, den = jnp.sum(w * nll), jnp.sum(w)
    if axis_names is not None:
        num, den = jax.lax.psum((num, den), axis_names)
    return num / jnp.maximum(den, 1e-12)


def _masked_mean(values, mask, axis_names=None):
    num, cnt = jnp.sum(jnp.where(mask, values, 0.0)), jnp.sum(mask)
    if axis_names is not None:
        # shard-local values: global mean = psum(sum) / psum(count) (parallel/sequence.py)
        num, cnt = jax.lax.psum((num, cnt), axis_names)
    return num / jnp.maximum(cnt, 1)


def _masked_diff(means, target, mask):
    """means - target with the mask applied INSIDE the subtraction: masked
    positions contribute an exact 0 to both the value and the VJP, so inf
    targets (and any non-finite prediction at a masked position) cannot leak
    NaN into the backward through the 0 * inf cotangent product."""
    return jnp.where(mask, means - jnp.where(mask, target, 0.0), 0.0)


def mse(preds, target, mask_background: bool = False, axis_names=None):
    """Reference depth 'l2' loss: mean of squared diff / 2 over finite targets.
    preds: (B, N, f_out) channels-last; channel 0 holds the mean prediction."""
    means = preds[..., 0]
    mask = ~jnp.isinf(target)
    return _masked_mean(jnp.square(_masked_diff(means, target, mask)) / 2.0, mask,
                        axis_names)


def mean_log_var_loss(preds, target, mask_background: bool = False, axis_names=None):
    """Gaussian NLL over (mean, logvar) channels (reference loss_depth_regression.py:24-40)."""
    means = preds[..., 0]
    log_var = preds[..., 1]
    mask = ~jnp.isinf(target)
    lv = jnp.where(mask, log_var, 0.0)
    vals = 0.5 * lv + jnp.square(_masked_diff(means, target, mask)) * (0.5 * jnp.exp(-lv))
    return _masked_mean(vals, mask, axis_names)


def l1_loss(preds, target, mask_background: bool = False, axis_names=None):
    means = preds[..., 0]
    mask = ~jnp.isinf(target)
    return _masked_mean(jnp.abs(_masked_diff(means, target, mask)), mask, axis_names)


def huber_loss(preds, target, mask_background: bool = False, delta: float = 1.0,
               axis_names=None):
    """torch SmoothL1Loss(beta=delta): 0.5*d^2/beta if |d|<beta else |d|-0.5*beta."""
    means = preds[..., 0]
    mask = ~jnp.isinf(target)
    d = jnp.abs(_masked_diff(means, target, mask))
    vals = jnp.where(d < delta, 0.5 * d * d / delta, d - 0.5 * delta)
    return _masked_mean(vals, mask, axis_names)


def get_depth_loss(common_depth_config) -> Callable:
    """Mirror of reference get_depth_loss (loss_depth_regression.py:70-83)."""
    if common_depth_config.use_logvar:
        return mean_log_var_loss
    losses = {
        "l2": mse,
        "l1": l1_loss,
        "huber": partial(huber_loss, delta=common_depth_config.huber_delta),
    }
    return losses[common_depth_config.loss]
