"""Task modules: model + loss + metrics + optimizer config bundles.

These replace the reference's pytorch-lightning modules
(``heal_swin/models_lightning/*``) with pure dataclasses + JAX functions consumed by
the Trainer.  Names, config classes and the registry dicts mirror
``models_lightning/models_lightning.py:12-34``:

- ``swin_hp``      WoodscapeSegmenterSwinHP   (model_lightning_swin_hp.py)
- ``swin``         WoodscapeSegmenterSwin     (model_lightning_swin.py)
- ``depth_swin_hp`` WoodscapeDepthSwinHP      (model_lightning_depth_swin_hp.py)
- ``depth_swin``   WoodscapeDepthSwin         (model_lightning_depth_swin.py)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from heal_swin_tpu.data.data_spec import DataSpec
from heal_swin_tpu.evaluation import metrics as M
from heal_swin_tpu.models.swin_flat import SwinTransformerConfig, SwinTransformerSys
from heal_swin_tpu.models.swin_hp import SwinHPTransformerConfig, SwinHPTransformerSys
from heal_swin_tpu.training.losses import get_depth_loss, weighted_cross_entropy
from heal_swin_tpu.training.optimizer import OptimizerConfig


@dataclass
class CommonDepthConfig:
    """Reference depth_common_config.py:5-10."""

    loss: str = "l2"  # "l2" | "l1" | "huber"
    use_logvar: bool = False
    train_uncertainty_after: int = -1
    huber_delta: float = 1.0


def _task_rngs(rng, seq):
    """Training rng streams for ``model.apply``.  Under sequence parallelism the
    element-dropout key folds in this shard's 'seq' index — otherwise every token
    shard of a sample draws the SAME mask over its local block and dropout becomes
    spatially periodic with period npix/n_shards instead of iid.  The 'drop_path'
    stream keeps the base key: DropPath's per-sample mask must agree across the
    token shards of one sample (models/layers.py DropPath).  Unsharded: one
    'dropout' stream, exactly as before."""
    if rng is None:
        return None
    if seq is None or seq[1] <= 1:
        return {"dropout": rng}
    return {
        "dropout": jax.random.fold_in(rng, jax.lax.axis_index(seq[0])),
        "drop_path": rng,
    }


# ---------------------------------------------------------------------------
# Segmentation
# ---------------------------------------------------------------------------


@dataclass
class WoodscapeSegmenterSwinHPConfig:
    swin_hp_transformer_config: SwinHPTransformerConfig = field(
        default_factory=SwinHPTransformerConfig
    )
    optimizer_config: OptimizerConfig = field(default_factory=OptimizerConfig)
    class_weights: Optional[List[float]] = None


@dataclass
class WoodscapeSegmenterSwinConfig:
    swin_transformer_config: SwinTransformerConfig = field(default_factory=SwinTransformerConfig)
    optimizer_config: OptimizerConfig = field(default_factory=OptimizerConfig)
    class_weights: Optional[List[float]] = None


class _SegmenterBase:
    """Shared segmentation task logic (reference model_lightning_swin_hp.py:26-114)."""

    input_key: str  # key of the network input in predict dict batches

    def __init__(self, config, data_spec: DataSpec, data_config=None):
        self.config = config
        self.data_spec = data_spec
        self.data_config = data_config
        self.optimizer_config = config.optimizer_config
        self.num_classes = data_spec.f_out
        self.class_names = data_spec.class_names or [str(c) for c in range(data_spec.f_out)]
        if config.class_weights is None:
            self.class_weights = np.ones(data_spec.f_out, dtype=np.float32)
        else:
            assert len(config.class_weights) == data_spec.f_out
            self.class_weights = np.asarray(config.class_weights, dtype=np.float32)
        self.model = self._build_model(config, data_spec)

    def init_variables(self, rng, imgs):
        return self.model.init(rng, jnp.asarray(imgs), True)

    # --- fused decoder-tail hooks (HP values; the flat subclass overrides) ---
    def _inner_cfg(self):
        return getattr(self.config, "swin_hp_transformer_config", None)

    def _fused_geometry(self):
        """(tokens per sample, sub-pixels per token) of the decoder tail."""
        cfg = self._inner_cfg()
        return self.data_spec.dim_in // cfg.patch_size, cfg.patch_size

    def _fused_params(self, params):
        """The param subtree holding up/{expand,norm} and output."""
        return params["params"]["decoder"]

    def _kernel_targets(self, arr):
        """Per-pixel array (B, npix) -> the kernel's (B*T, p) row layout: the p
        pixels of token n are the p column slices of its expand output."""
        B = arr.shape[0]
        T, p = self._fused_geometry()
        return arr.reshape(B * arr.shape[1] // p, p)

    def _fused_tail_ok(self, sample_mask, seq=None):
        """Gate for the fused expand+LN+head+CE train path (ops/final_head.py):
        the config flag on, no eval padding mask (the kernel's confusion matrix
        counts every element).  ``seq``: the (axis_name, n_shards) token sharding
        — the kernel then sees the per-shard token count (HP model only)."""
        cfg = self._inner_cfg()
        if cfg is None or not getattr(cfg, "fused_final_head", False):
            return False
        if sample_mask is not None:
            return False
        if jax.default_backend() != "tpu" and not self._fh_interpret():
            return False
        from heal_swin_tpu.ops import final_head as fh

        T, p = self._fused_geometry()  # tokens/sample (batch folds in at call time)
        if seq is not None and seq[1] > 1:
            if not getattr(self, "FUSED_SEQ_OK", True) or T % seq[1] != 0:
                return False
            T //= seq[1]
        return fh.supported(T, cfg.embed_dim, self.num_classes, p,
                            cfg.compute_dtype)

    @staticmethod
    def _fh_interpret():
        import os

        return os.environ.get("HEAL_SWIN_FH_INTERPRET") == "1"

    def loss_fn(self, params, imgs, targets, rng=None, deterministic=True, sample_mask=None,
                axis_names=None, seq=None):
        """Returns (loss, outputs): outputs are the (B, npix, f_out) logits, or the
        (F, F) step confusion matrix on the fused train path (metric_update handles
        both).

        ``axis_names``/``seq``: sharded execution inside ``shard_map``
        (parallel/sequence.py): inputs are device-local shards, ``seq`` is the model's
        (axis_name, n_shards) token sharding, and the loss psums its weighted
        numerator/denominator over ``axis_names`` so it is the exact global mean.
        The fused decoder-tail kernel runs in the sharded case too (the tail is
        token-local): it psums its own num/den and emits the SHARD-local confusion
        matrix, which the trainer's psum'd metric increments make global."""
        rngs = _task_rngs(rng, seq)
        if self._fused_tail_ok(sample_mask, seq):
            from heal_swin_tpu.ops import final_head as fh

            _, p = self._fused_geometry()
            feats = self.model.apply(
                params, imgs, deterministic, False, rngs=rngs, seq=seq
            )
            B, N, C = feats.shape
            pp = self._fused_params(params)
            y = self._kernel_targets(targets)
            welem = jnp.take(
                jnp.asarray(self.class_weights, jnp.float32), y, axis=0
            )
            loss, cm = fh.fused_final_head(
                feats.reshape(B * N, C),
                pp["up"]["expand"]["kernel"],
                pp["up"]["norm"]["ln"]["scale"],
                pp["up"]["norm"]["ln"]["bias"],
                pp["output"]["kernel"],
                y, welem, patch_size=p, interpret=self._fh_interpret(),
                axis_names=axis_names,
            )
            return loss, cm
        logits = self.model.apply(params, imgs, deterministic, rngs=rngs, seq=seq)
        loss = weighted_cross_entropy(
            logits, targets, jnp.asarray(self.class_weights), sample_mask=sample_mask,
            axis_names=axis_names,
        )
        return loss, logits

    def _pred_from_kernel(self, preds, B):
        """Kernel-layout (B*T, p) argmax indices -> the unfused predict shape."""
        return preds.reshape(B, -1)  # HP: (B, npix)

    def predict(self, params, imgs):
        if self._fused_tail_ok(None):
            # serving path: argmax straight out of the fused decoder-tail kernel
            # (no (B*npix, F) logits round-trip through HBM)
            from heal_swin_tpu.ops import final_head as fh

            _, p = self._fused_geometry()
            feats = self.model.apply(params, jnp.asarray(imgs), True, False)
            B, N, C = feats.shape
            pp = self._fused_params(params)
            preds = fh.fused_final_head_predict(
                feats.reshape(B * N, C),
                pp["up"]["expand"]["kernel"],
                pp["up"]["norm"]["ln"]["scale"],
                pp["up"]["norm"]["ln"]["bias"],
                pp["output"]["kernel"],
                patch_size=p, interpret=self._fh_interpret(),
            )
            return self._pred_from_kernel(preds, B)
        logits = self.model.apply(params, jnp.asarray(imgs), True)
        return jnp.argmax(logits, axis=-1)

    # --- metrics protocol ---
    def metric_init(self):
        return M.seg_state_init(self.num_classes)

    def metric_update(self, state, outputs, targets, sample_mask=None):
        if outputs.ndim == 2 and outputs.shape == (self.num_classes, self.num_classes):
            # fused train path: outputs IS the step's confusion matrix
            return M.seg_state_merge_confmat(state, outputs)
        preds = jnp.argmax(outputs, axis=-1)
        return M.seg_state_update(state, preds, targets, self.num_classes, sample_mask)

    def metric_compute(self, state, prefix, with_per_class=False):
        return M.seg_state_compute(
            state, prefix, class_names=self.class_names if with_per_class else None
        )


class WoodscapeSegmenterSwinHP(_SegmenterBase):
    CONFIG_CLASS = WoodscapeSegmenterSwinHPConfig
    NAME = "swin_hp"
    input_key = "hp_imgs"

    def _build_model(self, config, data_spec):
        return SwinHPTransformerSys(config.swin_hp_transformer_config, data_spec)


class WoodscapeSegmenterSwin(_SegmenterBase):
    CONFIG_CLASS = WoodscapeSegmenterSwinConfig
    NAME = "swin"
    input_key = "s2_imgs"
    FUSED_SEQ_OK = False  # the flat baseline is data-parallel only

    def _build_model(self, config, data_spec):
        return SwinTransformerSys(config.swin_transformer_config, data_spec)

    # fused decoder-tail hooks: the flat tail is FinalPatchExpand2D -> LN -> head
    # (models/swin_flat.py:414-419), i.e. the SAME (C, p*C)+(C,)+(C, F) math as
    # the HP tail with p = p1*p2 — only the depth-to-space transpose differs,
    # and it commutes with the per-element CE/confusion matrix, so targets are
    # rearranged into the kernel's row layout instead.
    def _inner_cfg(self):
        cfg = getattr(self.config, "swin_transformer_config", None)
        if cfg is None or cfg.final_upsample != "expand_first":
            return None
        return cfg.normalized()

    def _fused_geometry(self):
        cfg = self._inner_cfg()
        H, W = self.data_spec.dim_in
        p1, p2 = cfg.patch_size
        return (H // p1) * (W // p2), p1 * p2

    def _fused_params(self, params):
        return params["params"]

    def _kernel_targets(self, arr):
        """(B, H, W) -> (B*Hp*Wp, p1*p2): token (h, w)'s sub-pixel (d1, d2) is
        column slice d1*p2 + d2 of its expand output (FinalPatchExpand2D's
        (B, H, W, p1, p2, C) depth-to-space order)."""
        cfg = self._inner_cfg()
        p1, p2 = cfg.patch_size
        B, H, W = arr.shape
        a = arr.reshape(B, H // p1, p1, W // p2, p2)
        return a.transpose(0, 1, 3, 2, 4).reshape(-1, p1 * p2)

    def _pred_from_kernel(self, preds, B):
        cfg = self._inner_cfg()
        p1, p2 = cfg.patch_size
        H, W = self.data_spec.dim_in
        a = preds.reshape(B, H // p1, W // p2, p1, p2)
        return a.transpose(0, 1, 3, 2, 4).reshape(B, H, W)


# ---------------------------------------------------------------------------
# Depth estimation
# ---------------------------------------------------------------------------


@dataclass
class WoodscapeDepthSwinHPConfig:
    swin_hp_transformer_config: SwinHPTransformerConfig = field(
        default_factory=SwinHPTransformerConfig
    )
    optimizer_config: OptimizerConfig = field(default_factory=OptimizerConfig)
    common_depth_config: CommonDepthConfig = field(default_factory=CommonDepthConfig)


@dataclass
class WoodscapeDepthSwinConfig:
    swin_transformer_config: SwinTransformerConfig = field(default_factory=SwinTransformerConfig)
    optimizer_config: OptimizerConfig = field(default_factory=OptimizerConfig)
    common_depth_config: CommonDepthConfig = field(default_factory=CommonDepthConfig)


class _DepthBase:
    """Shared depth task logic (reference model_lightning_depth_swin_hp.py).

    The network is trained in transformed+normalized space; ``forward``/``predict``
    un-normalizes and re-transforms channel 0 so the task always emits metric depths
    (reference :92-100).  The loss re-normalizes targets (reference :132-159).
    """

    input_key: str

    def __init__(self, config, data_spec, data_config=None):
        from heal_swin_tpu.data import normalize_depth_data as ndd

        self.config = config
        self.data_spec = data_spec
        self.data_config = data_config
        self.optimizer_config = config.optimizer_config
        self.cd = config.common_depth_config
        f_out = 2 if self.cd.use_logvar else 1
        self.model = self._build_model(config, data_spec.replace(f_out=f_out))
        self.loss_impl = get_depth_loss(self.cd)
        self._epoch = 0
        self.dc = data_config.common_depth if data_config is not None else None
        # stats in transform space (normalization); metric-space mean for RelSE/RelAE
        if data_spec.data_stats is not None:
            self.norm_stats = data_spec.data_stats
        elif self.dc is not None:
            self.norm_stats = ndd.get_depth_data_stats(
                self.dc.data_transform, self.dc.mask_background
            )
        else:
            self.norm_stats = None
        mb = self.dc.mask_background if self.dc is not None else False
        self.metric_stats = ndd.get_depth_data_stats(None, mb)
        self.num_classes = None
        self.class_names = None

    def _to_metric(self, out_ch0):
        """Un-normalize + inverse-transform network output to metric depths
        (reference model_lightning_depth_swin_hp.py:92-100)."""
        from heal_swin_tpu.data import normalize_depth_data as ndd

        if self.dc is None:
            return out_ch0
        return ndd.unnormalize_and_retransform(
            out_ch0, self.dc.normalize_data, self.norm_stats, self.dc.data_transform
        )

    def _to_network(self, metric_depth):
        from heal_swin_tpu.data import normalize_depth_data as ndd

        if self.dc is None:
            return metric_depth
        return ndd.transform_and_normalize(
            metric_depth, self.dc.normalize_data, self.norm_stats, self.dc.data_transform
        )

    def init_variables(self, rng, imgs):
        return self.model.init(rng, jnp.asarray(imgs), True)

    def _loss_kind(self):
        """Map the current loss_impl (which ``set_epoch`` may switch to the NLL,
        train_uncertainty_after) to the fused kernel's static loss id."""
        from functools import partial as _partial

        from heal_swin_tpu.training import losses as L

        impl = self.loss_impl
        if impl is L.mean_log_var_loss:
            return "nll", 1.0
        if impl is L.mse:
            return "l2", 1.0
        if impl is L.l1_loss:
            return "l1", 1.0
        if isinstance(impl, _partial) and impl.func is L.huber_loss:
            return "huber", float(impl.keywords.get("delta", 1.0))
        return None, 1.0

    def _fused_tail_ok(self, seq=None):
        """Gate for the fused expand+LN+head+masked-depth-loss train path
        (ops/final_head.py fused_final_head_depth).  Unlike the segmentation gate,
        eval sample masks ARE supported: padded samples mask by setting their
        targets to inf, the kernel's native exclusion mechanism."""
        cfg = getattr(self.config, "swin_hp_transformer_config", None)
        if cfg is None or not getattr(cfg, "fused_final_head", False):
            return False
        if jax.default_backend() != "tpu" and not _SegmenterBase._fh_interpret():
            return False
        if self._loss_kind()[0] is None:
            return False
        from heal_swin_tpu.ops import final_head as fh

        npix = self.data_spec.dim_in
        T = npix // cfg.patch_size
        if seq is not None and seq[1] > 1:
            if T % seq[1] != 0:
                return False
            T //= seq[1]
        f_out = 2 if self.cd.use_logvar else 1
        return fh.supported_depth(T, cfg.embed_dim, f_out, cfg.patch_size,
                                  cfg.compute_dtype)

    def loss_fn(self, params, imgs, targets, rng=None, deterministic=True, sample_mask=None,
                axis_names=None, seq=None):
        """targets come from the dataloader already in network (transformed+normalized)
        space with non-finite background markers, exactly as in the reference
        (model_lightning_depth_swin_hp.py:132-143); the loss runs in that space.
        ``axis_names``/``seq``: sharded execution — see _SegmenterBase.loss_fn."""
        rngs = _task_rngs(rng, seq)
        if self._fused_tail_ok(seq):
            from heal_swin_tpu.ops import final_head as fh

            cfg = self.config.swin_hp_transformer_config
            p = cfg.patch_size
            kind, delta = self._loss_kind()
            feats = self.model.apply(
                params, imgs, deterministic, False, rngs=rngs, seq=seq
            )
            B, N, C = feats.shape
            pp = params["params"]["decoder"]
            t = targets
            if sample_mask is not None:
                m = jnp.reshape(
                    sample_mask, sample_mask.shape + (1,) * (t.ndim - sample_mask.ndim)
                )
                t = jnp.where(m, t, jnp.inf)  # kernel-native exclusion
            F = 2 if self.cd.use_logvar else 1
            loss, preds = fh.fused_final_head_depth(
                feats.reshape(B * N, C),
                pp["up"]["expand"]["kernel"],
                pp["up"]["norm"]["ln"]["scale"],
                pp["up"]["norm"]["ln"]["bias"],
                pp["output"]["kernel"],
                t.reshape(B * N, p), patch_size=p, loss_kind=kind,
                huber_delta=delta, interpret=_SegmenterBase._fh_interpret(),
                axis_names=axis_names,
            )
            return loss, preds.reshape(B, N * p, F)
        out = self.model.apply(params, imgs, deterministic, rngs=rngs, seq=seq)
        t = targets
        if sample_mask is not None:
            m = jnp.reshape(sample_mask, sample_mask.shape + (1,) * (t.ndim - sample_mask.ndim))
            t = jnp.where(m, t, jnp.inf)  # inf targets are excluded from depth losses
        loss = self.loss_impl(
            out, t, mask_background=getattr(self.dc, "mask_background", False),
            axis_names=axis_names,
        )
        return loss, out

    def predict(self, params, imgs):
        """Emit metric depths on channel 0 (reference forward, :92-100); the logvar
        channel (if any) stays in network space."""
        out = self.model.apply(params, jnp.asarray(imgs), True)
        ch0 = self._to_metric(out[..., 0])
        if out.shape[-1] > 1:
            return jnp.concatenate([ch0[..., None], out[..., 1:]], axis=-1)
        return ch0[..., None]

    def set_epoch(self, epoch: int) -> bool:
        """Loss switch after epoch ``train_uncertainty_after`` (reference
        model_lightning_depth_swin.py:105-111).  Returns True when the loss changed
        (the trainer rebuilds its jitted step)."""
        from heal_swin_tpu.training.losses import mean_log_var_loss

        self._epoch = epoch
        tua = self.cd.train_uncertainty_after
        if (
            self.cd.use_logvar
            and isinstance(tua, int)
            and tua > 0
            and epoch >= tua
            and self.loss_impl is not mean_log_var_loss
        ):
            self.loss_impl = mean_log_var_loss
            return True
        return False

    def metric_init(self):
        return M.depth_state_init()

    def metric_update(self, state, out, targets, sample_mask=None):
        """Metrics in metric space: both prediction and target are un-normalized and
        re-transformed (reference :145-158)."""
        pred_metric = self._to_metric(out[..., 0])
        t = self._to_metric(targets)
        if sample_mask is not None:
            t = jnp.where(
                jnp.reshape(sample_mask, sample_mask.shape + (1,) * (t.ndim - sample_mask.ndim)),
                t,
                jnp.inf,
            )
        log_var = out[..., 1] if (self.cd.use_logvar and out.shape[-1] > 1) else None
        return M.depth_state_update(
            state, pred_metric, t, dataset_mean=float(self.metric_stats.mean),
            log_var=log_var,
        )

    def metric_compute(self, state, prefix, with_per_class=False):
        return M.depth_state_compute(state, prefix)


class WoodscapeDepthSwinHP(_DepthBase):
    CONFIG_CLASS = WoodscapeDepthSwinHPConfig
    NAME = "depth_swin_hp"
    input_key = "hp_imgs"

    def _build_model(self, config, data_spec):
        return SwinHPTransformerSys(config.swin_hp_transformer_config, data_spec)


class WoodscapeDepthSwin(_DepthBase):
    CONFIG_CLASS = WoodscapeDepthSwinConfig
    NAME = "depth_swin"
    input_key = "s2_imgs"

    def _build_model(self, config, data_spec):
        return SwinTransformerSys(config.swin_transformer_config, data_spec)


# ---------------------------------------------------------------------------
# Registry (reference models_lightning.py:12-34)
# ---------------------------------------------------------------------------

MODEL_CLASSES = [
    WoodscapeSegmenterSwin,
    WoodscapeSegmenterSwinHP,
    WoodscapeDepthSwin,
    WoodscapeDepthSwinHP,
]

MODELS = {m.NAME: m for m in MODEL_CLASSES}
MODEL_NAME_FROM_CONFIG_NAME = {m.CONFIG_CLASS.__name__: m.__name__ for m in MODEL_CLASSES}
MODEL_FROM_CONFIG_NAME = {m.CONFIG_CLASS.__name__: m for m in MODEL_CLASSES}
MODEL_FROM_NAME = {m.__name__: m for m in MODEL_CLASSES}
