"""Flat (2-D) SWIN-UNet baseline in Flax.

Architectural parity with reference ``heal_swin/models_torch/swin_transformer.py``
(adapted there from HuCaoFighting/Swin-Unet); rebuilt TPU-first: channels-last
(B, H, W, C), window partition as reshape+transpose, 9-region shift masks precomputed
as (nW, ws) group ids, relative position bias with trunc-normal init
(swin_transformer.py:143).

Known reference quirk NOT reproduced: the reference's 2-D roll uses shift_size[0] for
both axes (swin_transformer.py:365-368, marked FIXME there); we roll by
(shift[0], shift[1]).  All shipped configs use symmetric shifts, where both agree.

Inputs: (B, H, W, f_in).  Output: (B, H, W, f_out).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, List, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from heal_swin_tpu.data.data_spec import DataSpec
from heal_swin_tpu.models.layers import DropPath, LayerNorm, Mlp, WindowAttention, dense, trunc_normal_init

Dtype = Any


@dataclass
class SwinTransformerConfig:
    """Mirrors reference SwinTransformerConfig (swin_transformer.py:796-820)."""

    patch_size: Union[int, Tuple[int, int]] = (4, 4)
    window_size: Union[int, Tuple[int, int]] = (4, 4)
    shift_size: Union[int, Tuple[int, int]] = -1  # -1 -> window//2
    embed_dim: int = 96
    patch_embed_norm_layer: Optional[str] = None
    depths: List[int] = field(default_factory=lambda: [2, 2, 2, 2])
    num_heads: List[int] = field(default_factory=lambda: [3, 6, 12, 24])
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    use_cos_attn: bool = False
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    norm_layer: str = "LayerNorm"
    use_v2_norm_placement: bool = False
    ape: bool = False
    patch_norm: bool = True
    use_checkpoint: bool = False
    final_upsample: str = "expand_first"
    use_masking: bool = True
    use_rel_pos_bias: bool = True
    dev_mode: bool = False
    dtype: Optional[str] = None  # TPU extension: compute dtype
    gelu_approx: bool = False  # TPU extension: tanh GELU (bf16-indistinguishable, faster)
    attention_impl: str = "auto"  # TPU extension: "auto" | "xla" | "pallas"
    # TPU extension: fuse FinalPatchExpand2D + LN + head + weighted CE into one
    # Pallas kernel on SEGMENTATION TRAIN steps (ops/final_head.py — the
    # depth-to-space transpose commutes with the per-element CE/confmat, so the
    # flat tail reuses the HP kernel with p = p1*p2 and transposed targets).
    # Default on like the HP model's flag; the gate in tasks.py falls back
    # off-TPU / unsupported shapes.  Eval/predict always use the plain tail.
    fused_final_head: bool = True

    @property
    def compute_dtype(self):
        return {None: jnp.float32, "float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]

    def normalized(self) -> "SwinTransformerConfig":
        """Resolve int -> pair and shift -1 -> window//2 (reference swin_transformer.py:862-921)."""
        def pair(v):
            if isinstance(v, int):
                return (v, v)
            v = tuple(v)
            return (v[0], v[0]) if len(v) == 1 else v

        import dataclasses

        ps, ws = pair(self.patch_size), pair(self.window_size)
        ss = (ws[0] // 2, ws[1] // 2) if self.shift_size == -1 else pair(self.shift_size)
        return dataclasses.replace(self, patch_size=ps, window_size=ws, shift_size=ss)


@functools.lru_cache(maxsize=None)
def _rel_pos_index_2d(wh: int, ww: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)


@functools.lru_cache(maxsize=None)
def _shift_win_groups(H: int, W: int, wh: int, ww: int, sh: int, sw: int) -> np.ndarray:
    """9-region SWIN shift mask -> (nW, wh*ww) group ids (reference swin_transformer.py:312-352)."""
    img = np.zeros((H, W), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, -wh), slice(-wh, -sh), slice(-sh, None)):
        for ws_ in (slice(0, -ww), slice(-ww, -sw), slice(-sw, None)):
            img[hs, ws_] = cnt
            cnt += 1
    # partition into windows
    g = img.reshape(H // wh, wh, W // ww, ww).transpose(0, 2, 1, 3).reshape(-1, wh * ww)
    return g


def _window_partition(x, wh, ww):
    """(B, H, W, C) -> (B, nW, wh*ww, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // wh, wh, W // ww, ww, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, (H // wh) * (W // ww), wh * ww, C)


def _window_reverse(x, wh, ww, H, W):
    """(B, nW, wh*ww, C) -> (B, H, W, C)."""
    B = x.shape[0]
    C = x.shape[-1]
    x = x.reshape(B, H // wh, W // ww, wh, ww, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


class SwinBlock2D(nn.Module):
    """(reference SwinTransformerBlock, swin_transformer.py:219-441)."""

    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: Tuple[int, int]
    shift_size: Tuple[int, int]
    mlp_ratio: float
    qkv_bias: bool
    qk_scale: Optional[float]
    drop: float
    attn_drop: float
    drop_path: float
    use_masking: bool
    use_v2_norm_placement: bool
    use_cos_attn: bool
    use_rel_pos_bias: bool
    attention_impl: str = "auto"
    gelu_approx: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        H, W = self.input_resolution
        B, L, C = x.shape
        assert L == H * W, "input feature has wrong size"

        wh, ww = self.window_size
        sh, sw = self.shift_size
        if H <= wh or W <= ww:
            wh, ww = H, W
            sh, sw = 0, 0
        assert 0 <= sh < wh and 0 <= sw < ww

        shortcut = x
        if not self.use_v2_norm_placement:
            x = LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x.reshape(B, H, W, C)

        shifted = sh > 0 or sw > 0
        if shifted:
            x = jnp.roll(x, (-sh, -sw), axis=(1, 2))

        xw = _window_partition(x, wh, ww)  # (B, nW, ws, C)

        win_groups = (
            _shift_win_groups(H, W, wh, ww, sh, sw) if (self.use_masking and shifted) else None
        )
        rel_idx = _rel_pos_index_2d(wh, ww) if self.use_rel_pos_bias else None
        xw = WindowAttention(
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            use_cos_attn=self.use_cos_attn,
            rel_pos_index=rel_idx,
            rel_pos_table_size=(2 * wh - 1) * (2 * ww - 1),
            rel_pos_init_zero=False,  # flat model trunc-normals its table (ref :143)
            attention_impl=self.attention_impl,
            dtype=self.dtype,
            name="attn",
        )(xw, win_groups=win_groups, deterministic=deterministic)

        x = _window_reverse(xw, wh, ww, H, W)
        if shifted:
            x = jnp.roll(x, (sh, sw), axis=(1, 2))
        x = x.reshape(B, H * W, C)

        mlp = Mlp(
            hidden_features=int(self.dim * self.mlp_ratio),
            out_features=self.dim,
            drop=self.drop,
            dtype=self.dtype,
            gelu_approx=self.gelu_approx,
            name="mlp",
        )
        dp = DropPath(self.drop_path, name="drop_path")
        if self.use_v2_norm_placement:
            x = shortcut + dp(LayerNorm(dtype=self.dtype, name="norm1")(x), deterministic)
            x = x + dp(
                LayerNorm(dtype=self.dtype, name="norm2")(mlp(x, deterministic)), deterministic
            )
        else:
            x = shortcut + dp(x, deterministic)
            x = x + dp(
                mlp(LayerNorm(dtype=self.dtype, name="norm2")(x), deterministic), deterministic
            )
        return x


class PatchMerging2D(nn.Module):
    """2x2 space-to-depth + LN + Dense(4C -> 2C) (reference swin_transformer.py:426-464)."""

    input_resolution: Tuple[int, int]
    dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        H, W = self.input_resolution
        B, L, C = x.shape
        assert L == H * W and H % 2 == 0 and W % 2 == 0
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        # concat order [x0, x1, x2, x3] = [(0,0), (1,0), (0,1), (1,1)] in (h, w) offsets
        x = x.transpose(0, 1, 3, 4, 2, 5)  # B, H/2, W/2, wofs, hofs, C
        x = x.reshape(B, (H // 2) * (W // 2), 4 * C)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        x = dense(2 * self.dim, use_bias=False, dtype=self.dtype, name="reduction")(x)
        return x


class PatchExpand2D(nn.Module):
    """Dense(C -> 2C) + depth-to-space 2x2 + LN (reference swin_transformer.py:477-501)."""

    input_resolution: Tuple[int, int]
    dim: int
    dim_scale: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        H, W = self.input_resolution
        if self.dim_scale == 2:
            x = dense(2 * self.dim, use_bias=False, dtype=self.dtype, name="expand")(x)
        B, L, C = x.shape
        assert L == H * W
        x = x.reshape(B, H, W, 2, 2, C // 4)
        x = x.transpose(0, 1, 3, 2, 4, 5)  # b (h p1) (w p2) c
        x = x.reshape(B, (2 * H) * (2 * W), C // 4)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        return x


class FinalPatchExpand2D(nn.Module):
    """Dense(C -> p1*p2*C) + depth-to-space (p1, p2) + LN (reference swin_transformer.py:504-535)."""

    input_resolution: Tuple[int, int]
    patch_size: Tuple[int, int]
    dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        H, W = self.input_resolution
        p1, p2 = self.patch_size
        x = dense(p1 * p2 * self.dim, use_bias=False, dtype=self.dtype, name="expand")(x)
        B, L, C = x.shape
        assert L == H * W
        x = x.reshape(B, H, W, p1, p2, self.dim)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, (H * p1) * (W * p2), self.dim)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        return x


class SwinTransformerSys(nn.Module):
    """Flat SWIN-UNet (reference SwinTransformerSys, swin_transformer.py:823-1136).

    __call__(x: (B, H, W, f_in)) -> (B, H, W, f_out) in float32.
    """

    config: SwinTransformerConfig
    data_spec: DataSpec

    def _check_divisibility(self, cfg):
        H, W = self.data_spec.dim_in
        merge = 2 ** (len(cfg.depths) - 1)
        ph, pw = cfg.patch_size
        wh, ww = cfg.window_size
        assert (H / (merge * ph * wh)) % 1 == 0, (
            f"H must be divisible by merge_factor*patch_height*window_height, got H={H}, "
            f"{merge}*{ph}*{wh}={merge * ph * wh}. "
            f"Correct by {-H % (merge * ph * wh)} or {-((H % (merge * ph * wh)) - merge * ph * wh)}."
        )
        assert (W / (merge * pw * ww)) % 1 == 0, (
            f"W must be divisible by merge_factor*patch_width*window_width, got W={W}, "
            f"{merge}*{pw}*{ww}={merge * pw * ww}. "
            f"Correct by {-W % (merge * pw * ww)} or {-((W % (merge * pw * ww)) - merge * pw * ww)}."
        )

    @nn.compact
    def __call__(self, x, deterministic: bool = True, tail: bool = True, seq=None):
        """``tail=False`` stops after norm_up and returns the (B, Hp*Wp, C)
        patch tokens — the input of the fused expand+LN+head+CE kernel
        (ops/final_head.py); mirrors SwinHPTransformerSys."""
        assert seq is None, (
            "sequence parallelism targets the HP model's 1-D nested token axis "
            "(parallel/sequence.py); the flat baseline is data-parallel only"
        )
        cfg = self.config.normalized()
        self._check_divisibility(cfg)
        spec = self.data_spec
        num_layers = len(cfg.depths)
        H, W = spec.dim_in
        ph, pw = cfg.patch_size
        pr = (H // ph, W // pw)  # patches resolution
        dt = cfg.compute_dtype

        block_cls = nn.remat(SwinBlock2D, static_argnums=(2,)) if cfg.use_checkpoint else SwinBlock2D

        def make_blocks(dim, res, depth, heads, dpr_slice, prefix):
            def run(x, deterministic):
                for i in range(depth):
                    x = block_cls(
                        dim=dim,
                        input_resolution=res,
                        num_heads=heads,
                        window_size=cfg.window_size,
                        shift_size=(0, 0) if i % 2 == 0 else cfg.shift_size,
                        mlp_ratio=cfg.mlp_ratio,
                        qkv_bias=cfg.qkv_bias,
                        qk_scale=cfg.qk_scale,
                        drop=cfg.drop_rate,
                        attn_drop=cfg.attn_drop_rate,
                        drop_path=dpr_slice[i],
                        use_masking=cfg.use_masking,
                        use_v2_norm_placement=cfg.use_v2_norm_placement,
                        use_cos_attn=cfg.use_cos_attn,
                        use_rel_pos_bias=cfg.use_rel_pos_bias,
                        attention_impl=cfg.attention_impl,
                        gelu_approx=cfg.gelu_approx,
                        dtype=dt,
                        name=f"{prefix}_block{i}",
                    )(x, deterministic)
                return x

            return run

        # patch embed: Conv2d(k=s=p) == space-to-depth + Dense
        B = x.shape[0]
        x = x.astype(dt)
        assert x.shape[1] == H and x.shape[2] == W, (
            f"Input image size {x.shape[1]}*{x.shape[2]} doesn't match model ({H}*{W})."
        )
        x = x.reshape(B, pr[0], ph, pr[1], pw, spec.f_in)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, pr[0] * pr[1], ph * pw * spec.f_in)
        x = dense(cfg.embed_dim, dtype=dt, name="patch_embed_proj")(x)
        if cfg.patch_embed_norm_layer is not None:
            x = LayerNorm(dtype=dt, name="patch_embed_norm")(x)

        if cfg.dev_mode:  # trace-time shape prints (reference swin_transformer.py:1063-1082)
            print(f"forward_features after patch_embed: {x.shape}")
        if cfg.ape:
            ape = self.param(
                "absolute_pos_embed", trunc_normal_init, (1, pr[0] * pr[1], cfg.embed_dim),
                jnp.float32,
            )
            x = x + ape.astype(dt)
        x = nn.Dropout(cfg.drop_rate)(x, deterministic=deterministic)

        dpr = list(np.linspace(0, cfg.drop_path_rate, sum(cfg.depths)))

        # encoder
        x_downsample = []
        for i in range(num_layers):
            res = (pr[0] // 2**i, pr[1] // 2**i)
            dim = int(cfg.embed_dim * 2**i)
            x_downsample.append(x)
            x = make_blocks(
                dim, res, cfg.depths[i], cfg.num_heads[i],
                dpr[sum(cfg.depths[:i]) : sum(cfg.depths[: i + 1])], f"layer{i}",
            )(x, deterministic)
            if i < num_layers - 1:
                x = PatchMerging2D(input_resolution=res, dim=dim, dtype=dt, name=f"downsample{i}")(x)
            if cfg.dev_mode:
                print(f"forward_features after layer {i}: {x.shape}")

        x = LayerNorm(dtype=dt, name="norm")(x)

        # decoder
        for inx in range(num_layers):
            down_idx = num_layers - 1 - inx
            res = (pr[0] // 2**down_idx, pr[1] // 2**down_idx)
            dim = int(cfg.embed_dim * 2**down_idx)
            if inx == 0:
                x = PatchExpand2D(input_resolution=res, dim=dim, dim_scale=2, dtype=dt, name="expand0")(x)
            else:
                x = jnp.concatenate([x, x_downsample[down_idx]], axis=-1)
                x = dense(dim, dtype=dt, name=f"concat_back_dim{inx}")(x)
                x = make_blocks(
                    dim, res, cfg.depths[down_idx], cfg.num_heads[down_idx],
                    dpr[sum(cfg.depths[:down_idx]) : sum(cfg.depths[: down_idx + 1])],
                    f"layer_up{inx}",
                )(x, deterministic)
                if down_idx > 0:
                    x = PatchExpand2D(
                        input_resolution=res, dim=dim, dim_scale=2, dtype=dt, name=f"upsample{inx}"
                    )(x)

        x = LayerNorm(dtype=dt, name="norm_up")(x)
        if not tail:
            return x

        if cfg.final_upsample == "expand_first":
            x = FinalPatchExpand2D(
                input_resolution=pr, patch_size=cfg.patch_size, dim=cfg.embed_dim, dtype=dt, name="up"
            )(x)
            x = dense(spec.f_out, use_bias=False, dtype=dt, name="output")(x)
        x = x.reshape(B, H, W, spec.f_out)
        return x.astype(jnp.float32)
