"""HEAL-SWIN-UNet in Flax: SWIN-UNet over the spherical HEALPix grid in nested ordering.

Tokens are nested-order HEALPix pixels treated as a flat 1-D sequence; windows are
contiguous runs (reshape), patch merging/expanding rides the 4-children-per-parent
nested hierarchy (reshape + dense), and shifted windows are host-precomputed roll /
permutation constants with group-id attention masks.

Architectural parity with reference ``heal_swin/models_torch/swin_hp_transformer.py``
(config defaults :794-819, encoder :849-955, decoder :704-791); rebuilt TPU-first:
channels-last, everything is a reshape/dense/einsum so XLA maps it onto the MXU, no
data-dependent control flow, optional bf16 compute, per-block rematerialization.

Inputs: (B, npix, f_in) channels-last.  Output: (B, npix, f_out).
(The torch reference uses (B, f_in, npix); channels-last is the TPU-native layout.)
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from heal_swin_tpu.data.data_spec import DataSpec
from heal_swin_tpu.models.layers import (
    _LNParams,
    DropPath,
    LayerNorm,
    Mlp,
    WindowAttention,
    dense,
    trunc_normal_init,
)
from heal_swin_tpu.ops.permute import permute_tokens
from heal_swin_tpu.ops.shifting import get_shift_spec
from heal_swin_tpu.ops.windowing import get_nest_win_idcs

Dtype = Any


@dataclass
class SwinHPTransformerConfig:
    """Mirrors reference SwinHPTransformerConfig (swin_hp_transformer.py:794-819).

    torch class references become strings: norm_layer="LayerNorm",
    decoder_class="UnetDecoder".  ``dtype`` is a TPU extension: compute dtype
    ("float32" | "bfloat16"); params are always float32.
    """

    patch_size: int = 4
    window_size: int = 4
    shift_size: int = 2
    shift_strategy: str = "nest_roll"  # "nest_roll" | "nest_grid_shift" | "ring_shift"
    rel_pos_bias: Optional[str] = None  # None | "flat"
    embed_dim: int = 96
    patch_embed_norm_layer: Optional[str] = None  # None | "LayerNorm"
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
    dev_mode: bool = False
    decoder_class: str = "UnetDecoder"
    dtype: Optional[str] = None  # TPU extension: compute dtype
    gelu_approx: bool = False  # TPU extension: tanh GELU (bf16-indistinguishable, faster)
    attention_impl: str = "auto"  # TPU extension: "auto" | "xla" | "pallas"
    # TPU extension: fuse FinalPatchExpand+LN+head+CE into one Pallas kernel for
    # SEGMENTATION TRAIN steps (ops/final_head.py; the step's confusion-matrix
    # metrics come from the kernel).  Eval/predict always use the plain tail.
    # Default on: measured 16.56 vs 15.31 img/s/chip with per-step train metrics
    # at paper scale (the gate in tasks.py falls back off-TPU / unsupported shapes).
    fused_final_head: bool = True

    @property
    def compute_dtype(self):
        return {None: jnp.float32, "float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]


@functools.lru_cache(maxsize=None)
def _roll_perms(n: int, r: int):
    """The forward shift ``roll(x, -r)`` and its reverse as gather permutations
    (``y[i] = x[perm[i]]``) — the form the sequence-parallel shift path uses
    (parallel/sequence.py; a roll crosses shard boundaries like any permutation)."""
    idx = np.arange(n, dtype=np.int32)
    fwd = (idx + r) % n  # roll(x, -r)[i] = x[(i + r) % n]
    bwd = (idx - r) % n
    return fwd, bwd


def _rel_pos_index_nested(window_size: int) -> np.ndarray:
    """(ws, ws) relative-position table index in nested token order.

    Builds the 2-D SWIN relative index on the sqrt(ws) x sqrt(ws) grid, then permutes
    rows/cols from grid order into nested order via get_nest_win_idcs
    (reference swin_hp_transformer.py:89-114).
    """
    side = int(round(np.sqrt(window_size)))
    coords = np.stack(np.meshgrid(np.arange(side), np.arange(side), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += side - 1
    rel[:, :, 1] += side - 1
    rel[:, :, 0] *= 2 * side - 1
    idx = rel.sum(-1)
    nest_inv = np.argsort(get_nest_win_idcs(window_size).reshape(-1))
    return idx[nest_inv][:, nest_inv]


class SwinHPBlock(nn.Module):
    """One SWIN transformer block on the nested pixel sequence
    (reference SwinTransformerBlock, swin_hp_transformer.py:193-340)."""

    dim: int
    input_resolution: int  # token count at this stage
    base_pix: int
    num_heads: int
    window_size: int
    shift_size: int
    shift_strategy: str
    rel_pos_bias: Optional[str]
    mlp_ratio: float
    qkv_bias: bool
    qk_scale: Optional[float]
    drop: float
    attn_drop: float
    drop_path: float
    use_v2_norm_placement: bool
    use_cos_attn: bool
    attention_impl: str = "auto"
    gelu_approx: bool = False
    dtype: Optional[Dtype] = None
    # sequence parallelism (parallel/sequence.py): tokens sharded over mesh axis
    # ``seq_axis`` in ``seq_shards`` pieces; x is then this shard's (B, N/shards, C)
    seq_axis: Optional[str] = None
    seq_shards: int = 1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, Nl, C = x.shape
        sp = self.seq_shards if self.seq_axis is not None else 1
        N = Nl * sp  # global token count; shift/window geometry is global
        ws = self.window_size
        shift = self.shift_size
        if N <= ws:  # no partitioning when window covers the whole sequence
            ws = N
            shift = 0

        spec = get_shift_spec(self.shift_strategy, N, self.base_pix, ws, shift)
        if sp > 1:
            assert Nl % ws == 0 and (N // ws) % sp == 0, (
                f"sequence shards must hold whole windows: {N} tokens / {sp} shards "
                f"= {Nl} per shard, window {ws}"
            )

        shortcut = x
        if not self.use_v2_norm_placement:
            x = LayerNorm(dtype=self.dtype, name="norm1")(x)

        # shift (roll or precomputed permutation gather with inverse-gather VJP);
        # under sequence parallelism every shift is a permutation routed through the
        # sharded all-gather + local-gather primitive — the model's ONLY cross-shard
        # communication (parallel/sequence.py)
        if sp > 1:
            from heal_swin_tpu.parallel.sequence import (
                seq_local_slice,
                sharded_permute,
            )

            # dispatcher: all-gather + local gather by default, or the boundary
            # all-to-all exchange (HEAL_SWIN_SEQ_EXCHANGE=all_to_all); perms stay
            # host numpy so the exchange tables can precompute
            sp_perm = functools.partial(
                sharded_permute, axis_name=self.seq_axis, n_shards=sp
            )
        if spec.kind == "roll":
            if sp > 1:
                fwd, bwd = _roll_perms(N, spec.roll_amount)
                x = sp_perm(x, fwd, bwd)
            else:
                x = jnp.roll(x, -spec.roll_amount, axis=1)
        elif spec.kind == "perm":
            if sp > 1:
                x = sp_perm(x, spec.perm, spec.inv_perm)
            else:
                x = permute_tokens(x, jnp.asarray(spec.perm), jnp.asarray(spec.inv_perm))

        # windows as a tensor dim: (B, nW, ws, C) — pure reshape in nested order
        x = x.reshape(B, Nl // ws, ws, C)

        win_groups = spec.win_groups
        if sp > 1 and win_groups is not None:
            # this shard's rows of the global (nW, ws) mask-group table
            win_groups = seq_local_slice(
                np.asarray(win_groups), self.seq_axis, sp, axis=0
            )

        rel_idx = _rel_pos_index_nested(ws) if self.rel_pos_bias == "flat" else None
        side = int(round(np.sqrt(ws)))
        # v2 res-post-norm: norm1 applies to the attention output; it is per-token,
        # so it commutes with the inverse shift and is hoisted INTO WindowAttention
        # (where it can fuse into the Pallas kernel's epilogue)
        ln1 = _LNParams(name="norm1")(C) if self.use_v2_norm_placement else None
        x = WindowAttention(
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            use_cos_attn=self.use_cos_attn,
            rel_pos_index=rel_idx,
            rel_pos_table_size=(2 * side - 1) ** 2,
            rel_pos_init_zero=True,  # reference quirk: HP rel-pos table stays zeros-init
            attention_impl=self.attention_impl,
            dtype=self.dtype,
            name="attn",
        )(x, win_groups=win_groups, deterministic=deterministic, ln_params=ln1)

        x = x.reshape(B, Nl, C)

        # reverse shift
        if spec.kind == "roll":
            if sp > 1:
                fwd, bwd = _roll_perms(N, spec.roll_amount)
                x = sp_perm(x, bwd, fwd)
            else:
                x = jnp.roll(x, spec.roll_amount, axis=1)
        elif spec.kind == "perm":
            if sp > 1:
                x = sp_perm(x, spec.inv_perm, spec.perm)
            else:
                x = permute_tokens(x, jnp.asarray(spec.inv_perm), jnp.asarray(spec.perm))

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
            # norm1 already applied inside WindowAttention (fused epilogue)
            x = shortcut + dp(x, deterministic)
            x = x + dp(
                LayerNorm(dtype=self.dtype, name="norm2")(mlp(x, deterministic)), deterministic
            )
        else:
            x = shortcut + dp(x, deterministic)
            x = x + dp(
                mlp(LayerNorm(dtype=self.dtype, name="norm2")(x), deterministic), deterministic
            )
        return x


class PatchMerging(nn.Module):
    """4 nested children -> parent: reshape (B, N/4, 4C) + LN + Dense(4C -> 2C).

    Identical math to the reference's strided-slice concat (swin_hp_transformer.py:378-395)
    because nested children are sequence-contiguous — but on TPU it is a free reshape.
    """

    dim: int
    dim_scale: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        assert N % 4 == 0, f"sequence length {N} not divisible by 4"
        x = x.reshape(B, N // 4, 4 * C)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        x = dense(self.dim_scale * self.dim, use_bias=False, dtype=self.dtype, name="reduction")(x)
        return x


class PatchExpand(nn.Module):
    """Parent -> 4 nested children: Dense(C -> scale*C) + reshape (B, 4N, scale*C/4) + LN
    (reference swin_hp_transformer.py:407-430)."""

    dim: int
    dim_scale: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        if self.dim_scale != 1:
            x = dense(self.dim_scale * self.dim, use_bias=False, dtype=self.dtype, name="expand")(x)
        B, N, C = x.shape
        x = x.reshape(B, N * 4, C // 4)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        return x


class FinalPatchExpand_X4(nn.Module):
    """Token -> patch_size pixels: Dense(C -> p*C) + reshape (B, N*p, C) + LN
    (reference swin_hp_transformer.py:433-452)."""

    patch_size: int
    dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x = dense(self.patch_size * self.dim, use_bias=False, dtype=self.dtype, name="expand")(x)
        B, N, C = x.shape
        x = x.reshape(B, N * self.patch_size, C // self.patch_size)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        return x


class PatchEmbed(nn.Module):
    """Pixel sequence -> patch tokens.  Conv1d(k=s=p) == reshape (B, N/p, p*f_in) + Dense
    on TPU (reference swin_hp_transformer.py:656-694)."""

    patch_size: int
    embed_dim: int
    use_norm: bool
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        B, N, F = x.shape
        assert self.patch_size % 4 == 0, "required for valid nside in deeper layers"
        assert N % self.patch_size == 0
        x = x.reshape(B, N // self.patch_size, self.patch_size * F)
        x = dense(self.embed_dim, dtype=self.dtype, name="proj")(x)
        if self.use_norm:
            x = LayerNorm(dtype=self.dtype, name="norm")(x)
        return x


def _make_block(cfg: SwinHPTransformerConfig, base_pix, dim, input_resolution, num_heads,
                shift_size, drop_path, name, seq=None):
    block_cls = nn.remat(SwinHPBlock, static_argnums=(2,)) if cfg.use_checkpoint else SwinHPBlock
    return block_cls(
        dim=dim,
        input_resolution=input_resolution,
        base_pix=base_pix,
        num_heads=num_heads,
        window_size=cfg.window_size,
        shift_size=shift_size,
        shift_strategy=cfg.shift_strategy,
        rel_pos_bias=cfg.rel_pos_bias,
        mlp_ratio=cfg.mlp_ratio,
        qkv_bias=cfg.qkv_bias,
        qk_scale=cfg.qk_scale,
        drop=cfg.drop_rate,
        attn_drop=cfg.attn_drop_rate,
        drop_path=drop_path,
        use_v2_norm_placement=cfg.use_v2_norm_placement,
        use_cos_attn=cfg.use_cos_attn,
        attention_impl=cfg.attention_impl,
        gelu_approx=cfg.gelu_approx,
        dtype=cfg.compute_dtype,
        seq_axis=seq[0] if seq else None,
        seq_shards=seq[1] if seq else 1,
        name=name,
    )


class BasicLayer(nn.Module):
    """Encoder stage: depth blocks (alternating shift 0 / shift_size) + optional merge
    (reference BasicLayer, swin_hp_transformer.py:455-558)."""

    config: SwinHPTransformerConfig
    base_pix: int
    dim: int
    input_resolution: int
    depth: int
    num_heads: int
    drop_path: List[float]
    downsample: bool
    seq: Optional[Tuple[str, int]] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        for i in range(self.depth):
            blk = _make_block(
                cfg, self.base_pix, self.dim, self.input_resolution, self.num_heads,
                0 if i % 2 == 0 else cfg.shift_size, self.drop_path[i], name=f"block{i}",
                seq=self.seq,
            )
            x = blk(x, deterministic)
        if self.downsample:
            x = PatchMerging(dim=self.dim, dtype=cfg.compute_dtype, name="downsample")(x)
        return x


class BasicLayerUp(nn.Module):
    """Decoder stage: depth blocks + optional expand
    (reference BasicLayer_up, swin_hp_transformer.py:561-653)."""

    config: SwinHPTransformerConfig
    base_pix: int
    dim: int
    input_resolution: int
    depth: int
    num_heads: int
    drop_path: List[float]
    upsample: bool
    seq: Optional[Tuple[str, int]] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        for i in range(self.depth):
            blk = _make_block(
                cfg, self.base_pix, self.dim, self.input_resolution, self.num_heads,
                0 if i % 2 == 0 else cfg.shift_size, self.drop_path[i], name=f"block{i}",
                seq=self.seq,
            )
            x = blk(x, deterministic)
        if self.upsample:
            x = PatchExpand(dim=self.dim, dim_scale=2, dtype=cfg.compute_dtype, name="upsample")(x)
        return x


class UnetDecoder(nn.Module):
    """Mirror decoder with skip concat + concat_back_dim linears, final LN ->
    FinalPatchExpand_X4 -> Dense(f_out) (reference UnetDecoder, swin_hp_transformer.py:704-791)."""

    config: SwinHPTransformerConfig
    data_spec: DataSpec
    dpr: List[float]
    seq: Optional[Tuple[str, int]] = None

    @nn.compact
    def __call__(self, x, x_downsample, deterministic: bool = True, tail: bool = True):
        """``tail=False`` stops after norm_up and returns the (B, N, C) tokens —
        the input of the fused expand+LN+head+CE kernel (ops/final_head.py); the
        'up'/'output' params are untouched in that mode (they exist from init)."""
        cfg = self.config
        num_layers = len(cfg.depths)
        num_patches = self.data_spec.dim_in // cfg.patch_size
        dt = cfg.compute_dtype

        for inx in range(num_layers):
            down_idx = num_layers - 1 - inx
            concat_out = int(cfg.embed_dim * 2**down_idx)
            if inx == 0:
                x = PatchExpand(dim=concat_out, dim_scale=2, dtype=dt, name="expand0")(x)
            else:
                x = jnp.concatenate([x, x_downsample[down_idx]], axis=-1)
                x = dense(concat_out, dtype=dt, name=f"concat_back_dim{inx}")(x)
                x = BasicLayerUp(
                    config=cfg,
                    base_pix=self.data_spec.base_pix,
                    dim=concat_out,
                    input_resolution=num_patches // (4**down_idx),
                    depth=cfg.depths[down_idx],
                    num_heads=cfg.num_heads[down_idx],
                    drop_path=self.dpr[
                        sum(cfg.depths[:down_idx]) : sum(cfg.depths[: down_idx + 1])
                    ],
                    upsample=down_idx > 0,
                    seq=self.seq,
                    name=f"layer_up{inx}",
                )(x, deterministic)

        x = LayerNorm(dtype=dt, name="norm_up")(x)
        if not tail:
            return x
        x = FinalPatchExpand_X4(patch_size=cfg.patch_size, dim=cfg.embed_dim, dtype=dt, name="up")(x)
        x = dense(self.data_spec.f_out, use_bias=False, dtype=dt, name="output")(x)
        return x


class SwinHPTransformerSys(nn.Module):
    """HEAL-SWIN-UNet (reference SwinHPTransformerSys, swin_hp_transformer.py:821-955).

    __call__(x: (B, npix, f_in)) -> (B, npix, f_out) logits/regression values in float32.
    """

    config: SwinHPTransformerConfig
    data_spec: DataSpec

    @nn.compact
    def __call__(self, x, deterministic: bool = True, tail: bool = True, seq=None):
        """``seq``: optional ``(axis_name, n_shards)`` sequence-parallel spec — x is
        then this shard's (B, npix/n_shards, f_in) token slice and the call must run
        inside ``jax.shard_map`` with that mesh axis in scope (parallel/sequence.py);
        the output is the matching (B, npix/n_shards, f_out) slice."""
        cfg = self.config
        spec = self.data_spec
        num_layers = len(cfg.depths)
        num_features = int(cfg.embed_dim * 2 ** (num_layers - 1))
        num_patches = spec.dim_in // cfg.patch_size
        dt = cfg.compute_dtype
        if seq is not None and seq[1] <= 1:
            seq = None
        if seq is not None:
            assert x.shape[1] * seq[1] == spec.dim_in, (
                f"seq-parallel input must be the local token slice: got {x.shape[1]} "
                f"pixels x {seq[1]} shards != dim_in {spec.dim_in}"
            )

        x = x.astype(dt)
        x = PatchEmbed(
            patch_size=cfg.patch_size,
            embed_dim=cfg.embed_dim,
            use_norm=cfg.patch_embed_norm_layer is not None,
            dtype=dt,
            name="patch_embed",
        )(x)

        if cfg.dev_mode:  # trace-time shape prints (reference swin_transformer.py:1064)
            print(f"forward_features after patch_embed: {x.shape}")
        if cfg.ape:
            ape = self.param(
                "absolute_pos_embed", trunc_normal_init, (1, num_patches, cfg.embed_dim),
                jnp.float32,
            )
            if seq is not None:
                from heal_swin_tpu.parallel.sequence import seq_local_slice

                ape = seq_local_slice(ape, seq[0], seq[1], axis=1)
            x = x + ape.astype(dt)
        x = nn.Dropout(cfg.drop_rate)(x, deterministic=deterministic)

        dpr = list(np.linspace(0, cfg.drop_path_rate, sum(cfg.depths)))

        x_downsample = []
        for i_layer in range(num_layers):
            x_downsample.append(x)
            x = BasicLayer(
                config=cfg,
                base_pix=spec.base_pix,
                dim=int(cfg.embed_dim * 2**i_layer),
                input_resolution=num_patches // (4**i_layer),
                depth=cfg.depths[i_layer],
                num_heads=cfg.num_heads[i_layer],
                drop_path=dpr[sum(cfg.depths[:i_layer]) : sum(cfg.depths[: i_layer + 1])],
                downsample=i_layer < num_layers - 1,
                seq=seq,
                name=f"layer{i_layer}",
            )(x, deterministic)
            if cfg.dev_mode:
                print(f"forward_features after layer {i_layer}: {x.shape}")

        x = LayerNorm(dtype=dt, name="norm")(x)
        if cfg.dev_mode:
            print(f"forward_features after norm: {x.shape}")
        x = UnetDecoder(config=cfg, data_spec=spec, dpr=dpr, seq=seq, name="decoder")(
            x, x_downsample, deterministic, tail
        )
        if not tail:
            return x  # (B, N, C) tokens after norm_up, compute dtype
        return x.astype(jnp.float32)
