"""Shared Flax building blocks for the SWIN family models.

TPU-first design notes (vs. the torch reference):
- Inputs are channels-last; attention operates on (B, nW, ws, C) keeping batch a pure
  leading dim so pjit batch sharding never crosses a window reshape.
- Attention masks are derived in-graph from (nW, ws) integer group ids (compare +
  select fuses into the logits add); the (nW, ws, ws) bias is never stored in HBM.
- Softmax always runs in float32 regardless of compute dtype.
- GELU is exact (erf), matching torch.nn.GELU.
- LayerNorm uses eps 1e-5 (torch default) and computes in float32.

Reference behavior: ``heal_swin/models_torch/swin_hp_transformer.py:21-191`` and
``heal_swin/models_torch/swin_transformer.py:18-204``.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

MASK_VALUE = -100.0

trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


def dense(features: int, use_bias: bool = True, dtype: Optional[Dtype] = None, name=None):
    """nn.Dense with the reference init: trunc_normal(0.02) kernel, zero bias.

    NOTE: do not flatten >2-D inputs to (M, C) before nn.Dense — measured 13% SLOWER
    end-to-end at paper scale.  XLA's conv-style lowering of the 4-D form (with its
    layout copies) beats the plain 2-D matmul here; the flat form is only used where
    an operand must feed the Pallas attention call copy-free (see WindowAttention)."""
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=trunc_normal_init,
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        name=name,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ln_fn(x, scale, bias, eps):
    y, _ = _ln_fwd(x, scale, bias, eps)
    return y


def _ln_fwd(x, scale, bias, eps):
    """f32 statistics; saves only the (low-precision) input plus per-row mean/rstd.

    Plain autodiff of the f32 upcast saved the full activation in f32 (a 4x blowup
    for bf16 plus a layout copy at paper scale); here the backward recomputes
    x_hat from x."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = xc * rstd * scale + bias
    return y, (x, mean, rstd, scale)


def _ln_bwd(eps, res, dy):
    x, mean, rstd, scale = res
    xf = x.astype(jnp.float32)
    xhat = (xf - mean) * rstd
    dyf = dy.astype(jnp.float32)
    red_axes = tuple(range(dy.ndim - 1))
    # param cotangents reduce over tokens; under shard_map (sequence/data sharding)
    # that reduction must also cross devices — see parallel/sequence.py match_vma
    from heal_swin_tpu.parallel.sequence import match_vma

    dscale = match_vma(jnp.sum(dyf * xhat, axis=red_axes), scale)
    dbias = match_vma(jnp.sum(dyf, axis=red_axes), scale)
    dg = dyf * scale
    dx = rstd * (
        dg
        - jnp.mean(dg, axis=-1, keepdims=True)
        - xhat * jnp.mean(dg * xhat, axis=-1, keepdims=True)
    )
    return dx.astype(x.dtype), dscale, dbias


_ln_fn.defvjp(_ln_fwd, _ln_bwd)


class _FusedLN(nn.Module):
    """Inner LN (param paths match the previous flax LayerNorm submodule 'ln')."""

    epsilon: float
    out_dtype: Optional[Dtype]

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        y = _ln_fn(x, scale, bias, self.epsilon)
        return y.astype(self.out_dtype or x.dtype)


class LayerNorm(nn.Module):
    """LayerNorm with torch defaults (eps=1e-5); statistics in float32.

    Written so XLA fuses the f32 upcast into the reductions and the normalize into the
    surrounding elementwise chain — wrapping flax LayerNorm with dtype=float32
    materialized an f32 copy of the full activation (805 MB at paper scale) plus a
    layout copy per call."""

    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return _FusedLN(epsilon=self.epsilon, out_dtype=self.dtype, name="ln")(x)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath semantics: scale by 1/keep)."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if self.rate == 0.0 or deterministic:
            return x
        # float(): stage rates arrive as np.float64 from np.linspace, and numpy
        # scalars are NOT weak-typed — `x / np.float64` silently promoted the whole
        # training-time residual stream to f32 (2x HBM on every downstream op)
        keep = float(1.0 - self.rate)
        # sequence-parallel runs pass a separate 'drop_path' stream: the per-SAMPLE
        # mask must agree across the token shards of one sample, while element
        # dropout must NOT (parallel/sequence.py; tasks.loss_fn derives the keys)
        stream = "drop_path" if self.has_rng("drop_path") else "dropout"
        rng = self.make_rng(stream)
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class _DenseParams(nn.Module):
    """Bare dense-layer parameters at nn.Dense's tree paths (kernel/bias) — for
    projections that run inside a fused Pallas kernel (attention qkv, MLP fc1/fc2)
    while staying checkpoint-compatible with the nn.Dense variant."""

    features: int
    use_bias: bool

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", trunc_normal_init, (in_features, self.features),
                            jnp.float32)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        return kernel, bias


class _LNParamsInner(nn.Module):
    @nn.compact
    def __call__(self, d: int):
        scale = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        return scale, bias


class _LNParams(nn.Module):
    """Bare LayerNorm parameters at the LayerNorm module's tree paths (ln/scale,
    ln/bias) — for norms that may run inside a fused Pallas kernel while staying
    checkpoint-compatible with the LayerNorm variant."""

    @nn.compact
    def __call__(self, d: int):
        return _LNParamsInner(name="ln")(d)


class Mlp(nn.Module):
    """Two-layer MLP with GELU (reference Mlp, swin_hp_transformer.py:21-44).

    ``gelu_approx=False`` (default) is the reference's exact-erf GELU (torch default).
    The tanh approximation (max |error| ~3e-4, far below bf16 resolution) avoids the
    erf polynomial that profiles at 13 ms/step at paper scale — enable via the model
    configs' ``gelu_approx`` TPU extension for production bf16 training."""

    hidden_features: int
    out_features: int
    drop: float = 0.0
    dtype: Optional[Dtype] = None
    gelu_approx: bool = False
    mlp_impl: str = "xla"  # "xla" | "fused"

    @nn.compact
    def __call__(self, x, deterministic: bool):
        from heal_swin_tpu.ops import mlp as mlp_ops

        C = x.shape[-1]
        T = int(np.prod(x.shape[:-1]))
        dropout_active = self.drop > 0.0 and not deterministic
        # Opt-in hybrid path: XLA-fused forward + Pallas flash-style backward.  The
        # kernel backward beats XLA's 2x in isolation at C=96, but at paper scale the
        # custom-VJP boundary costs one conv-layout->row-major copy each for x, dout
        # and dx, which eats the win exactly (measured 151.0 vs 151.2 ms/step) — so
        # the default stays on plain XLA.  Dropout sits between the fused ops, so any
        # active dropout falls back to the plain path.
        use_fused = (
            self.mlp_impl == "fused"
            and not dropout_active
            and self.out_features == C
            and mlp_ops.supported(
                jax.default_backend(), T, C, self.hidden_features, self.gelu_approx
            )
        )
        if use_fused:
            w1, b1 = _DenseParams(self.hidden_features, True, name="fc1")(C)
            w2, b2 = _DenseParams(self.out_features, True, name="fc2")(
                self.hidden_features
            )
            dt = self.dtype or x.dtype
            return mlp_ops.fused_mlp_nd(
                x.astype(dt), w1, b1, w2, b2, approximate=self.gelu_approx
            )
        x = dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=self.gelu_approx)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = dense(self.out_features, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class WindowAttention(nn.Module):
    """Multi-head self attention within windows.

    Input x: (B, nW, ws, C).  ``win_groups``: optional (nW, ws) int array of mask group
    ids — attention between tokens of different groups gets a -100 additive logit, the
    reference's soft masking (hp_shifting.py:10-28).  ``rel_pos_index``: optional
    (ws, ws) table index for a learned relative position bias; ``rel_pos_table_size``
    its table length; ``rel_pos_init_zero`` keeps the table at zeros init (a reference
    quirk of the HP model, swin_hp_transformer.py:121) while the flat model uses
    trunc_normal (swin_transformer.py:143).

    Supports scaled-dot attention and SWIN-v2 cosine attention with learnable clamped
    logit scale (swin_hp_transformer.py:84-87,142-147).
    """

    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_cos_attn: bool = False
    rel_pos_index: Optional[np.ndarray] = None
    rel_pos_table_size: int = 0
    rel_pos_init_zero: bool = True
    attention_impl: str = "auto"  # "auto" | "xla" | "pallas"
    dtype: Optional[Dtype] = None

    def _pallas_wblk(self, n_windows: int, ws: int, C: int) -> Optional[int]:
        """Largest window-batch size that divides the window count and fits the ~16 MB
        scoped VMEM.  Score temps are per-window (wblk*ws*ws f32, several live), so the
        footprint is dominated by the double-buffered qkv/out/dqkv blocks."""
        # Empirical caps measured against the 16 MB scoped VMEM on chip (ws=64,
        # bf16, full-model compile context): with the qkv projection fused into the
        # kernel, C<=192 fits wblk=16 (and 16 beats 8/32); C=384 OOMs at 16 (20.3 MB)
        # but fits 8; at C>=768 the f32 dW accumulator + weight const blocks get
        # double-buffered by the allocator and OOM at any wblk, so those stages use
        # the separate-qkv kernel (wblk=8, measured best).  Analytic estimates
        # disagree with the Mosaic allocator in both directions; measured caps it is.
        token_bytes = ws * C * 2
        if token_bytes <= 192 * 64 * 2:
            cap, fuse = 16, True
        elif token_bytes <= 384 * 64 * 2:
            cap, fuse = 8, True
        else:
            cap, fuse = 8, False
        # The WIDE cosine backward adds two (bwd_wblk, ws, C) f32 tangent scratches,
        # so its VMEM-fitting block is smaller at wide C (measured caps,
        # benchmarks/attn_bwd_parts.py: C=96 -> 16, C=192 -> 8, C>=384 -> 4).
        if self.use_cos_attn:
            if token_bytes <= 96 * 64 * 2:
                cos_bwd_cap = 16
            elif token_bytes <= 192 * 64 * 2:
                cos_bwd_cap = 8
            else:
                cos_bwd_cap = 4
        for w in (16, 8, 4, 2, 1):
            if w > cap or n_windows % w != 0:
                continue
            # the FORWARD fits (and wins with) 2x the backward's block at C=384 —
            # it has no dqkv scratch / dW accumulators (measured: 0.375 -> 0.338 ms)
            fwd_w = 2 * w if (fuse and cap == 8 and n_windows % (2 * w) == 0) else w
            bwd_w = min(w, cos_bwd_cap) if self.use_cos_attn else w
            return w, fuse, fwd_w, bwd_w
        return None

    def _resolve_impl(self, B, nW, ws, C, deterministic) -> str:
        if self.attention_impl == "xla":
            return "xla"
        dropout_active = self.attn_drop > 0.0 and not deterministic
        plan = self._pallas_wblk(B * nW, ws, C)
        wblk = plan[0] if plan else None
        ok = (
            jax.default_backend() == "tpu"
            and wblk is not None
            and C % self.num_heads == 0
            and not dropout_active
        )
        if self.attention_impl == "pallas" and not ok:
            raise ValueError(
                "attention_impl='pallas' unsupported here: requires TPU backend, "
                f"a VMEM-fitting window block for (B*nW={B * nW}, ws={ws}), and "
                "inactive attention dropout"
            )
        return "pallas" if ok else "xla"

    def _epi_wblks(self, n_windows: int, ws: int, C: int):
        """(fwd_wblk, bwd_wblk) for the epilogue-fused kernels, or None if the
        backward's extra scratches (cached softmax (h*bwd_wblk, ws, ws) f32 + o +
        proj dW) don't leave a fitting block.  Measured caps
        (benchmarks/attn_epi_probe.py)."""
        token_bytes = ws * C * 2
        if token_bytes <= 96 * 64 * 2:
            fw, bw = 16, 16
        elif token_bytes <= 192 * 64 * 2:
            fw, bw = 16, 8
        else:
            fw, bw = 16, 4
        while fw > 1 and n_windows % fw != 0:
            fw //= 2
        while bw > 1 and n_windows % bw != 0:
            bw //= 2
        if n_windows % fw != 0 or n_windows % bw != 0:
            return None
        return fw, bw

    @nn.compact
    def __call__(self, x, win_groups=None, deterministic: bool = True,
                 ln_params=None):
        """``ln_params``: optional (scale, bias) of a LayerNorm applied to the
        attention output (after the output projection) — the SWIN-v2 res-post-norm,
        hoisted into this module so it can fuse into the Pallas kernel (LN is
        per-token, so it commutes with the block's inverse shift)."""
        B, nW, ws, C = x.shape
        h = self.num_heads
        hd = C // h
        assert h * hd == C, f"dim {C} not divisible by num_heads {h}"

        impl = self._resolve_impl(B, nW, ws, C, deterministic)
        if impl == "pallas":
            # the qkv projection is fused INTO the attention kernel where VMEM allows
            # (3x less kernel HBM traffic, no separate dense/layout copy); only its
            # parameters are declared here, at nn.Dense's tree paths (qkv/kernel,bias)
            qkv_kernel = _DenseParams(3 * C, self.qkv_bias, name="qkv")(C)
            wblk, fuse_qkv, fwd_wblk, bwd_wblk = self._pallas_wblk(B * nW, ws, C)
        else:
            qkv = dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)

        # shared parameters (identical tree in both implementations)
        logit_scale = None
        if self.use_cos_attn:
            logit_scale = self.param(
                "logit_scale", lambda rng: jnp.log(10.0 * jnp.ones((h, 1, 1), jnp.float32))
            )
        rel_bias = None  # (h, ws, ws) f32
        if self.rel_pos_index is not None:
            init = nn.initializers.zeros if self.rel_pos_init_zero else trunc_normal_init
            table = self.param(
                "relative_position_bias_table", init, (self.rel_pos_table_size, h),
                jnp.float32,
            )
            idx = jnp.asarray(self.rel_pos_index)  # (ws, ws)
            rel_bias = jnp.transpose(table[idx], (2, 0, 1))

        if impl == "pallas":
            from heal_swin_tpu.ops.window_attention import (
                fused_window_attention,
                fused_window_attention_qkv,
                fused_window_attention_qkv_epi,
            )

            ls = (
                jnp.exp(jnp.minimum(logit_scale, jnp.log(1.0 / 0.01))).reshape(h)
                if logit_scale is not None
                else None
            )
            if win_groups is not None:
                groups = jnp.tile(jnp.asarray(win_groups, dtype=jnp.int32), (B, 1))
                has_mask = True
            else:
                groups = jnp.zeros((B * nW, ws), jnp.int32)
                has_mask = False
            scale = self.qk_scale if self.qk_scale is not None else hd**-0.5
            dt = self.dtype or x.dtype
            wq, bq = qkv_kernel
            wq = wq.astype(dt)
            bq = bq.astype(dt) if bq is not None else None
            x_flat = x.reshape(B * nW * ws, C).astype(dt)
            epi_wblks = self._epi_wblks(B * nW, ws, C)
            if (
                fuse_qkv
                and self.use_cos_attn
                and (self.proj_drop == 0.0 or deterministic)
                and epi_wblks is not None
            ):
                # fold the output projection (+ the caller's res-post-norm LN, if
                # given) into the kernel — see ops/window_attention.py epilogue
                wp_k, bp_k = _DenseParams(C, True, name="proj")(C)
                ln_s, ln_b = ln_params if ln_params is not None else (None, None)
                out = fused_window_attention_qkv_epi(
                    x_flat, wq, bq, wp_k.astype(dt), bp_k.astype(dt), ln_s, ln_b,
                    groups, rel_bias, ls, ws=ws, num_heads=h, sm_scale=float(scale),
                    has_mask=has_mask, wblk=wblk, fwd_wblk=epi_wblks[0],
                    bwd_wblk=epi_wblks[1],
                )
                out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
                return out.reshape(B, nW, ws, C)
            if fuse_qkv:
                out = fused_window_attention_qkv(
                    x_flat, wq, bq, groups, rel_bias, ls,
                    ws=ws, num_heads=h, use_cos=self.use_cos_attn,
                    sm_scale=float(scale), has_mask=has_mask, wblk=wblk,
                    fwd_wblk=fwd_wblk, bwd_wblk=bwd_wblk,
                )
            else:
                qkv_flat = x_flat @ wq
                if bq is not None:
                    qkv_flat = qkv_flat + bq
                out = fused_window_attention(
                    qkv_flat, groups, rel_bias, ls,
                    ws=ws, num_heads=h, use_cos=self.use_cos_attn,
                    sm_scale=float(scale), has_mask=has_mask, wblk=wblk,
                    bwd_wblk=bwd_wblk,
                )
            # proj on the flat (T, C) kernel output for the same layout reason
            out = dense(C, dtype=self.dtype, name="proj")(out)
            out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
            if ln_params is not None:
                out = _ln_fn(out, ln_params[0], ln_params[1], 1e-5).astype(
                    self.dtype or x.dtype)
            return out.reshape(B, nW, ws, C)
        else:
            qkv = qkv.reshape(B, nW, ws, 3, h, hd)
            q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]

            if self.use_cos_attn:
                # rsqrt(max(sum_sq, eps)) — NOT `x / max(norm(x), eps)`: norm()'s VJP
                # divides by the norm itself, so an exactly-zero row (outside-FOV
                # tokens are a zero fixed point of the encoder at init) turns the
                # masked-out branch into 0 * (0/0) = NaN in the backward.  With the
                # clamp inside the sum-of-squares the VJP is finite everywhere
                # (same guard as the Pallas kernels, ops/window_attention.py:99).
                qf = q.astype(jnp.float32)
                kf = k.astype(jnp.float32)
                q = (qf * jax.lax.rsqrt(
                    jnp.maximum(jnp.sum(qf * qf, -1, keepdims=True), 1e-24)
                )).astype(q.dtype)
                k = (kf * jax.lax.rsqrt(
                    jnp.maximum(jnp.sum(kf * kf, -1, keepdims=True), 1e-24)
                )).astype(k.dtype)
                attn = jnp.einsum(
                    "bwihd,bwjhd->bwhij", q, k, preferred_element_type=jnp.float32
                )
                ls = jnp.exp(jnp.minimum(logit_scale, jnp.log(1.0 / 0.01)))
                attn = attn * ls[None, None]
            else:
                scale = self.qk_scale if self.qk_scale is not None else hd**-0.5
                attn = jnp.einsum(
                    "bwihd,bwjhd->bwhij", q * scale, k, preferred_element_type=jnp.float32
                )

            if rel_bias is not None:
                attn = attn + rel_bias[None, None]

            if win_groups is not None:
                g = jnp.asarray(win_groups)  # (nW, ws)
                mask = jnp.where(g[:, :, None] != g[:, None, :], MASK_VALUE, 0.0)
                attn = attn + mask[None, :, None, :, :].astype(attn.dtype)

            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
            attn = attn.astype(self.dtype or x.dtype)
            attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)

            out = jnp.einsum("bwhij,bwjhd->bwihd", attn, v)
            out = out.reshape(B, nW, ws, C)

        out = dense(C, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        if ln_params is not None:
            out = _ln_fn(out, ln_params[0], ln_params[1], 1e-5).astype(
                self.dtype or x.dtype)
        return out
