"""Fused window multi-head self-attention (Pallas TPU kernel).

The XLA path materializes the (B, nW, h, ws, ws) attention scores in f32 in HBM
(plus layout copies around the qkv reshape) — ~1/3 of the train step at paper scale.
This kernel keeps the whole window attention VMEM-resident: per grid step it loads a
block of wblk windows' fused qkv rows ((wblk, ws, 3C), exactly the dense layer's output
layout — no transpose), computes per-head QK^T as a window-batched MXU dot
((wblk, ws, hd) x (wblk, ws, hd) -> (wblk, ws, ws)), adds the shift mask (derived
in-kernel from integer group ids) and the relative-position bias, softmaxes in f32,
applies AV and writes (wblk, ws, C).  Window-batched dots do exactly the required
FLOPs — no block-diagonal padding waste.  Supports both attention flavors of the
reference: scaled dot product and SWIN-v2 cosine attention with clamped logit scale
(reference swin_hp_transformer.py:124-174).

Backward: a second Pallas kernel (flash style) that saves only qkv/groups/bias from
the forward, recomputes the softmax in VMEM and emits dqkv plus grid-accumulated
dbias / dlogit_scale.  `reference_window_attention` is the identical jnp math, used as
the numerical oracle in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -100.0

_BATCH_QK = (((2,), (2,)), ((0,), (0,)))  # (w,i,d)x(w,j,d) -> (w,i,j)
_BATCH_AV = (((2,), (1,)), ((0,), (0,)))  # (w,i,j)x(w,j,d) -> (w,i,d)
_BATCH_TN = (((1,), (1,)), ((0,), (0,)))  # (w,i,j)x(w,i,d) -> (w,j,d)  (transpose-first)


def reference_window_attention(qkv, groups, bias, logit_scale, *, ws, num_heads,
                               use_cos, sm_scale, has_mask=True):
    """Pure-jnp window attention on the kernel's operand layout.

    qkv: (T, 3C) rows of fused q|k|v for T = B*nW*ws tokens (windows contiguous);
    groups: (T//ws, ws) int32 mask group ids; bias: (h, ws, ws) f32 (ignored if all
    zeros is desired — pass zeros); logit_scale: (h,) f32 (already exp(clamp(.))).
    Returns (T, C)."""
    T, C3 = qkv.shape
    C = C3 // 3
    h = num_heads
    hd = C // h
    nw = T // ws
    x = qkv.reshape(nw, ws, 3, h, hd)
    q, k, v = x[:, :, 0], x[:, :, 1], x[:, :, 2]  # (nw, ws, h, hd)
    if use_cos:
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        q = qf * jax.lax.rsqrt(jnp.maximum(jnp.sum(qf * qf, -1, keepdims=True), 1e-24))
        k = kf * jax.lax.rsqrt(jnp.maximum(jnp.sum(kf * kf, -1, keepdims=True), 1e-24))
        s = jnp.einsum("wihd,wjhd->whij", q, k, preferred_element_type=jnp.float32)
        s = s * logit_scale[None, :, None, None]
    else:
        s = jnp.einsum("wihd,wjhd->whij", q, k, preferred_element_type=jnp.float32)
        s = s * sm_scale
    s = s + bias[None]
    if has_mask:
        g = groups.astype(jnp.int32)
        mask = jnp.where(g[:, :, None] != g[:, None, :], MASK_VALUE, 0.0)
        s = s + mask[:, None]
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(qkv.dtype)
    o = jnp.einsum("whij,wjhd->wihd", p, v)
    return o.reshape(T, C).astype(qkv.dtype)


def _fwd_kernel(gcol_ref, grow_ref, qkv_ref, bias_ref, scale_ref, out_ref, *, ws, C,
                h, wblk, use_cos, has_bias, has_mask, sm_scale):
    """Window-batched attention: qkv block (wblk, ws, 3C); each head's QK^T / AV is
    one batched MXU dot over the wblk windows — exact per-window math, zero padding
    FLOPs."""
    hd = C // h

    mask = None
    if has_mask:
        gc = gcol_ref[...]  # (wblk, ws, 1)
        gr = grow_ref[...]  # (wblk, 1, ws)
        mask = jnp.where(gc != gr, MASK_VALUE, 0.0).astype(jnp.float32)  # (wblk, ws, ws)

    for head in range(h):
        q = qkv_ref[:, :, head * hd:(head + 1) * hd]
        k = qkv_ref[:, :, C + head * hd:C + (head + 1) * hd]
        v = qkv_ref[:, :, 2 * C + head * hd:2 * C + (head + 1) * hd]
        if use_cos:
            qf = q.astype(jnp.float32)
            kf = k.astype(jnp.float32)
            qf = qf * jax.lax.rsqrt(
                jnp.maximum(jnp.sum(qf * qf, -1, keepdims=True), 1e-24)
            )
            kf = kf * jax.lax.rsqrt(
                jnp.maximum(jnp.sum(kf * kf, -1, keepdims=True), 1e-24)
            )
            # bf16 operands keep the MXU at full rate; accumulation stays f32
            s = jax.lax.dot_general(
                qf.astype(q.dtype), kf.astype(k.dtype), _BATCH_QK,
                preferred_element_type=jnp.float32,
            )
            s = s * scale_ref[head, 0]
        else:
            s = jax.lax.dot_general(q, k, _BATCH_QK, preferred_element_type=jnp.float32)
            s = s * sm_scale
        if has_bias:
            s = s + bias_ref[head][None]
        if mask is not None:
            s = s + mask
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # (wblk, ws, ws) f32
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, _BATCH_AV, preferred_element_type=jnp.float32
        )
        out_ref[:, :, head * hd:(head + 1) * hd] = o.astype(out_ref.dtype)


def _float0_like(x):
    return jax.tree.map(lambda v: jnp.zeros(v.shape, dtype=jax.dtypes.float0), x)


def _bwd_kernel(gcol_ref, grow_ref, qkv_ref, bias_ref, scale_ref, dout_ref,
                dqkv_ref, dbias_ref, dls_ref, *, ws, C, h, wblk, use_cos, has_bias,
                has_mask, sm_scale):
    """Flash-style backward: recomputes the softmax from qkv in VMEM and produces
    dqkv; dbias (h, ws, ws) and dlogit_scale (h, 1) accumulate across the sequential
    grid into constant-index output blocks.  All dots window-batched."""
    hd = C // h

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)
        for _hh in range(h):
            dls_ref[_hh, 0] = 0.0

    mask = None
    if has_mask:
        gc = gcol_ref[...]
        gr = grow_ref[...]
        mask = jnp.where(gc != gr, MASK_VALUE, 0.0).astype(jnp.float32)

    for head in range(h):
        q = qkv_ref[:, :, head * hd:(head + 1) * hd]
        k = qkv_ref[:, :, C + head * hd:C + (head + 1) * hd]
        v = qkv_ref[:, :, 2 * C + head * hd:2 * C + (head + 1) * hd]
        do = dout_ref[:, :, head * hd:(head + 1) * hd]

        if use_cos:
            qf = q.astype(jnp.float32)
            kf = k.astype(jnp.float32)
            inv_nq = jax.lax.rsqrt(jnp.maximum(jnp.sum(qf * qf, -1, keepdims=True), 1e-24))
            inv_nk = jax.lax.rsqrt(jnp.maximum(jnp.sum(kf * kf, -1, keepdims=True), 1e-24))
            qh = (qf * inv_nq).astype(q.dtype)
            kh = (kf * inv_nk).astype(k.dtype)
            s_hat = jax.lax.dot_general(
                qh, kh, _BATCH_QK, preferred_element_type=jnp.float32
            )
            s = s_hat * scale_ref[head, 0]
        else:
            s = jax.lax.dot_general(q, k, _BATCH_QK, preferred_element_type=jnp.float32)
            s = s * sm_scale
        if has_bias:
            s = s + bias_ref[head][None]
        if mask is not None:
            s = s + mask
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # (wblk, ws, ws) f32

        p_lo = p.astype(v.dtype)
        # dV[w] = P[w]^T dO[w]
        dv = jax.lax.dot_general(p_lo, do, _BATCH_TN, preferred_element_type=jnp.float32)
        dqkv_ref[:, :, 2 * C + head * hd:2 * C + (head + 1) * hd] = dv.astype(dqkv_ref.dtype)
        # dP[w] = dO[w] V[w]^T
        dp = jax.lax.dot_general(do, v, _BATCH_QK, preferred_element_type=jnp.float32)
        t = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - t)  # (wblk, ws, ws) f32

        if has_bias:
            dbias_ref[head] += jnp.sum(ds, axis=0)

        ds_lo = ds.astype(q.dtype)
        if use_cos:
            dls_ref[head, 0] += jnp.sum(ds * s_hat)
            dsh_lo = (ds * scale_ref[head, 0]).astype(q.dtype)
            dqh = jax.lax.dot_general(
                dsh_lo, kh, _BATCH_AV, preferred_element_type=jnp.float32
            )
            dkh = jax.lax.dot_general(
                dsh_lo, qh, _BATCH_TN, preferred_element_type=jnp.float32
            )
            qhf = qf * inv_nq
            khf = kf * inv_nk
            dq = (dqh - qhf * jnp.sum(dqh * qhf, -1, keepdims=True)) * inv_nq
            dk = (dkh - khf * jnp.sum(dkh * khf, -1, keepdims=True)) * inv_nk
        else:
            dq = jax.lax.dot_general(
                ds_lo, k, _BATCH_AV, preferred_element_type=jnp.float32
            ) * sm_scale
            dk = jax.lax.dot_general(
                ds_lo, q, _BATCH_TN, preferred_element_type=jnp.float32
            ) * sm_scale
        dqkv_ref[:, :, head * hd:(head + 1) * hd] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, C + head * hd:C + (head + 1) * hd] = dk.astype(dqkv_ref.dtype)


def _fwd_kernel_xw(gcol_ref, grow_ref, x_ref, w_ref, b_ref, bias_ref, scale_ref,
                   out_ref, *, ws, C, h, wblk, use_cos, has_bias, has_mask, sm_scale,
                   has_qkv_bias):
    """Fused-qkv forward: the qkv projection runs IN the kernel (x block (wblk, ws, C)
    x (C, 3C) weight), cutting the kernel's HBM stream 3x and eliminating the separate
    XLA qkv dense + its layout copy.  The attention math is _fwd_kernel's."""
    qkv = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if has_qkv_bias:
        qkv = qkv + b_ref[...][None]
    qkv = qkv.astype(x_ref.dtype)

    hd = C // h
    mask = None
    if has_mask:
        gc = gcol_ref[...]
        gr = grow_ref[...]
        mask = jnp.where(gc != gr, MASK_VALUE, 0.0).astype(jnp.float32)

    for head in range(h):
        q = qkv[:, :, head * hd:(head + 1) * hd]
        k = qkv[:, :, C + head * hd:C + (head + 1) * hd]
        v = qkv[:, :, 2 * C + head * hd:2 * C + (head + 1) * hd]
        if use_cos:
            qf = q.astype(jnp.float32)
            kf = k.astype(jnp.float32)
            qf = qf * jax.lax.rsqrt(
                jnp.maximum(jnp.sum(qf * qf, -1, keepdims=True), 1e-24)
            )
            kf = kf * jax.lax.rsqrt(
                jnp.maximum(jnp.sum(kf * kf, -1, keepdims=True), 1e-24)
            )
            s = jax.lax.dot_general(
                qf.astype(q.dtype), kf.astype(k.dtype), _BATCH_QK,
                preferred_element_type=jnp.float32,
            )
            s = s * scale_ref[head, 0]
        else:
            s = jax.lax.dot_general(q, k, _BATCH_QK, preferred_element_type=jnp.float32)
            s = s * sm_scale
        if has_bias:
            s = s + bias_ref[head][None]
        if mask is not None:
            s = s + mask
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, _BATCH_AV, preferred_element_type=jnp.float32
        )
        out_ref[:, :, head * hd:(head + 1) * hd] = o.astype(out_ref.dtype)


def _bwd_kernel_xw(gcol_ref, grow_ref, x_ref, w_ref, b_ref, bias_ref, scale_ref,
                   dout_ref, dx_ref, dw_ref, db_ref, dbias_ref, dls_ref, dqkv_ref, *,
                   ws, C, h, wblk, use_cos, has_bias, has_mask, sm_scale,
                   has_qkv_bias):
    """Fused-qkv backward: recomputes qkv from x in VMEM, runs _bwd_kernel's math into
    a VMEM scratch dqkv, then dx = dqkv W^T and grid-accumulated dW = x^T dqkv /
    db = sum(dqkv)."""
    hd = C // h

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)
        for _hh in range(h):
            dls_ref[_hh, 0] = 0.0

    x = x_ref[...]
    w = w_ref[...]
    qkv = jax.lax.dot_general(
        x, w, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    if has_qkv_bias:
        qkv = qkv + b_ref[...][None]
    qkv = qkv.astype(x.dtype)

    mask = None
    if has_mask:
        gc = gcol_ref[...]
        gr = grow_ref[...]
        mask = jnp.where(gc != gr, MASK_VALUE, 0.0).astype(jnp.float32)

    for head in range(h):
        q = qkv[:, :, head * hd:(head + 1) * hd]
        k = qkv[:, :, C + head * hd:C + (head + 1) * hd]
        v = qkv[:, :, 2 * C + head * hd:2 * C + (head + 1) * hd]
        do = dout_ref[:, :, head * hd:(head + 1) * hd]

        if use_cos:
            qf = q.astype(jnp.float32)
            kf = k.astype(jnp.float32)
            inv_nq = jax.lax.rsqrt(jnp.maximum(jnp.sum(qf * qf, -1, keepdims=True), 1e-24))
            inv_nk = jax.lax.rsqrt(jnp.maximum(jnp.sum(kf * kf, -1, keepdims=True), 1e-24))
            qh = (qf * inv_nq).astype(q.dtype)
            kh = (kf * inv_nk).astype(k.dtype)
            s_hat = jax.lax.dot_general(
                qh, kh, _BATCH_QK, preferred_element_type=jnp.float32
            )
            s = s_hat * scale_ref[head, 0]
        else:
            s = jax.lax.dot_general(q, k, _BATCH_QK, preferred_element_type=jnp.float32)
            s = s * sm_scale
        if has_bias:
            s = s + bias_ref[head][None]
        if mask is not None:
            s = s + mask
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)

        p_lo = p.astype(v.dtype)
        dv = jax.lax.dot_general(p_lo, do, _BATCH_TN, preferred_element_type=jnp.float32)
        dqkv_ref[:, :, 2 * C + head * hd:2 * C + (head + 1) * hd] = dv.astype(dqkv_ref.dtype)
        dp = jax.lax.dot_general(do, v, _BATCH_QK, preferred_element_type=jnp.float32)
        t = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - t)

        if has_bias:
            dbias_ref[head] += jnp.sum(ds, axis=0)

        ds_lo = ds.astype(q.dtype)
        if use_cos:
            dls_ref[head, 0] += jnp.sum(ds * s_hat)
            dsh_lo = (ds * scale_ref[head, 0]).astype(q.dtype)
            dqh = jax.lax.dot_general(
                dsh_lo, kh, _BATCH_AV, preferred_element_type=jnp.float32
            )
            dkh = jax.lax.dot_general(
                dsh_lo, qh, _BATCH_TN, preferred_element_type=jnp.float32
            )
            qhf = qf * inv_nq
            khf = kf * inv_nk
            dq = (dqh - qhf * jnp.sum(dqh * qhf, -1, keepdims=True)) * inv_nq
            dk = (dkh - khf * jnp.sum(dkh * khf, -1, keepdims=True)) * inv_nk
        else:
            dq = jax.lax.dot_general(
                ds_lo, k, _BATCH_AV, preferred_element_type=jnp.float32
            ) * sm_scale
            dk = jax.lax.dot_general(
                ds_lo, q, _BATCH_TN, preferred_element_type=jnp.float32
            ) * sm_scale
        dqkv_ref[:, :, head * hd:(head + 1) * hd] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, C + head * hd:C + (head + 1) * hd] = dk.astype(dqkv_ref.dtype)

    dqkv = dqkv_ref[...]
    dx = jax.lax.dot_general(
        dqkv, w, (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dx_ref[...] = dx.astype(dx_ref.dtype)
    dw_acc = jnp.zeros((C, 3 * C), jnp.float32)
    for wi in range(wblk):
        dw_acc = dw_acc + jax.lax.dot_general(
            x[wi], dqkv[wi], (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    dw_ref[...] += dw_acc
    if has_qkv_bias:
        db_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=(0, 1)).reshape(1, 3 * C)


@functools.lru_cache(maxsize=None)
def _make_fused_qkv(ws: int, C: int, h: int, use_cos: bool, has_bias: bool,
                    has_mask: bool, sm_scale: float, wblk: int, dtype_name: str,
                    has_qkv_bias: bool, interpret: bool):
    dtype = jnp.dtype(dtype_name)

    def specs(extra_in, extra_out):
        in_specs = [
            pl.BlockSpec((wblk, ws, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wblk, 1, ws), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wblk, ws, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, ws, ws), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ] + extra_in
        return in_specs, extra_out

    def prep(x, groups, logit_scale):
        T = x.shape[0]
        nw = T // ws
        g = groups.astype(jnp.int32)
        return (nw, g.reshape(nw, ws, 1), g.reshape(nw, 1, ws),
                x.reshape(nw, ws, C), logit_scale.reshape(h, 1).astype(jnp.float32))

    def pallas_fwd(x, wqkv, bqkv, groups, bias, logit_scale):
        nw, gcol, grow, x3, scale_arr = prep(x, groups, logit_scale)
        kernel = functools.partial(
            _fwd_kernel_xw, ws=ws, C=C, h=h, wblk=wblk, use_cos=use_cos,
            has_bias=has_bias, has_mask=has_mask, sm_scale=sm_scale,
            has_qkv_bias=has_qkv_bias,
        )
        in_specs, _ = specs([], [])
        out = pl.pallas_call(
            kernel,
            grid=(nw // wblk,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((wblk, ws, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nw, ws, C), dtype),
            interpret=interpret,
        )(gcol, grow, x3, wqkv, bqkv.reshape(1, 3 * C), bias, scale_arr)
        return out.reshape(x.shape[0], C)

    @jax.custom_vjp
    def fused(x, wqkv, bqkv, groups, bias, logit_scale):
        return pallas_fwd(x, wqkv, bqkv, groups, bias, logit_scale)

    def fwd(x, wqkv, bqkv, groups, bias, logit_scale):
        return fused(x, wqkv, bqkv, groups, bias, logit_scale), (
            x, wqkv, bqkv, groups, bias, logit_scale,
        )

    def pallas_bwd(x, wqkv, bqkv, groups, bias, logit_scale, dout):
        nw, gcol, grow, x3, scale_arr = prep(x, groups, logit_scale)
        kernel = functools.partial(
            _bwd_kernel_xw, ws=ws, C=C, h=h, wblk=wblk, use_cos=use_cos,
            has_bias=has_bias, has_mask=has_mask, sm_scale=sm_scale,
            has_qkv_bias=has_qkv_bias,
        )
        in_specs, _ = specs(
            [pl.BlockSpec((wblk, ws, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
            [],
        )
        dx, dw, db, dbias, dls = pl.pallas_call(
            kernel,
            grid=(nw // wblk,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((wblk, ws, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, 3 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((h, ws, ws), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((h, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nw, ws, C), dtype),
                jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),
                jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),
                jax.ShapeDtypeStruct((h, ws, ws), jnp.float32),
                jax.ShapeDtypeStruct((h, 1), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((wblk, ws, 3 * C), dtype)],
            interpret=interpret,
        )(gcol, grow, x3, wqkv, bqkv.reshape(1, 3 * C), bias, scale_arr,
          dout.reshape(nw, ws, C))
        return dx.reshape(x.shape), dw, db, dbias, dls

    def bwd(res, g):
        x, wqkv, bqkv, groups, bias, logit_scale = res
        dx, dw, db, dbias, dls = pallas_bwd(
            x, wqkv, bqkv, groups, bias, logit_scale, g.astype(dtype)
        )
        return (dx, dw.astype(wqkv.dtype), db.reshape(bqkv.shape).astype(bqkv.dtype),
                _float0_like(groups), dbias, dls.reshape(h))

    fused.defvjp(fwd, bwd)
    return fused


def fused_window_attention_qkv(x, wqkv, bqkv, groups, bias, logit_scale, *, ws,
                               num_heads, use_cos, sm_scale, has_mask=True,
                               wblk: int = 8, interpret: bool = False):
    """Fused qkv-projection + window attention.  x: (T, C) tokens; wqkv: (C, 3C);
    bqkv: (3C,) or None; other operands as fused_window_attention.  Returns the
    pre-output-projection attention result (T, C)."""
    C = x.shape[-1]
    has_qkv_bias = bqkv is not None
    fn = _make_fused_qkv(
        ws, C, num_heads, use_cos, bias is not None, has_mask, float(sm_scale), wblk,
        str(x.dtype), has_qkv_bias, interpret,
    )
    if bqkv is None:
        bqkv = jnp.zeros((3 * C,), x.dtype)
    if bias is None:
        bias = jnp.zeros((num_heads, ws, ws), jnp.float32)
    if logit_scale is None:
        logit_scale = jnp.zeros((num_heads,), jnp.float32)
    return fn(x, wqkv.astype(x.dtype), bqkv.astype(x.dtype), groups, bias, logit_scale)


@functools.lru_cache(maxsize=None)
def _make_fused(ws: int, C: int, h: int, use_cos: bool, has_bias: bool, has_mask: bool,
                sm_scale: float, wblk: int, dtype_name: str, interpret: bool):
    dtype = jnp.dtype(dtype_name)

    def pallas_fwd(qkv, groups, bias, logit_scale):
        T = qkv.shape[0]
        nw = T // ws
        grid = (nw // wblk,)
        kernel = functools.partial(
            _fwd_kernel, ws=ws, C=C, h=h, wblk=wblk, use_cos=use_cos,
            has_bias=has_bias, has_mask=has_mask, sm_scale=sm_scale,
        )
        scale_arr = logit_scale.reshape(h, 1).astype(jnp.float32)
        g = groups.astype(jnp.int32)
        gcol = g.reshape(nw, ws, 1)
        grow = g.reshape(nw, 1, ws)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((wblk, ws, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((wblk, 1, ws), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((wblk, ws, 3 * C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((h, ws, ws), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((h, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((wblk, ws, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nw, ws, C), dtype),
            interpret=interpret,
        )(gcol, grow, qkv.reshape(nw, ws, 3 * C), bias, scale_arr)
        return out.reshape(T, C)

    @jax.custom_vjp
    def fused(qkv, groups, bias, logit_scale):
        return pallas_fwd(qkv, groups, bias, logit_scale)

    def fwd(qkv, groups, bias, logit_scale):
        return fused(qkv, groups, bias, logit_scale), (qkv, groups, bias, logit_scale)

    def pallas_bwd(qkv, groups, bias, logit_scale, dout):
        T = qkv.shape[0]
        nw = T // ws
        grid = (nw // wblk,)
        kernel = functools.partial(
            _bwd_kernel, ws=ws, C=C, h=h, wblk=wblk, use_cos=use_cos,
            has_bias=has_bias, has_mask=has_mask, sm_scale=sm_scale,
        )
        scale_arr = logit_scale.reshape(h, 1).astype(jnp.float32)
        g = groups.astype(jnp.int32)
        gcol = g.reshape(nw, ws, 1)
        grow = g.reshape(nw, 1, ws)
        dqkv, dbias, dls = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((wblk, ws, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((wblk, 1, ws), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((wblk, ws, 3 * C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((h, ws, ws), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((h, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((wblk, ws, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((wblk, ws, 3 * C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((h, ws, ws), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((h, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nw, ws, 3 * C), dtype),
                jax.ShapeDtypeStruct((h, ws, ws), jnp.float32),
                jax.ShapeDtypeStruct((h, 1), jnp.float32),
            ],
            interpret=interpret,
        )(gcol, grow, qkv.reshape(nw, ws, 3 * C), bias, scale_arr,
          dout.reshape(nw, ws, C))
        return dqkv.reshape(T, 3 * C), dbias, dls

    def bwd(res, g):
        qkv, groups, bias, logit_scale = res
        dqkv, dbias, dls = pallas_bwd(qkv, groups, bias, logit_scale, g.astype(dtype))
        return dqkv, _float0_like(groups), dbias, dls.reshape(h)

    fused.defvjp(fwd, bwd)
    return fused


def supported(backend: str, T: int, ws: int, num_heads: int, C: int,
              wblk: int = 8) -> bool:
    """Whether the fused kernel handles this shape on this backend."""
    if backend != "tpu":
        return False
    if C % num_heads != 0:
        return False
    nw = T // ws
    return T % ws == 0 and nw % wblk == 0 and ws % 8 == 0


def fused_window_attention(qkv, groups, bias, logit_scale, *, ws, num_heads, use_cos,
                           sm_scale, has_mask=True, wblk: int = 8,
                           interpret: bool = False):
    """Entry point.  qkv: (T, 3C); groups: (T//ws, ws) int32; bias: (h, ws, ws) f32 or
    None; logit_scale: (h,) f32 (pre-exp'd) or None.  Returns (T, C)."""
    C = qkv.shape[-1] // 3
    fn = _make_fused(
        ws, C, num_heads, use_cos, bias is not None, has_mask, float(sm_scale), wblk,
        str(qkv.dtype), interpret,
    )
    if bias is None:
        bias = jnp.zeros((num_heads, ws, ws), jnp.float32)
    if logit_scale is None:
        logit_scale = jnp.zeros((num_heads,), jnp.float32)
    return fn(qkv, groups, bias, logit_scale)
