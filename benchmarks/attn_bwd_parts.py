#!/usr/bin/env python3
"""Subtractive timing ablation of the fused-qkv BACKWARD kernel body.

Variants strip one piece each (semantics intentionally wrong — timing only):
  full       — production body
  no_dls     — skip dlogit_scale accumulation
  no_dbias   — skip dbias accumulation
  no_tang    — skip the cosine tangent projection (dq=dqh*inv, dk=dkh*inv)
  no_norm    — skip q/k normalization recompute (use raw q,k as qh,kh)
  no_soft    — skip softmax recompute (p = constant scores)
  dv_only    — only dv path (no dp/ds/dq/dk)
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.prof_util import device_ms
from heal_swin_tpu.ops import window_attention as wa

WS = 64


def make_bwd(*, C, h, wblk, variant):
    hd = C // h

    def body_wide(qkv, mask, bias_ref, scale_ref, dout_ref, dqkv_ref, dbias_ref,
                  dls_ref, aq_ref, bk_ref):
        """Fully-wide cosine backward: per-head ops are ONLY the 6 MXU dots; all
        normalization + tangent-projection elementwise math runs at full C width,
        with per-head row-reductions as tiny 0/1-indicator matmuls."""
        f32 = jnp.float32
        rows = wblk * WS
        scale_vec = scale_ref[...][:, 0]  # (h,)
        qf = qkv[:, :, :C].astype(f32)
        kf = qkv[:, :, C:2 * C].astype(f32)
        sq = qkv[:, :, :2 * C].astype(f32)
        sq = sq * sq
        r2 = jax.lax.broadcasted_iota(jnp.int32, (2 * C, 2 * h), 0) // hd
        c2 = jax.lax.broadcasted_iota(jnp.int32, (2 * C, 2 * h), 1)
        ind2 = (r2 == c2).astype(f32)  # (2C, 2h)
        ss = jax.lax.dot_general(sq.reshape(rows, 2 * C), ind2, wa._ROWS,
                                 preferred_element_type=f32)
        inv = jax.lax.rsqrt(jnp.maximum(ss, 1e-24))  # (rows, 2h)
        rc = jax.lax.broadcasted_iota(jnp.int32, (h, C), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (h, C), 1) // hd
        indt = (rc == cc).astype(f32)  # (h, C)
        uq_exp = jax.lax.dot_general(inv[:, :h], indt, wa._ROWS,
                                     preferred_element_type=f32).reshape(wblk, WS, C)
        uk_exp = jax.lax.dot_general(inv[:, h:], indt, wa._ROWS,
                                     preferred_element_type=f32).reshape(wblk, WS, C)
        qhat = qf * uq_exp  # (wblk, ws, C) f32, unscaled normalized q
        khat = kf * uk_exp
        scale_row = jax.lax.dot_general(scale_vec.reshape(1, h), indt, wa._ROWS,
                                        preferred_element_type=f32)  # (1, C)
        qhat_s = (qhat * scale_row[None]).astype(qkv.dtype)  # scale-folded bf16
        khat_lo = khat.astype(qkv.dtype)

        for head in range(h):
            sl = slice(head * hd, (head + 1) * hd)
            v = qkv[:, :, 2 * C + head * hd:2 * C + (head + 1) * hd]
            do = dout_ref[:, :, sl]
            scale = scale_ref[head, 0]
            qh_s = qhat_s[:, :, sl]
            kh = khat_lo[:, :, sl]
            if variant == "wide_nosoft":
                # p-caching upper bound: skip the QK score dot + exp/div (what a
                # forward-cached softmax would save, EXCLUDING its HBM read cost)
                s_dot = 1e-3 * mask
                p = 0.01 + 1e-6 * mask
            elif variant == "wide_nodot":
                # skip only the QK score dot (keep exp/div) -> isolates dot vs exp
                s_dot = 1e-3 * mask + bias_ref[head][None]
                e = jnp.exp(s_dot)
                p = e / jnp.sum(e, axis=-1, keepdims=True)
            else:
                s_dot = jax.lax.dot_general(qh_s, kh, wa._BATCH_QK,
                                            preferred_element_type=f32)
                bias_h = bias_ref[head]
                s = s_dot + (bias_h - (jnp.max(bias_h) + scale))[None] + mask
                e = jnp.exp(s)
                p = e / jnp.sum(e, axis=-1, keepdims=True)
            p_lo = p.astype(v.dtype)
            dv = jax.lax.dot_general(p_lo, do, wa._BATCH_TN,
                                     preferred_element_type=f32)
            dqkv_ref[:, :, 2 * C + head * hd:2 * C + (head + 1) * hd] = dv.astype(
                dqkv_ref.dtype)
            dp = jax.lax.dot_general(do, v, wa._BATCH_QK,
                                     preferred_element_type=f32)
            t = jnp.sum(dp * p, axis=-1, keepdims=True)
            ds = p * (dp - t)
            dbias_ref[head] += jnp.sum(ds, axis=0)
            dls_ref[head, 0] += jnp.sum(ds * s_dot) / scale
            ds_lo = ds.astype(qkv.dtype)
            aq_ref[:, :, sl] = jax.lax.dot_general(  # d(q-hat), unscaled
                ds_lo, kh, wa._BATCH_AV, preferred_element_type=f32)
            bk_ref[:, :, sl] = jax.lax.dot_general(  # d(k-hat), scale included
                ds_lo, qh_s, wa._BATCH_TN, preferred_element_type=f32)

        ind_ch = jnp.transpose(indt)  # (C, h)
        aq = aq_ref[...]
        rdq = jax.lax.dot_general((aq * qhat).reshape(rows, C), ind_ch, wa._ROWS,
                                  preferred_element_type=f32)  # (rows, h)
        rdq_exp = jax.lax.dot_general(rdq, indt, wa._ROWS,
                                      preferred_element_type=f32).reshape(wblk, WS, C)
        suq = inv[:, :h] * scale_vec[None, :]  # scale * u per head
        suq_exp = jax.lax.dot_general(suq, indt, wa._ROWS,
                                      preferred_element_type=f32).reshape(wblk, WS, C)
        dq = (aq - qhat * rdq_exp) * suq_exp
        bk = bk_ref[...]
        rdk = jax.lax.dot_general((bk * khat).reshape(rows, C), ind_ch, wa._ROWS,
                                  preferred_element_type=f32)
        rdk_exp = jax.lax.dot_general(rdk, indt, wa._ROWS,
                                      preferred_element_type=f32).reshape(wblk, WS, C)
        dk = (bk - khat * rdk_exp) * uk_exp
        dqkv_ref[:, :, :C] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, C:2 * C] = dk.astype(dqkv_ref.dtype)

    def body(qkv, mask, bias_ref, scale_ref, dout_ref, dqkv_ref, dbias_ref, dls_ref):
        for head in range(h):
            v = qkv[:, :, 2 * C + head * hd:2 * C + (head + 1) * hd]
            do = dout_ref[:, :, head * hd:(head + 1) * hd]
            scale = scale_ref[head, 0]
            qf = qkv[:, :, head * hd:(head + 1) * hd].astype(jnp.float32)
            kf = qkv[:, :, C + head * hd:C + (head + 1) * hd].astype(jnp.float32)
            if variant == "no_norm":
                inv_nq = inv_nk = None
                qh = qf.astype(qkv.dtype)
                kh = kf.astype(qkv.dtype)
            else:
                inv_nq = jax.lax.rsqrt(
                    jnp.maximum(jnp.sum(qf * qf, -1, keepdims=True), 1e-24))
                inv_nk = jax.lax.rsqrt(
                    jnp.maximum(jnp.sum(kf * kf, -1, keepdims=True), 1e-24))
                qh = (qf * inv_nq).astype(qkv.dtype)
                kh = (kf * inv_nk).astype(qkv.dtype)
            s_hat = jax.lax.dot_general(qh, kh, wa._BATCH_QK,
                                        preferred_element_type=jnp.float32)
            if variant == "no_soft":
                p = s_hat  # skip bias/mask/exp/normalize
            else:
                bias_h = bias_ref[head]
                s = s_hat * scale + (bias_h - (jnp.max(bias_h) + scale))[None] + mask
                e = jnp.exp(s)
                p = e / jnp.sum(e, axis=-1, keepdims=True)
            p_lo = p.astype(v.dtype)
            dv = jax.lax.dot_general(p_lo, do, wa._BATCH_TN,
                                     preferred_element_type=jnp.float32)
            dqkv_ref[:, :, 2 * C + head * hd:2 * C + (head + 1) * hd] = dv.astype(
                dqkv_ref.dtype)
            if variant == "dv_only":
                dqkv_ref[:, :, head * hd:(head + 1) * hd] = dv.astype(dqkv_ref.dtype)
                dqkv_ref[:, :, C + head * hd:C + (head + 1) * hd] = dv.astype(
                    dqkv_ref.dtype)
                continue
            dp = jax.lax.dot_general(do, v, wa._BATCH_QK,
                                     preferred_element_type=jnp.float32)
            t = jnp.sum(dp * p, axis=-1, keepdims=True)
            ds = p * (dp - t)
            if variant != "no_dbias":
                dbias_ref[head] += jnp.sum(ds, axis=0)
            if variant != "no_dls":
                dls_ref[head, 0] += jnp.sum(ds * s_hat)
            dsh_lo = (ds * scale).astype(qkv.dtype)
            dqh = jax.lax.dot_general(dsh_lo, kh, wa._BATCH_AV,
                                      preferred_element_type=jnp.float32)
            dkh = jax.lax.dot_general(dsh_lo, qh, wa._BATCH_TN,
                                      preferred_element_type=jnp.float32)
            if variant in ("no_tang", "no_norm"):
                dq = dqh if inv_nq is None else dqh * inv_nq
                dk = dkh if inv_nk is None else dkh * inv_nk
            else:
                qhf = qf * inv_nq
                khf = kf * inv_nk
                dq = (dqh - qhf * jnp.sum(dqh * qhf, -1, keepdims=True)) * inv_nq
                dk = (dkh - khf * jnp.sum(dkh * khf, -1, keepdims=True)) * inv_nk
            dqkv_ref[:, :, head * hd:(head + 1) * hd] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[:, :, C + head * hd:C + (head + 1) * hd] = dk.astype(
                dqkv_ref.dtype)

    def kernel(gcol_ref, grow_ref, x_ref, w_ref, b_ref, bias_ref, scale_ref,
               dout_ref, dx_ref, dw_ref, db_ref, dbias_ref, dls_ref, dqkv_ref,
               *scratches):
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
        qkv = (qkv + b_ref[...][None]).astype(x.dtype)
        mask = jnp.where(gcol_ref[...] != grow_ref[...], wa.MASK_VALUE, 0.0).astype(
            jnp.float32)
        if variant.startswith("wide"):
            body_wide(qkv, mask, bias_ref, scale_ref, dout_ref, dqkv_ref, dbias_ref,
                      dls_ref, *scratches)
        else:
            body(qkv, mask, bias_ref, scale_ref, dout_ref, dqkv_ref, dbias_ref,
                 dls_ref)
        dqkv = dqkv_ref[...].reshape(wblk * WS, 3 * C)
        dx = jax.lax.dot_general(
            dqkv, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dx_ref[...] = dx.reshape(wblk, WS, C).astype(dx_ref.dtype)
        dw_ref[...] += jax.lax.dot_general(
            x.reshape(wblk * WS, C), dqkv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0).reshape(1, 3 * C)

    return kernel


def run(C, h, nw, wblk, variants):
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (nw, WS, C), dtype)
    w = jax.random.normal(key, (C, 3 * C), dtype) * 0.05
    b = jnp.zeros((1, 3 * C), dtype)
    bias = jax.random.normal(key, (h, WS, WS), jnp.float32)
    scale = jnp.full((h, 1), 5.0, jnp.float32)
    dout = jax.random.normal(key, (nw, WS, C), dtype)
    gcol = jnp.zeros((nw, WS, 1), jnp.int32)
    grow = jnp.zeros((nw, 1, WS), jnp.int32)

    outs_by_variant = {}
    for variant in variants:
        kernel = make_bwd(C=C, h=h, wblk=wblk, variant=variant)
        scratches = [pltpu.VMEM((wblk, WS, 3 * C), dtype)]
        if variant.startswith("wide"):
            scratches += [pltpu.VMEM((wblk, WS, C), jnp.float32) for _ in range(2)]
        bspec = lambda shp, im: pl.BlockSpec(shp, im, memory_space=pltpu.VMEM)
        call = functools.partial(
            pl.pallas_call, kernel,
            grid=(nw // wblk,),
            in_specs=[
                bspec((wblk, WS, 1), lambda i: (i, 0, 0)),
                bspec((wblk, 1, WS), lambda i: (i, 0, 0)),
                bspec((wblk, WS, C), lambda i: (i, 0, 0)),
                bspec((C, 3 * C), lambda i: (0, 0)),
                bspec((1, 3 * C), lambda i: (0, 0)),
                bspec((h, WS, WS), lambda i: (0, 0, 0)),
                bspec((h, 1), lambda i: (0, 0)),
                bspec((wblk, WS, C), lambda i: (i, 0, 0)),
            ],
            out_specs=[
                bspec((wblk, WS, C), lambda i: (i, 0, 0)),
                bspec((C, 3 * C), lambda i: (0, 0)),
                bspec((1, 3 * C), lambda i: (0, 0)),
                bspec((h, WS, WS), lambda i: (0, 0, 0)),
                pl.BlockSpec((h, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nw, WS, C), dtype),
                jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),
                jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),
                jax.ShapeDtypeStruct((h, WS, WS), jnp.float32),
                jax.ShapeDtypeStruct((h, 1), jnp.float32),
            ],
            scratch_shapes=scratches,
        )

        def fn(x_, w_, b_, bias_, scale_, dout_, gcol_, grow_):
            outs = call()(gcol_, grow_, x_, w_, b_, bias_, scale_, dout_)
            return outs[0]

        if variant in ("full", "wide"):
            outs_by_variant[variant] = np.asarray(
                jax.jit(fn)(x, w, b, bias, scale, dout, gcol, grow), np.float32)
        ms = device_ms(fn, (x, w, b, bias, scale, dout, gcol, grow), iters=30)
        print(f"C={C} h={h} nw={nw} wblk={wblk} {variant:8s}: {ms:.3f} ms")
    if "full" in outs_by_variant and "wide" in outs_by_variant:
        d = np.abs(outs_by_variant["full"] - outs_by_variant["wide"]).max()
        ref = np.abs(outs_by_variant["full"]).max()
        print(f"  wide-vs-full max|dx diff| = {d:.3e} (max|dx| {ref:.3e})")


if __name__ == "__main__":
    vs = ["full", "wide", "wide_nosoft", "wide_nodot"]
    run(96, 3, 4096, 16, vs)    # stage 0 per-block (B=2)
    run(384, 12, 512, 8, vs)    # stage 2
