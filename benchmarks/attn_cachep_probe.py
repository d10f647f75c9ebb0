#!/usr/bin/env python3
"""Measure the "bf16 softmax caching" avenue for the epilogue-fused attention
backward (docs/PERFORMANCE.md "known remaining headroom").

Variant under test: the FORWARD additionally writes the per-head softmax p to HBM
in bf16 ((h, nW, ws, ws) extra output); the BACKWARD takes it as an input and skips
phase 1's per-head QK dot + exp/sum/div recompute (it still recomputes qkv and the
wide preamble — the tangent projection needs q_hat/k_hat either way, and o must
still be rebuilt via the AV dots for the proj/LN chain).

Trade per stage-0 step (C=96, h=3, nW=4096): -1 batched QK dot and -1 softmax
elementwise pass per head per grid step, vs ~100 MB of extra HBM write (fwd) +
read (bwd).  Compares against the production fused_window_attention_qkv_epi chain
under the identical device_ms_grad harness (scan-chained, remat bodies, profiler
device time).
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.prof_util import device_ms_grad
import heal_swin_tpu.ops.window_attention as wa

WS = 64


def _fwd_kernel_cachep(gcol_ref, grow_ref, x_ref, w_ref, b_ref, wp_ref, bp_ref,
                       g_ref, be_ref, bias_ref, scale_ref, out_ref, p_out_ref,
                       o_scr, *, C, h, has_bias, has_mask, ln_eps):
    f32 = jnp.float32
    hd = C // h
    x = x_ref[...]
    qkv = jax.lax.dot_general(x, w_ref[...], (((2,), (0,)), ((), ())),
                              preferred_element_type=f32)
    qkv = (qkv + b_ref[...][None]).astype(x.dtype)
    mask = wa._mask_from_groups(gcol_ref, grow_ref, has_mask)
    # identical math to the production _attn_fwd_body (cosine flavor), plus the
    # p_out store — so the fwd-side cost of caching is isolated.
    scale_vec = scale_ref[...][:, 0]
    q_hat, k_hat, _ = wa._cos_fold(qkv, C, h, scale_vec, qkv.dtype)
    for head in range(h):
        v = qkv[:, :, 2 * C + head * hd:2 * C + (head + 1) * hd]
        q = q_hat[:, :, head * hd:(head + 1) * hd]
        k = k_hat[:, :, head * hd:(head + 1) * hd]
        s = jax.lax.dot_general(q, k, wa._BATCH_QK, preferred_element_type=f32)
        if has_bias:
            s = s + bias_ref[head][None]
        else:
            s = s - scale_vec[head]
        if mask is not None:
            s = s + mask
        e = jnp.exp(s)
        p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
        p_out_ref[head] = p.astype(p_out_ref.dtype)
        o_scr[:, :, head * hd:(head + 1) * hd] = jax.lax.dot_general(
            p.astype(v.dtype), v, wa._BATCH_AV, preferred_element_type=f32
        ).astype(o_scr.dtype)
    z = wa._proj_ln_fwd(o_scr[...], wp_ref, bp_ref, g_ref, be_ref, has_ln=True,
                        ln_eps=ln_eps)
    out_ref[...] = z.astype(out_ref.dtype)


def _bwd_kernel_cachep(gcol_ref, grow_ref, x_ref, w_ref, b_ref, wp_ref, bp_ref,
                       g_ref, be_ref, bias_ref, scale_ref, p_in_ref, dz_ref,
                       dx_ref, dw_ref, db_ref, dwp_ref, dbp_ref, dg_ref, dbe_ref,
                       dbias_ref, dls_ref,
                       dqkv_scr, o_scr, aq_scr, bk_scr, *, C, h, wblk, has_bias,
                       has_mask, ln_eps):
    f32 = jnp.float32
    hd = C // h

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dwp_ref[...] = jnp.zeros_like(dwp_ref)
        dbp_ref[...] = jnp.zeros_like(dbp_ref)
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dbe_ref[...] = jnp.zeros_like(dbe_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)
        for _hh in range(h):
            dls_ref[_hh, 0] = 0.0

    x = x_ref[...]
    w = w_ref[...]
    qkv = jax.lax.dot_general(x, w, (((2,), (0,)), ((), ())),
                              preferred_element_type=f32)
    qkv = (qkv + b_ref[...][None]).astype(x.dtype)
    mask = wa._mask_from_groups(gcol_ref, grow_ref, has_mask)
    pre = wa._cos_wide_preamble(qkv, C, h, scale_ref[...][:, 0])

    # phase 1: o from the CACHED p (no QK dot, no softmax recompute)
    for head in range(h):
        sl = slice(head * hd, (head + 1) * hd)
        p_lo = p_in_ref[head]
        v = qkv[:, :, 2 * C + head * hd:2 * C + (head + 1) * hd]
        o_scr[:, :, sl] = jax.lax.dot_general(
            p_lo, v, wa._BATCH_AV, preferred_element_type=f32
        ).astype(o_scr.dtype)

    o = o_scr[...]
    u = jax.lax.dot_general(o, wp_ref[...], (((2,), (0,)), ((), ())),
                            preferred_element_type=f32)
    u = u + bp_ref[...][None].astype(f32)
    dzf = dz_ref[...].astype(f32)
    mean = jnp.mean(u, axis=-1, keepdims=True)
    xc = u - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + ln_eps)
    xhat = xc * rstd
    dg_ref[...] += jnp.sum(dzf * xhat, axis=(0, 1)).reshape(1, C)
    dbe_ref[...] += jnp.sum(dzf, axis=(0, 1)).reshape(1, C)
    dgl = dzf * g_ref[...][None]
    du = rstd * (
        dgl
        - jnp.mean(dgl, axis=-1, keepdims=True)
        - xhat * jnp.mean(dgl * xhat, axis=-1, keepdims=True)
    )
    du_lo = du.astype(x.dtype)
    rows = wblk * WS
    dwp_ref[...] += jax.lax.dot_general(
        o.reshape(rows, C), du_lo.reshape(rows, C), (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    dbp_ref[...] += jnp.sum(du, axis=(0, 1)).reshape(1, C)
    do_full = jax.lax.dot_general(du_lo, wp_ref[...], (((2,), (1,)), ((), ())),
                                  preferred_element_type=f32).astype(x.dtype)

    # phase 2: attention gradients from the cached p
    for head in range(h):
        sl = slice(head * hd, (head + 1) * hd)
        p = p_in_ref[head].astype(f32)
        wa._cos_wide_head_bwd(qkv, mask, bias_ref, scale_ref, do_full[:, :, sl],
                              dqkv_scr, dbias_ref, aq_scr, bk_scr, pre, head,
                              C=C, h=h, has_bias=has_bias, p=p)
    wa._cos_wide_tangent(aq_scr, bk_scr, pre, dqkv_scr, dls_ref, C=C, h=h)

    dqkv = dqkv_scr[...].reshape(rows, 3 * C)
    dx = jax.lax.dot_general(dqkv, w, (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)
    dx_ref[...] = dx.reshape(wblk, WS, C).astype(dx_ref.dtype)
    dw_ref[...] += jax.lax.dot_general(
        x.reshape(rows, C), dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    db_ref[...] += jnp.sum(dqkv.astype(f32), axis=0).reshape(1, 3 * C)


@functools.lru_cache(maxsize=None)
def make_cachep(C, h, fwd_wblk, bwd_wblk, dtype_name):
    ws = WS
    dtype = jnp.dtype(dtype_name)
    has_bias = has_mask = True
    ln_eps = 1e-5

    def const_specs():
        return [
            pl.BlockSpec((C, 3 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, ws, ws), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]

    def block_specs(wb):
        return [
            pl.BlockSpec((wb, ws, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, 1, ws), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, ws, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ]

    def prep(x, groups, logit_scale):
        T = x.shape[0]
        nw = T // ws
        g = groups.astype(jnp.int32)
        return (nw, g.reshape(nw, ws, 1), g.reshape(nw, 1, ws),
                x.reshape(nw, ws, C), logit_scale.reshape(h, 1).astype(jnp.float32))

    def pallas_fwd(x, wqkv, bqkv, wp, bp, gamma, beta, groups, bias, logit_scale):
        nw, gcol, grow, x3, scale_arr = prep(x, groups, logit_scale)
        bias = wa._shift_bias(bias, logit_scale, True, has_bias)
        fw = fwd_wblk
        kernel = functools.partial(_fwd_kernel_cachep, C=C, h=h, has_bias=has_bias,
                                   has_mask=has_mask, ln_eps=ln_eps)
        z, p = pl.pallas_call(
            kernel,
            grid=(nw // fw,),
            in_specs=block_specs(fw) + const_specs(),
            out_specs=[
                pl.BlockSpec((fw, ws, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((h, fw, ws, ws), lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nw, ws, C), dtype),
                jax.ShapeDtypeStruct((h, nw, ws, ws), dtype),
            ],
            scratch_shapes=[pltpu.VMEM((fw, ws, C), dtype)],
        )(gcol, grow, x3, wqkv, bqkv.reshape(1, 3 * C), wp, bp.reshape(1, C),
          gamma.reshape(1, C).astype(jnp.float32),
          beta.reshape(1, C).astype(jnp.float32), bias, scale_arr)
        return z.reshape(x.shape[0], C), p

    def pallas_bwd(x, wqkv, bqkv, wp, bp, gamma, beta, groups, bias, logit_scale,
                   p, dz):
        nw, gcol, grow, x3, scale_arr = prep(x, groups, logit_scale)
        bias = wa._shift_bias(bias, logit_scale, True, has_bias)
        bw = bwd_wblk
        kernel = functools.partial(_bwd_kernel_cachep, C=C, h=h, wblk=bw,
                                   has_bias=has_bias, has_mask=has_mask,
                                   ln_eps=ln_eps)
        outs = pl.pallas_call(
            kernel,
            grid=(nw // bw,),
            in_specs=block_specs(bw) + const_specs() + [
                pl.BlockSpec((h, bw, ws, ws), lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bw, ws, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((bw, ws, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, 3 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((h, ws, ws), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((h, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nw, ws, C), dtype),
                jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),
                jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),
                jax.ShapeDtypeStruct((C, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((h, ws, ws), jnp.float32),
                jax.ShapeDtypeStruct((h, 1), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((bw, ws, 3 * C), dtype),
                pltpu.VMEM((bw, ws, C), dtype),
                pltpu.VMEM((bw, ws, C), jnp.float32),
                pltpu.VMEM((bw, ws, C), jnp.float32),
            ],
        )(gcol, grow, x3, wqkv, bqkv.reshape(1, 3 * C), wp, bp.reshape(1, C),
          gamma.reshape(1, C).astype(jnp.float32),
          beta.reshape(1, C).astype(jnp.float32), bias, scale_arr,
          p, dz.reshape(nw, ws, C))
        return outs

    @jax.custom_vjp
    def fused(x, wqkv, bqkv, wp, bp, gamma, beta, groups, bias, logit_scale):
        z, _ = pallas_fwd(x, wqkv, bqkv, wp, bp, gamma, beta, groups, bias,
                          logit_scale)
        return z

    def fwd(x, wqkv, bqkv, wp, bp, gamma, beta, groups, bias, logit_scale):
        z, p = pallas_fwd(x, wqkv, bqkv, wp, bp, gamma, beta, groups, bias,
                          logit_scale)
        return z, (x, wqkv, bqkv, wp, bp, gamma, beta, groups, bias, logit_scale, p)

    def bwd(res, g):
        x, wqkv, bqkv, wp, bp, gamma, beta, groups, bias, logit_scale, p = res
        dx, dw, db, dwp, dbp, dg, dbe, dbias, dls = pallas_bwd(
            x, wqkv, bqkv, wp, bp, gamma, beta, groups, bias, logit_scale, p,
            g.astype(dtype))
        return (dx.reshape(x.shape), dw.astype(wqkv.dtype),
                db.reshape(bqkv.shape).astype(bqkv.dtype), dwp.astype(wp.dtype),
                dbp.reshape(bp.shape).astype(bp.dtype), dg.reshape(gamma.shape),
                dbe.reshape(beta.shape), wa._float0_like(groups), dbias,
                dls.reshape(h))

    fused.defvjp(fwd, bwd)
    return fused


def run(C, h, nw, fwd_wblk, bwd_wblk):
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    T = nw * WS
    x = jnp.asarray(rng.normal(size=(T, C)), dtype)
    wq = jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.05, dtype)
    bq = jnp.zeros((3 * C,), dtype)
    wp = jnp.asarray(rng.normal(size=(C, C)) * 0.05, dtype)
    bp = jnp.zeros((C,), dtype)
    gam = jnp.ones((C,), jnp.float32)
    bet = jnp.zeros((C,), jnp.float32)
    groups = jnp.zeros((nw, WS), jnp.int32)
    bias = jnp.asarray(rng.normal(size=(h, WS, WS)), jnp.float32)
    ls = jnp.full((h,), 5.0, jnp.float32)

    def prod(x_, wq_):
        return wa.fused_window_attention_qkv_epi(
            x_, wq_, bq, wp, bp, gam, bet, groups, bias, ls, ws=WS, num_heads=h,
            sm_scale=0.2, wblk=bwd_wblk, fwd_wblk=fwd_wblk, bwd_wblk=bwd_wblk)

    cachep_fn = make_cachep(C, h, fwd_wblk, bwd_wblk, "bfloat16")

    def cachep(x_, wq_):
        return cachep_fn(x_, wq_, bq, wp, bp, gam, bet, groups, bias, ls)

    # numerics cross-check before timing
    gp = jax.jit(jax.grad(lambda a, b: jnp.sum(prod(a, b).astype(jnp.float32)),
                          argnums=(0, 1)))(x, wq)
    gc = jax.jit(jax.grad(lambda a, b: jnp.sum(cachep(a, b).astype(jnp.float32)),
                          argnums=(0, 1)))(x, wq)
    for a, b, name in [(gp[0], gc[0], "dx"), (gp[1], gc[1], "dw")]:
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        print(f"C={C} max|prod-cachep| {name}: {err:.2e}")

    ms_p = device_ms_grad(lambda a, b: jnp.sum(prod(a, b).astype(jnp.float32)),
                          (x, wq), iters=20)
    ms_c = device_ms_grad(lambda a, b: jnp.sum(cachep(a, b).astype(jnp.float32)),
                          (x, wq), iters=20)
    print(f"C={C} nw={nw} production epi chain : {ms_p:.3f} ms")
    print(f"C={C} nw={nw} cached-p    chain    : {ms_c:.3f} ms")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "96"):
        run(96, 3, 4096, 16, 16)
    if which in ("all", "192"):
        run(192, 6, 1024, 16, 8)
    if which in ("all", "384"):
        run(384, 12, 512, 16, 4)
