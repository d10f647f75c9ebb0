#!/usr/bin/env python3
"""Fused-qkv BACKWARD: dW accumulation as a wblk-loop of small dots (current prod)
vs one reshaped (wblk*ws, C)^T @ (wblk*ws, 3C) dot (K=wblk*ws on the MXU).

Also ablates dx the same way ((wblk, ws, 3C) batched vs flat 2-D dot).
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

from benchmarks.prof_util import device_ms
from heal_swin_tpu.ops import window_attention as wa

WS = 64


def make_bwd(*, C, h, wblk, variant):
    def kernel(gcol_ref, grow_ref, x_ref, w_ref, b_ref, bias_ref, scale_ref,
               dout_ref, dx_ref, dw_ref, db_ref, dbias_ref, dls_ref, dqkv_ref):
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
        wa._attn_bwd_body(qkv, mask, bias_ref, scale_ref, dout_ref, dqkv_ref,
                          dbias_ref, dls_ref, C=C, h=h, use_cos=True,
                          has_bias=True, sm_scale=1.0)
        dqkv = dqkv_ref[...]
        if variant == "loop":
            dx = jax.lax.dot_general(
                dqkv, w, (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            dx_ref[...] = dx.astype(dx_ref.dtype)
            dw_acc = jnp.zeros((C, 3 * C), jnp.float32)
            for wi in range(wblk):
                dw_acc = dw_acc + jax.lax.dot_general(
                    x[wi], dqkv[wi], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            dw_ref[...] += dw_acc
            db_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=(0, 1)).reshape(
                1, 3 * C)
        else:  # flat
            dqkv2 = dqkv.reshape(wblk * WS, 3 * C)
            dx = jax.lax.dot_general(
                dqkv2, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            dx_ref[...] = dx.reshape(wblk, WS, C).astype(dx_ref.dtype)
            x2 = x.reshape(wblk * WS, C)
            dw_ref[...] += jax.lax.dot_general(
                x2, dqkv2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            db_ref[...] += jnp.sum(dqkv2.astype(jnp.float32), axis=0).reshape(
                1, 3 * C)

    return kernel


def run(C, h, nw, wblk):
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

    for variant in ("loop", "flat"):
        kernel = make_bwd(C=C, h=h, wblk=wblk, variant=variant)
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
            scratch_shapes=[pltpu.VMEM((wblk, WS, 3 * C), dtype)],
        )

        def fn(x_, w_, b_, bias_, scale_, dout_, gcol_, grow_):
            outs = call()(gcol_, grow_, x_, w_, b_, bias_, scale_, dout_)
            return outs[0]

        ms = device_ms(fn, (x, w, b, bias, scale, dout, gcol, grow), iters=30)
        print(f"C={C} h={h} nw={nw} wblk={wblk} {variant:5s}: {ms:.3f} ms")

    # numerical check loop vs flat
    k1 = make_bwd(C=C, h=h, wblk=wblk, variant="loop")


if __name__ == "__main__":
    run(96, 3, 8192, 16)    # stage 0, B=2
    run(192, 6, 2048, 16)   # stage 1
    run(384, 12, 512, 8)    # stage 2
