#!/usr/bin/env python3
"""Cost comparison of cosine-attention BACKWARD formulations at stage-0 shape.

Standalone bwd kernels (qkv, dout) -> (dqkv, dbias, dls); no qkv-projection parts.
  old    — normalize q/k per head (narrow) + tangent projection
  new    — folded operands + rowsum/colsum(ds*s_dot) corrections (current prod)
  new2   — new, but dls derived from rowsum (one less full traversal)
  mixed  — folded operands from _cos_fold + old tangent projection per head
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.prof_util import device_ms
from heal_swin_tpu.ops.window_attention import (
    MASK_VALUE, _BATCH_QK, _BATCH_AV, _BATCH_TN, _cos_fold,
)

WS = 64


def make_bwd(*, C, h, wblk, variant):
    hd = C // h

    def kernel(gcol_ref, grow_ref, qkv_ref, bias_ref, scale_ref, dout_ref,
               dqkv_ref, dbias_ref, dls_ref):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            dbias_ref[...] = jnp.zeros_like(dbias_ref)
            for _hh in range(h):
                dls_ref[_hh, 0] = 0.0

        mask = jnp.where(gcol_ref[...] != grow_ref[...], MASK_VALUE, 0.0).astype(
            jnp.float32)
        qkv = qkv_ref[...]

        if variant != "old":
            scale_vec = scale_ref[...][:, 0]
            q_hat, k_hat, inv = _cos_fold(qkv, C, h, scale_vec, qkv.dtype)

        for head in range(h):
            v = qkv[:, :, 2 * C + head * hd:2 * C + (head + 1) * hd]
            do = dout_ref[:, :, head * hd:(head + 1) * hd]
            scale = scale_ref[head, 0]

            if variant == "old":
                q = qkv[:, :, head * hd:(head + 1) * hd]
                k = qkv[:, :, C + head * hd:C + (head + 1) * hd]
                qf = q.astype(jnp.float32)
                kf = k.astype(jnp.float32)
                inv_nq = jax.lax.rsqrt(
                    jnp.maximum(jnp.sum(qf * qf, -1, keepdims=True), 1e-24))
                inv_nk = jax.lax.rsqrt(
                    jnp.maximum(jnp.sum(kf * kf, -1, keepdims=True), 1e-24))
                qh = (qf * inv_nq).astype(q.dtype)
                kh = (kf * inv_nk).astype(k.dtype)
                s_hat = jax.lax.dot_general(qh, kh, _BATCH_QK,
                                            preferred_element_type=jnp.float32)
                s = s_hat * scale
                s = s + bias_ref[head][None] + mask
                s = s - jnp.max(s, axis=-1, keepdims=True)
            else:
                qh = q_hat[:, :, head * hd:(head + 1) * hd]
                kh = k_hat[:, :, head * hd:(head + 1) * hd]
                s_dot = jax.lax.dot_general(qh, kh, _BATCH_QK,
                                            preferred_element_type=jnp.float32)
                bias_h = bias_ref[head]
                s = s_dot + (bias_h - (jnp.max(bias_h) + scale))[None] + mask
            e = jnp.exp(s)
            p = e / jnp.sum(e, axis=-1, keepdims=True)

            p_lo = p.astype(v.dtype)
            dv = jax.lax.dot_general(p_lo, do, _BATCH_TN,
                                     preferred_element_type=jnp.float32)
            dqkv_ref[:, :, 2 * C + head * hd:2 * C + (head + 1) * hd] = dv.astype(
                dqkv_ref.dtype)
            dp = jax.lax.dot_general(do, v, _BATCH_QK,
                                     preferred_element_type=jnp.float32)
            t = jnp.sum(dp * p, axis=-1, keepdims=True)
            ds = p * (dp - t)
            dbias_ref[head] += jnp.sum(ds, axis=0)
            ds_lo = ds.astype(qkv.dtype)

            if variant == "old":
                dls_ref[head, 0] += jnp.sum(ds * s_hat)
                dsh_lo = (ds * scale).astype(qkv.dtype)
                dqh = jax.lax.dot_general(dsh_lo, kh, _BATCH_AV,
                                          preferred_element_type=jnp.float32)
                dkh = jax.lax.dot_general(dsh_lo, qh, _BATCH_TN,
                                          preferred_element_type=jnp.float32)
                qhf = qf * inv_nq
                khf = kf * inv_nk
                dq = (dqh - qhf * jnp.sum(dqh * qhf, -1, keepdims=True)) * inv_nq
                dk = (dkh - khf * jnp.sum(dkh * khf, -1, keepdims=True)) * inv_nk
            elif variant == "mixed":
                u = inv[:, :, head:head + 1]
                vk = inv[:, :, h + head:h + head + 1]
                dls_ref[head, 0] += jnp.sum(ds * s_dot) / scale
                # dqh wrt UNSCALED normalized q; q_hat carries scale so divide once
                dqh = jax.lax.dot_general(ds_lo, kh, _BATCH_AV,
                                          preferred_element_type=jnp.float32) * scale
                dkh = jax.lax.dot_general(ds_lo, qh, _BATCH_TN,
                                          preferred_element_type=jnp.float32)
                qf = qkv[:, :, head * hd:(head + 1) * hd].astype(jnp.float32)
                kf = qkv[:, :, C + head * hd:C + (head + 1) * hd].astype(jnp.float32)
                qhf = qf * u
                khf = kf * vk
                dq = (dqh - qhf * jnp.sum(dqh * qhf, -1, keepdims=True)) * u
                dk = (dkh - khf * jnp.sum(dkh * khf, -1, keepdims=True)) * vk
            else:  # new / new2
                u = inv[:, :, head:head + 1]
                vk = inv[:, :, h + head:h + head + 1]
                dssd = ds * s_dot
                rq = jnp.sum(dssd, axis=-1, keepdims=True)
                ck = jnp.sum(dssd, axis=1)[:, :, None]
                if variant == "new2":
                    dls_ref[head, 0] += jnp.sum(rq) / scale
                else:
                    dls_ref[head, 0] += jnp.sum(dssd) / scale
                q_raw = qkv[:, :, head * hd:(head + 1) * hd].astype(jnp.float32)
                k_raw = qkv[:, :, C + head * hd:C + (head + 1) * hd].astype(jnp.float32)
                dq = jax.lax.dot_general(ds_lo, kh, _BATCH_AV,
                                         preferred_element_type=jnp.float32
                                         ) * (u * scale) - q_raw * (u * u * rq)
                dk = jax.lax.dot_general(ds_lo, qh, _BATCH_TN,
                                         preferred_element_type=jnp.float32
                                         ) * vk - k_raw * (vk * vk * ck)
            dqkv_ref[:, :, head * hd:(head + 1) * hd] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[:, :, C + head * hd:C + (head + 1) * hd] = dk.astype(dqkv_ref.dtype)

    return kernel


def run(tokens, C, h, wblk, variant):
    B = 2
    T = B * tokens
    nw = T // WS
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(nw, WS, 3 * C), jnp.bfloat16)
    dout = jnp.asarray(rng.randn(nw, WS, C), jnp.bfloat16)
    g = jnp.asarray(rng.randint(0, 3, (nw, WS)), jnp.int32)
    gcol = g.reshape(nw, WS, 1)
    grow = g.reshape(nw, 1, WS)
    bias = jnp.asarray(rng.randn(h, WS, WS) * 0.02, jnp.float32)
    ls = jnp.asarray(np.full((h, 1), 8.0), jnp.float32)

    kernel = make_bwd(C=C, h=h, wblk=wblk, variant=variant)

    def fn(qkv, dout):
        return pl.pallas_call(
            kernel,
            grid=(nw // wblk,),
            in_specs=[
                pl.BlockSpec((wblk, WS, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((wblk, 1, WS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((wblk, WS, 3 * C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((h, WS, WS), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((h, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((wblk, WS, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((wblk, WS, 3 * C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((h, WS, WS), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((h, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nw, WS, 3 * C), jnp.bfloat16),
                jax.ShapeDtypeStruct((h, WS, WS), jnp.float32),
                jax.ShapeDtypeStruct((h, 1), jnp.float32),
            ],
        )(gcol, grow, qkv, bias, ls, dout)[0]

    ms = device_ms(fn, (qkv, dout), iters=20)
    print(json.dumps({"variant": variant, "C": C, "ms": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    variants = sys.argv[1:] or ["old", "new", "new2", "mixed"]
    for v in variants:
        try:
            run(131072, 96, 3, 16, v)
        except Exception as e:
            print(json.dumps({"variant": v, "err": str(e)[:100]}), flush=True)
