#!/usr/bin/env python3
"""Cost attribution inside the fused window-attention forward at stage-0 shape.

Each variant disables one piece of the kernel (numerically WRONG — timing only):
  full        — mirror of the production fwd kernel (fused qkv, cos attention)
  no_max      — softmax without the running-max subtraction
  no_softmax  — scores go straight to AV (no exp/normalize)
  no_cosnorm  — skip q/k L2 normalization
  no_mask     — skip group-mask derivation/add
  no_bias     — skip relative-position-bias add
  dots_only   — qkv dot + QK^T + AV only
  heads_1dot  — all heads in ONE batched dot via (wblk*h, ws, hd) relayout
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

WS = 64
MASK_VALUE = -100.0
_BATCH_QK = (((2,), (2,)), ((0,), (0,)))
_BATCH_AV = (((2,), (1,)), ((0,), (0,)))


def make_kernel(*, C, h, wblk, variant):
    hd = C // h

    def kernel(gcol_ref, grow_ref, x_ref, w_ref, b_ref, bias_ref, scale_ref, out_ref):
        qkv = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        qkv = (qkv + b_ref[...][None]).astype(x_ref.dtype)

        mask = None
        if variant not in ("no_mask", "dots_only"):
            mask = jnp.where(gcol_ref[...] != grow_ref[...], MASK_VALUE, 0.0).astype(
                jnp.float32
            )

        if variant == "heads_1dot":
            # (wblk, ws, 3C) -> (wblk*h, ws, hd) with heads as extra batch
            def split(off):
                a = qkv[:, :, off:off + C].reshape(wblk, WS, h, hd)
                return a.transpose(0, 2, 1, 3).reshape(wblk * h, WS, hd)

            q, k, v = split(0), split(C), split(2 * C)
            qf = q.astype(jnp.float32)
            kf = k.astype(jnp.float32)
            qf = qf * jax.lax.rsqrt(jnp.maximum(jnp.sum(qf * qf, -1, keepdims=True), 1e-24))
            kf = kf * jax.lax.rsqrt(jnp.maximum(jnp.sum(kf * kf, -1, keepdims=True), 1e-24))
            s = jax.lax.dot_general(
                qf.astype(q.dtype), kf.astype(k.dtype), _BATCH_QK,
                preferred_element_type=jnp.float32,
            )
            scale_b = jnp.repeat(scale_ref[...][:, 0], wblk * h // h // (wblk) or 1)
            # per-head scale: build (wblk*h, 1, 1) by tiling head scales
            sc = jnp.tile(scale_ref[...][:, 0], (wblk,)).reshape(wblk * h, 1, 1)
            s = s * sc
            bias_b = jnp.tile(bias_ref[...], (wblk, 1, 1))
            s = s + bias_b
            if mask is not None:
                mask_b = jnp.repeat(mask, h, axis=0)
                s = s + mask_b
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, _BATCH_AV, preferred_element_type=jnp.float32
            )
            o4 = o.reshape(wblk, h, WS, hd).transpose(0, 2, 1, 3).reshape(wblk, WS, C)
            out_ref[...] = o4.astype(out_ref.dtype)
            return

        if variant == "cosfold2":
            # normalize q,k for ALL heads via wide ops + tiny indicator matmuls;
            # per-head loop does only dot/softmax/AV.
            qf = qkv[:, :, :C].astype(jnp.float32)
            kf = qkv[:, :, C:2 * C].astype(jnp.float32)
            sq = qkv[:, :, :2 * C].astype(jnp.float32)
            sq = sq * sq
            rows = jax.lax.broadcasted_iota(jnp.int32, (2 * C, 2 * h), 0) // hd
            cols = jax.lax.broadcasted_iota(jnp.int32, (2 * C, 2 * h), 1)
            ind = (rows == cols).astype(jnp.float32)
            ss = jax.lax.dot_general(
                sq.reshape(wblk * WS, 2 * C), ind,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            inv = jax.lax.rsqrt(jnp.maximum(ss, 1e-24))  # (wblk*ws, 2h)
            scal = scale_ref[...][:, 0]  # (h,)
            inv_qs = inv[:, :h] * scal[None, :]
            rowsC = jax.lax.broadcasted_iota(jnp.int32, (h, C), 0)
            colsC = jax.lax.broadcasted_iota(jnp.int32, (h, C), 1) // hd
            indT = (rowsC == colsC).astype(jnp.float32)
            exp_q = jax.lax.dot_general(
                inv_qs, indT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(wblk, WS, C)
            exp_k = jax.lax.dot_general(
                inv[:, h:], indT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(wblk, WS, C)
            q_hat = (qf * exp_q).astype(x_ref.dtype)
            k_hat = (kf * exp_k).astype(x_ref.dtype)
            for head in range(h):
                q = q_hat[:, :, head * hd:(head + 1) * hd]
                k = k_hat[:, :, head * hd:(head + 1) * hd]
                v = qkv[:, :, 2 * C + head * hd:2 * C + (head + 1) * hd]
                s = jax.lax.dot_general(q, k, _BATCH_QK, preferred_element_type=jnp.float32)
                bias_h = bias_ref[head]
                bshift = (bias_h - jnp.max(bias_h) - scale_ref[head, 0])[None]
                s = s + bshift
                if mask is not None:
                    s = s + mask
                e = jnp.exp(s)
                p = e / jnp.sum(e, axis=-1, keepdims=True)
                o = jax.lax.dot_general(
                    p.astype(v.dtype), v, _BATCH_AV, preferred_element_type=jnp.float32
                )
                out_ref[:, :, head * hd:(head + 1) * hd] = o.astype(out_ref.dtype)
            return

        if variant in ("cosfold", "cosfold_vpu"):
            # fold q/k normalization into score scaling: k_hat = k / |k| per head;
            # rows scaled by scale/|q| after the dot; softmax shifted by the static
            # bound scale + max(bias) instead of the per-row max.
            qk = qkv[:, :, :2 * C].astype(jnp.float32)
            sq = qk * qk  # one wide pass
            rows = jax.lax.broadcasted_iota(jnp.int32, (2 * C, 2 * h), 0) // hd
            cols = jax.lax.broadcasted_iota(jnp.int32, (2 * C, 2 * h), 1)
            ind = (rows == cols).astype(jnp.float32)
            ss = jax.lax.dot_general(
                sq.reshape(wblk * WS, 2 * C), ind,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ).reshape(wblk, WS, 2 * h)
            inv = jax.lax.rsqrt(jnp.maximum(ss, 1e-24))  # (wblk, ws, 2h)
            for head in range(h):
                q = qkv[:, :, head * hd:(head + 1) * hd]
                k = qkv[:, :, C + head * hd:C + (head + 1) * hd]
                v = qkv[:, :, 2 * C + head * hd:2 * C + (head + 1) * hd]
                u = inv[:, :, head:head + 1]  # 1/|q|  (wblk, ws, 1)
                vk = inv[:, :, h + head:h + head + 1]  # 1/|k|
                k_hat = (k.astype(jnp.float32) * vk).astype(k.dtype)
                s_dot = jax.lax.dot_general(
                    q, k_hat, _BATCH_QK, preferred_element_type=jnp.float32
                )
                scale = scale_ref[head, 0]
                bias_h = bias_ref[head]
                bshift = (bias_h - jnp.max(bias_h) - scale)[None]
                s = s_dot * (u * scale) + bshift
                if mask is not None:
                    s = s + mask
                e = jnp.exp(s)
                p = e / jnp.sum(e, axis=-1, keepdims=True)
                o = jax.lax.dot_general(
                    p.astype(v.dtype), v, _BATCH_AV, preferred_element_type=jnp.float32
                )
                out_ref[:, :, head * hd:(head + 1) * hd] = o.astype(out_ref.dtype)
            return

        for head in range(h):
            q = qkv[:, :, head * hd:(head + 1) * hd]
            k = qkv[:, :, C + head * hd:C + (head + 1) * hd]
            v = qkv[:, :, 2 * C + head * hd:2 * C + (head + 1) * hd]
            if variant not in ("no_cosnorm", "dots_only"):
                qf = q.astype(jnp.float32)
                kf = k.astype(jnp.float32)
                qf = qf * jax.lax.rsqrt(
                    jnp.maximum(jnp.sum(qf * qf, -1, keepdims=True), 1e-24)
                )
                kf = kf * jax.lax.rsqrt(
                    jnp.maximum(jnp.sum(kf * kf, -1, keepdims=True), 1e-24)
                )
                q, k = qf.astype(q.dtype), kf.astype(k.dtype)
            s = jax.lax.dot_general(q, k, _BATCH_QK, preferred_element_type=jnp.float32)
            s = s * scale_ref[head, 0]
            if variant not in ("no_bias", "dots_only"):
                s = s + bias_ref[head][None]
            if mask is not None:
                s = s + mask
            if variant not in ("no_softmax", "dots_only"):
                if variant != "no_max":
                    s = s - jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s)
                p = e / jnp.sum(e, axis=-1, keepdims=True)
            else:
                p = s
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, _BATCH_AV, preferred_element_type=jnp.float32
            )
            out_ref[:, :, head * hd:(head + 1) * hd] = o.astype(out_ref.dtype)

    return kernel


def run(tokens, C, h, wblk, variant):
    B = 2
    T = B * tokens
    nw = T // WS
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(nw, WS, C), jnp.bfloat16)
    w = jnp.asarray(rng.randn(C, 3 * C) * 0.05, jnp.bfloat16)
    b = jnp.asarray(rng.randn(1, 3 * C) * 0.02, jnp.bfloat16)
    g = jnp.asarray(rng.randint(0, 3, (nw, WS)), jnp.int32)
    gcol = g.reshape(nw, WS, 1)
    grow = g.reshape(nw, 1, WS)
    bias = jnp.asarray(rng.randn(h, WS, WS) * 0.02, jnp.float32)
    ls = jnp.asarray(np.full((h, 1), 8.0), jnp.float32)

    kernel = make_kernel(C=C, h=h, wblk=wblk, variant=variant)

    def fn(x, w):
        return pl.pallas_call(
            kernel,
            grid=(nw // wblk,),
            in_specs=[
                pl.BlockSpec((wblk, WS, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((wblk, 1, WS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((wblk, WS, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, 3 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((h, WS, WS), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((h, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((wblk, WS, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nw, WS, C), jnp.bfloat16),
        )(gcol, grow, x, w, b, bias, ls)

    ms = device_ms(fn, (x, w), iters=20)
    print(json.dumps({"variant": variant, "C": C, "ms": round(ms, 3)}), flush=True)


VARIANTS = ["full", "no_max", "no_softmax", "no_cosnorm", "no_mask", "no_bias",
            "dots_only", "heads_1dot"]

if __name__ == "__main__":
    variants = sys.argv[1:] or VARIANTS
    for v in variants:
        try:
            run(131072, 96, 3, 16, v)
        except Exception as e:
            print(json.dumps({"variant": v, "err": str(e)[:100]}), flush=True)
