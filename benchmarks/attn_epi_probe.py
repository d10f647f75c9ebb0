#!/usr/bin/env python3
"""VMEM-fit + timing probe for the epilogue-fused attention kernels per stage shape.

Compares, per (C, h, nw): the UNFUSED chain (fused_window_attention_qkv + XLA proj
+ LN, fwd+bwd) vs fused_window_attention_qkv_epi at candidate (fwd_wblk, bwd_wblk).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.prof_util import device_ms
from heal_swin_tpu.ops.window_attention import (
    fused_window_attention_qkv,
    fused_window_attention_qkv_epi,
)

WS = 64


def ln(u, g, b):
    uf = u.astype(jnp.float32)
    mu = jnp.mean(uf, -1, keepdims=True)
    xc = uf - mu
    var = jnp.mean(xc * xc, -1, keepdims=True)
    return (xc * jax.lax.rsqrt(var + 1e-5) * g + b).astype(u.dtype)


def run(C, h, nw, wblk, fwd_wblk, bwd_wblk, epi_candidates):
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

    def unfused(x_, wq_):
        def loss(a, b):
            o = fused_window_attention_qkv(a, b, bq, groups, bias, ls, ws=WS,
                num_heads=h, use_cos=True, sm_scale=0.2, wblk=wblk,
                fwd_wblk=fwd_wblk, bwd_wblk=bwd_wblk)
            z = ln(o @ wp + bp, gam, bet)
            return jnp.sum(z.astype(jnp.float32))
        return jax.grad(loss)(x_, wq_)

    try:
        ms = device_ms(unfused, (x, wq), iters=20)
        print(f"C={C} nw={nw} unfused(chain)      : {ms:.3f} ms")
    except Exception as e:
        print(f"C={C} nw={nw} unfused FAILED {str(e)[:80]}")

    for (fw, bw) in epi_candidates:
        def epi(x_, wq_):
            def loss(a, b):
                z = fused_window_attention_qkv_epi(a, b, bq, wp, bp, gam, bet,
                    groups, bias, ls, ws=WS, num_heads=h, sm_scale=0.2, wblk=wblk,
                    fwd_wblk=fw, bwd_wblk=bw)
                return jnp.sum(z.astype(jnp.float32))
            return jax.grad(loss)(x_, wq_)
        try:
            ms = device_ms(epi, (x, wq), iters=20)
            print(f"C={C} nw={nw} epi fw={fw:2d} bw={bw:2d}   : {ms:.3f} ms")
        except Exception as e:
            print(f"C={C} nw={nw} epi fw={fw} bw={bw} FAILED {str(e)[:80]}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "96"):
        run(96, 3, 4096, 16, 16, 16, [(16, 16), (16, 8)])
    if which in ("all", "192"):
        run(192, 6, 1024, 16, 16, 8, [(16, 8), (16, 4)])
    if which in ("all", "384"):
        run(384, 12, 512, 8, 16, 4, [(16, 4), (8, 2)])
