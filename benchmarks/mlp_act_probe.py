#!/usr/bin/env python3
"""Probe: is the fused MLP transcendental-bound?  Compare activation flavors."""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 30
T, C = 262144, 96
H = 4 * C
RBLK = 1024


def act(h, kind):
    if kind == "id":
        return h
    if kind == "relu":
        return jnp.maximum(h, 0.0)
    if kind == "tanh_gelu":
        u = 0.7978845608 * (h + 0.044715 * h * h * h)
        return 0.5 * h * (1.0 + jnp.tanh(u))
    if kind == "pade_gelu":
        u = 0.7978845608 * (h + 0.044715 * h * h * h)
        u = jnp.clip(u, -4.0, 4.0)
        u2 = u * u
        t = u * (27.0 + u2) / (27.0 + 9.0 * u2)
        return 0.5 * h * (1.0 + t)
    if kind == "sigmoid_gelu":
        return h * jax.nn.sigmoid(1.702 * h)
    if kind == "erf_gelu":
        return 0.5 * h * (1.0 + jax.lax.erf(h * 0.70710678))
    if kind == "tanh_gelu_bf16":
        hb = h.astype(jnp.bfloat16)
        u = 0.7978845608 * (hb + 0.044715 * hb * hb * hb)
        return (0.5 * hb * (1.0 + jnp.tanh(u))).astype(jnp.float32)
    raise ValueError(kind)


def kern(x_ref, w1_ref, w2_ref, out_ref, *, kind):
    h = jax.lax.dot_general(x_ref[...], w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    g = act(h, kind).astype(x_ref.dtype)
    o = jax.lax.dot_general(g, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    out_ref[...] = o.astype(out_ref.dtype)


def make(kind):
    def f(x, w1, w2):
        return pl.pallas_call(
            functools.partial(kern, kind=kind),
            grid=(T // RBLK,),
            in_specs=[
                pl.BlockSpec((RBLK, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((H, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((RBLK, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, C), x.dtype),
        )(x, w1, w2)
    return f


def bench(fn, ops):
    def chain(x, *rest):
        def body(c, _):
            return fn(c, *rest), ()
        c, _ = jax.lax.scan(body, x, None, length=ITERS)
        return jnp.sum(c.astype(jnp.float32))
    f = jax.jit(chain)
    float(f(*ops))
    t0 = time.time()
    float(f(*ops))
    return 1000.0 * (time.time() - t0) / ITERS


rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(T, C), jnp.bfloat16)
w1 = jnp.asarray(rng.randn(C, H) * 0.05, jnp.bfloat16)
w2 = jnp.asarray(rng.randn(H, C) * 0.05, jnp.bfloat16)

for kind in ["id", "relu", "tanh_gelu", "pade_gelu", "sigmoid_gelu", "erf_gelu",
             "tanh_gelu_bf16"]:
    try:
        ms = bench(make(kind), (x, w1, w2))
        print(json.dumps({"act": kind, "fwd_ms": round(ms, 3)}), flush=True)
    except Exception as e:
        print(json.dumps({"act": kind, "error": str(e)[:100]}), flush=True)
