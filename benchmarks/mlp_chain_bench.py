#!/usr/bin/env python3
"""Microbench: fused Pallas MLP vs XLA dense-GELU-dense at the model's stage shapes.

lax.scan chain (per-call dispatch through the axon tunnel is ~9 ms, single-call
timing is useless); sync by fetching a scalar."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from heal_swin_tpu.ops.mlp import fused_mlp, reference_mlp, pick_rblk

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 30
B = 2
# (tokens_per_sample, C) per stage of the paper config
STAGES = [(131072, 96), (32768, 192), (8192, 384)]


def bench(fn, ops, iters=ITERS):
    def chain(x, *rest):
        def body(c, _):
            o = fn(c, *rest)
            # feed output back (same shape); keeps the chain data-dependent
            return o, ()

        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(c.astype(jnp.float32))

    f = jax.jit(chain)
    v = float(f(*ops))  # compile + warm
    t0 = time.time()
    v = float(f(*ops))
    dt = time.time() - t0
    return 1000.0 * dt / iters, v


def grad_bench(fn, ops, iters=ITERS):
    # remat each body: scan residuals stay O(carry) for both variants (otherwise the
    # XLA variant stores the (T, 4C) hidden per iteration and OOMs HBM).  The timing
    # then includes one extra forward per iteration for BOTH variants — the
    # comparison stays fair; report fwd+fwd+bwd.
    def chain(x, w1, b1, w2, b2):
        @jax.checkpoint
        def body(c, _):
            o = fn(c, w1, b1, w2, b2)
            return o, ()

        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(c.astype(jnp.float32))

    g = jax.jit(jax.grad(chain, argnums=(0, 1)))
    r = g(*ops)
    v = float(jnp.sum(r[1]))
    t0 = time.time()
    r = g(*ops)
    v = float(jnp.sum(r[1]))
    dt = time.time() - t0
    return 1000.0 * dt / iters, v


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.RandomState(0)
    for tokens, C in STAGES:
        T = B * tokens
        H = 4 * C
        dt = jnp.bfloat16
        x = jnp.asarray(rng.randn(T, C), dt)
        w1 = jnp.asarray(rng.randn(C, H) * 0.05, dt)
        b1 = jnp.asarray(rng.randn(H) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.randn(H, C) * 0.05, dt)
        b2 = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
        ops = (x, w1, b1, w2, b2)

        def xla_fn(x, w1, b1, w2, b2):
            return reference_mlp(x, w1, b1, w2, b2, approximate=True)

        def pallas_fn(x, w1, b1, w2, b2):
            return fused_mlp(x, w1, b1, w2, b2, approximate=True)

        ms_x, _ = bench(xla_fn, ops)
        ms_p, _ = bench(pallas_fn, ops)
        gms_x, _ = grad_bench(xla_fn, ops)
        gms_p, _ = grad_bench(pallas_fn, ops)
        print(json.dumps({
            "stage": f"T={T} C={C}", "rblk": pick_rblk(T, C, H),
            "fwd_ms_xla": round(ms_x, 3), "fwd_ms_pallas": round(ms_p, 3),
            "fwdbwd_ms_xla": round(gms_x, 3), "fwdbwd_ms_pallas": round(gms_p, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
