#!/usr/bin/env python3
"""Sweep fused-MLP rblk at each stage shape (fwd and fwd+bwd chains)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from heal_swin_tpu.ops.mlp import fused_mlp

ITERS = 30
B = 2
STAGES = [(131072, 96), (32768, 192), (8192, 384)]
RBLKS = [512, 1024, 2048, 4096]


def fwd_chain(fn, ops, iters=ITERS):
    def chain(x, *rest):
        def body(c, _):
            return fn(c, *rest), ()

        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(c.astype(jnp.float32))

    f = jax.jit(chain)
    float(f(*ops))
    t0 = time.time()
    float(f(*ops))
    return 1000.0 * (time.time() - t0) / iters


def grad_chain(fn, ops, iters=ITERS):
    def chain(x, w1, b1, w2, b2):
        @jax.checkpoint
        def body(c, _):
            return fn(c, w1, b1, w2, b2), ()

        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(c.astype(jnp.float32))

    g = jax.jit(jax.grad(chain, argnums=(0, 1)))
    float(jnp.sum(g(*ops)[1]))
    t0 = time.time()
    float(jnp.sum(g(*ops)[1]))
    return 1000.0 * (time.time() - t0) / iters


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.RandomState(0)
    for tokens, C in STAGES:
        T = B * tokens
        H = 4 * C
        dt = jnp.bfloat16
        ops = (jnp.asarray(rng.randn(T, C), dt),
               jnp.asarray(rng.randn(C, H) * 0.05, dt),
               jnp.asarray(rng.randn(H) * 0.1, jnp.float32),
               jnp.asarray(rng.randn(H, C) * 0.05, dt),
               jnp.asarray(rng.randn(C) * 0.1, jnp.float32))
        for rblk in RBLKS:
            if T % rblk:
                continue
            try:
                def fn(x, w1, b1, w2, b2, _r=rblk):
                    return fused_mlp(x, w1, b1, w2, b2, approximate=True, rblk=_r)

                ms_f = fwd_chain(fn, ops)
                ms_g = grad_chain(fn, ops)
                print(json.dumps({"T": T, "C": C, "rblk": rblk,
                                  "fwd_ms": round(ms_f, 3),
                                  "fwd2bwd_ms": round(ms_g, 3)}), flush=True)
            except Exception as e:  # VMEM OOM etc.
                print(json.dumps({"T": T, "C": C, "rblk": rblk,
                                  "error": str(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()
