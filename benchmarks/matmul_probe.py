#!/usr/bin/env python3
"""Raw XLA matmul TF/s at the model's dense shapes (round-trip pairs so the scan
chain stays shape-stable and data-dependent)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 30

# (M, K, N): per iteration c(M,K) @ b1(K,N) -> o; o @ b2(N,K) -> c
SHAPES = [
    (262144, 96, 384),    # stage0 fc1+fc2
    (262144, 96, 288),    # stage0 qkv-ish
    (65536, 192, 768),    # stage1 mlp
    (16384, 384, 1536),   # stage2 mlp
    (4096, 768, 3072),    # stage3 mlp
    (16384, 1024, 1024),  # control square
    (8192, 4096, 4096),   # control large
]


def bench(M, K, N):
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
    b1 = jnp.asarray(rng.randn(K, N) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(rng.randn(N, K) * 0.05, jnp.bfloat16)

    def chain(a, b1, b2):
        def body(c, _):
            o = jax.lax.dot_general(c, b1, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            c2 = jax.lax.dot_general(o.astype(c.dtype), b2, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            return c2.astype(c.dtype), ()

        c, _ = jax.lax.scan(body, a, None, length=ITERS)
        return jnp.sum(c.astype(jnp.float32))

    f = jax.jit(chain)
    float(f(a, b1, b2))
    t0 = time.time()
    float(f(a, b1, b2))
    ms = 1000.0 * (time.time() - t0) / ITERS
    tf = 4.0 * M * K * N / (ms / 1000.0) / 1e12
    # traffic if the intermediate o round-trips HBM (bf16): read c + write o + read o
    # + write c
    gb = (2 * M * K * 2 + 2 * M * N * 2) / 1e9 / (ms / 1000.0)
    return ms, tf, gb


for M, K, N in SHAPES:
    try:
        ms, tf, gb = bench(M, K, N)
        print(json.dumps({"pair": f"({M},{K})<->({K},{N})", "ms": round(ms, 3),
                          "tflops": round(tf, 1), "GBps_if_o_in_hbm": round(gb, 1)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"pair": f"({M},{K})<->({K},{N})", "error": str(e)[:80]}),
              flush=True)
