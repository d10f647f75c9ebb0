#!/usr/bin/env python3
"""FinalPatchExpand_X4 chain (dense -> reshape -> LN) fwd+bwd: reshape-then-LN
(current) vs grouped-LN-then-collapse vs Pallas grouped-LN kernel (if present)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.prof_util import device_ms
from heal_swin_tpu.models.layers import _ln_fn

B, N, C, P = 2, 131072, 96, 4


def run():
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, P * C)), dtype)  # dense output
    w = jnp.asarray(rng.normal(size=(P * C, P * C)) * 0.05, dtype)
    g = jnp.ones((C,), jnp.float32)
    b = jnp.zeros((C,), jnp.float32)

    def chain_reshape_first(x_, w_):
        def loss(a, ww):
            y = a @ ww  # stand-in for the expand dense
            y = y.reshape(B, N * P, C)
            z = _ln_fn(y, g, b, 1e-5).astype(dtype)
            return jnp.sum(z.astype(jnp.float32))
        return jax.grad(loss)(x_, w_)

    def chain_grouped_ln(x_, w_):
        def loss(a, ww):
            y = a @ ww
            y = y.reshape(B, N, P, C)
            z = _ln_fn(y, g, b, 1e-5).astype(dtype)
            z = z.reshape(B, N * P, C)
            return jnp.sum(z.astype(jnp.float32))
        return jax.grad(loss)(x_, w_)

    for name, fn in [("reshape-then-LN", chain_reshape_first),
                     ("grouped-LN     ", chain_grouped_ln)]:
        ms = device_ms(fn, (x, w), iters=20)
        print(f"{name}: {ms:.3f} ms")


if __name__ == "__main__":
    run()
