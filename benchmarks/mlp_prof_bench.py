#!/usr/bin/env python3
"""Device-time comparison: fused Pallas MLP vs XLA at stage shapes."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from benchmarks.prof_util import device_ms, device_ms_grad
from heal_swin_tpu.ops.mlp import fused_mlp, reference_mlp

B = 2
STAGES = [(131072, 96), (32768, 192), (8192, 384), (2048, 768)]
RBLKS = {96: [512, 1024, 2048], 192: [512, 1024], 384: [256, 512], 768: [128, 256]}

rng = np.random.RandomState(0)
for tokens, C in STAGES:
    T = B * tokens
    H = 4 * C
    ops = (jnp.asarray(rng.randn(T, C), jnp.bfloat16),
           jnp.asarray(rng.randn(C, H) * 0.05, jnp.bfloat16),
           jnp.asarray(rng.randn(H) * 0.1, jnp.float32),
           jnp.asarray(rng.randn(H, C) * 0.05, jnp.bfloat16),
           jnp.asarray(rng.randn(C) * 0.1, jnp.float32))

    def xla_fn(x, w1, b1, w2, b2):
        return reference_mlp(x, w1, b1, w2, b2, approximate=True)

    row = {"T": T, "C": C,
           "xla_fwd": round(device_ms(xla_fn, ops), 3),
           "xla_ffb": round(device_ms_grad(xla_fn, ops), 3)}
    for rblk in RBLKS[C]:
        if T % rblk:
            continue
        try:
            def pfn(x, w1, b1, w2, b2, _r=rblk):
                return fused_mlp(x, w1, b1, w2, b2, approximate=True, rblk=_r)

            row[f"pal{rblk}_fwd"] = round(device_ms(pfn, ops), 3)
            row[f"pal{rblk}_ffb"] = round(device_ms_grad(pfn, ops), 3)
        except Exception as e:
            row[f"pal{rblk}_err"] = str(e)[:60]
    print(json.dumps(row), flush=True)
