#!/usr/bin/env python3
"""Device-time microbench of the fused window-attention kernels at stage shapes.

Usage: python benchmarks/attn_prof_bench.py [stage_indices...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.prof_util import device_ms, device_ms_grad
from heal_swin_tpu.ops.window_attention import fused_window_attention_qkv

B = 2
WS = 64
# (tokens_per_sample, C, heads, wblk) per stage (paper config)
STAGES = [
    (131072, 96, 3, 16),
    (32768, 192, 6, 16),
    (8192, 384, 12, 8),
]

which = [int(a) for a in sys.argv[1:]] or list(range(len(STAGES)))

rng = np.random.RandomState(0)
for si in which:
    tokens, C, h, wblk = STAGES[si]
    T = B * tokens
    nw = T // WS
    x = jnp.asarray(rng.randn(T, C), jnp.bfloat16)
    wqkv = jnp.asarray(rng.randn(C, 3 * C) * 0.05, jnp.bfloat16)
    bqkv = jnp.asarray(rng.randn(3 * C) * 0.02, jnp.bfloat16)
    groups = jnp.asarray(rng.randint(0, 3, (nw, WS)), jnp.int32)
    bias = jnp.asarray(rng.randn(h, WS, WS) * 0.02, jnp.float32)
    ls = jnp.asarray(np.full(h, 8.0), jnp.float32)

    def fn(x, wqkv):
        return fused_window_attention_qkv(
            x, wqkv, bqkv, groups, bias, ls,
            ws=WS, num_heads=h, use_cos=True, sm_scale=0.18, has_mask=True,
            wblk=wblk,
        )

    ops = (x, wqkv)
    row = {
        "stage": si, "T": T, "C": C, "h": h, "wblk": wblk,
        "fwd_ms": round(device_ms(fn, ops), 3),
        "ffb_ms": round(device_ms_grad(fn, ops), 3),
    }
    print(json.dumps(row), flush=True)
