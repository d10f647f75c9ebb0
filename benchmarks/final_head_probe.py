#!/usr/bin/env python3
"""Final region probe: FinalPatchExpand dense -> reshape -> LN -> head dense ->
weighted CE, fwd+bwd at paper scale — XLA chain vs the fused Pallas kernel
(ops/final_head.py, when present).

The region is the tail of UnetDecoder (models/swin_hp.py:399-401) plus the loss
(training/losses.py weighted_cross_entropy).  CAVEAT (docs/PERFORMANCE.md): isolated
probes guide kernel work but only full bench.py numbers decide.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.prof_util import device_ms
from heal_swin_tpu.models.layers import _ln_fn
from heal_swin_tpu.training.losses import weighted_cross_entropy

B, N, C, P, F = 2, 131072, 96, 4, 10


def run():
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, C)), dtype)  # tokens after norm_up
    we = jnp.asarray(rng.normal(size=(C, P * C)) * 0.05, dtype)
    wh = jnp.asarray(rng.normal(size=(C, F)) * 0.05, dtype)
    g = jnp.ones((C,), jnp.float32)
    bta = jnp.zeros((C,), jnp.float32)
    y = jnp.asarray(rng.integers(0, F, size=(B, N * P)), jnp.int32)
    cw = jnp.ones((F,), jnp.float32)

    def xla_region(x_, we_):
        def loss(a, ww, whh, gg, bb):
            h = a @ ww  # (B, N, P*C)
            h = h.reshape(B, N * P, C)
            z = _ln_fn(h, gg, bb, 1e-5).astype(dtype)
            logits = z @ whh
            return weighted_cross_entropy(logits, y, cw)

        dx, dwe, dwh, dg, db = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
            x_, we_, wh, g, bta
        )
        # keep the param grads alive without polluting the carry numerics
        s = (jnp.sum(dwe) + jnp.sum(dwh) + jnp.sum(dg) + jnp.sum(db)).astype(jnp.float32)
        return dx + (jnp.tanh(s) * 1e-20).astype(dx.dtype)

    ms = device_ms(xla_region, (x, we), iters=20)
    print(f"XLA expand+LN+head+CE fwd+bwd: {ms:.3f} ms")

    try:
        from heal_swin_tpu.ops import final_head as fh
    except ImportError:
        print("ops/final_head.py not present; skipping fused variant")
        return

    y2 = y.reshape(B * N, P)  # out row t*P+i <-> (token t, slice i)
    welem = jnp.ones((B * N, P), jnp.float32)  # uniform class weights

    def fused_region(x_, we_):
        def loss(a, ww, whh, gg, bb):
            l, _ = fh.fused_final_head(
                a.reshape(B * N, C), ww, gg, bb, whh, y2, welem, patch_size=P,
            )
            return l

        dx, dwe, dwh, dg, db = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
            x_, we_, wh, g, bta
        )
        s = (jnp.sum(dwe) + jnp.sum(dwh) + jnp.sum(dg) + jnp.sum(db)).astype(jnp.float32)
        return dx + (jnp.tanh(s) * 1e-20).astype(dx.dtype)

    import os

    rblks = [int(r) for r in os.environ.get("FH_RBLKS", "2048").split(",")]
    for rblk in rblks:
        def fused_r(x_, we_, rblk=rblk):
            def loss(a, ww, whh, gg, bb):
                l, _ = fh.fused_final_head(
                    a.reshape(B * N, C), ww, gg, bb, whh, y2, welem, patch_size=P,
                    rblk=rblk,
                )
                return l

            dx, dwe, dwh, dg, db = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
                x_, we_, wh, g, bta
            )
            s = (jnp.sum(dwe) + jnp.sum(dwh) + jnp.sum(dg) + jnp.sum(db)).astype(
                jnp.float32)
            return dx + (jnp.tanh(s) * 1e-20).astype(dx.dtype)

        try:
            ms = device_ms(fused_r, (x, we), iters=20)
            print(f"Pallas fused rblk={rblk}: {ms:.3f} ms")
        except Exception as e:
            print(f"Pallas fused rblk={rblk}: FAILED {type(e).__name__}")


if __name__ == "__main__":
    run()
