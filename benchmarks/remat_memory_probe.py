#!/usr/bin/env python3
"""XLA memory analysis for per-block rematerialization at paper scale (r5).

AOT-compiles the EXACT bench.py train step (paper HEAL-SWIN seg config,
nside=256, fused tail, Adam) with ``use_checkpoint`` off/on at batch 2 and 8
and prints the compiler's own memory analysis — the authoritative
activations/workspace budget behind the nside-512 per-shard-batch guidance
(docs/PERFORMANCE.md "remat pricing").  Throughput for the same four cells is
measured by ``BENCH_REMAT=1 BENCH_BATCH=... python bench.py``.

Usage: python benchmarks/remat_memory_probe.py [batch ...] (default: 2 8)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import optax

from heal_swin_tpu.data.data_spec import DataSpec
from heal_swin_tpu.models.swin_hp import SwinHPTransformerConfig
from heal_swin_tpu.models.tasks import (
    WoodscapeSegmenterSwinHP,
    WoodscapeSegmenterSwinHPConfig,
)


def fmt(b):
    return f"{b / 2**30:.2f} GiB" if b >= 2**29 else f"{b / 2**20:.1f} MiB"


def main():
    batches = [int(a) for a in sys.argv[1:]] or [2, 8]
    nside = int(os.environ.get("BENCH_NSIDE", 256))
    npix = 8 * nside * nside
    n_classes = 10
    print(f"backend={jax.default_backend()} nside={nside} npix={npix}", flush=True)

    for batch in batches:
        for remat in (False, True):
            cfg = SwinHPTransformerConfig(
                patch_size=4, window_size=64, shift_size=4,
                shift_strategy="ring_shift", rel_pos_bias="flat", embed_dim=96,
                depths=[2, 2, 6, 2], num_heads=[3, 6, 12, 24], use_cos_attn=True,
                use_v2_norm_placement=True, dtype="bfloat16", gelu_approx=True,
                fused_final_head=True, use_checkpoint=remat,
            )
            spec = DataSpec(dim_in=npix, f_in=3, f_out=n_classes, base_pix=8)
            task = WoodscapeSegmenterSwinHP(
                WoodscapeSegmenterSwinHPConfig(swin_hp_transformer_config=cfg), spec
            )
            tx = optax.adam(9.55e-4)

            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def train_step(params, opt_state, x, y, step_rng, task=task, tx=tx):
                def loss_fn(p):
                    return task.loss_fn(p, x, y, rng=step_rng, deterministic=False)

                (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, loss

            imgs1 = jax.ShapeDtypeStruct((1, npix, 3), jnp.float32)
            params_s = jax.eval_shape(task.init_variables, jax.random.PRNGKey(0), imgs1)
            opt_s = jax.eval_shape(tx.init, params_s)
            lowered = train_step.lower(
                params_s, opt_s,
                jax.ShapeDtypeStruct((batch, npix, 3), jnp.float32),
                jax.ShapeDtypeStruct((batch, npix), jnp.int32),
                jax.ShapeDtypeStruct((2,), jnp.uint32),
            )
            try:
                compiled = lowered.compile()
            except Exception as e:  # noqa: BLE001 — OOM at compile time IS the result
                print(f"batch={batch} remat={remat}: COMPILE FAILED: "
                      f"{type(e).__name__}: {str(e)[:400]}", flush=True)
                continue
            ma = compiled.memory_analysis()
            if ma is None:
                print(f"batch={batch} remat={remat}: memory_analysis unavailable",
                      flush=True)
                continue
            live = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                    - ma.alias_size_in_bytes + ma.temp_size_in_bytes)
            print(f"batch={batch} remat={remat}: temps={fmt(ma.temp_size_in_bytes)} "
                  f"args={fmt(ma.argument_size_in_bytes)} peak_live={fmt(live)}",
                  flush=True)


if __name__ == "__main__":
    main()
