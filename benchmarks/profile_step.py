#!/usr/bin/env python3
"""Profile the paper-scale train step; print per-category and top-op device times."""

import glob
import gzip
import json
import os
import shutil
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from heal_swin_tpu.data.data_spec import DataSpec
from heal_swin_tpu.models.swin_hp import SwinHPTransformerConfig, SwinHPTransformerSys
from heal_swin_tpu.training.losses import weighted_cross_entropy

NSIDE = int(os.environ.get("PROF_NSIDE", 256))
BATCH = int(os.environ.get("PROF_BATCH", 2))
NPIX = 8 * NSIDE * NSIDE

cfg = SwinHPTransformerConfig(
    patch_size=4, window_size=64, shift_size=4, shift_strategy="ring_shift",
    rel_pos_bias="flat", embed_dim=96, depths=[2, 2, 6, 2], num_heads=[3, 6, 12, 24],
    use_cos_attn=True, use_v2_norm_placement=True, dtype="bfloat16", gelu_approx=True,
)
spec = DataSpec(dim_in=NPIX, f_in=3, f_out=10, base_pix=8)
model = SwinHPTransformerSys(cfg, spec)
rng = jax.random.PRNGKey(0)
x = jax.random.uniform(rng, (BATCH, NPIX, 3), jnp.float32, 0.0, 255.0)
y = jax.random.randint(rng, (BATCH, NPIX), 0, 10, jnp.int32)
params = jax.jit(model.init, static_argnums=2)(rng, x, True)
tx = optax.adam(9.55e-4)
opt_state = jax.jit(tx.init)(params)

# PROF_TASK=1: profile the production fused-tail task path instead of the plain
# weighted-CE tail (the headline bench's shape)
task = None
if os.environ.get("PROF_TASK"):
    from heal_swin_tpu.models.tasks import (
        WoodscapeSegmenterSwinHP, WoodscapeSegmenterSwinHPConfig,
    )

    cfg.fused_final_head = True
    task = WoodscapeSegmenterSwinHP(
        WoodscapeSegmenterSwinHPConfig(swin_hp_transformer_config=cfg), spec
    )
    task.model = model
    assert task._fused_tail_ok(None)

import functools


@functools.partial(jax.jit, donate_argnums=(0, 1))
def step(params, opt_state, x, y, srng):
    def loss_fn(p):
        if task is not None:
            return task.loss_fn(p, x, y, rng=srng, deterministic=False)[0]
        return weighted_cross_entropy(
            model.apply(p, x, False, rngs={"dropout": srng}), y
        )

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


srng = jax.random.PRNGKey(2)
params, opt_state, loss = step(params, opt_state, x, y, srng)
print("warm loss", float(loss), file=sys.stderr)

N_PROF = 3
shutil.rmtree("/tmp/stepprof", ignore_errors=True)
with jax.profiler.trace("/tmp/stepprof"):
    for _ in range(N_PROF):
        params, opt_state, loss = step(params, opt_state, x, y, srng)
    _ = float(loss)

cat_ms = defaultdict(float)
op_ms = defaultdict(float)
for t in glob.glob("/tmp/stepprof/**/*.trace.json.gz", recursive=True):
    with gzip.open(t, "rt") as fh:
        data = json.load(fh)
    for ev in data.get("traceEvents", []):
        args = ev.get("args") or {}
        cat = args.get("hlo_category", "?")
        if "device_duration_ps" not in args or cat == "?":
            continue
        if cat in ("while", "copy-start"):
            continue
        ms = float(args["device_duration_ps"]) / 1e9 / N_PROF
        cat_ms[cat] += ms
        op_ms[ev.get("name", "?")] += ms

print("== categories (ms/step) ==")
for cat, ms in sorted(cat_ms.items(), key=lambda kv: -kv[1]):
    print(f"{ms:8.2f}  {cat}")
print(f"{sum(cat_ms.values()):8.2f}  TOTAL")
print("== top ops ==")
for name, ms in sorted(op_ms.items(), key=lambda kv: -kv[1])[:30]:
    print(f"{ms:8.3f}  {name[:90]}")
