#!/usr/bin/env python3
"""Ablation bench: where does the HEAL-SWIN train step spend its time?

Variants toggle shift strategy (gather vs roll vs none), rel-pos bias, cosine
attention, precision, and remat to locate the bottleneck on the real chip."""

import json
import sys
import time

import jax
import jax.numpy as jnp
import optax

from heal_swin_tpu.data.data_spec import DataSpec
from heal_swin_tpu.models.swin_hp import SwinHPTransformerConfig, SwinHPTransformerSys
from heal_swin_tpu.training.losses import weighted_cross_entropy

NSIDE = int(sys.argv[1]) if len(sys.argv) > 1 else 256
BATCH = 2
STEPS = 10
NPIX = 8 * NSIDE * NSIDE


def run(name, **kw):
    cfg = SwinHPTransformerConfig(
        patch_size=4, window_size=64, shift_size=4, shift_strategy="ring_shift",
        rel_pos_bias="flat", embed_dim=96, depths=[2, 2, 6, 2], num_heads=[3, 6, 12, 24],
        use_cos_attn=True, use_v2_norm_placement=True, dtype="bfloat16",
    )
    for k, v in kw.items():
        object.__setattr__(cfg, k, v) if False else setattr(cfg, k, v)
    spec = DataSpec(dim_in=NPIX, f_in=3, f_out=10, base_pix=8)
    model = SwinHPTransformerSys(cfg, spec)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (BATCH, NPIX, 3), jnp.float32, 0.0, 255.0)
    y = jax.random.randint(rng, (BATCH, NPIX), 0, 10, jnp.int32)
    params = jax.jit(model.init, static_argnums=2)(rng, x, True)
    tx = optax.adam(1e-3)
    opt_state = jax.jit(tx.init)(params)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, x, y):
        def loss_fn(p):
            return weighted_cross_entropy(model.apply(p, x, True), y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, loss = step(params, opt_state, x, y)
    _ = float(loss)
    t0 = time.time()
    for _ in range(STEPS):
        params, opt_state, loss = step(params, opt_state, x, y)
    _ = float(loss)  # axon: block_until_ready does not synchronize; fetch does
    dt = time.time() - t0
    print(json.dumps({"variant": name, "img_per_s": round(BATCH * STEPS / dt, 2),
                      "ms_per_step": round(1000 * dt / STEPS, 1)}), flush=True)


run("baseline_ring_relpos_cos_bf16")
run("nest_roll", shift_strategy="nest_roll")
run("no_shift_mask_overhead", shift_size=0)
run("no_relpos", rel_pos_bias=None)
run("no_cos", use_cos_attn=False)
run("dot_no_extras", rel_pos_bias=None, use_cos_attn=False, shift_strategy="nest_roll")
run("f32", dtype="float32")
run("remat", use_checkpoint=True)
