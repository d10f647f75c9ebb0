#!/usr/bin/env python3
"""Price the optimizer tail (VERDICT r2 item 6 'probe fusing the optimizer update').

The train step's elementwise bucket (~10 ms/step) includes the Adam moment
updates + param apply over the 41M-param tree (f32 p/m/v + grads: ~7 passes x
165 MB = ~1.2 GB of HBM traffic, ~3.3 ms at the 352 GB/s stream ceiling) plus
the global-norm clip's extra grad read.  This probe measures the update in
isolation on the real parameter shapes via the trace's device_duration_ps
(wall-clock chains are useless at this size, prof_util docstring):

  * adam:        optax.adam update + apply_updates
  * adam+clip:   optax.chain(clip_by_global_norm, adam) — the production shape
  * sgd:         optax.sgd (the floor: one grad pass + one param write)

If (adam+clip) - sgd is small, a fused Pallas update has no room and the item
closes as a measured rejection.

Usage: python benchmarks/opt_update_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from heal_swin_tpu.data.data_spec import DataSpec
from heal_swin_tpu.models.swin_hp import SwinHPTransformerConfig, SwinHPTransformerSys

NSIDE, BATCH = 256, 2
NPIX = 8 * NSIDE * NSIDE

cfg = SwinHPTransformerConfig(
    patch_size=4, window_size=64, shift_size=4, shift_strategy="ring_shift",
    rel_pos_bias="flat", embed_dim=96, depths=[2, 2, 6, 2], num_heads=[3, 6, 12, 24],
    use_cos_attn=True, use_v2_norm_placement=True, dtype="bfloat16", gelu_approx=True,
)
spec = DataSpec(dim_in=NPIX, f_in=3, f_out=10, base_pix=8)
model = SwinHPTransformerSys(cfg, spec)
rng = jax.random.PRNGKey(0)
x = jax.random.uniform(rng, (2, NPIX, 3), jnp.float32, 0.0, 255.0)
params = jax.jit(model.init, static_argnums=2)(rng, x, True)
n_params = sum(p.size for p in jax.tree.leaves(params))
print(f"params: {n_params:,}", file=sys.stderr)


def probe(name, tx, iters=50):
    """Scan the update with (params, opt_state) as the loop carry — every HBM
    write the real train step performs stays live (no DCE of m/v/param stores);
    grads derive from the carried params so iterations can't be CSE'd.
    Wall-clock over the scan chain (the CLAUDE.md microbench pattern — the
    remote profiler reports fully-fused scan bodies only under the excluded
    `while` event, so device_duration parsing under-counts here)."""
    import time

    opt_state = jax.jit(tx.init)(params)

    def chain(p0, s0):
        def body(carry, _):
            p, s = carry
            g = jax.tree.map(lambda q: q * 1e-3 + 1e-5, p)
            updates, s2 = tx.update(g, s, p)
            return (optax.apply_updates(p, updates), s2), ()

        (p, s), _ = jax.lax.scan(body, (p0, s0), None, length=iters)
        return jnp.sum(jax.tree.leaves(p)[0].astype(jnp.float32))

    f = jax.jit(chain)
    float(f(params, opt_state))  # compile + warm
    t0 = time.time()
    float(f(params, opt_state))  # sync by fetching the value
    ms = (time.time() - t0) * 1e3 / iters
    # the grad synthesis (one read+write pass over params) is shared by all
    # variants; subtract nothing — compare variants against each other
    print(f"{name:12s}: {ms:7.3f} ms/update (incl. shared grad synthesis)")
    return ms


def scale_by_adam_clipped(max_norm, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0):
    """Measurement artifact: clip+decay+adam as ONE tree pass, to test whether
    optax.chain's materialized scaled-grad tree costs anything.  VERDICT: it
    does NOT — measured identical to the chain (XLA fuses the scale pass into
    the adam pass already; the clip's 1.8 ms is the global-norm reduce pass +
    its barrier).  Kept here, out of the production optimizer factory."""

    def init(params):
        return optax.scale_by_adam(b1=b1, b2=b2, eps=eps).init(params)

    def update(updates, state, params=None):
        g_norm = optax.global_norm(updates)
        trigger = jnp.squeeze(g_norm < max_norm)
        count_inc = optax.safe_increment(state.count)
        bc1 = 1 - jnp.asarray(b1, jnp.float32) ** count_inc
        bc2 = 1 - jnp.asarray(b2, jnp.float32) ** count_inc

        def leaf(g, p, mu, nu):
            gs = jax.lax.select(trigger, g, (g / g_norm.astype(g.dtype)) * max_norm)
            if weight_decay:
                gs = gs + weight_decay * p
            mu2 = (1 - b1) * gs + b1 * mu
            nu2 = (1 - b2) * (gs**2) + b2 * nu
            upd = (mu2 / bc1.astype(mu2.dtype)) / (
                jnp.sqrt(nu2 / bc2.astype(nu2.dtype)) + eps
            )
            return upd, mu2, nu2

        flat_g, treedef = jax.tree.flatten(updates)
        flat_p = (
            treedef.flatten_up_to(params) if params is not None else [None] * len(flat_g)
        )
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        out = [leaf(g, p, m, v) for g, p, m, v in zip(flat_g, flat_p, flat_mu, flat_nu)]
        from optax._src.transform import ScaleByAdamState

        return (
            treedef.unflatten([o[0] for o in out]),
            ScaleByAdamState(
                count=count_inc,
                mu=treedef.unflatten([o[1] for o in out]),
                nu=treedef.unflatten([o[2] for o in out]),
            ),
        )

    return optax.GradientTransformation(init, update)


if __name__ == "__main__":
    sgd = probe("sgd", optax.sgd(1e-3))
    adam = probe("adam", optax.adam(9.55e-4))
    adam_clip = probe(
        "adam+clip",
        optax.chain(optax.clip_by_global_norm(1.0), optax.adam(9.55e-4)),
    )
    fused = probe(
        "fused-clip",
        optax.chain(
            scale_by_adam_clipped(1.0), optax.scale_by_learning_rate(9.55e-4)
        ),
    )
    print(
        f"adam-over-sgd: {adam - sgd:.3f} ms; chained clip adds "
        f"{adam_clip - adam:.3f} ms; fused clip adds {fused - adam:.3f} ms "
        f"(fused saves {adam_clip - fused:.3f} ms/step)"
    )
