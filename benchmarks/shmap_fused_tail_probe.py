#!/usr/bin/env python3
"""TPU hardware validation of the shard_map train-step path WITH the fused
decoder tail (ops/final_head.py axis_names plumbing).

The multi-chip trainer runs its step under jax.shard_map (training/trainer.py
_build_train_step_shmap); this dev environment has ONE chip, so we run the same
shard-mapped step on a 1-device ('data',) mesh at paper scale and check
loss + gradients against the plain jit path (which uses the identical kernels
without the psum'd num/den).  Also times both paths: the shard_map wrapper must
be overhead-free.

Usage: python benchmarks/shmap_fused_tail_probe.py [nside] [batch] [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from heal_swin_tpu.data.data_spec import DataSpec
from heal_swin_tpu.models.swin_hp import SwinHPTransformerConfig, SwinHPTransformerSys
from heal_swin_tpu.models.tasks import (
    WoodscapeSegmenterSwinHP,
    WoodscapeSegmenterSwinHPConfig,
)

nside = int(sys.argv[1]) if len(sys.argv) > 1 else 256
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2
steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
npix = 8 * nside * nside
n_classes = 10

cfg = SwinHPTransformerConfig(
    patch_size=4, window_size=64, shift_size=4, shift_strategy="ring_shift",
    rel_pos_bias="flat", embed_dim=96, depths=[2, 2, 6, 2],
    num_heads=[3, 6, 12, 24], use_cos_attn=True, use_v2_norm_placement=True,
    dtype="bfloat16", gelu_approx=True, fused_final_head=True,
    drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0,  # deterministic compare
)
spec = DataSpec(dim_in=npix, f_in=3, f_out=n_classes, base_pix=8)
task = WoodscapeSegmenterSwinHP(
    WoodscapeSegmenterSwinHPConfig(swin_hp_transformer_config=cfg), spec
)
assert task._fused_tail_ok(None), "fused tail gate rejected the probe config"

rng = jax.random.PRNGKey(0)
x = jax.random.uniform(rng, (batch, npix, 3), jnp.float32, 0.0, 255.0)
y = jax.random.randint(rng, (batch, npix), 0, n_classes, jnp.int32)
t0 = time.time()
params = jax.jit(task.init_variables)(rng, x[:1])
print(f"init: {time.time()-t0:.1f}s", file=sys.stderr)


def jit_lossgrad(p, x, y):
    (loss, cm), grads = jax.value_and_grad(
        lambda p: task.loss_fn(p, x, y, deterministic=True), has_aux=True
    )(p)
    return loss, cm, grads


mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))


def sh_body(p, x, y):
    (loss, cm), grads = jax.value_and_grad(
        lambda p: task.loss_fn(p, x, y, deterministic=True, axis_names=("data",)),
        has_aux=True,
    )(p)
    return loss, jax.lax.psum(cm, "data"), grads


sh_lossgrad = jax.shard_map(
    sh_body, mesh=mesh, in_specs=(P(), P("data"), P("data")),
    out_specs=(P(), P(), P()), check_vma=True,
)

for name, fn in [("jit", jax.jit(jit_lossgrad)), ("shmap", jax.jit(sh_lossgrad))]:
    t0 = time.time()
    loss, cm, grads = fn(params, x, y)
    loss = float(loss)
    print(f"{name}: compile+run {time.time()-t0:.1f}s loss={loss:.6f}", file=sys.stderr)
    if name == "jit":
        ref = (loss, jax.device_get(cm), jax.device_get(grads))
    else:
        assert abs(loss - ref[0]) < 1e-6 * max(1.0, abs(ref[0])), (loss, ref[0])
        np.testing.assert_array_equal(np.asarray(jax.device_get(cm)), ref[1])
        flat_r, td = jax.tree_util.tree_flatten_with_path(ref[2])
        flat_s = jax.tree_util.tree_leaves(jax.device_get(grads))
        worst = 0.0
        for (path, a), b in zip(flat_r, flat_s):
            d = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
            s = float(np.max(np.abs(np.asarray(a)))) + 1e-9
            worst = max(worst, d / s)
            assert d / s < 5e-4, (jax.tree_util.keystr(path), d, s)
        print(f"gradients match (worst rel {worst:.2e})", file=sys.stderr)

    # timing: chained steps, sync by fetching (block_until_ready lies on axon)
    t0 = time.time()
    for _ in range(steps):
        loss_t, cm, grads = fn(params, x, y)
    _ = float(loss_t)
    dt = (time.time() - t0) / steps
    print(f"{name}: {dt*1e3:.1f} ms/lossgrad ({batch/dt:.2f} img/s equiv)")
