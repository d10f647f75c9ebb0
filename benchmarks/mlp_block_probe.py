import os, sys
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from benchmarks.prof_util import device_ms
from heal_swin_tpu.ops.mlp import fused_mlp_block, reference_mlp_block

for (C, T) in [(96, 262144), (192, 65536), (384, 16384)]:
    H = 4 * C
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(T, C)), dtype)
    w1 = jnp.asarray(rng.normal(size=(C, H)) * 0.05, dtype)
    b1 = jnp.zeros((H,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(H, C)) * 0.05, dtype)
    b2 = jnp.zeros((C,), jnp.float32)
    gam = jnp.ones((C,), jnp.float32)
    bet = jnp.zeros((C,), jnp.float32)
    ds = jnp.ones((T, 1), jnp.float32)

    def xla_chain(x_, w1_):
        def loss(a, b):
            z = reference_mlp_block(a, b, b1, w2, b2, gam, bet, ds, approximate=True)
            return jnp.sum(z.astype(jnp.float32))
        return jax.grad(loss)(x_, w1_)

    def fused(x_, w1_):
        def loss(a, b):
            z = fused_mlp_block(a, b, b1, w2, b2, gam, bet, ds, approximate=True)
            return jnp.sum(z.astype(jnp.float32))
        return jax.grad(loss)(x_, w1_)

    for name, fn in [("xla  ", xla_chain), ("fused", fused)]:
        try:
            ms = device_ms(fn, (x, w1), iters=20)
            print(f"C={C} T={T} {name}: {ms:.3f} ms")
        except Exception as e:
            print(f"C={C} T={T} {name}: FAILED {str(e)[:90]}")
