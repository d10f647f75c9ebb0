"""use_checkpoint (per-block rematerialization, reference swin_hp_transformer.py:539-547
via torch.utils.checkpoint) must not change values or gradients — it only trades
recompute for activation memory (nn.remat in models/swin_hp.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from heal_swin_tpu.data.data_spec import DataSpec
from heal_swin_tpu.models.swin_hp import SwinHPTransformerConfig, SwinHPTransformerSys


def test_use_checkpoint_matches_values_and_grads():
    npix = 8 * 16 * 16
    base = SwinHPTransformerConfig(
        window_size=16, embed_dim=8, depths=[2, 1], num_heads=[2, 2],
        shift_size=4, shift_strategy="ring_shift", drop_path_rate=0.0,
    )
    spec = DataSpec(dim_in=npix, f_in=3, f_out=4, base_pix=8)
    x = jnp.asarray(np.random.RandomState(0).rand(2, npix, 3), jnp.float32)

    models = {
        ck: SwinHPTransformerSys(dataclasses.replace(base, use_checkpoint=ck), spec)
        for ck in (False, True)
    }
    params = models[False].init(jax.random.PRNGKey(0), x, True)

    def loss(m):
        return lambda p: jnp.mean(jnp.square(m.apply(p, x, True)))

    v0, g0 = jax.value_and_grad(loss(models[False]))(params)
    v1, g1 = jax.value_and_grad(loss(models[True]))(params)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
