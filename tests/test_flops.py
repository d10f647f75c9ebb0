"""Analytic FLOPs counters validated against XLA's own cost analysis.

The reference's flops() methods (swin_hp_transformer.py:179-190,349-361,957-969) are
encoder-only, unused and bit-rotted; ours cover the full UNet and must land close to
(and below) the compiler's exact count — the difference is the elementwise/softmax work
we deliberately don't count.
"""

import jax
import jax.numpy as jnp
import pytest

from heal_swin_tpu.data.data_spec import DataSpec
from heal_swin_tpu.models import flops as F
from heal_swin_tpu.models.swin_flat import SwinTransformerConfig, SwinTransformerSys
from heal_swin_tpu.models.swin_hp import SwinHPTransformerConfig, SwinHPTransformerSys

pytestmark = pytest.mark.slow  # XLA cost-analysis cross-check compiles, ~1 min (fast tier: run.py test-repo)


def _hp_setup():
    npix = 8 * 32 * 32
    cfg = SwinHPTransformerConfig(
        window_size=16, embed_dim=48, depths=[2, 2], num_heads=[3, 6],
        shift_size=4, shift_strategy="nest_roll", ape=False, patch_size=4,
    )
    spec = DataSpec(dim_in=npix, f_in=3, f_out=5, base_pix=8)
    return cfg, spec, npix


def test_hp_flops_close_to_xla():
    cfg, spec, npix = _hp_setup()
    model = SwinHPTransformerSys(cfg, spec)
    x = jnp.zeros((1, npix, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, True)
    xla = F.xla_flops(lambda p, xx: model.apply(p, xx, True), params, x)
    analytic = F.swin_hp_flops(cfg, spec)["total"]
    assert 0.7 * xla <= analytic <= 1.02 * xla, (analytic, xla)


def test_flat_flops_close_to_xla():
    cfg = SwinTransformerConfig(
        window_size=(4, 8), embed_dim=48, depths=[2, 2], num_heads=[3, 6],
        patch_size=(4, 4),
    )
    spec = DataSpec(dim_in=(64, 128), f_in=3, f_out=5)
    model = SwinTransformerSys(cfg, spec)
    x = jnp.zeros((1, 64, 128, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, True)
    xla = F.xla_flops(lambda p, xx: model.apply(p, xx, True), params, x)
    analytic = F.swin_flat_flops(cfg, spec)["total"]
    assert 0.7 * xla <= analytic <= 1.02 * xla, (analytic, xla)


def test_depth_scaling_is_exactly_per_block():
    """Adding encoder blocks at stage 0 must add exactly depth*block_flops (both in the
    encoder and mirrored in the decoder's layer_up for stage>0 only)."""
    cfg, spec, npix = _hp_setup()
    import dataclasses

    base = F.swin_hp_flops(cfg, spec)
    deeper = F.swin_hp_flops(dataclasses.replace(cfg, depths=[4, 2]), spec)
    n0 = (npix // cfg.patch_size)
    blk = F._block_flops(n0, cfg.embed_dim, cfg.num_heads[0], cfg.window_size, cfg.mlp_ratio)
    # stage 0 appears once in the encoder AND once in the decoder (layer_up at
    # down_idx==0), so both grow by exactly the two added blocks
    assert deeper["encoder"] - base["encoder"] == 2 * blk
    assert deeper["decoder"] - base["decoder"] == 2 * blk


def test_model_flops_dispatch():
    from heal_swin_tpu.models import tasks

    cfg, spec, _ = _hp_setup()
    mc = tasks.WoodscapeSegmenterSwinHPConfig(swin_hp_transformer_config=cfg)
    assert F.model_flops(mc, spec) == F.swin_hp_flops(cfg, spec)

    fcfg = SwinTransformerConfig(window_size=(4, 8), depths=[2, 2], num_heads=[3, 6])
    fspec = DataSpec(dim_in=(64, 128), f_in=3, f_out=5)
    fmc = tasks.WoodscapeSegmenterSwinConfig(swin_transformer_config=fcfg)
    assert F.model_flops(fmc, fspec) == F.swin_flat_flops(fcfg, fspec)
