"""Numerical parity of the JAX models against the torch reference (weight copy).

Runs the actual reference code from /root/reference (with stub timm/healpy) as an
oracle, copies its randomly-initialized weights into the flax models, and compares
forward outputs in eval mode.  This pins every architectural detail: window order,
shift permutations, mask values, rel-pos indexing, norm placement, GELU flavor.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.reference_oracle import (
    copy_torch_weights,
    install_stubs_and_reference,
    _map_flat_path,
    _map_hp_path,
)

install_stubs_and_reference()

from heal_swin.models_torch import hp_shifting as ref_hp_shifting  # noqa: E402
from heal_swin.models_torch.swin_hp_transformer import (  # noqa: E402
    SwinHPTransformerConfig as RefHPConfig,
    SwinHPTransformerSys as RefHPSys,
)
from heal_swin.models_torch.swin_transformer import (  # noqa: E402
    SwinTransformerConfig as RefFlatConfig,
    SwinTransformerSys as RefFlatSys,
)
from heal_swin.data.segmentation.data_spec import DataSpec as RefDataSpec  # noqa: E402

from heal_swin_tpu.data.data_spec import DataSpec  # noqa: E402
from heal_swin_tpu.models.swin_hp import SwinHPTransformerConfig, SwinHPTransformerSys  # noqa: E402
from heal_swin_tpu.models.swin_flat import SwinTransformerConfig, SwinTransformerSys  # noqa: E402
from heal_swin_tpu.ops import shifting as sh  # noqa: E402

pytestmark = pytest.mark.slow  # torch-oracle forward parity at near-paper widths, ~3 min (fast tier: run.py test-repo)

NPIX = 8 * 16 * 16  # nside=16


def _hp_pair(**kw):
    defaults = dict(
        patch_size=4, window_size=16, shift_size=8, embed_dim=8,
        depths=[2, 2], num_heads=[2, 4], drop_path_rate=0.0, drop_rate=0.0,
    )
    defaults.update(kw)
    jcfg = SwinHPTransformerConfig(**defaults)
    rcfg = RefHPConfig(**defaults)
    jspec = DataSpec(dim_in=NPIX, f_in=3, f_out=5, base_pix=8)
    rspec = RefDataSpec(dim_in=NPIX, f_in=3, f_out=5, base_pix=8, class_names=[])
    return jcfg, rcfg, jspec, rspec


def _compare_hp(jcfg, rcfg, jspec, rspec, atol=2e-4):
    torch.manual_seed(0)
    ref = RefHPSys(rcfg, rspec).eval()
    model = SwinHPTransformerSys(jcfg, jspec)

    x = np.random.default_rng(0).normal(size=(2, NPIX, 3)).astype(np.float32)
    params = jax.jit(model.init, static_argnums=2)(jax.random.PRNGKey(0), jnp.asarray(x), True)

    n_ref = sum(p.numel() for p in ref.parameters())
    n_jax = sum(p.size for p in jax.tree.leaves(params))
    assert n_ref == n_jax, f"param count mismatch: torch {n_ref} vs jax {n_jax}"

    params = copy_torch_weights(ref, params, _map_hp_path)
    y_jax = np.asarray(jax.jit(model.apply, static_argnums=2)(params, jnp.asarray(x), True))

    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)

    np.testing.assert_allclose(y_jax, y_ref, atol=atol, rtol=1e-3)


@pytest.mark.parametrize("strategy", ["nest_roll", "nest_grid_shift", "ring_shift"])
def test_hp_forward_parity(strategy):
    _compare_hp(*_hp_pair(shift_strategy=strategy))


def test_hp_forward_parity_v2_cos_relpos():
    _compare_hp(
        *_hp_pair(
            shift_strategy="ring_shift",
            rel_pos_bias="flat",
            use_cos_attn=True,
            use_v2_norm_placement=True,
            window_size=16,
            shift_size=4,
        )
    )


def test_hp_forward_parity_ape_patchnorm():
    jcfg, rcfg, jspec, rspec = _hp_pair(ape=True)
    # reference takes an instantiated norm layer over embed_dim
    import torch.nn as tnn

    rcfg.patch_embed_norm_layer = tnn.LayerNorm(rcfg.embed_dim)
    jcfg.patch_embed_norm_layer = "LayerNorm"
    _compare_hp(jcfg, rcfg, jspec, rspec)


def test_hp_shift_perms_match_reference():
    """NestGridShift / RingShift permutations + masks equal the reference classes."""
    for nside, ws in [(8, 4), (16, 16)]:
        npix = 8 * nside * nside
        ref = ref_hp_shifting.NestGridShift(nside=nside, base_pix=8, window_size=ws)
        spec = sh.nest_grid_shift(nside, 8, ws)
        np.testing.assert_array_equal(spec.perm, ref.shift_idcs.numpy())
        np.testing.assert_array_equal(spec.inv_perm, ref.back_shift_idcs.numpy())
        ref_mask = ref.get_mask(get_attn_mask=False).numpy()
        np.testing.assert_array_equal(spec.win_groups.reshape(-1), ref_mask.astype(np.int32))
        ref_attn = ref.get_mask(get_attn_mask=True).numpy()
        np.testing.assert_array_equal(spec.attn_bias(), ref_attn)

        ref_r = ref_hp_shifting.RingShift(nside=nside, base_pix=8, window_size=ws, shift_size=ws // 2)
        spec_r = sh.ring_shift(nside, 8, ws, ws // 2)
        np.testing.assert_array_equal(spec_r.perm, ref_r.shift_idcs.numpy())
        ref_mask_r = ref_r.get_mask(get_attn_mask=False).numpy()
        np.testing.assert_array_equal(spec_r.win_groups.reshape(-1), ref_mask_r.astype(np.int32))

        ref_roll = ref_hp_shifting.NestRollShift(
            shift_size=ws // 2, input_resolution=npix, window_size=ws
        )
        spec_roll = sh.nest_roll_shift(npix, ws, ws // 2)
        np.testing.assert_array_equal(spec_roll.attn_bias(), ref_roll.get_mask().numpy())


def test_flat_forward_parity():
    H, W = 64, 96
    kw = dict(
        patch_size=(4, 4), window_size=(4, 4), embed_dim=8, depths=[2, 2],
        num_heads=[2, 4], drop_path_rate=0.0,
    )
    jcfg = SwinTransformerConfig(**kw)
    rcfg = RefFlatConfig(**kw)
    jspec = DataSpec(dim_in=(H, W), f_in=3, f_out=5)
    rspec = RefDataSpec(dim_in=(H, W), f_in=3, f_out=5, base_pix=None, class_names=[])

    torch.manual_seed(0)
    ref = RefFlatSys(rcfg, rspec).eval()
    model = SwinTransformerSys(jcfg, jspec)

    x = np.random.default_rng(0).normal(size=(2, H, W, 3)).astype(np.float32)
    params = jax.jit(model.init, static_argnums=2)(jax.random.PRNGKey(0), jnp.asarray(x), True)

    n_ref = sum(p.numel() for p in ref.parameters())
    n_jax = sum(p.size for p in jax.tree.leaves(params))
    assert n_ref == n_jax, f"param count mismatch: torch {n_ref} vs jax {n_jax}"

    params = copy_torch_weights(ref, params, _map_flat_path)
    y_jax = np.asarray(jax.jit(model.apply, static_argnums=2)(params, jnp.asarray(x), True))
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(y_jax, y_ref, atol=2e-4, rtol=1e-3)


def test_flat_forward_parity_v2_cos():
    H, W = 32, 32
    kw = dict(
        patch_size=(4, 4), window_size=(2, 2), embed_dim=8, depths=[2, 2],
        num_heads=[2, 4], drop_path_rate=0.0, use_cos_attn=True,
        use_v2_norm_placement=True, ape=True,
    )
    jcfg = SwinTransformerConfig(**kw)
    rcfg = RefFlatConfig(**kw)
    jspec = DataSpec(dim_in=(H, W), f_in=3, f_out=5)
    rspec = RefDataSpec(dim_in=(H, W), f_in=3, f_out=5, base_pix=None, class_names=[])

    torch.manual_seed(0)
    ref = RefFlatSys(rcfg, rspec).eval()
    model = SwinTransformerSys(jcfg, jspec)
    x = np.random.default_rng(0).normal(size=(1, H, W, 3)).astype(np.float32)
    params = jax.jit(model.init, static_argnums=2)(jax.random.PRNGKey(0), jnp.asarray(x), True)
    params = copy_torch_weights(ref, params, _map_flat_path)
    y_jax = np.asarray(jax.jit(model.apply, static_argnums=2)(params, jnp.asarray(x), True))
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(y_jax, y_ref, atol=2e-4, rtol=1e-3)
