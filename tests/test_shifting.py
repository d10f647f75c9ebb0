"""Shift-strategy property tests (heal_swin_tpu/ops/shifting.py).

Includes the reference's embedded self-test expectations for NestGridShift offsets
(reference hp_shifting.py:148-160, 214-223) plus permutation/inverse/mask properties
the reference only asserts at model-build time."""

import numpy as np
import pytest

from heal_swin_tpu.ops import healpix as hpx
from heal_swin_tpu.ops import shifting as sh


def test_nest_grid_offsets_match_reference_self_tests():
    b = sh._NestGridBuilder(nside=64, base_pix=8, window_size=4)
    ws = b.ws
    assert b.base_pix_len > 44
    expected_dir1 = {2: 1, 3: 1, 6: 1, 7: 1, 8: 5, 9: 5, 10: 1, 11: 1, 12: 5, 32: 21}
    for widx, off in expected_dir1.items():
        assert b._offset_dir1(widx * ws) // ws == off
    assert b._offset_dir1(0) // (ws * b.base_pix_len) == 2
    expected_dir2 = {4: 2, 12: 2, 16: 10, 20: 2, 24: 10, 28: 2, 36: 2, 44: 2}
    for widx, off in expected_dir2.items():
        assert b._offset_dir2(widx * ws) == off * ws


@pytest.mark.parametrize("nside,ws", [(8, 4), (16, 16), (32, 64)])
@pytest.mark.parametrize("strategy", ["nest_roll", "nest_grid_shift", "ring_shift"])
def test_perm_and_inverse(nside, ws, strategy):
    npix = 8 * nside * nside
    spec = sh.get_shift_spec(strategy, npix, 8, ws, ws // 2)
    if spec.kind == "perm":
        assert np.array_equal(np.sort(spec.perm), np.arange(npix))
        assert np.array_equal(spec.perm[spec.inv_perm], np.arange(npix))
        assert np.array_equal(spec.inv_perm[spec.perm], np.arange(npix))
    else:
        assert spec.kind == "roll" and spec.roll_amount == ws // 2
    assert spec.win_groups.shape == (npix // ws, ws)
    # shift then shift_back must be identity on data
    x = np.arange(npix)
    if spec.kind == "perm":
        assert np.array_equal(x[spec.perm][spec.inv_perm], x)
    else:
        assert np.array_equal(np.roll(np.roll(x, -spec.roll_amount), spec.roll_amount), x)


def test_nest_roll_groups():
    npix, ws, shift = 8 * 16 * 16, 16, 8
    spec = sh.get_shift_spec("nest_roll", npix, 8, ws, shift)
    g = spec.win_groups.reshape(-1)
    assert np.all(g[: npix - ws] == 0)
    assert np.all(g[npix - ws : npix - shift] == 1)
    assert np.all(g[npix - shift :] == 2)
    bias = spec.attn_bias()
    # only the last window is masked
    assert np.all(bias[:-1] == 0)
    assert bias[-1].min() == sh.MASK_VALUE


def test_ring_shift_semantics():
    """Unmasked positions follow the pure ring-roll source formula; masked positions'
    ring-roll source lies outside the 8-base-pixel domain (reference RingShift)."""
    nside, ws, shift = 16, 16, 8
    npix = 8 * nside * nside
    spec = sh.get_shift_spec("ring_shift", npix, 8, ws, shift)
    nest_in_ring = hpx.nest2ring(nside, np.arange(npix))
    expect = hpx.ring2nest(nside, (nest_in_ring - shift) % hpx.nside2npix(nside))
    unmasked = spec.win_groups.reshape(-1) == 0
    assert np.array_equal(spec.perm[unmasked], expect[unmasked])
    assert np.all(expect[~unmasked] >= npix)
    # refilled sources are exactly the lost pixels (still a permutation of the domain)
    assert np.array_equal(np.sort(spec.perm), np.arange(npix))


def test_get_shift_spec_zero_shift_is_noshift():
    spec = sh.get_shift_spec("ring_shift", 8 * 16 * 16, 8, 16, 0)
    assert spec.kind == "none" and spec.win_groups is None


def test_nest_win_idcs():
    from heal_swin_tpu.ops.windowing import get_nest_win_idcs

    g = get_nest_win_idcs(4)
    assert np.array_equal(g, np.array([[1, 0], [3, 2]]))
    g16 = get_nest_win_idcs(16)
    assert np.array_equal(np.sort(g16.reshape(-1)), np.arange(16))
    # quadrant structure: top-left (in x) quadrant holds ids 0..3 etc.
    assert set(g16[:2, 2:].reshape(-1).tolist()) == {0, 1, 2, 3}
    assert set(g16[:2, :2].reshape(-1).tolist()) == {4, 5, 6, 7}
    assert set(g16[2:, 2:].reshape(-1).tolist()) == {8, 9, 10, 11}
    assert set(g16[2:, :2].reshape(-1).tolist()) == {12, 13, 14, 15}


def test_permute_gather_group_size_and_chunked_equality():
    """The shift-gather table chunking (ops/permute.py): group sizes stay under
    the measured ~76 MiB XLA gather cliff at real model shapes, and the chunked
    gather is bit-equal to the single gather (r4 batch-scaling fix)."""
    import jax
    import jax.numpy as jnp

    from heal_swin_tpu.ops import permute as pm

    spb_s0 = 131072 * 96 * 2  # nside-256 stage-0 bf16 sample: 24 MiB
    assert pm._group_size(2, spb_s0) == 2  # 48 MiB table: single fast gather
    assert pm._group_size(4, spb_s0) == 2  # 96 MiB crosses the cliff -> 2+2
    assert pm._group_size(8, spb_s0) == 3  # 3 groups of 3+3+2 (72/72/48 MiB)
    assert pm._group_size(6, spb_s0) == 3  # 72 MiB is still on the fast side
    assert pm._group_size(5, spb_s0) == 3  # ragged 3+2, not five singles
    spb_s1 = 32768 * 192 * 2  # stage-1 sample: 12 MiB
    assert pm._group_size(8, spb_s1) == 4  # crosses only at batch 8
    assert pm._group_size(1, 200 * 2**20) == 1  # single over-cliff sample: as-is

    # chunked path == reference permutation, values AND vjp (ragged 3+2 groups)
    rng = np.random.default_rng(0)
    B, N, C = 5, 96, 8
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    perm = rng.permutation(N).astype(np.int32)
    inv = np.argsort(perm).astype(np.int32)
    ref = np.asarray(x)[:, perm, :]
    saved_cliff = pm._TABLE_BYTES_FAST
    try:
        pm._TABLE_BYTES_FAST = 3 * N * C * 4  # force 3+2 ragged grouping
        out = pm.permute_tokens(x, jnp.asarray(perm), jnp.asarray(inv))
        g = jax.grad(
            lambda a: jnp.sum(
                jnp.cos(pm.permute_tokens(a, jnp.asarray(perm), jnp.asarray(inv)))
            )
        )(x)
    finally:
        pm._TABLE_BYTES_FAST = saved_cliff
    assert np.array_equal(np.asarray(out), ref)
    g_ref = jax.grad(
        lambda a: jnp.sum(
            jnp.cos(pm.permute_tokens(a, jnp.asarray(perm), jnp.asarray(inv)))
        )
    )(x)
    assert np.array_equal(np.asarray(g), np.asarray(g_ref))
