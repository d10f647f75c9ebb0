"""Fused window-attention kernel: numerical equivalence with the jnp reference in
interpret mode (CPU), forward and gradients, across attention flavors and block sizes;
plus model-level equivalence of the two attention implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heal_swin_tpu.ops.window_attention import (
    fused_window_attention,
    reference_window_attention,
)


@pytest.mark.parametrize("wblk", [2, 4])
@pytest.mark.parametrize("use_cos", [False, True])
@pytest.mark.parametrize("has_bias", [False, True])
def test_kernel_matches_reference(wblk, use_cos, has_bias):
    rng = np.random.default_rng(0)
    ws, h, C, nw = 16, 4, 32, 16
    T = nw * ws
    qkv = jnp.asarray(rng.normal(size=(T, 3 * C)).astype(np.float32))
    groups = jnp.asarray(rng.integers(0, 3, (nw, ws)).astype(np.int32))
    bias = jnp.asarray(rng.normal(size=(h, ws, ws)).astype(np.float32))
    ls = jnp.asarray(np.exp(rng.normal(size=h) * 0.3).astype(np.float32))

    out_k = fused_window_attention(
        qkv, groups, bias if has_bias else None, ls if use_cos else None,
        ws=ws, num_heads=h, use_cos=use_cos, sm_scale=0.35, interpret=True, wblk=wblk,
    )
    out_r = reference_window_attention(
        qkv, groups, bias if has_bias else jnp.zeros((h, ws, ws)), ls,
        ws=ws, num_heads=h, use_cos=use_cos, sm_scale=0.35,
    )
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r), atol=2e-5)


def test_kernel_gradients_match_reference():
    rng = np.random.default_rng(1)
    ws, h, C, nw = 16, 2, 16, 8
    T = nw * ws
    qkv = jnp.asarray(rng.normal(size=(T, 3 * C)).astype(np.float32))
    groups = jnp.asarray(rng.integers(0, 2, (nw, ws)).astype(np.int32))
    bias = jnp.asarray(rng.normal(size=(h, ws, ws)).astype(np.float32))
    ls = jnp.asarray(np.exp(rng.normal(size=h) * 0.3).astype(np.float32))

    def loss_k(qkv, bias, ls):
        o = fused_window_attention(qkv, groups, bias, ls, ws=ws, num_heads=h,
                                   use_cos=True, sm_scale=0.25, interpret=True, wblk=2)
        return jnp.sum(jnp.square(o))

    def loss_r(qkv, bias, ls):
        o = reference_window_attention(qkv, groups, bias, ls, ws=ws, num_heads=h,
                                       use_cos=True, sm_scale=0.25)
        return jnp.sum(jnp.square(o))

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(qkv, bias, ls)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(qkv, bias, ls)
    for a, b, name in zip(gk, gr, ["dqkv", "dbias", "dlogit_scale"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, err_msg=name)


def test_model_attention_impl_equivalence():
    """swin_hp forward with attention_impl='xla' on CPU equals the reference
    implementation path used by the kernel's backward (they share the math)."""
    from heal_swin_tpu.data.data_spec import DataSpec
    from heal_swin_tpu.models.swin_hp import SwinHPTransformerConfig, SwinHPTransformerSys

    cfg = SwinHPTransformerConfig(
        patch_size=4, window_size=16, shift_size=8, shift_strategy="ring_shift",
        rel_pos_bias="flat", embed_dim=8, depths=[2, 1], num_heads=[2, 2],
        use_cos_attn=True, use_v2_norm_placement=True, attention_impl="xla",
    )
    spec = DataSpec(dim_in=8 * 16 * 16, f_in=3, f_out=4, base_pix=8)
    model = SwinHPTransformerSys(cfg, spec)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, spec.dim_in, 3)), jnp.float32)
    params = jax.jit(model.init, static_argnums=2)(jax.random.PRNGKey(0), x, True)
    y = jax.jit(model.apply, static_argnums=2)(params, x, True)
    assert np.isfinite(np.asarray(y)).all()

    # explicit pallas on CPU must raise a clear error
    import dataclasses

    cfg_p = dataclasses.replace(cfg, attention_impl="pallas")
    model_p = SwinHPTransformerSys(cfg_p, spec)
    if jax.default_backend() != "tpu":
        with pytest.raises(ValueError, match="attention_impl='pallas' unsupported"):
            jax.jit(model_p.apply, static_argnums=2)(params, x, True)


@pytest.mark.parametrize("use_cos,qkv_bias", [(True, True), (False, False)])
def test_fused_qkv_matches_oracle(use_cos, qkv_bias):
    """fused_window_attention_qkv (qkv projection inside the kernel) vs the jnp
    oracle on x @ Wqkv + b: forward and every gradient."""
    from heal_swin_tpu.ops.window_attention import fused_window_attention_qkv

    ws, h, C, nw = 16, 2, 32, 16
    T = nw * ws
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(T, C)).astype(np.float32))
    wq = jnp.asarray((rng.normal(size=(C, 3 * C)) * 0.1).astype(np.float32))
    bq = jnp.asarray((rng.normal(size=(3 * C,)) * 0.1).astype(np.float32)) if qkv_bias else None
    groups = jnp.asarray(rng.integers(0, 3, (nw, ws)).astype(np.int32))
    bias = jnp.asarray(rng.normal(size=(h, ws, ws)).astype(np.float32))
    ls = jnp.asarray(np.exp(rng.normal(size=h)).astype(np.float32))

    def ref(x, wq, bias, ls):
        qkv = x @ wq + (bq if bq is not None else 0.0)
        return reference_window_attention(qkv, groups, bias, ls, ws=ws, num_heads=h,
                                          use_cos=use_cos, sm_scale=0.18)

    def fused(x, wq, bias, ls):
        return fused_window_attention_qkv(x, wq, bq, groups, bias, ls, ws=ws,
                                          num_heads=h, use_cos=use_cos, sm_scale=0.18,
                                          wblk=4, interpret=True)

    o1, o2 = ref(x, wq, bias, ls), fused(x, wq, bias, ls)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=2e-5, atol=2e-5)

    loss = lambda f: (lambda *a: jnp.sum(jnp.sin(f(*a))))
    g1 = jax.grad(loss(ref), argnums=(0, 1, 2, 3))(x, wq, bias, ls)
    g2 = jax.grad(loss(fused), argnums=(0, 1, 2, 3))(x, wq, bias, ls)
    for a, b in zip(g1, g2):
        scale = float(jnp.max(jnp.abs(a))) + 1e-12
        np.testing.assert_allclose(np.asarray(a) / scale, np.asarray(b) / scale,
                                   atol=3e-6)


@pytest.mark.parametrize("has_ln", [True, False])
def test_fused_qkv_epilogue_matches_oracle(has_ln):
    """fused_window_attention_qkv_epi (qkv proj + cos attention + out proj
    [+ LayerNorm]) vs the jnp oracle: forward and every gradient."""
    from heal_swin_tpu.ops.window_attention import fused_window_attention_qkv_epi

    ws, h, C, nw = 16, 2, 32, 16
    T = nw * ws
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(T, C)).astype(np.float32))
    wq = jnp.asarray((rng.normal(size=(C, 3 * C)) * 0.1).astype(np.float32))
    bq = jnp.asarray((rng.normal(size=(3 * C,)) * 0.1).astype(np.float32))
    wp = jnp.asarray((rng.normal(size=(C, C)) * 0.2).astype(np.float32))
    bp = jnp.asarray((rng.normal(size=(C,)) * 0.1).astype(np.float32))
    gam = jnp.asarray((1.0 + 0.3 * rng.normal(size=C)).astype(np.float32))
    bet = jnp.asarray((0.2 * rng.normal(size=C)).astype(np.float32))
    groups = jnp.asarray(rng.integers(0, 3, (nw, ws)).astype(np.int32))
    bias = jnp.asarray(rng.normal(size=(h, ws, ws)).astype(np.float32))
    ls = jnp.asarray(np.exp(rng.normal(size=h)).astype(np.float32))

    def ln(u, g, b):
        mu = jnp.mean(u, -1, keepdims=True)
        xc = u - mu
        var = jnp.mean(xc * xc, -1, keepdims=True)
        return xc * jax.lax.rsqrt(var + 1e-5) * g + b

    def ref(x, wq, wp, gam, bet, bias, ls):
        qkv = x @ wq + bq
        o = reference_window_attention(qkv, groups, bias, ls, ws=ws, num_heads=h,
                                       use_cos=True, sm_scale=0.18)
        u = o @ wp + bp
        return ln(u, gam, bet) if has_ln else u

    def fused(x, wq, wp, gam, bet, bias, ls):
        return fused_window_attention_qkv_epi(
            x, wq, bq, wp, bp, gam if has_ln else None, bet if has_ln else None,
            groups, bias, ls, ws=ws, num_heads=h, sm_scale=0.18, wblk=4,
            interpret=True)

    o1, o2 = ref(x, wq, wp, gam, bet, bias, ls), fused(x, wq, wp, gam, bet, bias, ls)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=2e-5, atol=2e-5)

    loss = lambda f: (lambda *a: jnp.sum(jnp.sin(f(*a))))
    g1 = jax.grad(loss(ref), argnums=tuple(range(7)))(x, wq, wp, gam, bet, bias, ls)
    g2 = jax.grad(loss(fused), argnums=tuple(range(7)))(x, wq, wp, gam, bet, bias, ls)
    names = ["dx", "dwq", "dwp", "dgamma", "dbeta", "dbias", "dls"]
    for a, b, name in zip(g1, g2, names):
        scale = float(jnp.max(jnp.abs(a))) + 1e-12
        np.testing.assert_allclose(np.asarray(a) / scale, np.asarray(b) / scale,
                                   atol=5e-6, err_msg=name)


def test_zero_token_gradients_finite():
    """Outside-FOV pixels project to exactly-zero inputs, and zero tokens are a
    fixed point of the encoder at init (zero biases, zero LN bias, zeros-init
    rel-pos table) — so cosine attention sees exactly-zero q/k rows.  The XLA
    path's q/k normalization backward must stay finite there: `x / max(norm(x),
    eps)` NaNs (norm's VJP divides by the norm); regression for the depth-smoke
    step-2 NaN (2026-08-18)."""
    from heal_swin_tpu.data.data_spec import DataSpec
    from heal_swin_tpu.models.swin_hp import SwinHPTransformerConfig, SwinHPTransformerSys
    from heal_swin_tpu.training.losses import mse

    cfg = SwinHPTransformerConfig(
        patch_size=4, window_size=16, shift_size=8, shift_strategy="ring_shift",
        rel_pos_bias="flat", embed_dim=8, depths=[2, 1], num_heads=[2, 2],
        use_cos_attn=True, use_v2_norm_placement=True, attention_impl="xla",
    )
    spec = DataSpec(dim_in=8 * 16 * 16, f_in=3, f_out=1, base_pix=8)
    model = SwinHPTransformerSys(cfg, spec)
    rng = np.random.default_rng(0)
    x = np.abs(rng.normal(size=(1, spec.dim_in, 3))).astype(np.float32)
    x[:, : spec.dim_in // 2] = 0.0  # a large exactly-zero (outside-FOV) region
    x = jnp.asarray(x)
    # targets: masked (inf) exactly over the zero region, like the depth pipeline
    t = np.abs(rng.normal(size=(1, spec.dim_in))).astype(np.float32)
    t[:, : spec.dim_in // 2] = np.inf
    t = jnp.asarray(t)
    params = jax.jit(model.init, static_argnums=2)(jax.random.PRNGKey(0), x, True)

    def loss_fn(p):
        out = model.apply(p, x, True)
        return mse(out, t)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    bad = [
        "/".join(str(k) for k in path)
        for path, leaf in jax.tree_util.tree_flatten_with_path(grads)[0]
        if not bool(np.isfinite(np.asarray(leaf)).all())
    ]
    assert not bad, f"non-finite grads at: {bad[:10]}"


def test_masked_depth_loss_gradients_isolate_masked_positions():
    """Depth losses must not let masked (inf-target) positions leak into the
    backward even when the prediction there is non-finite (the 0 * inf = NaN
    where-trap)."""
    from heal_swin_tpu.training import losses

    t = jnp.asarray([[1.0, jnp.inf, 2.0, jnp.inf]])
    preds = jnp.asarray([[[0.5], [jnp.nan], [1.5], [jnp.inf]]])

    for name in ["mse", "l1_loss"]:
        fn = getattr(losses, name)
        val, g = jax.value_and_grad(lambda p: fn(p, t))(preds)
        assert np.isfinite(float(val)), name
        assert np.isfinite(np.asarray(g)).all(), name
    val, g = jax.value_and_grad(lambda p: losses.huber_loss(p, t, delta=1.0))(preds)
    assert np.isfinite(float(val)) and np.isfinite(np.asarray(g)).all()
    preds2 = jnp.concatenate([preds, jnp.zeros_like(preds)], axis=-1)
    val, g = jax.value_and_grad(lambda p: losses.mean_log_var_loss(p, t))(preds2)
    assert np.isfinite(float(val)) and np.isfinite(np.asarray(g)).all()
