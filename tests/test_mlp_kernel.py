"""Fused MLP kernel vs the jnp oracle (interpret mode — runs on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heal_swin_tpu.ops.mlp import fused_mlp, reference_mlp, pick_rblk, supported


def _operands(T=128, C=96, H=384, dtype=jnp.float32, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(T, C), dtype)
    w1 = jnp.asarray(rng.randn(C, H) * 0.05, dtype)
    b1 = jnp.asarray(rng.randn(H) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(H, C) * 0.05, dtype)
    b2 = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("approximate", [False, True])
def test_fused_mlp_forward_matches_oracle(approximate):
    x, w1, b1, w2, b2 = _operands()
    out = fused_mlp(x, w1, b1, w2, b2, approximate=approximate, rblk=32,
                    interpret=True, fwd_impl="pallas")
    ref = reference_mlp(x, w1, b1, w2, b2, approximate=approximate)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("approximate", [False, True])
@pytest.mark.parametrize("fwd_impl", ["xla", "pallas"])
def test_fused_mlp_grads_match_oracle(approximate, fwd_impl):
    x, w1, b1, w2, b2 = _operands(T=64, C=32, H=128)

    def loss_fused(x, w1, b1, w2, b2):
        o = fused_mlp(x, w1, b1, w2, b2, approximate=approximate, rblk=16,
                      interpret=True, fwd_impl=fwd_impl)
        return jnp.sum(jnp.sin(o.astype(jnp.float32)))

    def loss_ref(x, w1, b1, w2, b2):
        o = reference_mlp(x, w1, b1, w2, b2, approximate=approximate)
        return jnp.sum(jnp.sin(o.astype(jnp.float32)))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_fused_mlp_bf16_close_to_f32_oracle():
    x, w1, b1, w2, b2 = _operands(dtype=jnp.bfloat16)
    out = fused_mlp(x, w1, b1, w2, b2, approximate=True, rblk=32, interpret=True,
                    fwd_impl="pallas")
    ref = reference_mlp(x.astype(jnp.float32), w1.astype(jnp.float32), b1,
                        w2.astype(jnp.float32), b2, approximate=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.1, atol=0.15
    )


def test_pick_rblk_divides_and_bounds():
    assert pick_rblk(2 * 131072, 96, 384) == 512
    r = pick_rblk(2 * 2048, 384, 1536)
    assert r is not None and (2 * 2048) % r == 0
    assert pick_rblk(7, 96, 384) is None


def test_mlp_module_fused_path_matches_plain(monkeypatch):
    """Mlp with the fused kernel engaged (forced on CPU via interpret) must match the
    plain dense path in outputs AND parameter gradients — same param tree paths."""
    import functools

    from heal_swin_tpu.models import layers
    from heal_swin_tpu.ops import mlp as mlp_ops

    x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 16, 96), jnp.float32)
    plain = layers.Mlp(hidden_features=384, out_features=96, gelu_approx=True)
    fused = layers.Mlp(hidden_features=384, out_features=96, gelu_approx=True,
                       mlp_impl="fused")
    params = plain.init(jax.random.PRNGKey(0), x, True)

    monkeypatch.setattr(mlp_ops, "supported", lambda *a, **k: True)
    orig = mlp_ops.fused_mlp_nd
    monkeypatch.setattr(
        mlp_ops, "fused_mlp_nd", functools.partial(orig, rblk=16, interpret=True)
    )

    def loss(m, p):
        return jnp.sum(jnp.sin(m.apply(p, x, True)))

    np.testing.assert_allclose(
        np.asarray(fused.apply(params, x, True)),
        np.asarray(plain.apply(params, x, True)), rtol=1e-5, atol=1e-5)
    gf = jax.grad(lambda p: loss(fused, p))(params)
    gp = jax.grad(lambda p: loss(plain, p))(params)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_supported_gates():
    # eligible: TPU, C=96, tanh GELU, divisible T
    assert supported("tpu", 2 * 131072, 96, 384, True)
    assert not supported("cpu", 2 * 131072, 96, 384, True)
    assert not supported("tpu", 2 * 131072, 96, 384, False)  # erf not in Mosaic
    assert not supported("tpu", 2 * 32768, 192, 768, True)  # XLA bwd at parity
    assert not supported("tpu", 7, 96, 384, True)  # no dividing row block


@pytest.mark.parametrize("has_dp", [False, True])
def test_mlp_block_kernel_matches_oracle(has_dp):
    """fused_mlp_block (residual + DropPath scale + LN + 2-layer MLP) vs the jnp
    oracle: forward and every gradient."""
    from heal_swin_tpu.ops.mlp import fused_mlp_block, reference_mlp_block

    T, C, H = 128, 32, 128
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(T, C)).astype(np.float32))
    w1 = jnp.asarray((rng.normal(size=(C, H)) * 0.1).astype(np.float32))
    b1 = jnp.asarray((rng.normal(size=H) * 0.1).astype(np.float32))
    w2 = jnp.asarray((rng.normal(size=(H, C)) * 0.1).astype(np.float32))
    b2 = jnp.asarray((rng.normal(size=C) * 0.1).astype(np.float32))
    gam = jnp.asarray((1.0 + 0.3 * rng.normal(size=C)).astype(np.float32))
    bet = jnp.asarray((0.2 * rng.normal(size=C)).astype(np.float32))
    ds = jnp.asarray(
        rng.choice([0.0, 1.25], size=(T, 1)).astype(np.float32)) if has_dp else None

    def ref(x, w1, b1, w2, b2, gam, bet):
        return reference_mlp_block(x, w1, b1, w2, b2, gam, bet, ds,
                                   approximate=True)

    def fused(x, w1, b1, w2, b2, gam, bet):
        return fused_mlp_block(x, w1, b1, w2, b2, gam, bet, ds, approximate=True,
                               rblks=(32, 16), interpret=True)

    o1 = ref(x, w1, b1, w2, b2, gam, bet)
    o2 = fused(x, w1, b1, w2, b2, gam, bet)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=2e-5, atol=2e-5)

    loss = lambda f: (lambda *a: jnp.sum(jnp.sin(f(*a))))
    g1 = jax.grad(loss(ref), argnums=tuple(range(7)))(x, w1, b1, w2, b2, gam, bet)
    g2 = jax.grad(loss(fused), argnums=tuple(range(7)))(x, w1, b1, w2, b2, gam, bet)
    for a, b, name in zip(g1, g2, ["dx", "dw1", "db1", "dw2", "db2", "dg", "dbe"]):
        scale = float(jnp.max(jnp.abs(a))) + 1e-12
        np.testing.assert_allclose(np.asarray(a) / scale, np.asarray(b) / scale,
                                   atol=5e-6, err_msg=name)
