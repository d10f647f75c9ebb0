"""Fused depth decoder-tail kernel (ops/final_head.py fused_final_head_depth):
oracle parity in interpret mode for every loss kind, gradient parity, and
end-to-end depth-task parity (fused vs plain loss/grads/metrics, incl. the
inf-masked background and padded-sample eval masking)."""

import dataclasses
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from heal_swin_tpu.ops import final_head as fh
from heal_swin_tpu.training import losses as L

T, C, P = 256, 96, 4


def _reference_depth(x, we, g, b, wh, t, *, kind, delta):
    """Unfused tail on the kernel layout: expand -> LN -> head -> losses.py loss.
    Returns (loss, preds (T, P, F))."""
    F = wh.shape[-1]
    h = x @ we  # (T, P*C)
    outs = []
    from heal_swin_tpu.models.layers import _ln_fn

    for i in range(P):
        z = _ln_fn(h[:, i * C:(i + 1) * C], g, b, 1e-5)
        outs.append(z @ wh)  # (T, F)
    preds = jnp.stack(outs, axis=1)  # (T, P, F)
    impl = {
        "l2": L.mse,
        "l1": L.l1_loss,
        "huber": functools.partial(L.huber_loss, delta=delta),
        "nll": L.mean_log_var_loss,
    }[kind]
    loss = impl(preds.reshape(1, T * P, F), t.reshape(1, T * P))
    return loss, preds


@pytest.fixture(scope="module")
def ops():
    rng = np.random.default_rng(0)
    t = rng.normal(size=(T, P)).astype(np.float32)
    t[rng.uniform(size=(T, P)) < 0.3] = np.inf  # background markers
    return dict(
        x=jnp.asarray(rng.normal(size=(T, C)), jnp.float32),
        we=jnp.asarray(rng.normal(size=(C, P * C)) * 0.05, jnp.float32),
        g=jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1 + 1.0),
        b=jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1),
        wh1=jnp.asarray(rng.normal(size=(C, 1)) * 0.05, jnp.float32),
        wh2=jnp.asarray(rng.normal(size=(C, 2)) * 0.05, jnp.float32),
        t=jnp.asarray(t),
    )


KINDS = [("l2", 1, 1.0), ("l1", 1, 1.0), ("huber", 1, 0.7), ("nll", 2, 1.0),
         ("l2", 2, 1.0)]  # l2 with a (zero-grad) logvar channel: pre-switch phase


@pytest.mark.parametrize("kind,F,delta", KINDS)
def test_depth_kernel_matches_reference(ops, kind, F, delta):
    wh = ops["wh1"] if F == 1 else ops["wh2"]
    ref_loss, ref_preds = _reference_depth(
        ops["x"], ops["we"], ops["g"], ops["b"], wh, ops["t"], kind=kind, delta=delta
    )
    loss, preds = fh.fused_final_head_depth(
        ops["x"], ops["we"], ops["g"], ops["b"], wh, ops["t"],
        patch_size=P, loss_kind=kind, huber_delta=delta, interpret=True, rblk=128,
    )
    assert float(ref_loss) == pytest.approx(float(loss), rel=1e-5, abs=1e-6)
    np.testing.assert_allclose(
        np.asarray(preds).reshape(T, P, F), np.asarray(ref_preds), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("kind,F,delta", KINDS)
def test_depth_kernel_gradients_match_reference(ops, kind, F, delta):
    wh = ops["wh1"] if F == 1 else ops["wh2"]

    def ref(x, we, g, b, wh):
        return _reference_depth(x, we, g, b, wh, ops["t"], kind=kind, delta=delta)[0]

    def fused(x, we, g, b, wh):
        return fh.fused_final_head_depth(
            x, we, g, b, wh, ops["t"], patch_size=P, loss_kind=kind,
            huber_delta=delta, interpret=True, rblk=128,
        )[0]

    gr = jax.grad(ref, argnums=(0, 1, 2, 3, 4))(
        ops["x"], ops["we"], ops["g"], ops["b"], wh
    )
    gf = jax.grad(fused, argnums=(0, 1, 2, 3, 4))(
        ops["x"], ops["we"], ops["g"], ops["b"], wh
    )
    for name, a, b in zip(["dx", "dwe", "dg", "db", "dwh"], gr, gf):
        d = float(jnp.max(jnp.abs(a - b)))
        s = float(jnp.max(jnp.abs(a))) + 1e-12
        assert d / s < 2e-5, (name, d / s)


def _build_depth_task(fused, use_logvar=False, loss="l2", nside=8):
    from heal_swin_tpu.data.data_spec import DepthDataSpec
    from heal_swin_tpu.models.swin_hp import SwinHPTransformerConfig
    from heal_swin_tpu.models.tasks import (
        CommonDepthConfig,
        WoodscapeDepthSwinHP,
        WoodscapeDepthSwinHPConfig,
    )

    npix = 8 * nside * nside
    cfg = SwinHPTransformerConfig(
        patch_size=4, window_size=16, shift_size=8, shift_strategy="ring_shift",
        embed_dim=8, depths=[2, 1], num_heads=[2, 2], drop_rate=0.0,
        attn_drop_rate=0.0, drop_path_rate=0.0, fused_final_head=fused,
    )
    spec = DepthDataSpec(dim_in=npix, f_in=3, f_out=1, base_pix=8)
    task = WoodscapeDepthSwinHP(
        WoodscapeDepthSwinHPConfig(
            swin_hp_transformer_config=cfg,
            common_depth_config=CommonDepthConfig(loss=loss, use_logvar=use_logvar),
        ),
        spec,
    )
    return task, npix


@pytest.mark.parametrize("use_logvar", [False, True])
def test_depth_task_fused_path_matches_plain(monkeypatch, use_logvar):
    """Depth task with fused_final_head=True: same loss, gradients, and epoch
    metrics as the plain tail + losses.py path (VERDICT r2 item 2)."""
    monkeypatch.setenv("HEAL_SWIN_FH_INTERPRET", "1")
    task_f, npix = _build_depth_task(True, use_logvar)
    task_p, _ = _build_depth_task(False, use_logvar)

    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.normal(size=(2, npix, 3)), jnp.float32)
    t = rng.normal(size=(2, npix)).astype(np.float32)
    t[rng.uniform(size=(2, npix)) < 0.35] = np.inf
    targets = jnp.asarray(t)

    params = jax.jit(task_p.init_variables)(jax.random.PRNGKey(0), imgs[:1])
    assert task_f._fused_tail_ok() and not task_p._fused_tail_ok()

    def loss_of(task):
        def f(p):
            return task.loss_fn(p, imgs, targets, deterministic=True)
        return f

    (loss_p, out_p), grads_p = jax.value_and_grad(loss_of(task_p), has_aux=True)(params)
    (loss_f, out_f), grads_f = jax.value_and_grad(loss_of(task_f), has_aux=True)(params)
    assert float(loss_p) == pytest.approx(float(loss_f), rel=1e-5, abs=1e-7)
    assert out_f.shape == out_p.shape  # (B, npix, F): metric_update-compatible

    flat_p, _ = jax.tree_util.tree_flatten_with_path(grads_p)
    flat_f, _ = jax.tree_util.tree_flatten(grads_f)
    for (path, a), b in zip(flat_p, flat_f):
        d = float(jnp.max(jnp.abs(a - b)))
        s = float(jnp.max(jnp.abs(a))) + 1e-9
        assert d / max(s, 1e-6) < 5e-4, (jax.tree_util.keystr(path), d, s)

    m_p = task_p.metric_compute(
        task_p.metric_update(task_p.metric_init(), out_p, targets), "train_"
    )
    m_f = task_f.metric_compute(
        task_f.metric_update(task_f.metric_init(), out_f, targets), "train_"
    )
    assert m_p.keys() == m_f.keys()
    for k in m_p:
        # loose rel: the untrained net predicts near zero, so inverse/log metrics
        # (iRMSE, SILogE) amplify f32 summation-order differences between the
        # kernel's lane-reduce head and XLA's dot; the raw preds agree to 1e-5
        assert m_p[k] == pytest.approx(m_f[k], rel=5e-3, abs=1e-5), k


def test_depth_task_fused_sample_mask_matches_plain(monkeypatch):
    """Padded-sample eval masking on the fused path (targets -> inf) equals the
    plain masked loss."""
    monkeypatch.setenv("HEAL_SWIN_FH_INTERPRET", "1")
    task_f, npix = _build_depth_task(True)
    task_p, _ = _build_depth_task(False)
    rng = np.random.default_rng(7)
    imgs = jnp.asarray(rng.normal(size=(2, npix, 3)), jnp.float32)
    t = rng.normal(size=(2, npix)).astype(np.float32)
    t[rng.uniform(size=(2, npix)) < 0.2] = np.inf
    targets = jnp.asarray(t)
    mask = jnp.asarray([True, False])

    params = jax.jit(task_p.init_variables)(jax.random.PRNGKey(0), imgs[:1])
    loss_p, _ = task_p.loss_fn(params, imgs, targets, deterministic=True,
                               sample_mask=mask)
    loss_f, _ = task_f.loss_fn(params, imgs, targets, deterministic=True,
                               sample_mask=mask)
    assert float(loss_p) == pytest.approx(float(loss_f), rel=1e-5, abs=1e-7)


def test_depth_logvar_uses_nll_kind(monkeypatch):
    """use_logvar starts on the NLL immediately (reference get_depth_loss,
    loss_depth_regression.py:70-76 — 'Only mse base loss available for
    uncertainty estimation' then returns mean_log_var_loss), so the fused
    kernel's kind is 'nll' from epoch 0 and set_epoch never flips it."""
    monkeypatch.setenv("HEAL_SWIN_FH_INTERPRET", "1")
    task, npix = _build_depth_task(True, use_logvar=True)
    task.cd = dataclasses.replace(task.cd, train_uncertainty_after=2)
    assert task._loss_kind()[0] == "nll"
    assert not task.set_epoch(1)
    assert not task.set_epoch(3)  # already the NLL: no step rebuild needed
    assert task._loss_kind()[0] == "nll"
    assert task._fused_tail_ok()

    # every non-logvar kind maps too (the fused gate accepts all four)
    for loss, kind in [("l2", "l2"), ("l1", "l1"), ("huber", "huber")]:
        t2, _ = _build_depth_task(True, use_logvar=False, loss=loss)
        assert t2._loss_kind()[0] == kind and t2._fused_tail_ok()


@pytest.mark.parametrize("use_logvar", [False, True])
def test_depth_fused_tail_under_shard_map(monkeypatch, use_logvar):
    """Fused depth tail ACTIVE inside shard_map over a (dp=2, sp=2) mesh ==
    the plain (unfused, unsharded) loss/gradients: pins the kernel's psum'd
    loss num/den (`fused_final_head_depth(axis_names=...)`), the vma-stamped
    out-shapes, and the match_vma'd weight cotangents under check_vma — the
    depth analogue of test_sequence_parallel.py::test_forced_shmap_fused_tail
    _matches_plain.  Tolerances are fused-vs-plain kernel noise (f32-close)."""
    from jax.sharding import Mesh
    from jax.sharding import PartitionSpec as PSpec

    monkeypatch.setenv("HEAL_SWIN_FH_INTERPRET", "1")
    # per-shard token count must stay kernel-supported (pick_rblk: T_shard % 128
    # == 0), so nside 16 -> T = 512 tokens, 256 per seq shard
    task_f, npix = _build_depth_task(True, use_logvar, nside=16)
    task_p, _ = _build_depth_task(False, use_logvar, nside=16)

    rng = np.random.default_rng(11)
    imgs = jnp.asarray(rng.normal(size=(2, npix, 3)), jnp.float32)
    t = rng.normal(size=(2, npix)).astype(np.float32)
    t[rng.uniform(size=(2, npix)) < 0.3] = np.inf
    targets = jnp.asarray(t)

    params = jax.jit(task_p.init_variables)(jax.random.PRNGKey(0), imgs[:1])

    (loss_p, _), grads_p = jax.jit(jax.value_and_grad(
        lambda p: task_p.loss_fn(p, imgs, targets, deterministic=True),
        has_aux=True,
    ))(params)

    dp, sp = 2, 2
    mesh = Mesh(np.asarray(jax.devices()[: dp * sp]).reshape(dp, sp),
                ("data", "seq"))
    axes = ("data", "seq")
    assert task_f._fused_tail_ok(seq=("seq", sp))

    def grad_body(p, imgs, targets):
        def lf(p):
            return task_f.loss_fn(p, imgs, targets, deterministic=True,
                                  axis_names=axes, seq=("seq", sp))[0]

        return jax.value_and_grad(lf)(p)

    loss_f, grads_f = jax.jit(jax.shard_map(
        grad_body, mesh=mesh,
        in_specs=(PSpec(), PSpec("data", "seq"), PSpec("data", "seq")),
        out_specs=(PSpec(), PSpec()), check_vma=True,
    ))(params, imgs, targets)

    assert float(loss_p) == pytest.approx(float(loss_f), rel=2e-5, abs=1e-7)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(grads_p)
    flat_f, _ = jax.tree_util.tree_flatten(grads_f)
    assert len(flat_p) == len(flat_f)
    for (path, a), b in zip(flat_p, flat_f):
        d = float(jnp.max(jnp.abs(a - b)))
        s = float(jnp.max(jnp.abs(a))) + 1e-9
        assert d / max(s, 1e-6) < 5e-4, (jax.tree_util.keystr(path), d, s)
