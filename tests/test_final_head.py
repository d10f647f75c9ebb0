"""Fused decoder-tail kernel (ops/final_head.py): oracle parity in interpret mode,
and end-to-end task parity — the fused segmentation train path (loss + step confmat
from the kernel) must match the plain tail + weighted CE + argmax metrics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from heal_swin_tpu.ops import final_head as fh

T, C, F, P = 256, 96, 10, 4


@pytest.fixture(scope="module")
def ops():
    rng = np.random.default_rng(0)
    return dict(
        x=jnp.asarray(rng.normal(size=(T, C)), jnp.float32),
        we=jnp.asarray(rng.normal(size=(C, P * C)) * 0.05, jnp.float32),
        wh=jnp.asarray(rng.normal(size=(C, F)) * 0.05, jnp.float32),
        g=jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1 + 1.0),
        b=jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1),
        y=jnp.asarray(rng.integers(0, F, size=(T, P)), jnp.int32),
        w=jnp.asarray(rng.uniform(0.5, 2.0, size=(T, P)), jnp.float32),
    )


def test_kernel_matches_oracle(ops):
    ref_loss, ref_cm = fh.reference_final_head(
        ops["x"], ops["we"], ops["g"], ops["b"], ops["wh"], ops["y"], ops["w"],
        patch_size=P,
    )
    loss, cm = fh.fused_final_head(
        ops["x"], ops["we"], ops["g"], ops["b"], ops["wh"], ops["y"], ops["w"],
        patch_size=P, interpret=True, rblk=128,
    )
    assert abs(float(ref_loss) - float(loss)) < 1e-5
    np.testing.assert_array_equal(np.asarray(ref_cm), np.asarray(cm))
    assert float(jnp.sum(cm)) == T * P


def test_kernel_gradients_match_oracle(ops):
    def L(fn):
        def inner(x, we, g, b, wh):
            l, _ = fn(x, we, g, b, wh, ops["y"], ops["w"], patch_size=P)
            return l
        return inner

    gr = jax.grad(L(fh.reference_final_head), argnums=(0, 1, 2, 3, 4))(
        ops["x"], ops["we"], ops["g"], ops["b"], ops["wh"]
    )
    import functools

    fused = functools.partial(fh.fused_final_head, interpret=True, rblk=128)
    gf = jax.grad(L(fused), argnums=(0, 1, 2, 3, 4))(
        ops["x"], ops["we"], ops["g"], ops["b"], ops["wh"]
    )
    for name, a, b in zip(["dx", "dwe", "dg", "db", "dwh"], gr, gf):
        d = float(jnp.max(jnp.abs(a - b)))
        s = float(jnp.max(jnp.abs(a))) + 1e-12
        assert d / s < 2e-5, (name, d / s)


def test_loss_matches_weighted_cross_entropy(ops):
    """The kernel's loss equals training/losses.weighted_cross_entropy on the
    equivalent unfused logits (same reshape semantics)."""
    from heal_swin_tpu.training.losses import weighted_cross_entropy

    x, we, g, b, wh = ops["x"], ops["we"], ops["g"], ops["b"], ops["wh"]
    from heal_swin_tpu.models.layers import _ln_fn

    h = (x @ we).reshape(T * P, C)
    z = _ln_fn(h, g, b, 1e-5)
    logits = z @ wh
    # per-element class weights: welem[t, i] = cw_effective -> here arbitrary
    # weights, so compare against the weighted form directly
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(ops["y"].reshape(-1), F)
    nll = -jnp.sum(logp * onehot, axis=-1)
    w = ops["w"].reshape(-1)
    expected = jnp.sum(w * nll) / jnp.sum(w)

    loss, _ = fh.fused_final_head(x, we, g, b, wh, ops["y"], ops["w"],
                                  patch_size=P, interpret=True, rblk=128)
    assert abs(float(loss) - float(expected)) < 1e-5

    # and with uniform weights it equals weighted_cross_entropy itself
    ones = jnp.ones_like(ops["w"])
    loss_u, _ = fh.fused_final_head(x, we, g, b, wh, ops["y"], ones,
                                    patch_size=P, interpret=True, rblk=128)
    wce = weighted_cross_entropy(logits[None], ops["y"].reshape(1, T * P))
    assert abs(float(loss_u) - float(wce)) < 1e-5


def test_task_fused_path_matches_plain(monkeypatch):
    """Segmentation task with fused_final_head=True: same loss, same gradients,
    same epoch metrics as the plain path."""
    monkeypatch.setenv("HEAL_SWIN_FH_INTERPRET", "1")
    import dataclasses

    from heal_swin_tpu.data.data_spec import DataSpec
    from heal_swin_tpu.models.swin_hp import SwinHPTransformerConfig
    from heal_swin_tpu.models.tasks import (
        WoodscapeSegmenterSwinHP,
        WoodscapeSegmenterSwinHPConfig,
    )

    nside = 8
    npix = 8 * nside * nside
    cfg = SwinHPTransformerConfig(
        patch_size=4, window_size=16, shift_size=8, shift_strategy="ring_shift",
        embed_dim=8, depths=[2, 1], num_heads=[2, 2], drop_rate=0.0,
        attn_drop_rate=0.0, drop_path_rate=0.0,
    )
    spec = DataSpec(dim_in=npix, f_in=3, f_out=5, base_pix=8)
    weights = [1.0, 2.0, 0.5, 1.0, 1.0]
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.normal(size=(2, npix, 3)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, 5, size=(2, npix)), jnp.int32)

    def build(fused):
        c = dataclasses.replace(cfg, fused_final_head=fused)
        task = WoodscapeSegmenterSwinHP(
            WoodscapeSegmenterSwinHPConfig(swin_hp_transformer_config=c,
                                           class_weights=weights),
            spec,
        )
        params = jax.jit(task.init_variables)(jax.random.PRNGKey(0), imgs[:1])
        return task, params

    task_p, params = build(False)
    task_f, params_f = build(True)
    chex_equal = jax.tree_util.tree_all(
        jax.tree.map(lambda a, b: jnp.array_equal(a, b), params, params_f)
    )
    assert bool(chex_equal)
    assert task_f._fused_tail_ok(None) and not task_p._fused_tail_ok(None)

    def loss_of(task):
        def f(p):
            loss, out = task.loss_fn(p, imgs, targets, deterministic=True)
            return loss, out
        return f

    (loss_p, logits), grads_p = jax.value_and_grad(loss_of(task_p), has_aux=True)(params)
    (loss_f, cm), grads_f = jax.value_and_grad(loss_of(task_f), has_aux=True)(params)
    assert abs(float(loss_p) - float(loss_f)) < 1e-5
    assert cm.shape == (5, 5)

    flat_p, td = jax.tree_util.tree_flatten_with_path(grads_p)
    flat_f, _ = jax.tree_util.tree_flatten(grads_f)
    for (path, a), b in zip(flat_p, flat_f):
        d = float(jnp.max(jnp.abs(a - b)))
        s = float(jnp.max(jnp.abs(a))) + 1e-9
        assert d / max(s, 1e-6) < 5e-4, (jax.tree_util.keystr(path), d, s)

    # step metrics from the kernel confmat == argmax-over-logits metrics
    mstate_p = task_p.metric_update(task_p.metric_init(), logits, targets)
    mstate_f = task_f.metric_update(task_f.metric_init(), cm, targets)
    out_p = task_p.metric_compute(mstate_p, "train_")
    out_f = task_f.metric_compute(mstate_f, "train_")
    assert out_p.keys() == out_f.keys()
    for k in out_p:
        assert out_p[k] == pytest.approx(out_f[k], abs=1e-6), k


def test_fused_head_sharded_matches_unsharded():
    """fused_final_head(axis_names=...) inside shard_map with the token rows
    sharded over a mesh axis == the unsharded kernel: exact global weighted-mean
    loss (psum'd num/den — NOT a mean of shard means), psum'd confusion matrix,
    and gradients (weight cotangents arrive globally reduced via match_vma; a
    shard-local denominator or a double psum fails this)."""
    from jax.sharding import Mesh, PartitionSpec as Pt

    rng = np.random.default_rng(7)
    Tg, sp = 1024, 4
    x = jnp.asarray(rng.normal(size=(Tg, C)), jnp.float32)
    we = jnp.asarray(rng.normal(size=(C, P * C)) * 0.05, jnp.float32)
    wh = jnp.asarray(rng.normal(size=(C, F)) * 0.05, jnp.float32)
    g = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1 + 1.0)
    b = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    y = jnp.asarray(rng.integers(0, F, size=(Tg, P)), jnp.int32)
    # non-uniform weights, deliberately unbalanced ACROSS shards: a mean-of-means
    # instead of sum/sum shows up immediately
    w = jnp.asarray(rng.uniform(0.1, 3.0, size=(Tg, P)), jnp.float32)

    def ref_loss(x, we, g, b, wh):
        loss, cm = fh.fused_final_head(x, we, g, b, wh, y, w, patch_size=P,
                                       interpret=True, rblk=128)
        return loss, cm

    (loss_ref, cm_ref), grads_ref = jax.value_and_grad(
        ref_loss, argnums=(0, 1, 2, 3, 4), has_aux=True
    )(x, we, g, b, wh)

    mesh = Mesh(np.asarray(jax.devices()[:sp]), ("seq",))

    def body(x, we, g, b, wh, y, w):
        def lf(x, we, g, b, wh):
            loss, cm = fh.fused_final_head(
                x, we, g, b, wh, y, w, patch_size=P, interpret=True, rblk=128,
                axis_names=("seq",),
            )
            return loss, jax.lax.psum(cm, "seq")

        return jax.value_and_grad(lf, argnums=(0, 1, 2, 3, 4), has_aux=True)(
            x, we, g, b, wh
        )

    (loss_s, cm_s), grads_s = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(Pt("seq"), Pt(), Pt(), Pt(), Pt(), Pt("seq"), Pt("seq")),
            out_specs=((Pt(), Pt()), (Pt("seq"), Pt(), Pt(), Pt(), Pt())),
            check_vma=True,
        )
    )(x, we, g, b, wh, y, w)

    assert abs(float(loss_s) - float(loss_ref)) < 1e-6 * max(1.0, abs(float(loss_ref)))
    np.testing.assert_array_equal(np.asarray(cm_s), np.asarray(cm_ref))
    for name, a, bb in zip(["dx", "dwe", "dg", "db", "dwh"], grads_ref, grads_s):
        d = float(jnp.max(jnp.abs(a - bb)))
        s = float(jnp.max(jnp.abs(a))) + 1e-12
        assert d / s < 2e-5, (name, d / s)


def test_task_fused_path_sharded_matches_plain(monkeypatch):
    """The segmentation task's fused tail under a (data, seq) shard_map — the
    multi-chip trainer step path — produces the same loss/gradients/metrics as the
    plain unsharded path (loss_fn(axis_names=..., seq=...), ops/final_head.py
    axis_names plumbing)."""
    monkeypatch.setenv("HEAL_SWIN_FH_INTERPRET", "1")
    import dataclasses

    from jax.sharding import Mesh, PartitionSpec as Pt

    from heal_swin_tpu.data.data_spec import DataSpec
    from heal_swin_tpu.models.swin_hp import SwinHPTransformerConfig
    from heal_swin_tpu.models.tasks import (
        WoodscapeSegmenterSwinHP,
        WoodscapeSegmenterSwinHPConfig,
    )

    nside = 16
    npix = 8 * nside * nside  # 2048 pixels -> 512 tokens; 256/shard at sp=2
    cfg = SwinHPTransformerConfig(
        patch_size=4, window_size=16, shift_size=8, shift_strategy="ring_shift",
        embed_dim=8, depths=[2, 1], num_heads=[2, 2], drop_rate=0.0,
        attn_drop_rate=0.0, drop_path_rate=0.0, fused_final_head=True,
    )
    spec = DataSpec(dim_in=npix, f_in=3, f_out=5, base_pix=8)
    weights = [1.0, 2.0, 0.5, 1.0, 1.0]
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.normal(size=(2, npix, 3)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, 5, size=(2, npix)), jnp.int32)

    task = WoodscapeSegmenterSwinHP(
        WoodscapeSegmenterSwinHPConfig(swin_hp_transformer_config=cfg,
                                       class_weights=weights),
        spec,
    )
    params = jax.jit(task.init_variables)(jax.random.PRNGKey(0), imgs[:1])
    # gate accounts for the per-shard token count (512 tokens -> 256/shard at sp=2)
    assert task._fused_tail_ok(None, ("seq", 2))

    def plain(p):
        loss, cm = task.loss_fn(p, imgs, targets, deterministic=True)
        return loss, cm

    (loss_ref, cm_ref), grads_ref = jax.value_and_grad(plain, has_aux=True)(params)

    dp, sp = 2, 2
    mesh = Mesh(np.asarray(jax.devices()[: dp * sp]).reshape(dp, sp),
                ("data", "seq"))
    axes = ("data", "seq")

    def body(p, imgs, targets):
        from heal_swin_tpu.parallel.sequence import seq_local_slice

        imgs = seq_local_slice(imgs, "seq", sp, axis=1)
        targets = seq_local_slice(targets, "seq", sp, axis=1)

        def lf(p):
            return task.loss_fn(
                p, imgs, targets, deterministic=True, axis_names=axes,
                seq=("seq", sp),
            )

        (loss, cm), grads = jax.value_and_grad(lf, has_aux=True)(p)
        return loss, jax.lax.psum(cm, axes), grads

    loss_s, cm_s, grads_s = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(Pt(), Pt("data"), Pt("data")),
            out_specs=(Pt(), Pt(), Pt()), check_vma=True,
        )
    )(params, imgs, targets)

    assert abs(float(loss_s) - float(loss_ref)) < 2e-6 * max(1.0, abs(float(loss_ref)))
    np.testing.assert_array_equal(np.asarray(cm_s), np.asarray(cm_ref))
    flat_r, td = jax.tree_util.tree_flatten_with_path(grads_ref)
    flat_s, _ = jax.tree_util.tree_flatten(grads_s)
    for (path, a), b in zip(flat_r, flat_s):
        d = float(jnp.max(jnp.abs(a - b)))
        s = float(jnp.max(jnp.abs(a))) + 1e-9
        assert d / max(s, 1e-6) < 5e-4, (jax.tree_util.keystr(path), d, s)


def test_fused_predict_matches_argmax(monkeypatch):
    """The fused inference tail (fused_final_head_predict wired into
    task.predict) == argmax over the plain path's logits, bit-exact on CPU f32."""
    monkeypatch.setenv("HEAL_SWIN_FH_INTERPRET", "1")
    import dataclasses

    from heal_swin_tpu.data.data_spec import DataSpec
    from heal_swin_tpu.models.swin_hp import SwinHPTransformerConfig
    from heal_swin_tpu.models.tasks import (
        WoodscapeSegmenterSwinHP,
        WoodscapeSegmenterSwinHPConfig,
    )

    nside = 8
    npix = 8 * nside * nside
    cfg = SwinHPTransformerConfig(
        patch_size=4, window_size=16, shift_size=8, shift_strategy="ring_shift",
        embed_dim=8, depths=[2, 1], num_heads=[2, 2], drop_rate=0.0,
        attn_drop_rate=0.0, drop_path_rate=0.0,
    )
    spec = DataSpec(dim_in=npix, f_in=3, f_out=5, base_pix=8)
    rng = np.random.default_rng(11)
    imgs = jnp.asarray(rng.normal(size=(2, npix, 3)), jnp.float32)

    def build(fused):
        c = dataclasses.replace(cfg, fused_final_head=fused)
        task = WoodscapeSegmenterSwinHP(
            WoodscapeSegmenterSwinHPConfig(swin_hp_transformer_config=c), spec
        )
        params = jax.jit(task.init_variables)(jax.random.PRNGKey(0), imgs[:1])
        return task, params

    task_p, params = build(False)
    task_f, _ = build(True)
    preds_p = np.asarray(jax.jit(task_p.predict)(params, imgs))
    preds_f = np.asarray(jax.jit(task_f.predict)(params, imgs))
    assert preds_f.shape == (2, npix) and preds_f.dtype == np.int32
    np.testing.assert_array_equal(preds_f, preds_p)


def test_fused_head_nan_rows_do_not_alias_confmat(ops):
    """All-NaN logit rows (diverged step) are DROPPED from the kernel's confusion
    matrix instead of aliasing into (target+1, class 0) — pre-fix, pred_idx == F
    made comb = y*F + F land on lane (y+1)*F."""
    n_bad = 8
    x = ops["x"].at[:n_bad].set(jnp.nan)
    loss, cm = fh.fused_final_head(
        x, ops["we"], ops["g"], ops["b"], ops["wh"], ops["y"], ops["w"],
        patch_size=P, interpret=True, rblk=128,
    )
    assert not np.isfinite(float(loss))  # the loss itself reports the divergence
    assert float(jnp.sum(cm)) == (T - n_bad) * P
    ref_loss, ref_cm = fh.reference_final_head(
        ops["x"][n_bad:], ops["we"], ops["g"], ops["b"], ops["wh"],
        ops["y"][n_bad:], ops["w"][n_bad:], patch_size=P,
    )
    np.testing.assert_array_equal(np.asarray(cm), np.asarray(ref_cm))

    # predict kernel: NaN rows clamp into the class range (no out-of-range index)
    preds = fh.fused_final_head_predict(
        x, ops["we"], ops["g"], ops["b"], ops["wh"], patch_size=P,
        interpret=True, rblk=128,
    )
    assert int(jnp.max(preds)) <= F - 1 and int(jnp.min(preds)) >= 0


def test_flat_task_fused_path_matches_plain(monkeypatch):
    """Flat SWIN segmentation task with fused_final_head=True: the depth-to-space
    transpose commutes with the per-element CE, so the HP kernel with p=p1*p2 and
    rearranged targets must reproduce the plain path's loss, gradients and epoch
    metrics (VERDICT r2 item 2, flat half)."""
    monkeypatch.setenv("HEAL_SWIN_FH_INTERPRET", "1")
    import dataclasses

    from heal_swin_tpu.data.data_spec import DataSpec
    from heal_swin_tpu.models.swin_flat import SwinTransformerConfig
    from heal_swin_tpu.models.tasks import (
        WoodscapeSegmenterSwin,
        WoodscapeSegmenterSwinConfig,
    )

    H, W = 32, 64
    cfg = SwinTransformerConfig(
        patch_size=2, window_size=4, shift_size=1, embed_dim=8, depths=[2, 1],
        num_heads=[2, 2], drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0,
    )
    spec = DataSpec(dim_in=(H, W), f_in=3, f_out=5)
    weights = [1.0, 2.0, 0.5, 1.0, 1.0]
    rng = np.random.default_rng(11)
    imgs = jnp.asarray(rng.normal(size=(2, H, W, 3)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, 5, size=(2, H, W)), jnp.int32)

    def build(fused):
        c = dataclasses.replace(cfg, fused_final_head=fused)
        task = WoodscapeSegmenterSwin(
            WoodscapeSegmenterSwinConfig(swin_transformer_config=c,
                                         class_weights=weights),
            spec,
        )
        params = jax.jit(task.init_variables)(jax.random.PRNGKey(0), imgs[:1])
        return task, params

    task_p, params = build(False)
    task_f, params_f = build(True)
    assert jax.tree_util.tree_all(
        jax.tree.map(lambda a, b: jnp.array_equal(a, b), params, params_f)
    )
    assert task_f._fused_tail_ok(None) and not task_p._fused_tail_ok(None)
    # the fused gate picks a 128-row block: (H/2)*(W/2)*B = 1024 rows — ok
    assert not task_f._fused_tail_ok(None, seq=("seq", 2))  # flat: no seq sharding

    def loss_of(task):
        def f(p):
            loss, out = task.loss_fn(p, imgs, targets, deterministic=True)
            return loss, out
        return f

    (loss_p, logits), grads_p = jax.value_and_grad(loss_of(task_p), has_aux=True)(params)
    (loss_f, cm), grads_f = jax.value_and_grad(loss_of(task_f), has_aux=True)(params)
    assert abs(float(loss_p) - float(loss_f)) < 1e-5
    assert cm.shape == (5, 5) and float(jnp.sum(cm)) == 2 * H * W

    flat_p, _ = jax.tree_util.tree_flatten_with_path(grads_p)
    flat_f, _ = jax.tree_util.tree_flatten(grads_f)
    for (path, a), b in zip(flat_p, flat_f):
        d = float(jnp.max(jnp.abs(a - b)))
        s = float(jnp.max(jnp.abs(a))) + 1e-9
        assert d / max(s, 1e-6) < 5e-4, (jax.tree_util.keystr(path), d, s)

    m_p = task_p.metric_compute(
        task_p.metric_update(task_p.metric_init(), logits, targets), "train_"
    )
    m_f = task_f.metric_compute(
        task_f.metric_update(task_f.metric_init(), cm, targets), "train_"
    )
    assert m_p.keys() == m_f.keys()
    for k in m_p:
        assert m_p[k] == pytest.approx(m_f[k], abs=1e-6), k

    # fused predict must equal argmax over the plain logits, pixel for pixel
    preds_f = task_f.predict(params, imgs)
    preds_p = task_p.predict(params, imgs)
    assert preds_f.shape == preds_p.shape == (2, H, W)
    assert float(jnp.mean((preds_f == preds_p).astype(jnp.float32))) > 0.999
