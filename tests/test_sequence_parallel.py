"""Sequence parallelism (parallel/sequence.py): token-axis sharding equivalence.

The HP model is token-local except the shift permutations, so running it under
``jax.shard_map`` with the sequence sharded over a mesh axis must reproduce the
unsharded computation exactly: forward bit-equal, training (loss trajectory, final
params) equal up to all-reduce float noise.  A wrong permutation slice, a missed
psum (loss numerator/denominator, gradients, metric increments), or a mask-group
misalignment fails these tests.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from heal_swin_tpu.data.data import get_data_module
from heal_swin_tpu.data.data_spec import DataSpec
from heal_swin_tpu.models.swin_hp import SwinHPTransformerConfig, SwinHPTransformerSys
from heal_swin_tpu.models.tasks import MODEL_FROM_CONFIG_NAME
from heal_swin_tpu.parallel.sequence import sharded_permute_tokens
from heal_swin_tpu.tracking.mlflow_store import MlflowFileStore
from heal_swin_tpu.training.train_config import PLConfig
from heal_swin_tpu.training.trainer import Trainer
from heal_swin_tpu.utils.utils import get_config_from_config_path

pytestmark = pytest.mark.slow  # multi-epoch shard_map equivalence fits, ~8 min (fast tier: run.py test-repo)

CONFIG = "run_configs/swin_hp_test_run_config.py"


def _seq_mesh(sp):
    assert len(jax.devices()) >= sp, "conftest must provide the 8-device CPU mesh"
    return Mesh(np.asarray(jax.devices()[:sp]), ("seq",))


def test_sharded_permute_matches_unsharded():
    """Value AND gradient of the sharded permutation gather == jnp.take."""
    rng = np.random.RandomState(0)
    B, N, C, sp = 2, 64, 5, 4
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    perm = rng.permutation(N).astype(np.int32)
    inv = np.argsort(perm).astype(np.int32)
    g = jnp.asarray(rng.randn(B, N, C).astype(np.float32))  # cotangent

    ref = jnp.take(x, jnp.asarray(perm), axis=1)
    ref_dx = jax.grad(lambda x: jnp.sum(jnp.take(x, jnp.asarray(perm), axis=1) * g))(x)

    mesh = _seq_mesh(sp)

    def f(x):
        y = sharded_permute_tokens(x, jnp.asarray(perm), jnp.asarray(inv), "seq", sp)
        return y

    y = jax.jit(
        jax.shard_map(f, mesh=mesh, in_specs=P(None, "seq"), out_specs=P(None, "seq"),
                      check_vma=True)
    )(x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))

    def loss(x, g):
        y = sharded_permute_tokens(x, jnp.asarray(perm), jnp.asarray(inv), "seq", sp)
        return jax.lax.psum(jnp.sum(y * g), "seq")

    dx = jax.jit(
        jax.shard_map(
            jax.grad(loss), mesh=mesh,
            in_specs=(P(None, "seq"), P(None, "seq")), out_specs=P(None, "seq"),
            check_vma=True,
        )
    )(x, g)
    np.testing.assert_array_equal(np.asarray(dx), np.asarray(ref_dx))


@pytest.mark.parametrize("strategy", ["nest_roll", "nest_grid_shift", "ring_shift"])
def test_sp_forward_equivalence(strategy):
    """Sharded (sp=4) forward == unsharded forward, bit-exact on CPU f32."""
    nside = 16
    npix = 8 * nside * nside
    spec = DataSpec(dim_in=npix, f_in=3, f_out=5, base_pix=8)
    cfg = SwinHPTransformerConfig(
        patch_size=4, window_size=16, shift_size=8, shift_strategy=strategy,
        rel_pos_bias="flat", embed_dim=8, depths=[2, 2], num_heads=[2, 4],
        use_cos_attn=(strategy == "ring_shift"),
        use_v2_norm_placement=(strategy == "ring_shift"),
        drop_path_rate=0.0,
    )
    model = SwinHPTransformerSys(cfg, spec)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, npix, 3), jnp.float32)
    params = jax.jit(model.init, static_argnums=2)(rng, x, True)
    ref = jax.jit(lambda p, x: model.apply(p, x, True))(params, x)

    sp = 4
    sharded = jax.jit(
        jax.shard_map(
            lambda p, xl: model.apply(p, xl, True, seq=("seq", sp)),
            mesh=_seq_mesh(sp), in_specs=(P(), P(None, "seq")),
            out_specs=P(None, "seq"), check_vma=True,
        )
    )(params, x)
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(ref))


def _train(tmp_path, n_devices, sp, global_batch=4, epochs=2):
    run_config = get_config_from_config_path(CONFIG, "get_train_run_config")
    dp = n_devices // sp
    data = dataclasses.replace(
        run_config.data,
        common=dataclasses.replace(
            run_config.data.common,
            batch_size=global_batch // dp,
            val_batch_size=2,
        ),
    )
    # drop_path draws differ between the GSPMD path (one global mask) and the
    # shard_map path (per-data-shard folded keys); disable for exact comparison
    model_cfg = dataclasses.replace(
        run_config.model,
        swin_hp_transformer_config=dataclasses.replace(
            run_config.model.swin_hp_transformer_config, drop_path_rate=0.0
        ),
    )
    run_config = dataclasses.replace(run_config, data=data, model=model_cfg)

    dm, data_spec = get_data_module(run_config.data)
    task_cls = MODEL_FROM_CONFIG_NAME[type(run_config.model).__name__]
    task = task_cls(run_config.model, data_spec, run_config.data)

    store = MlflowFileStore(tmp_path / f"mlruns_{n_devices}x{sp}")
    run = store.create_run("sp_equivalence")
    pl = PLConfig(
        max_epochs=epochs, limit_train_batches=1, limit_val_batches=1,
        num_sanity_val_steps=0, log_every_n_steps=1, gpus=n_devices,
        seq_parallel_devices=sp,
    )
    trainer = Trainer(pl, run_config.train, run=run, ckpt_dir=None)
    trainer.fit(task, dm)
    losses = [h[1] for h in run.get_metric_history("train_loss")]
    val_losses = [h[1] for h in run.get_metric_history("val_loss")]
    val_ious = [h[1] for h in run.get_metric_history("val_iou_global")]
    return losses, val_losses, val_ious, jax.device_get(trainer._params)


def test_sp_train_equivalence(tmp_path):
    """2 epochs on (dp=2, sp=4) == 2 epochs on 1 device: same losses and the same
    psum-reduced val metrics.  The epoch-2 train loss is computed AFTER the first
    optimizer update, so its match implies the sharded step-1 update was right.

    Final params are compared at Adam's noise floor: for near-zero gradients the
    normalized update m/sqrt(v) is sign-sensitive to reduction-order float noise, so
    per-element differences up to ~2*lr*steps are expected and carry no signal
    (gradient-scale bugs are invisible to Adam anyway — see the direct gradient
    equivalence test below for the rigorous check)."""
    losses_1, vloss_1, viou_1, params_1 = _train(tmp_path, 1, 1)
    losses_s, vloss_s, viou_s, params_s = _train(tmp_path, 8, 4)

    assert len(losses_1) == len(losses_s) == 2
    np.testing.assert_allclose(losses_1, losses_s, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(vloss_1, vloss_s, rtol=1e-4, atol=1e-6)
    # argmax-derived: loose (see test_device_equivalence.py)
    np.testing.assert_allclose(viou_1, viou_s, rtol=0.05, atol=0.005)

    lr = 1e-3  # run config optimizer lr
    flat_1, _ = jax.tree_util.tree_flatten(params_1)
    flat_s, treedef = jax.tree_util.tree_flatten(params_s)
    assert len(flat_1) == len(flat_s)
    for a, b in zip(flat_1, flat_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=2 * lr * 2 * 1.05,
            err_msg=str(treedef),
        )


def test_sp_gradient_equivalence():
    """Gradients from the shard-mapped (dp=2, sp=4) loss (psum'd num/den + psum'd
    grads) == plain global-batch gradients, to reduction-order float noise.  This is
    the check Adam-evolved params cannot provide: a missing/extra psum, a wrong
    cotangent routing through the sharded permutation, or a loss-denominator error
    shows up here directly."""
    run_config = get_config_from_config_path(CONFIG, "get_train_run_config")
    dm, data_spec = get_data_module(run_config.data)
    task_cls = MODEL_FROM_CONFIG_NAME[type(run_config.model).__name__]
    task = task_cls(run_config.model, data_spec, run_config.data)

    rng = jax.random.PRNGKey(0)
    loader = dm.train_dataloader()
    loader.batch_size = 4
    loader.set_epoch(0)
    imgs, targets = next(iter(loader))
    imgs, targets = jnp.asarray(imgs), jnp.asarray(targets)
    params = jax.jit(task.init_variables)(rng, imgs[:1])

    ref_loss, ref_grads = jax.jit(
        jax.value_and_grad(lambda p: task.loss_fn(p, imgs, targets)[0])
    )(params)

    dp, sp = 2, 4
    mesh = Mesh(np.asarray(jax.devices()[: dp * sp]).reshape(dp, sp), ("data", "seq"))
    axes = ("data", "seq")

    def grad_body(params, imgs, targets):
        def lf(p):
            return task.loss_fn(
                p, imgs, targets, axis_names=axes, seq=("seq", sp)
            )[0]

        # grads of the invariant (replicated) params come out globally reduced:
        # shard_map's vma transpose inserts the psum (an explicit one would scale
        # by the device count)
        return jax.value_and_grad(lf)(params)

    loss_s, grads_s = jax.jit(
        jax.shard_map(
            grad_body, mesh=mesh,
            in_specs=(P(), P("data", "seq"), P("data", "seq")),
            out_specs=(P(), P()), check_vma=True,
        )
    )(params, imgs, targets)

    np.testing.assert_allclose(float(loss_s), float(ref_loss), rtol=1e-6)
    flat_r, _ = jax.tree_util.tree_flatten(ref_grads)
    flat_s, treedef = jax.tree_util.tree_flatten(grads_s)
    for a, b in zip(flat_r, flat_s):
        a, b = np.asarray(a), np.asarray(b)
        tol = 1e-5 * max(1.0, float(np.max(np.abs(a))))
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=tol, err_msg=str(treedef))


def test_forced_shmap_dp_equivalence(tmp_path, monkeypatch):
    """The shard_map step path with a PLAIN data-parallel mesh (the variant real
    multi-chip TPU runs use, where pallas_call must see per-shard operands) matches
    the 1-device jit path on losses/val metrics.  HEAL_SWIN_FORCE_SHMAP=1 exercises
    it on the CPU mesh."""
    losses_1, vloss_1, viou_1, _ = _train(tmp_path, 1, 1, global_batch=8)
    monkeypatch.setenv("HEAL_SWIN_FORCE_SHMAP", "1")
    losses_s, vloss_s, viou_s, _ = _train(tmp_path, 8, 1, global_batch=8)
    np.testing.assert_allclose(losses_1, losses_s, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(vloss_1, vloss_s, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(viou_1, viou_s, rtol=0.05, atol=0.005)


def test_sp_depth_train_smoke(tmp_path):
    """Depth task under (dp=2, sp=2): psum'd masked-mean losses and additive depth
    metric increments stay finite and the run completes."""
    run_config = get_config_from_config_path(
        "run_configs/depth_swin_hp_test_run_config.py", "get_train_run_config"
    )
    dm, data_spec = get_data_module(run_config.data)
    task_cls = MODEL_FROM_CONFIG_NAME[type(run_config.model).__name__]
    task = task_cls(run_config.model, data_spec, run_config.data)

    store = MlflowFileStore(tmp_path / "mlruns_depth_sp")
    run = store.create_run("sp_depth")
    pl = PLConfig(
        max_epochs=1, limit_train_batches=1, limit_val_batches=1,
        num_sanity_val_steps=0, log_every_n_steps=1, gpus=4, seq_parallel_devices=2,
    )
    trainer = Trainer(pl, run_config.train, run=run, ckpt_dir=None)
    result = trainer.fit(task, dm)
    assert np.isfinite(result.last_metrics["train_loss"])
    assert np.isfinite(result.last_metrics["val_mse"])


def test_forced_shmap_fused_tail_matches_plain(tmp_path, monkeypatch):
    """Trainer fit under HEAL_SWIN_FORCE_SHMAP with the fused decoder tail ACTIVE
    (HEAL_SWIN_FH_INTERPRET=1; dp=4 x sp=2 mesh) == the plain 1-device jit path:
    the kernel's psum'd CE num/den and its shard-local confusion-matrix metric
    increments wire correctly through the real train/eval steps.  Tolerances are
    the fused-vs-plain kernel noise (f32-close, not bit-equal), not sharding
    noise."""
    losses_1, vloss_1, viou_1, _ = _train(tmp_path, 1, 1, global_batch=8)
    monkeypatch.setenv("HEAL_SWIN_FORCE_SHMAP", "1")
    monkeypatch.setenv("HEAL_SWIN_FH_INTERPRET", "1")
    losses_s, vloss_s, viou_s, _ = _train(tmp_path, 8, 2, global_batch=8)
    assert len(losses_1) == len(losses_s) == 2
    np.testing.assert_allclose(losses_1, losses_s, rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(vloss_1, vloss_s, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(viou_1, viou_s, rtol=0.05, atol=0.01)


def test_sp_rng_streams():
    """Element-dropout keys are iid PER TOKEN SHARD while the DropPath stream is
    shard-invariant (tasks._task_rngs): pre-fix, every 'seq' shard drew the same
    local mask, making dropout spatially periodic with period npix/n_shards."""
    from heal_swin_tpu.models.tasks import _task_rngs

    sp = 4
    mesh = _seq_mesh(sp)

    def body():
        rngs = _task_rngs(jax.random.PRNGKey(0), ("seq", sp))
        d = jax.random.key_data(rngs["dropout"]).reshape(1, -1)
        p = jax.random.key_data(rngs["drop_path"]).reshape(1, -1)
        return d, jax.lax.psum(p, "seq")

    d, p = jax.jit(
        jax.shard_map(body, mesh=mesh, in_specs=(), out_specs=(P(None, "seq"), P()),
                      check_vma=True)
    )()
    d = np.asarray(d).reshape(sp, -1)
    assert len({tuple(row) for row in d}) == sp, "dropout keys must differ per shard"
    base = np.asarray(jax.random.key_data(jax.random.PRNGKey(0))) * sp
    np.testing.assert_array_equal(np.asarray(p).ravel(), base.ravel())

    # unsharded: single 'dropout' stream, exactly as before
    rngs = _task_rngs(jax.random.PRNGKey(0), None)
    assert set(rngs) == {"dropout"}


def test_drop_path_prefers_drop_path_stream():
    """models/layers.DropPath draws from the 'drop_path' stream when provided (the
    per-sample mask must agree across a sample's token shards) and falls back to
    'dropout' otherwise."""
    from heal_swin_tpu.models.layers import DropPath

    m = DropPath(rate=0.5)
    x = jnp.ones((64, 3, 2))
    params = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
                    x, False)

    def run(**rngs):
        return np.asarray(m.apply(params, x, False, rngs=rngs))

    k1, k2, k3 = (jax.random.PRNGKey(i) for i in (1, 2, 3))
    # same drop_path key, different dropout keys -> same per-sample mask
    np.testing.assert_array_equal(run(dropout=k1, drop_path=k3),
                                  run(dropout=k2, drop_path=k3))
    # different drop_path keys -> different mask (rate 0.5, 64 samples)
    assert (run(dropout=k1, drop_path=k1) != run(dropout=k1, drop_path=k2)).any()
    # no drop_path stream -> falls back to 'dropout'
    assert (run(dropout=k1) != run(dropout=k2)).any()


def test_sp_depth_gradient_equivalence():
    """Depth-task gradients from the shard-mapped (dp=2, sp=4) loss == plain
    global-batch gradients: pins the masked-mean num/den psum in the depth losses
    (training/losses.py _masked_mean axis_names) the seg test cannot reach."""
    run_config = get_config_from_config_path(
        "run_configs/depth_swin_hp_test_run_config.py", "get_train_run_config"
    )
    dm, data_spec = get_data_module(run_config.data)
    task_cls = MODEL_FROM_CONFIG_NAME[type(run_config.model).__name__]
    task = task_cls(run_config.model, data_spec, run_config.data)

    rng = jax.random.PRNGKey(0)
    loader = dm.train_dataloader()
    loader.batch_size = 4
    loader.set_epoch(0)
    imgs, targets = next(iter(loader))
    imgs, targets = jnp.asarray(imgs), jnp.asarray(targets)
    params = jax.jit(task.init_variables)(rng, imgs[:1])

    ref_loss, ref_grads = jax.jit(
        jax.value_and_grad(lambda p: task.loss_fn(p, imgs, targets)[0])
    )(params)

    dp, sp = 2, 4
    mesh = Mesh(np.asarray(jax.devices()[: dp * sp]).reshape(dp, sp), ("data", "seq"))
    axes = ("data", "seq")

    def grad_body(params, imgs, targets):
        def lf(p):
            return task.loss_fn(p, imgs, targets, axis_names=axes, seq=("seq", sp))[0]

        return jax.value_and_grad(lf)(params)

    loss_s, grads_s = jax.jit(
        jax.shard_map(
            grad_body, mesh=mesh,
            in_specs=(P(), P("data", "seq"), P("data", "seq")),
            out_specs=(P(), P()), check_vma=True,
        )
    )(params, imgs, targets)

    np.testing.assert_allclose(float(loss_s), float(ref_loss), rtol=1e-6)
    flat_r, treedef = jax.tree_util.tree_flatten(ref_grads)
    flat_s, _ = jax.tree_util.tree_flatten(grads_s)
    for a, b in zip(flat_r, flat_s):
        a, b = np.asarray(a), np.asarray(b)
        tol = 1e-5 * max(1.0, float(np.max(np.abs(a))))
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=tol, err_msg=str(treedef))


def test_sp_checkpoint_resume_e2e(tmp_path, monkeypatch):
    """Checkpoint/resume over a (data, seq) mesh: train 1 epoch at dp2 x sp2,
    resume for a 2nd, and match the straight 2-epoch sp run's losses — the
    replicated-param snapshot/restore (put_replicated on a 2-D mesh) composes with
    the sequence-parallel shard_map steps."""
    monkeypatch.setenv("HEAL_SWIN_MLRUNS", str(tmp_path / "mlruns"))

    from heal_swin_tpu.train import train_model
    from heal_swin_tpu.resume import main as resume_main
    from heal_swin_tpu.training.train_config import ResumeConfig

    def cfgs(max_epochs):
        run_config = get_config_from_config_path(CONFIG, "get_train_run_config")
        model_cfg = dataclasses.replace(
            run_config.model,
            swin_hp_transformer_config=dataclasses.replace(
                run_config.model.swin_hp_transformer_config, drop_path_rate=0.0
            ),
        )
        run_config = dataclasses.replace(run_config, model=model_cfg)
        pl = PLConfig(
            max_epochs=max_epochs, limit_train_batches=1, limit_val_batches=1,
            num_sanity_val_steps=0, log_every_n_steps=1, gpus=4,
            seq_parallel_devices=2,
        )
        return run_config, pl

    # straight 2-epoch run
    run_config, pl = cfgs(2)
    straight_id, _ = train_model(run_config, pl)
    # 1 epoch + resume for the 2nd
    run_config, pl = cfgs(1)
    first_id, _ = train_model(run_config, pl)
    pl = dataclasses.replace(pl, max_epochs=2)
    resumed_id, result = resume_main(
        None, pl, ResumeConfig(path=first_id, epoch="last", train_run_config=run_config)
    )
    assert result.epochs_run == 1

    store = MlflowFileStore(tmp_path / "mlruns")
    straight = [v for _, v, _ in store.get_run(straight_id).get_metric_history("train_loss")]
    first = [v for _, v, _ in store.get_run(first_id).get_metric_history("train_loss")]
    resumed = [v for _, v, _ in store.get_run(resumed_id).get_metric_history("train_loss")]
    np.testing.assert_allclose(first + resumed, straight, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("kind", ["random", "ring_shift", "roll"])
def test_a2a_permute_matches_unsharded(kind):
    """The boundary all-to-all exchange (sharded_permute_tokens_a2a): value AND
    gradient equal jnp.take, for a dense random permutation (worst case), the real
    ring-shift permutation (3-6% cross-shard), and a roll."""
    from heal_swin_tpu.parallel.sequence import sharded_permute_tokens_a2a

    rng = np.random.RandomState(1)
    sp = 4
    if kind == "random":
        N = 128
        perm = rng.permutation(N).astype(np.int32)
    elif kind == "roll":
        N = 128
        perm = ((np.arange(N) + 5) % N).astype(np.int32)
    else:
        from heal_swin_tpu.ops.shifting import get_shift_spec

        spec = get_shift_spec("ring_shift", 2048, 8, 16, 8)
        perm = np.asarray(spec.perm, np.int32)
        N = perm.size
    inv = np.argsort(perm).astype(np.int32)
    B, C = 2, 5
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    g = jnp.asarray(rng.randn(B, N, C).astype(np.float32))

    ref = jnp.take(x, jnp.asarray(perm), axis=1)
    ref_dx = jax.grad(lambda x: jnp.sum(jnp.take(x, jnp.asarray(perm), axis=1) * g))(x)

    mesh = _seq_mesh(sp)

    y = jax.jit(
        jax.shard_map(
            lambda x: sharded_permute_tokens_a2a(x, perm, inv, "seq", sp),
            mesh=mesh, in_specs=P(None, "seq"), out_specs=P(None, "seq"),
            check_vma=True,
        )
    )(x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))

    def loss(x, g):
        y = sharded_permute_tokens_a2a(x, perm, inv, "seq", sp)
        return jax.lax.psum(jnp.sum(y * g), "seq")

    dx = jax.jit(
        jax.shard_map(
            jax.grad(loss), mesh=mesh,
            in_specs=(P(None, "seq"), P(None, "seq")), out_specs=P(None, "seq"),
            check_vma=True,
        )
    )(x, g)
    np.testing.assert_array_equal(np.asarray(dx), np.asarray(ref_dx))


def test_sp_forward_equivalence_a2a_exchange(monkeypatch):
    """Full-model SP forward with HEAL_SWIN_SEQ_EXCHANGE=all_to_all == unsharded,
    bit-exact (same check as test_sp_forward_equivalence, boundary exchange)."""
    monkeypatch.setenv("HEAL_SWIN_SEQ_EXCHANGE", "all_to_all")
    test_sp_forward_equivalence("ring_shift")


def test_sp_train_equivalence_a2a_exchange(tmp_path, monkeypatch):
    """2 epochs at dp=2 x sp=4 with the boundary all-to-all exchange == the
    1-device run: the exchange plugs into the full train/eval loop (losses and
    psum'd val metrics), not just the isolated primitive."""
    losses_1, vloss_1, viou_1, _ = _train(tmp_path, 1, 1)
    monkeypatch.setenv("HEAL_SWIN_SEQ_EXCHANGE", "all_to_all")
    losses_s, vloss_s, viou_s, _ = _train(tmp_path, 8, 4)
    np.testing.assert_allclose(losses_1, losses_s, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(vloss_1, vloss_s, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(viou_1, viou_s, rtol=0.05, atol=0.005)


def test_match_vma_psum_axis_order_is_canonical():
    """The r5 multi-process fix: match_vma must emit its grad psum with a
    DETERMINISTIC axis order (mesh axis_name order), not frozenset iteration
    order — a multi-axis psum's replica-group flattening depends on the axis
    tuple order (("data","seq") -> {{0..7}} ascending vs ("seq","data") ->
    {{0,2,4,6,1,3,5,7}}), and frozenset order is string-hash dependent, i.e.
    differs across coordinator-connected processes under hash randomization,
    which made their gloo rendezvous keys never match (test_multihost.py's
    former deterministic failure)."""
    import re

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from heal_swin_tpu.parallel.sequence import _canonical_axis_order, match_vma

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "seq"))

    def f(x):
        w = jnp.float32(3.0)  # enters replicated (invariant)

        def loss(w):
            return jnp.sum(x * w)

        g = jax.grad(loss)(w)  # varying over both axes
        return match_vma(g, w)

    with mesh:
        jf = jax.jit(
            jax.shard_map(f, mesh=mesh, in_specs=(P("data", "seq"),), out_specs=P())
        )
        xs = jax.device_put(
            np.ones((8, 4), np.float32), NamedSharding(mesh, P("data", "seq"))
        )
        txt = jf.lower(xs).compile().as_text()
        groups = set(re.findall(r"replica_groups=\{\{([0-9,]+)\}\}", txt))
        # the grad psum over BOTH axes must flatten ascending (the ("data",
        # "seq") order) — the hash-order alternative is {{0,2,4,6,1,3,5,7}}
        assert "0,1,2,3,4,5,6,7" in groups, groups
        assert "0,2,4,6,1,3,5,7" not in groups, groups
        out = jf(xs)
        assert float(np.asarray(out)) == 32.0  # psum of per-shard sums

    # outside any mesh: falls back to sorted() — still deterministic
    assert _canonical_axis_order({"zeta", "alpha"}) == ("alpha", "zeta")
