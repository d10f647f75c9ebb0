#!/usr/bin/env python3
"""Headline benchmark: HEAL-SWIN-UNet training throughput (images/sec/chip).

Paper-scale config (reference swin_hp_synwoodscape_large_train_run_config.py:35-92):
nside=256 / base_pix=8 -> 524,288-pixel inputs, SwinUNet-T capacity (embed 96, depths
[2,2,6,2], heads [3,6,12,24], window 64, ring_shift 4, cosine attention, v2 norm,
flat rel-pos bias), batch 2 per chip, Adam.  One fully jitted, donated train step
(forward + weighted-CE + backward + Adam), bf16 compute / f32 params.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md).  We use an
estimated reference throughput of 2.5 images/sec per A100 (fp32, torch 1.8,
train_time_per_sample ~400 ms — derived from the model's ~2 TFLOP/image forward+backward
at the ~15-25% fp32 utilization typical of this unfused windowed-attention workload).
vs_baseline = our_images_per_sec_per_chip / 2.5.

Env knobs: BENCH_NSIDE (default 256), BENCH_BATCH (default 2), BENCH_STEPS (default 20),
BENCH_FUSED=0 to disable the fused decoder-tail kernel (default on, as in training),
BENCH_METRICS=1 to include per-step train-metric accumulation in the step (the real
training-step shape; the fused tail then gets its confusion matrix for free).

BENCH_INPUT=real benchmarks the FULL input path instead of pre-generated device
tensors: host PNG decode -> prefetch loader -> on-device fisheye->HEALPix projection
(projection/device.py) -> jitted train step, driven by the actual Trainer on a
full-resolution (966x1280) synthetic WoodScape fixture.  The reported number is the
trainer's own `train_time_per_sample in ms` (the reference's only throughput metric,
logging_callbacks.py:61-76 — wall time INCLUDING data), averaged over all epochs after
the compile epoch.  Extra knob: BENCH_EPOCHS (default 10).
"""

import json
import os
import sys
import time


def main_real_input():
    """End-to-end throughput with the real input pipeline (loader + on-device
    projection + train step) at paper scale, via the actual Trainer."""
    from pathlib import Path

    import numpy as np

    nside = int(os.environ.get("BENCH_NSIDE", 256))
    batch = int(os.environ.get("BENCH_BATCH", 2))
    epochs = int(os.environ.get("BENCH_EPOCHS", 10))

    n_per_cam = int(os.environ.get("BENCH_N_PER_CAM", 4))  # 3/4 go to train
    root = Path(
        os.environ.get(
            "BENCH_DATA_DIR",
            f"/tmp/heal_swin_bench_data{'' if n_per_cam == 4 else n_per_cam}",
        )
    )
    os.environ["HEAL_SWIN_DATA_ROOT"] = str(root)
    os.environ.setdefault("HEAL_SWIN_MLRUNS", str(root / "mlruns"))

    from heal_swin_tpu.data.synthetic_woodscape import generate

    if not (root / "woodscape").exists():
        print("generating full-res (966x1280) synthetic WoodScape fixture...",
              file=sys.stderr)
        generate(root, version="woodscape", n_per_cam=n_per_cam, W=1280, H=966, seed=0)

    from heal_swin_tpu.data.data import get_data_module
    from heal_swin_tpu.data.data_config import WoodscapeCommonConfig, WoodscapeHPConfig
    from heal_swin_tpu.models.swin_hp import SwinHPTransformerConfig
    from heal_swin_tpu.models.tasks import (
        MODEL_FROM_CONFIG_NAME,
        WoodscapeSegmenterSwinHPConfig,
    )
    from heal_swin_tpu.tracking.mlflow_store import MlflowFileStore
    from heal_swin_tpu.training.train_config import PLConfig, TrainConfig
    from heal_swin_tpu.training.trainer import Trainer

    # BENCH_PROJECT=device (default): host decode -> on-device projection (ships
    # full-res uint8 frames).  BENCH_PROJECT=disk: the reference's pipeline shape —
    # pre-projected uint8 npz datasets on disk (auto-generated once), ~2.5x fewer
    # wire bytes per sample.
    on_device = os.environ.get("BENCH_PROJECT", "device") != "disk"
    data_config = WoodscapeHPConfig(
        common=WoodscapeCommonConfig(
            version="woodscape", batch_size=batch, val_batch_size=batch,
            train_share=0.75,
        ),
        input_nside=nside,
        input_base_pix=8,
        project_on_device=on_device,
    )
    if os.environ.get("BENCH_SMOKE"):  # tiny model for CI-style smoke at small nside
        swin_cfg = SwinHPTransformerConfig(
            patch_size=4, window_size=16, shift_size=8, shift_strategy="ring_shift",
            embed_dim=4, depths=[2, 1], num_heads=[2, 2], dtype="bfloat16",
        )
    else:
        # paper model config (reference swin_hp_synwoodscape_large_train_run_config.py)
        swin_cfg = SwinHPTransformerConfig(
            patch_size=4, window_size=64, shift_size=4, shift_strategy="ring_shift",
            rel_pos_bias="flat", embed_dim=96, depths=[2, 2, 6, 2],
            num_heads=[3, 6, 12, 24], use_cos_attn=True, use_v2_norm_placement=True,
            dtype="bfloat16", gelu_approx=True,
        )
    model_config = WoodscapeSegmenterSwinHPConfig(swin_hp_transformer_config=swin_cfg)

    dm, spec = get_data_module(data_config)
    task = MODEL_FROM_CONFIG_NAME[type(model_config).__name__](
        model_config, spec, data_config
    )
    store = MlflowFileStore(Path(os.environ["HEAL_SWIN_MLRUNS"]))
    run = store.create_run("bench_real_input")
    pl = PLConfig(
        max_epochs=epochs, num_sanity_val_steps=0, check_val_every_n_epoch=10**6,
        log_every_n_steps=10**6,  # per-step host syncs would add tunnel latency
    )
    trainer = Trainer(pl, TrainConfig(seed=0, log_gpu_stats=False), run=run,
                      ckpt_dir=None)
    t0 = time.time()
    trainer.fit(task, dm)
    total = time.time() - t0

    hist = [h[1] for h in run.get_metric_history("train_time_per_sample in ms")]
    assert len(hist) >= 2, "need >= 2 epochs (first epoch is compile)"
    ms_per_sample = float(np.mean(hist[1:]))
    images_per_sec = 1000.0 / ms_per_sample
    print(f"real-input bench: {epochs} epochs in {total:.1f}s; per-epoch "
          f"ms/sample={['%.1f' % h for h in hist]} -> sustained "
          f"{images_per_sec:.2f} img/s", file=sys.stderr)

    reference_a100_imgs_per_sec = 2.5  # documented estimate, see module docstring
    stage = "decode+project+train" if on_device else "load+train (disk-projected)"
    print(json.dumps({
        "metric": "heal_swin_unet_real_input_train_images_per_sec_per_chip",
        "value": round(images_per_sec, 3),
        "unit": f"images/sec/chip ({stage}, nside={nside}, batch {batch})",
        "vs_baseline": round(images_per_sec / reference_a100_imgs_per_sec, 3),
    }))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from heal_swin_tpu.data.data_spec import DataSpec
    from heal_swin_tpu.models.swin_hp import SwinHPTransformerConfig, SwinHPTransformerSys
    from heal_swin_tpu.training.losses import weighted_cross_entropy

    nside = int(os.environ.get("BENCH_NSIDE", 256))
    batch = int(os.environ.get("BENCH_BATCH", 2))
    steps = int(os.environ.get("BENCH_STEPS", 20))
    # "swin_hp" | "swin" | "depth_swin_hp" | "depth_swin" (registry names, models/tasks.py)
    which = os.environ.get("BENCH_MODEL", "swin_hp")
    npix = 8 * nside * nside
    n_classes = 10

    print(f"bench: model={which} nside={nside} npix={npix} batch={batch} on "
          f"{jax.devices()[0]}", file=sys.stderr)

    rng = jax.random.PRNGKey(0)
    if which == "swin":
        # paper flat config (reference swin_synwoodscape_large_train_run_config.py)
        from heal_swin_tpu.models.swin_flat import (
            SwinTransformerConfig, SwinTransformerSys,
        )

        H, W = 640, 768
        cfg = SwinTransformerConfig(
            patch_size=2, window_size=8, shift_size=2, embed_dim=96,
            depths=[2, 2, 6, 2], num_heads=[3, 6, 12, 24], use_cos_attn=True,
            use_v2_norm_placement=True, dtype="bfloat16", gelu_approx=True,
            fused_final_head=os.environ.get("BENCH_FUSED", "1") != "0",
        )
        spec = DataSpec(dim_in=(H, W), f_in=3, f_out=n_classes)
        model = SwinTransformerSys(cfg, spec)
        x = jax.random.uniform(rng, (batch, H, W, 3), jnp.float32, 0.0, 255.0)
        y = jax.random.randint(rng, (batch, H, W), 0, n_classes, jnp.int32)
    elif which == "depth_swin":
        # paper FLAT depth config (reference depth_swin_train_run_config.py:56-92):
        # flat SWIN backbone at 640x768, 1 output channel, masked-l2 loss
        from heal_swin_tpu.models.swin_flat import (
            SwinTransformerConfig, SwinTransformerSys,
        )

        H, W = 640, 768
        cfg = SwinTransformerConfig(
            patch_size=2, window_size=8, shift_size=2, embed_dim=96,
            depths=[2, 2, 6, 2], num_heads=[3, 6, 12, 24], use_cos_attn=True,
            use_v2_norm_placement=True, dtype="bfloat16", gelu_approx=True,
            fused_final_head=os.environ.get("BENCH_FUSED", "1") != "0",
        )
        from heal_swin_tpu.data.data_spec import DepthDataSpec

        spec = DepthDataSpec(dim_in=(H, W), f_in=3, f_out=1)
        x = jax.random.uniform(rng, (batch, H, W, 3), jnp.float32, 0.0, 255.0)
        depths = jax.random.uniform(rng, (batch, H, W), jnp.float32, 0.1, 60.0)
        bg = jax.random.uniform(jax.random.PRNGKey(3), (batch, H, W)) < 0.35
        y = jnp.where(bg, jnp.inf, depths)
    elif which == "depth_swin_hp":
        # paper depth config (reference depth_swin_hp_train_run_config.py:83-129):
        # same backbone capacity, 1 output channel, masked-l2 loss on inf-marked
        # background (~35% of pixels outside the fisheye footprint)
        cfg = SwinHPTransformerConfig(
            patch_size=4, window_size=64, shift_size=4, shift_strategy="ring_shift",
            rel_pos_bias="flat", embed_dim=96, depths=[2, 2, 6, 2],
            num_heads=[3, 6, 12, 24], use_cos_attn=True, use_v2_norm_placement=True,
            dtype="bfloat16", gelu_approx=True,
            fused_final_head=os.environ.get("BENCH_FUSED", "1") != "0",
        )
        from heal_swin_tpu.data.data_spec import DepthDataSpec

        spec = DepthDataSpec(dim_in=npix, f_in=3, f_out=1, base_pix=8)
        x = jax.random.uniform(rng, (batch, npix, 3), jnp.float32, 0.0, 255.0)
        depths = jax.random.uniform(rng, (batch, npix), jnp.float32, 0.1, 60.0)
        bg = jax.random.uniform(jax.random.PRNGKey(3), (batch, npix)) < 0.35
        y = jnp.where(bg, jnp.inf, depths)
    else:
        cfg = SwinHPTransformerConfig(
            patch_size=4, window_size=64, shift_size=4, shift_strategy="ring_shift",
            rel_pos_bias="flat", embed_dim=96, depths=[2, 2, 6, 2],
            num_heads=[3, 6, 12, 24], use_cos_attn=True, use_v2_norm_placement=True,
            dtype="bfloat16", gelu_approx=True,
            fused_final_head=os.environ.get("BENCH_FUSED", "1") != "0",
            # BENCH_REMAT=1: per-block activation rematerialization
            # (use_checkpoint, reference swin_hp_transformer.py:539-547) —
            # prices the img/s + peak-HBM trade for memory-bound batch sizes
            use_checkpoint=os.environ.get("BENCH_REMAT") == "1",
        )
        spec = DataSpec(dim_in=npix, f_in=3, f_out=n_classes, base_pix=8)
        model = SwinHPTransformerSys(cfg, spec)
        x = jax.random.uniform(rng, (batch, npix, 3), jnp.float32, 0.0, 255.0)
        y = jax.random.randint(rng, (batch, npix), 0, n_classes, jnp.int32)

    task = None
    if which == "depth_swin_hp":
        from heal_swin_tpu.models.tasks import (
            CommonDepthConfig, WoodscapeDepthSwinHP, WoodscapeDepthSwinHPConfig,
        )

        task = WoodscapeDepthSwinHP(
            WoodscapeDepthSwinHPConfig(
                swin_hp_transformer_config=cfg,
                common_depth_config=CommonDepthConfig(loss="l2"),
            ),
            spec,
        )
        model = task.model  # f_out=1 head
    elif which == "depth_swin":
        from heal_swin_tpu.models.tasks import (
            CommonDepthConfig, WoodscapeDepthSwin, WoodscapeDepthSwinConfig,
        )

        task = WoodscapeDepthSwin(
            WoodscapeDepthSwinConfig(
                swin_transformer_config=cfg,
                common_depth_config=CommonDepthConfig(loss="l2"),
            ),
            spec,
        )
        model = task.model  # f_out=1 head

    t0 = time.time()
    params = jax.jit(model.init, static_argnums=2)(rng, x, True)
    print(f"init: {time.time()-t0:.1f}s, params="
          f"{sum(p.size for p in jax.tree.leaves(params)):,}", file=sys.stderr)

    if os.environ.get("BENCH_MODE") == "infer":
        # serving path: jitted forward + argmax (task.predict — the fused
        # decoder-tail predict kernel when enabled), timed as a lax.scan chain
        # (per-call dispatch through the tunnel is ~9 ms, so serial-dependency
        # chaining is the only honest timing — CLAUDE.md)
        import functools

        predict = lambda p, x: jnp.argmax(model.apply(p, x, True), -1)  # noqa: E731
        if which == "swin_hp":
            from heal_swin_tpu.models.tasks import (
                WoodscapeSegmenterSwinHP, WoodscapeSegmenterSwinHPConfig,
            )

            task = WoodscapeSegmenterSwinHP(
                WoodscapeSegmenterSwinHPConfig(swin_hp_transformer_config=cfg), spec
            )
            task.model = model
            print(f"infer: fused predict tail = {task._fused_tail_ok(None)}",
                  file=sys.stderr)
            predict = task.predict

        @functools.partial(jax.jit, static_argnums=2)
        def infer_n(params, x, n):
            def body(tick, _):
                preds = predict(params, x + 0.0 * tick)
                return preds[0, 0].astype(jnp.float32), None

            tick, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return tick

        t0 = time.time()
        _ = float(infer_n(params, x, steps))  # same static length as the timed call
        print(f"infer compile+first: {time.time()-t0:.1f}s", file=sys.stderr)
        t0 = time.time()
        _ = float(infer_n(params, x, steps))
        dt = time.time() - t0
        images_per_sec = batch * steps / dt
        print(f"{steps} inference steps in {dt:.2f}s", file=sys.stderr)
        print(json.dumps({
            "metric": "heal_swin_unet_infer_images_per_sec_per_chip",
            "value": round(images_per_sec, 3),
            "unit": f"images/sec/chip forward+argmax (nside={nside}, batch {batch}, bf16)",
            "vs_baseline": round(images_per_sec / 10.0, 3),  # ~4x the 2.5 train est.
        }))
        return

    tx = optax.adam(9.55e-4)
    opt_state = jax.jit(tx.init)(params)

    import functools

    fused_tail = cfg.fused_final_head
    with_metrics = bool(os.environ.get("BENCH_METRICS"))
    if which in ("swin_hp", "swin") and (fused_tail or with_metrics):
        mode = " + per-step train metrics" if with_metrics else ""
        print(f"bench: task train path (fused={fused_tail}){mode}", file=sys.stderr)
        from heal_swin_tpu.models.tasks import (
            WoodscapeSegmenterSwin, WoodscapeSegmenterSwinConfig,
            WoodscapeSegmenterSwinHP, WoodscapeSegmenterSwinHPConfig,
        )

        if which == "swin_hp":
            task = WoodscapeSegmenterSwinHP(
                WoodscapeSegmenterSwinHPConfig(swin_hp_transformer_config=cfg), spec
            )
        else:
            task = WoodscapeSegmenterSwin(
                WoodscapeSegmenterSwinConfig(swin_transformer_config=cfg), spec
            )
        task.model = model  # same module/params
        if fused_tail:
            assert task._fused_tail_ok(None), "fused tail gate rejected the bench config"
    elif which in ("depth_swin_hp", "depth_swin"):
        print(f"bench: depth task train path (fused_final_head={cfg.fused_final_head})",
              file=sys.stderr)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, mstate, x, y, step_rng):
        def loss_fn(p):
            if task is not None:
                return task.loss_fn(p, x, y, rng=step_rng, deterministic=False)
            logits = model.apply(p, x, False, rngs={"dropout": step_rng})
            return weighted_cross_entropy(logits, y), logits

        (loss, outputs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        if with_metrics:
            mstate = task.metric_update(mstate, outputs, y)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, mstate, loss

    mstate = task.metric_init() if with_metrics else jnp.zeros(())

    # warmup / compile.  NOTE: on the axon TPU client block_until_ready() does not
    # reliably synchronize; fetching the value is the only dependable barrier.
    t0 = time.time()
    params, opt_state, mstate, loss = train_step(
        params, opt_state, mstate, x, y, jax.random.PRNGKey(1)
    )
    print(f"compile+first step: {time.time()-t0:.1f}s loss={float(loss):.3f}",
          file=sys.stderr)

    step_rng = jax.random.PRNGKey(2)  # created once: per-step host work adds tunnel latency
    t0 = time.time()
    for i in range(steps):
        params, opt_state, mstate, loss = train_step(
            params, opt_state, mstate, x, y, step_rng
        )
    _ = float(loss)  # forces the full dependency chain
    dt = time.time() - t0

    images_per_sec = batch * steps / dt
    ms_per_sample = 1000.0 * dt / (batch * steps)
    print(f"{steps} steps in {dt:.2f}s -> {images_per_sec:.2f} img/s "
          f"({ms_per_sample:.1f} ms/sample)", file=sys.stderr)
    try:
        ms = jax.local_devices()[0].memory_stats() or {}
        peak = ms.get("peak_bytes_in_use")
        if peak:
            print(f"device peak_bytes_in_use: {peak / 2**30:.2f} GiB", file=sys.stderr)
    except Exception:
        pass

    # honest self-contained utilization number: analytic fwd FLOPs (XLA-validated,
    # tests/test_flops.py) x3 for fwd+bwd, vs the v5e bf16 peak (197 TFLOP/s)
    from heal_swin_tpu.models.flops import swin_flat_flops, swin_hp_flops

    counter = swin_flat_flops if which in ("swin", "depth_swin") else swin_hp_flops
    fwd_flops = counter(cfg, spec)["total"]
    train_flops = 3.0 * fwd_flops  # fwd + ~2x bwd
    achieved_tflops = images_per_sec * train_flops / 1e12
    v5e_peak_tflops = 197.0
    mfu = achieved_tflops / v5e_peak_tflops
    print(f"analytic: {fwd_flops/1e9:.0f} GFLOP/img fwd -> {achieved_tflops:.1f} "
          f"TFLOP/s achieved, MFU {100*mfu:.1f}% of v5e bf16 peak", file=sys.stderr)

    reference_a100_imgs_per_sec = 2.5  # documented estimate, see module docstring
    metric_name = {
        "swin": "swin_unet_train_images_per_sec_per_chip",
        "depth_swin_hp": "heal_swin_depth_unet_train_images_per_sec_per_chip",
        "depth_swin": "swin_depth_unet_train_images_per_sec_per_chip",
    }.get(which, "heal_swin_unet_train_images_per_sec_per_chip")
    print(json.dumps({
        "metric": metric_name,
        "value": round(images_per_sec, 3),
        "unit": (
            f"images/sec/chip (flat 640x768, batch {batch}, bf16)"
            if which in ("swin", "depth_swin")
            else f"images/sec/chip (nside={nside}, {npix} px, batch {batch}, bf16)"
        ),
        "vs_baseline": round(images_per_sec / reference_a100_imgs_per_sec, 3),
    }))


if __name__ == "__main__":
    if os.environ.get("BENCH_INPUT", "synthetic") == "real":
        main_real_input()
    else:
        main()
