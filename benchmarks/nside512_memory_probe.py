#!/usr/bin/env python3
"""HBM memory math for the flagship nside-512 SP config (r4, VERDICT item 6).

Compiles the EXACT flagship train step (paper architecture, nside=512 ->
2,097,152-pixel inputs, batch 1) ahead-of-time and prints XLA's own memory
analysis — the authoritative per-device HBM budget, not an estimate:

  * ``--backend tpu`` (default when a TPU is attached): single-chip, no SP.
    If args+temps exceed one v5e's 16 GB the compiler's own numbers prove the
    config needs sequence parallelism; per-SP-shard cost is then temp/sp plus
    the replicated params/optimizer (all activations are token-sharded).
  * ``--backend cpu``: the dp2 x sp4 shard_map step over the 8-virtual-device
    mesh (the same lowering tests/test_nside512_sp.py traces), memory analysis
    per CPU device — shard-level shapes, same HLO the TPU mesh would get.

Results are tabulated in docs/PERFORMANCE.md ("nside-512 memory math").

Usage: python benchmarks/nside512_memory_probe.py [--backend tpu|cpu] [--nside N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fmt(b):
    return f"{b / 2**30:.2f} GiB" if b >= 2**29 else f"{b / 2**20:.1f} MiB"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", choices=["tpu", "cpu"], default="tpu")
    ap.add_argument("--nside", type=int, default=512)
    args = ap.parse_args()

    if args.backend == "cpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        )
    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from heal_swin_tpu.data.data_spec import DataSpec
    from heal_swin_tpu.models.tasks import MODEL_FROM_CONFIG_NAME
    from heal_swin_tpu.training.optimizer import make_optimizer
    from heal_swin_tpu.training.trainer import Trainer
    from heal_swin_tpu.utils.utils import get_config_from_config_path

    CONFIG = "run_configs/segmentation/swin_hp_woodscape_nside512_sp_train_run_config.py"
    npix = 8 * args.nside * args.nside

    run_config = get_config_from_config_path(CONFIG, "get_train_run_config")
    pl = get_config_from_config_path(CONFIG, "get_pl_config")
    if args.nside != 512:
        run_config = dataclasses.replace(
            run_config, data=dataclasses.replace(run_config.data, input_nside=args.nside)
        )
    if args.backend == "tpu":
        # single chip, no SP: does the flagship config fit ONE v5e?
        pl = dataclasses.replace(pl, gpus=1, seq_parallel_devices=1)

    data_spec = DataSpec(
        dim_in=npix, f_in=3, f_out=len(run_config.model.class_weights), base_pix=8
    )
    task_cls = MODEL_FROM_CONFIG_NAME[type(run_config.model).__name__]
    task = task_cls(run_config.model, data_spec, run_config.data)
    trainer = Trainer(pl, run_config.train)
    tx = make_optimizer(task.optimizer_config, pl.gradient_clip_val or 0.0)
    rng_host = np.asarray(jax.random.PRNGKey(0))
    # always the shard_map builder: over a 1-device mesh it is the jit step
    # (overhead-free, benchmarks/shmap_fused_tail_probe.py), and it is what the
    # real multi-chip mesh runs
    step = trainer._build_train_step_shmap(task, None, tx, rng_host)
    B = run_config.data.common.batch_size * trainer.dp

    imgs1 = jax.ShapeDtypeStruct((1, npix, 3), jnp.float32)
    params_s = jax.eval_shape(task.init_variables, jax.random.PRNGKey(0), imgs1)
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params_s))
    opt_s = jax.eval_shape(tx.init, params_s)
    mstate_s = jax.eval_shape(task.metric_init)
    print(
        f"backend={args.backend} nside={args.nside} npix={npix} "
        f"B={B} dp={trainer.dp} sp={trainer.sp} params={n_params/1e6:.1f}M",
        flush=True,
    )

    lowered = step.lower(
        params_s, opt_s, mstate_s,
        jax.ShapeDtypeStruct((), jnp.float32),
        jax.ShapeDtypeStruct((B, npix, 3), jnp.float32),
        jax.ShapeDtypeStruct((B, npix), jnp.int32),
        jax.ShapeDtypeStruct((), jnp.int32),
    )
    print("lowered; compiling...", flush=True)
    try:
        compiled = lowered.compile()
    except Exception as e:  # noqa: BLE001 — OOM at compile time IS the result
        print(f"COMPILE FAILED: {type(e).__name__}: {str(e)[:2000]}")
        return
    ma = compiled.memory_analysis()
    if ma is None:
        print("memory_analysis unavailable on this backend")
        return
    print(f"argument_size   = {fmt(ma.argument_size_in_bytes)}")
    print(f"output_size     = {fmt(ma.output_size_in_bytes)}")
    print(f"alias_size      = {fmt(ma.alias_size_in_bytes)} (donated args)")
    print(f"temp_size       = {fmt(ma.temp_size_in_bytes)} (activations/workspace)")
    live = (
        ma.argument_size_in_bytes
        + ma.output_size_in_bytes
        - ma.alias_size_in_bytes
        + ma.temp_size_in_bytes
    )
    print(f"peak live       = {fmt(live)}  (args + outputs - aliased + temps)")


if __name__ == "__main__":
    main()
