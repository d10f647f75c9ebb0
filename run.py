#!/usr/bin/env python3
"""Launcher CLI: mirrors reference ``run.py``.

Subcommands: train, resume, evaluate, test-repo, bench, start-mlflow-server.
Container wrapping (singularity/docker) is not applicable in this TPU deployment —
the jax runtime owns the device; ``--env`` is accepted for config compatibility and
ignored with a notice.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys


def main():
    parser = argparse.ArgumentParser(description="heal-swin-tpu launcher")
    parser.add_argument("--env", default="local", help="accepted for compat; ignored")
    sub = parser.add_subparsers(dest="cmd", required=True)

    for name in ["train", "resume", "evaluate"]:
        p = sub.add_parser(name)
        p.add_argument("--config_path", required=True)

    sub.add_parser("test-repo")
    p = sub.add_parser("bench")
    p.add_argument("--input", choices=["synthetic", "real"], default="synthetic",
                   help="'real' drives the full input pipeline (decode + prefetch + "
                        "on-device projection) through the actual Trainer")
    sub.add_parser("format-code")  # reference run.py format_code (black)
    p = sub.add_parser("start-mlflow-server")
    p.add_argument("--port", type=int, default=5000)

    args = parser.parse_args()
    if args.env != "local":
        print(f"note: container env '{args.env}' not applicable on TPU; running locally")

    if args.cmd == "train":
        from heal_swin_tpu import train

        sys.argv = ["train", "--config_path", args.config_path]
        train.main()
    elif args.cmd == "resume":
        from heal_swin_tpu import resume
        from heal_swin_tpu.utils import utils

        resume_config = utils.get_config_from_config_path(
            args.config_path, "get_resume_run_config"
        )
        pl_config = utils.get_config_from_config_path(args.config_path, "get_pl_config")
        resume.main(args.config_path, pl_config, resume_config)
    elif args.cmd == "evaluate":
        from heal_swin_tpu import evaluate

        sys.argv = ["evaluate", "--config_path", args.config_path]
        evaluate.main()
    elif args.cmd == "test-repo":
        sys.exit(subprocess.call([sys.executable, "-m", "pytest", "tests/", "-x", "-q"]))
    elif args.cmd == "bench":
        env = dict(os.environ, BENCH_INPUT=args.input)
        sys.exit(subprocess.call([sys.executable, "bench.py"], env=env))
    elif args.cmd == "format-code":
        rc = subprocess.call(
            [sys.executable, "-m", "black", "--line-length", "99",
             "heal_swin_tpu", "tests", "run_configs", "run.py", "bench.py"]
        )
        if rc != 0:
            print("black is not installed in this image; no formatting applied")
        sys.exit(rc)
    elif args.cmd == "start-mlflow-server":
        try:
            from heal_swin_tpu.utils.utils import get_mlruns_path

            subprocess.call(
                ["mlflow", "ui", "--backend-store-uri", f"file://{get_mlruns_path()}",
                 "--port", str(args.port)]
            )
        except FileNotFoundError:
            print(
                "mlflow is not installed in this image; runs are written in the MLflow "
                f"FileStore format under {get_mlruns_path()} and can be browsed with any "
                "mlflow ui pointed at that directory."
            )


if __name__ == "__main__":
    main()
