"""Launcher CLI: mirrors reference ``run.py`` (the repo-root ``run.py`` is a thin
shim over this module; ``pip install -e .`` also exposes it as ``heal-swin-tpu``).

Subcommands: train, resume, evaluate, test-repo, bench, format-code,
start-mlflow-server.  Container wrapping (singularity/docker, reference
run.py:60-104) is not applicable in this TPU deployment — the jax runtime owns
the device; ``--env`` is accepted for config compatibility and ignored with a
notice.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
from pathlib import Path


def _repo_root() -> Path:
    """The source checkout root (for test-repo / bench / format-code, which drive
    repo files outside the installed package)."""
    root = Path(__file__).resolve().parent.parent
    return root


def main():
    parser = argparse.ArgumentParser(description="heal-swin-tpu launcher")
    parser.add_argument("--env", default="local", help="accepted for compat; ignored")
    sub = parser.add_subparsers(dest="cmd", required=True)

    for name in ["train", "resume", "evaluate"]:
        p = sub.add_parser(name)
        p.add_argument("--config_path", required=True)

    p_test = sub.add_parser("test-repo")
    p_test.add_argument(
        "--all", action="store_true",
        help="also run the paper-scale/e2e tests marked slow (full CI tier)",
    )
    p = sub.add_parser("bench")
    p.add_argument("--input", choices=["synthetic", "real"], default="synthetic",
                   help="'real' drives the full input pipeline (decode + prefetch + "
                        "on-device projection) through the actual Trainer")
    sub.add_parser("format-code")  # reference run.py format_code (black)
    p = sub.add_parser("start-mlflow-server")
    p.add_argument("--port", type=int, default=5000)
    p.add_argument("--backend", choices=["filesystem", "builtin"], default="builtin",
                   help="'filesystem' delegates to an installed mlflow binary; "
                        "'builtin' (default) serves the FileStore with the "
                        "lockfile-guarded stdlib server (tracking/server.py)")
    p.add_argument("--workers", type=int, default=1,
                   help="accepted for reference compat (builtin server is threaded)")
    p.add_argument("--timeout", type=int, default=600,
                   help="accepted for reference compat")

    args = parser.parse_args()
    if args.env != "local":
        print(f"note: container env '{args.env}' not applicable on TPU; running locally")

    root = _repo_root()
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
        tests = root / "tests"
        if not tests.is_dir():
            sys.exit(f"test-repo needs the source checkout (no tests/ next to {root})")
        cmd = [sys.executable, "-m", "pytest", str(tests), "-x", "-q"]
        if not args.all:
            # fast tier (reference run.py has a single `pytest` tier; the slow
            # marker keeps the dev loop under ~10 min — full suite via --all)
            cmd += ["-m", "not slow"]
        sys.exit(subprocess.call(cmd, cwd=root))
    elif args.cmd == "bench":
        bench = root / "bench.py"
        if not bench.is_file():
            sys.exit(f"bench needs the source checkout (no bench.py next to {root})")
        env = dict(os.environ, BENCH_INPUT=args.input)
        sys.exit(subprocess.call([sys.executable, str(bench)], env=env, cwd=root))
    elif args.cmd == "format-code":
        rc = subprocess.call(
            [sys.executable, "-m", "black", "--line-length", "99",
             "heal_swin_tpu", "tests", "run_configs", "run.py", "bench.py"],
            cwd=root,
        )
        if rc != 0:
            print("black is not installed in this image; no formatting applied")
        sys.exit(rc)
    elif args.cmd == "start-mlflow-server":
        # reference run.py:69-120 mlf_server: filesystem backend delegates to the
        # mlflow binary; the default backend runs a lockfile-guarded tracking
        # server (ours is the stdlib FileStore server, tracking/server.py, since
        # mlflow/sqlite aren't baked into the TPU image).  The lockfile makes
        # tracking/server.py get_tracking_uri resolve to this server, exactly
        # like the reference's utils/mlflow_utils.py:8-19.
        from heal_swin_tpu.utils.utils import get_mlruns_path

        if args.backend == "filesystem":
            try:
                subprocess.call(
                    ["mlflow", "ui", "--backend-store-uri",
                     f"file://{get_mlruns_path()}", "--port", str(args.port)]
                )
            except FileNotFoundError:
                print(
                    "mlflow is not installed in this image; use the default "
                    "--backend builtin, or browse the FileStore under "
                    f"{get_mlruns_path()} with any mlflow ui pointed at it."
                )
            return
        from heal_swin_tpu.tracking.server import serve

        serve(port=args.port)


if __name__ == "__main__":
    main()
