"""Pluggable site configuration (reference compute_environment/, L1 in SURVEY.md §1).

Resolution order for paths: (1) an optional ``current_environment.py`` module on the
path exporting PATHS/CONTAINER/LOGGING (the reference's site-override mechanism),
(2) HEAL_SWIN_DATA_ROOT / HEAL_SWIN_MLRUNS environment variables, (3) local defaults
(./datasets, ./mlruns).  Container config is not applicable on TPU and kept only for
config compatibility."""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from pathlib import Path


@dataclass
class Paths:
    datasets: Path = field(
        default_factory=lambda: Path(os.environ.get("HEAL_SWIN_DATA_ROOT", "datasets"))
    )
    mlruns: Path = field(
        default_factory=lambda: Path(os.environ.get("HEAL_SWIN_MLRUNS", "mlruns"))
    )


@dataclass
class Container:
    name: str = "none (TPU-native, no container wrapping)"


@dataclass
class Logging:
    mlflow_backend: str = "filesystem"  # FileStore format, browsable by mlflow ui


try:  # site override, like the reference's current_environment.py symlink
    from current_environment import CONTAINER, LOGGING, PATHS  # type: ignore  # noqa: F401
except ImportError:
    PATHS = Paths()
    CONTAINER = Container()
    LOGGING = Logging()


def inform():
    """Print the active environment and ensure the directories exist
    (reference compute_environment.py:16-43)."""
    print(f"datasets: {PATHS.datasets.absolute()}")
    print(f"mlruns:   {PATHS.mlruns.absolute()}")
    PATHS.mlruns.mkdir(parents=True, exist_ok=True)
