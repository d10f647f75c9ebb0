"""Device-mesh / sharding helpers (the TPU replacement for the reference's
torch.distributed DDP backend, reference heal_swin/train.py:187 + SURVEY.md §5.8).

The framework is data-parallel: one 1-D ``jax.sharding.Mesh`` over the ``data``
axis, parameters/optimizer state replicated, batches sharded on axis 0.  XLA
inserts the gradient all-reduce over ICI from the sharding annotations alone —
there is no explicit collective code anywhere in the training loop.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_data_mesh(n_devices: Optional[int] = None,
                   devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` local devices (all by
    default).  Replaces the reference's ``pl.Trainer(gpus=...)`` device selection."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = list(devices)[: min(n_devices, len(devices))]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    """Sharding for params / optimizer / metric state (every device holds a copy)."""
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Sharding for batches: axis 0 split across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))
