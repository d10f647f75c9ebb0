"""Windowing of nested-order HEALPix pixel sequences.

Because nested ordering stores every aligned run of ``window_size`` (a power of 4,
or more generally a power of 2) pixels as a spatially contiguous block, window
partitioning is a pure reshape — ideal on TPU where reshapes are free layout changes.

Reference behavior: ``heal_swin/models_torch/hp_windowing.py:6-62``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def window_partition(x: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """(B, N, C) -> (B * N // ws, ws, C).  Pure reshape."""
    B, N, C = x.shape
    return x.reshape(B * (N // window_size), window_size, C)


def window_reverse(windows: jnp.ndarray, window_size: int, N: int) -> jnp.ndarray:
    """(B * N // ws, ws, C) -> (B, N, C).  Pure reshape."""
    nw = N // window_size
    B = windows.shape[0] // nw
    return windows.reshape(B, N, windows.shape[-1])


def get_nest_win_idcs(window_size: int) -> np.ndarray:
    """sqrt(ws) x sqrt(ws) grid holding the nested (Z-order) index of each cell.

    Used to translate 2-D relative-position indices into nested order for the
    flat relative-position bias (reference ``hp_windowing.py:43-62``).  The nested
    scheme within a window: index 0 is the (0, 1) cell of each 2x2 quad, i.e. children
    are ordered (x, y+1), (x, y), (x+1, y+1), (x+1, y).
    """
    side = int(round(np.sqrt(window_size)))
    assert side * side == window_size, "window_size must be a perfect square"
    result = np.zeros((side, side), dtype=np.int64)

    def fill(idx, x, y, size):
        if size == 2:
            result[x, y + 1] = idx
            result[x, y] = idx + 1
            result[x + 1, y + 1] = idx + 2
            result[x + 1, y] = idx + 3
        else:
            h = size // 2
            q = size * size // 4
            fill(idx, x, y + h, h)
            fill(idx + q, x, y, h)
            fill(idx + 2 * q, x + h, y + h, h)
            fill(idx + 3 * q, x + h, y, h)

    fill(0, 0, 0, side)
    return result
