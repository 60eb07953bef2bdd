"""Mesh construction helpers."""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, rows: int | None = None,
              cols: int | None = None) -> Mesh:
    """Build a 2D ('rows','cols') mesh. Default shape: as square as possible
    with cols <= rows (row sharding scales output/windows, col sharding
    scales the x slice)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if rows is None or cols is None:
        cols = 1
        for c in range(int(np.sqrt(n)), 0, -1):
            if n % c == 0:
                cols = c
                break
        rows = n // cols
    assert rows * cols == n
    return Mesh(np.asarray(devs).reshape(rows, cols), ("rows", "cols"))
