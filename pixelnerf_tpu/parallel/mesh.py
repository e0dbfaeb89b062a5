"""Device-mesh construction.

The reference parallelizes with single-process torch DataParallel over the ray
dimension (nerf.py:354-371) and has no multi-node anything (SURVEY §5.8).  The
TPU-native equivalent is SPMD over a `jax.sharding.Mesh`:

  * eval: 1-D ``("rays",)`` mesh — rays are embarrassingly parallel; the small
    encoded-scene latents are replicated once over ICI, collectives-free loop.
  * train: 2-D ``("data", "rays")`` mesh — object superbatch over "data", the
    per-object ray batch over "rays"; gradients all-reduce via the psum XLA
    inserts for replicated params.

``--gpu_id 'a b c'`` from the reference CLI becomes a device-count hint.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def _pick_devices(n_devices: Optional[int] = None) -> list:
    devices = jax.devices()
    if n_devices is None or n_devices <= 0:
        return devices
    return devices[: min(n_devices, len(devices))]


def make_ray_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over all (or the first n) local devices, axis name "rays"."""
    devices = _pick_devices(n_devices)
    return Mesh(np.array(devices), ("rays",))


def make_train_mesh(
    n_devices: Optional[int] = None, data_parallel: Optional[int] = None
) -> Mesh:
    """2-D ("data", "rays") mesh.  ``data_parallel`` fixes the data axis size;
    by default the mesh is (n, 1) — pure object-batch data parallelism."""
    devices = _pick_devices(n_devices)
    n = len(devices)
    if data_parallel is None:
        data_parallel = n
    assert n % data_parallel == 0, (n, data_parallel)
    arr = np.array(devices).reshape(data_parallel, n // data_parallel)
    return Mesh(arr, ("data", "rays"))
