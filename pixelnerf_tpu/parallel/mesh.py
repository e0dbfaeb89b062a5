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


# Per-batch-key sharding kinds for a ("data", "rays") train mesh.  "data"
# tensors carry one slice per object (axis 0 = SB); "rays" tensors add a
# per-object ray axis (axis 1 = R) sharded over the mesh's ray dimension.
# This table is the single source of truth for which keys a training batch
# may contain — prepare_ray_batch (train/trainer.py) must not emit a key
# that is absent here (pinned by tests/test_train_pipeline.py), which is
# what let round 3's new "mask_gt" key silently break the driver dryrun.
BATCH_KEY_KINDS = {
    "src_images": "data",
    "src_poses": "data",
    "focal": "data",
    "c": "data",
    "rays": "rays",
    "rgb_gt": "rays",
    "mask_gt": "rays",
}


def batch_shardings(mesh: Mesh, batch: dict) -> dict:
    """NamedSharding per tensor of one training batch over a ("data", "rays")
    mesh.  Any axis whose size does not divide the mesh axis falls back to
    replication (e.g. the validate path's SB=1 batches on a data>1 mesh) —
    replication is semantically identical, just unsharded along that axis.

    Shared by Trainer._batch_shardings and the driver's dryrun_multichip so
    a new batch key can never be sharded in one and missing in the other.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    data_n = mesh.shape["data"]
    rays_n = mesh.shape["rays"]

    out = {}
    for k, v in batch.items():
        kind = BATCH_KEY_KINDS.get(k)
        if kind is None:
            raise KeyError(
                f"batch key {k!r} has no sharding kind; add it to "
                "parallel.mesh.BATCH_KEY_KINDS"
            )
        d = "data" if v.shape[0] % data_n == 0 else None
        if kind == "data":
            out[k] = NamedSharding(mesh, P(d))
        else:
            r = "rays" if v.shape[1] % rays_n == 0 else None
            out[k] = NamedSharding(mesh, P(d, r))
    return out
