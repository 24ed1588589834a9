"""Device-mesh and sharding helpers.

The reference's entire parallelism story is dormant torch.distributed/NCCL
data parallelism (src/utils/misc.py:390-412; see SURVEY.md §2).  The
TPU-native story: a ``jax.sharding.Mesh`` over the slice with named axes

- ``dp``  — data parallel: frames (detector training / batched inference)
            or scenes sharded across chips; gradients reduce over ICI.
- ``mp``  — map parallel: the mapping stage's object axis — each chip
            optimizes a shard of a scene's objects (they are independent).

jit + NamedSharding annotations compile to XLA collectives; nothing in the
framework issues explicit psums for DP (the global-program formulation
handles it), keeping every step a single compiled region.
"""
from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: dict[str, int] | None = None,
              devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Build a mesh; default: all devices on one ``dp`` axis."""
    if devices is None:
        devices = jax.devices()
    if axis_sizes is None:
        axis_sizes = {"dp": len(devices)}
    names = tuple(axis_sizes)
    sizes = tuple(axis_sizes.values())
    assert int(np.prod(sizes)) == len(devices), (sizes, len(devices))
    return Mesh(np.asarray(devices).reshape(sizes), names)


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) axis of every array in a pytree."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "dp"):
    """Place a host pytree with its leading axis sharded over ``axis``."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def shard_local_batch(local_batch, mesh: Mesh, axis: str = "dp"):
    """Form a GLOBAL batch from each process's local shard (multi-process).

    ``device_put`` of a full array only works when every mesh device is
    addressable; under real multi-process SPMD each host holds only its own
    slice of the global batch, so the global array is assembled from
    per-process shards (torch's DistributedSampler+DDP equivalent,
    reference src/utils/misc.py:390-412 — here one jit over a global mesh).
    """
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        local_batch,
    )


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0,
                    fill=0.0) -> np.ndarray:
    """Pad an axis up to a multiple (so batches divide evenly over the mesh)."""
    n = x.shape[axis]
    target = -(-n // multiple) * multiple
    if target == n:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - n)
    return np.pad(x, pad, constant_values=fill)
