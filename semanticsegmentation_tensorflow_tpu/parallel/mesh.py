"""Device mesh + sharding helpers.

One logical axis, ``data``: batches shard over it, params replicate, grads
allreduce across it (psum/pmean compiled by XLA onto ICI rings). Laid out
over the physical device order JAX reports, which on TPU slices follows the
ICI topology — collectives stay on ICI, never DCN, for a single slice.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: list | None = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_batch(batch, mesh: Mesh):
    """Place a host batch on device, sharded along the leading (batch) dim.

    Single-process: ``batch`` is the global batch (leading dim divisible by
    the mesh size). Multi-process (pods): ``batch`` is this host's local
    slice (see BatchLoader's process sharding) and the global array is
    assembled across hosts.
    """
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
