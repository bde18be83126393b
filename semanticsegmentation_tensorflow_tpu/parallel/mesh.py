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
SPATIAL_AXIS = "spatial"


def make_mesh(devices: list | None = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_mesh_2d(data: int, spatial: int,
                 devices: list | None = None) -> Mesh:
    """2-D mesh: batch sharded over ``data``, image HEIGHT sharded over
    ``spatial``. Spatial partitioning splits each image's rows across chips;
    XLA's SPMD partitioner inserts the halo exchanges convolutions need at
    shard boundaries automatically (collectives ride ICI). This is the
    conv-net analog of sequence parallelism (SURVEY.md §5 "spatial
    partitioning ... optional stretch") — it lets activations larger than
    one chip's HBM train without shrinking the batch."""
    devices = list(devices) if devices is not None else jax.devices()
    if data * spatial != len(devices):
        raise ValueError(f"mesh {data}x{spatial} != {len(devices)} devices")
    return Mesh(np.asarray(devices).reshape(data, spatial),
                (DATA_AXIS, SPATIAL_AXIS))


def round_up_to_mesh(n: int, mesh: Mesh) -> int:
    """Smallest multiple of ``mesh.size`` >= n — the batch-size rounding
    rule every mesh CLI applies (scripts/test.py --mesh, scripts/eval.py
    --mesh; sharded leading dims must divide evenly)."""
    return -(-n // mesh.size) * mesh.size


def batch_spec(mesh: Mesh) -> P:
    """PartitionSpec for [N, H, ...] batch leaves under the given mesh."""
    if SPATIAL_AXIS in mesh.axis_names:
        return P(DATA_AXIS, SPATIAL_AXIS)
    return P(DATA_AXIS)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch on device, sharded along the leading (batch) dim.

    Single-process: ``batch`` is the global batch (leading dim divisible by
    the mesh size). Multi-process (pods): ``batch`` is this host's local
    slice (see BatchLoader's process sharding) and the global array is
    assembled across hosts. On a 2-D mesh the image height dim also shards
    over the ``spatial`` axis.
    """
    sharding = NamedSharding(mesh, batch_spec(mesh))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/state) across the mesh.

    Multi-process (pods): device_put rejects shardings spanning
    non-addressable devices; every process holds the same full value
    (same seed / same restored checkpoint), so the global replicated
    array is assembled from the per-process copies."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        def _rep(x):
            if (isinstance(x, jax.Array)
                    and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key)):
                # typed PRNG keys: assemble the raw key data, re-wrap
                impl = str(jax.random.key_impl(x))
                g = jax.make_array_from_process_local_data(
                    sharding, np.asarray(jax.random.key_data(x)))
                return jax.random.wrap_key_data(g, impl=impl)
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))

        return jax.tree.map(_rep, tree)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
