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

def zero1_spec(x, mesh: Mesh) -> P:
    """Per-leaf PartitionSpec for ZeRO-1 optimizer-state sharding.

    A leaf shards its LAST axis over the data axis when that axis divides
    evenly (conv kernels' cout and biases' width are 64..4096 here — all
    multiples of any practical mesh); everything else (adam's scalar
    count, the tiny num_classes-wide score layers) stays replicated. The
    same rule, applied to the matching PARAM leaf's shape, drives the
    slicing inside the train step (train/step.py:_zero1_apply_gradients) —
    the two must agree, which they do because optimizer moments mirror
    param shapes exactly.
    """
    n = int(mesh.shape[DATA_AXIS])
    shape = getattr(x, "shape", ())
    if len(shape) >= 1 and shape[-1] >= n and shape[-1] % n == 0:
        return P(*([None] * (len(shape) - 1)), DATA_AXIS)
    return P()


def shard_state_zero1(state, mesh: Mesh):
    """Place a TrainState for ZeRO-1: params/rest replicated, each
    optimizer-state leaf sharded per :func:`zero1_spec`. Adam on the
    fc4096 FCN-8s carries ~1.07 GB of f32 moments — this stores 1/n of
    them per chip (the update then runs on 1/n-sized slices and
    all_gathers the fresh params, the classic ZeRO-1 exchange).
    """
    def _place(x):
        sharding = NamedSharding(mesh, zero1_spec(x, mesh))
        if jax.process_count() > 1:
            # device_put rejects shardings spanning non-addressable devices.
            # Every process holds the same full leaf (same seed / same
            # restored checkpoint), so each supplies its addressable shards
            # by slicing the replicated host copy — works for any process
            # count and either spec (sharded last axis or fully replicated).
            host = np.asarray(x)
            return jax.make_array_from_callback(
                host.shape, sharding, lambda idx: host[idx])
        return jax.device_put(x, sharding)

    opt = jax.tree.map(_place, state.opt_state)
    rest = replicate(state.replace(opt_state={}), mesh)
    return rest.replace(opt_state=opt)


def state_specs_zero1(state, mesh: Mesh):
    """TrainState-shaped tree of PartitionSpecs matching
    :func:`shard_state_zero1`'s placement (shard_map in/out_specs)."""
    specs = jax.tree.map(lambda _: P(), state)
    opt = jax.tree.map(lambda x: zero1_spec(x, mesh), state.opt_state)
    return specs.replace(opt_state=opt)
