"""Multi-process (pod) launch: ``jax.distributed`` wiring.

On a TPU pod each host runs one copy of the same program, owning the chips
wired to it; collectives ride ICI between them. Where a torch/TF reference
would spin up NCCL/MPI process groups (SURVEY.md §5 "distributed comm
backend"), the TPU-native equivalent is ``jax.distributed.initialize`` —
one coordinator, N processes, and from then on every ``jax.Array`` is a
global array and every psum/all_gather XLA emits spans the whole pod.

Call :func:`initialize_distributed` once at process start (before any
device access). Three ways to configure it, in precedence order:

1. explicit arguments (``--coordinator``/``--num-processes``/``--process-id``
   CLI flags on the entry scripts),
2. ``SEG_COORDINATOR`` / ``SEG_NUM_PROCESSES`` / ``SEG_PROCESS_ID`` env vars
   (what a cluster scheduler template would set),
3. nothing — on real TPU pod slices JAX auto-detects all three from the
   TPU metadata server, so a bare ``initialize_distributed()`` is the
   normal production path.

After init, the rest of the framework needs no changes: ``make_mesh()``
builds over ``jax.devices()`` (now global), ``BatchLoader(mesh=...)`` loads
only this process's 1/process_count slice, and ``shard_batch`` assembles
the global batch via ``make_array_from_process_local_data``.
"""

from __future__ import annotations

import os

import jax

__all__ = [
    "initialize_distributed", "is_primary", "barrier", "primary_print",
]


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None,
                           local_device_ids=None) -> tuple[int, int]:
    """Join (or start) the multi-process runtime; idempotent.

    Returns ``(process_index, process_count)``. With all arguments ``None``
    and no ``SEG_*`` env vars set, defers to JAX's own auto-detection
    (TPU pod metadata / SLURM / Open MPI env conventions).
    """
    # NB: the guard must not call jax.process_count()/devices() — those
    # initialize the XLA backend, after which jax.distributed.initialize
    # raises. Probe only the distributed-client state.
    if _already_initialized():
        return jax.process_index(), jax.process_count()
    coordinator = coordinator or os.environ.get("SEG_COORDINATOR")
    if num_processes is None and os.environ.get("SEG_NUM_PROCESSES"):
        num_processes = int(os.environ["SEG_NUM_PROCESSES"])
    if process_id is None and os.environ.get("SEG_PROCESS_ID"):
        process_id = int(os.environ["SEG_PROCESS_ID"])
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def _already_initialized() -> bool:
    """True if jax.distributed.initialize was already called (a second call
    raises); process_count()==1 cannot distinguish 'uninitialized' from
    'initialized as a 1-process group', so probe the distributed-client
    state (NOT jax.process_count(), which initializes the backend)."""
    if hasattr(jax.distributed, "is_initialized"):
        return bool(jax.distributed.is_initialized())
    from jax._src import distributed as _dist  # older jax: no public probe

    return bool(getattr(_dist.global_state, "client", None))


def is_primary() -> bool:
    """True on the one process that should own logging/printing."""
    return jax.process_index() == 0


def primary_print(*args, **kwargs) -> None:
    """print() on process 0 only — pod runs otherwise interleave N copies
    of every status line."""
    if is_primary():
        print(*args, **kwargs)


def barrier(name: str = "seg_barrier", timeout_s: float = 1800.0) -> None:
    """Block until every process reaches this point.

    Goes through the coordination service (gRPC, arbitrary timeout), NOT a
    device collective: XLA's gloo CPU backend hard-codes a 30 s rendezvous
    deadline on its one-time context init, so the first *device* collective
    doubles as a 30 s-fused barrier — any slower process (a cold jit
    compile, a slow host) kills the job. The entry points therefore call
    this before the first collective-bearing region (orbax manager init,
    first train step) so processes enter it near-aligned."""
    if jax.process_count() == 1:
        return
    from jax._src import distributed as _dist

    client = getattr(_dist.global_state, "client", None)
    if client is not None:
        client.wait_at_barrier(name, int(timeout_s * 1000))
    else:  # initialized by other means; device-collective fallback
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
