"""Checkpoint/resume via orbax (the reference's tf.train.Saver analog).

Saves the full train state pytree (params, opt state, batch stats, step,
RNG key) every N steps and restores on startup — which gives actual
resume-on-restart, a capability the reference's end-of-training Saver write
did not wire up (SURVEY.md §5).
"""

from __future__ import annotations

import os


import jax
import orbax.checkpoint as ocp

from semanticsegmentation_tensorflow_tpu.train.state import TrainState


def _abstract_with_sharding(leaf):
    """Template leaf -> ShapeDtypeStruct WITH sharding.

    Orbax warns (and on a mesh, guesses wrong) when a restore template
    leaf carries no sharding; concrete arrays know theirs, and abstract
    ShapeDtypeStructs default to single-device placement. Non-array
    leaves (python ints, key arrays) pass through for StandardRestore to
    handle."""
    if isinstance(leaf, jax.Array):
        if jax.dtypes.issubdtype(leaf.dtype, jax.dtypes.prng_key):
            return leaf  # typed PRNG keys restore from the concrete leaf
        return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype,
                                    sharding=leaf.sharding)
    if isinstance(leaf, jax.ShapeDtypeStruct) and leaf.sharding is None:
        return jax.ShapeDtypeStruct(
            leaf.shape, leaf.dtype,
            sharding=jax.sharding.SingleDeviceSharding(jax.devices()[0]))
    return leaf


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, state: TrainState, wait: bool = False) -> None:
        step = int(jax.device_get(state.step))
        payload = {"step": state.step, "params": state.params,
                   "opt_state": state.opt_state,
                   "batch_stats": state.batch_stats, "rng": state.rng}
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state: TrainState, step: int | None = None) -> TrainState:
        """Restore into the structure of ``state`` (must be pre-created)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            if any(isinstance(l, jax.ShapeDtypeStruct)
                   for l in jax.tree.leaves(state)):
                raise FileNotFoundError(
                    f"no checkpoint found in {self._mgr.directory!r} and the "
                    "restore template is abstract (shapes only) — train "
                    "first or pass a real state")
            return state
        template = {"step": state.step, "params": state.params,
                    "opt_state": state.opt_state,
                    "batch_stats": state.batch_stats, "rng": state.rng}
        template = jax.tree.map(_abstract_with_sharding, template)
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template))
        return state.replace(**restored)

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
