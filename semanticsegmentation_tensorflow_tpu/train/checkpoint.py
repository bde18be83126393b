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


def _encode_impl(rng) -> "jax.Array":
    """PRNG impl name ('threefry2x32', 'rbg', ...) as a uint8 byte array.

    Under a multi-process launch this fresh array must be a GLOBAL
    fully-replicated array (orbax rejects host-local arrays in multihost
    serialization); every process computes the same bytes, so the
    replicated assembly is trivially consistent."""
    import numpy as np

    name = str(jax.random.key_impl(rng)).encode()
    data = np.frombuffer(name, dtype=np.uint8)
    if jax.process_count() > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        mesh = Mesh(np.asarray(jax.devices()), ("_ckpt",))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, PartitionSpec()), data)
    return jax.numpy.asarray(data)


# impl names jax.random.key accepts; used to resolve an abstract key's
# dtype tag (str(dtype) is the SHORT tag, e.g. 'key<fry>' for threefry2x32,
# which jax.random.key(impl=...) does not accept)
_KNOWN_PRNG_IMPLS = ("threefry2x32", "rbg", "unsafe_rbg")


def _impl_from_dtype(dtype) -> str:
    """Resolve a key dtype (or its short tag) to a jax.random impl name."""
    for impl in _KNOWN_PRNG_IMPLS:
        try:
            if jax.eval_shape(lambda: jax.random.key(0, impl=impl)
                              ).dtype == dtype:
                return impl
        except Exception:  # noqa: BLE001 — impl absent in this jax build
            continue
    # last resort: maybe the tag already is a valid impl name
    tag = str(dtype)
    return tag[4:-1] if tag.startswith("key<") else tag


def _rng_template_leaves(rng):
    """(rng_data, rng_impl) template leaves from a concrete OR abstract
    rng — key_data/key_impl reject ShapeDtypeStructs, so for abstract
    templates the impl is resolved from the key dtype via
    ``_impl_from_dtype`` (the dtype's str() is a short tag like
    'key<fry>', not the impl name jax.random.key accepts)."""
    import numpy as np

    if isinstance(rng, jax.Array):
        return jax.random.key_data(rng), _encode_impl(rng)
    name = _impl_from_dtype(rng.dtype)
    sample = jax.eval_shape(lambda: jax.random.key_data(
        jax.random.key(0, impl=name)))
    return (jax.ShapeDtypeStruct(sample.shape, sample.dtype),
            jax.numpy.asarray(np.frombuffer(name.encode(), dtype=np.uint8)))


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
        # local_devices()[0], not devices()[0]: under multi-process
        # (pod) launch the global list leads with process 0's device,
        # which other processes cannot device_put to
        return jax.ShapeDtypeStruct(
            leaf.shape, leaf.dtype,
            sharding=jax.sharding.SingleDeviceSharding(
                jax.local_devices()[0]))
    return leaf


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, state: TrainState, wait: bool = False) -> None:
        step = int(jax.device_get(state.step))
        # The rng is stored as raw key DATA + impl name, not as a typed key
        # array: key shapes differ per impl (threefry2x32 uint32[2] vs rbg
        # uint32[4]), so storing the typed key couples every checkpoint to
        # the impl the writer happened to use. Data+name restores exactly
        # the original stream under any future default.
        payload = {"step": state.step, "params": state.params,
                   "opt_state": state.opt_state,
                   "batch_stats": state.batch_stats,
                   "rng_data": jax.random.key_data(state.rng),
                   # impl name as uint8 bytes — orbax StandardSave rejects
                   # plain strings
                   "rng_impl": _encode_impl(state.rng)}
        if jax.tree.leaves(state.ema_params):
            # only when tracked — keeps the layout of non-EMA checkpoints
            # (and their templates) unchanged
            payload["ema_params"] = state.ema_params
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state: TrainState, step: int | None = None,
                warn_dropped: bool = False) -> TrainState:
        """Restore into the structure of ``state`` (must be pre-created).

        ``warn_dropped=True`` logs a warning when the checkpoint holds
        ``ema_params`` the template doesn't track — the resume-without-
        ``--ema-decay`` case, where EMA tracking silently stops and the
        next save drops the EMA tree. Eval/serving paths (where ignoring
        a stored EMA tree is the everyday case) leave it off.
        """
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
                    "batch_stats": state.batch_stats}
        try:
            # on a manager that hasn't saved in-process, item_metadata can
            # return None (no handler registry) — treat like a parse failure
            meta_keys = set(self._mgr.item_metadata(step).keys())
        except Exception:
            # a legacy typed-key leaf can make metadata parsing itself fail
            meta_keys = None
        if jax.tree.leaves(state.ema_params):
            if meta_keys is not None and "ema_params" not in meta_keys:
                raise ValueError(
                    "EMA params requested (template tracks them) but the "
                    f"checkpoint at step {step} holds none — it was not "
                    "trained with --ema-decay")
            template["ema_params"] = state.ema_params

        def _meta_sds(key):
            md = self._mgr.item_metadata(step)[key]
            return jax.ShapeDtypeStruct(tuple(md.shape), md.dtype)

        # The checkpoint may hold entries the template doesn't ask for —
        # the everyday case: evaluating/serving an --ema-decay checkpoint
        # WITHOUT --ema. StandardRestore demands structural equality, so
        # restore those entries into metadata-shaped abstract leaves and
        # drop them afterwards (an ignored EMA tree must not leak into a
        # state that isn't tracking EMA).
        drop_keys: list[str] = []
        if meta_keys is not None:
            for k in meta_keys - set(template) - {"rng_data", "rng_impl",
                                                  "rng"}:
                md = self._mgr.item_metadata(step)[k]
                template[k] = jax.tree.map(
                    lambda m: jax.ShapeDtypeStruct(tuple(m.shape), m.dtype),
                    md)
                drop_keys.append(k)

        def _restore(tmpl):
            tmpl = jax.tree.map(_abstract_with_sharding, tmpl)
            return self._mgr.restore(step,
                                     args=ocp.args.StandardRestore(tmpl))

        if meta_keys is not None and "rng_data" in meta_keys:
            # rng_data's / rng_impl's stored shapes follow the WRITER's
            # impl, which may differ from the current default — take them
            # from the checkpoint metadata
            restored = _restore(dict(template,
                                     rng_data=_meta_sds("rng_data"),
                                     rng_impl=_meta_sds("rng_impl")))
        elif meta_keys is not None and "rng" in meta_keys:
            # legacy checkpoint layout: a typed key leaf (only restorable
            # while the template impl still matches the writer's)
            restored = _restore(dict(template, rng=state.rng))
        else:
            # metadata unavailable: try the current layout (shapes derived
            # from the template's impl — abstract-template safe), and fall
            # back to the legacy typed-key layout on a structure mismatch
            data, impl_u8 = _rng_template_leaves(state.rng)
            try:
                restored = _restore(dict(template, rng_data=data,
                                         rng_impl=impl_u8))
            except Exception as first_err:  # noqa: BLE001 — orbax raises
                # assorted types on a layout mismatch (ValueError, KeyError,
                # its own error classes); try the legacy typed-key layout,
                # and if that fails too re-raise the CURRENT-layout error
                # (the informative one) rather than the legacy attempt's
                try:
                    restored = _restore(dict(template, rng=state.rng))
                except Exception:
                    # with metadata unavailable, an EMA template against a
                    # non-EMA checkpoint lands here too — probe by retrying
                    # WITHOUT ema_params so the user gets the real story
                    # instead of an orbax structure dump
                    if "ema_params" in template:
                        t2 = {k: v for k, v in template.items()
                              if k != "ema_params"}
                        try:
                            _restore(dict(t2, rng_data=data,
                                          rng_impl=impl_u8))
                        except Exception:
                            raise first_err from None
                        raise ValueError(
                            "EMA params requested (template tracks them) "
                            f"but the checkpoint at step {step} holds none "
                            "— it was not trained with --ema-decay"
                        ) from None
                    # the inverse mismatch: a non-EMA template against an
                    # --ema-decay checkpoint. The stored ema_params tree
                    # mirrors params exactly, so probe with a params-shaped
                    # abstract entry and drop it from the result.
                    t3 = dict(template, rng_data=data, rng_impl=impl_u8,
                              ema_params=jax.tree.map(
                                  lambda p: jax.ShapeDtypeStruct(
                                      jax.numpy.shape(p), p.dtype),
                                  state.params))
                    try:
                        restored = _restore(t3)
                    except Exception:
                        raise first_err from None
                    if restored.pop("ema_params", None) is not None:
                        drop_keys.append("ema_params")
        for k in drop_keys:
            restored.pop(k, None)
        if warn_dropped and "ema_params" in drop_keys:
            import warnings

            warnings.warn(
                f"checkpoint at step {step} holds EMA params but this run "
                "does not track them (no --ema-decay): EMA tracking stops "
                "here and the next save will not carry an EMA tree. Pass "
                "--ema-decay to keep updating it.", stacklevel=2)
        if "rng_data" in restored:
            import numpy as np

            impl = bytes(np.asarray(restored.pop("rng_impl"))).decode()
            rng = jax.random.wrap_key_data(restored.pop("rng_data"),
                                           impl=impl)
            return state.replace(rng=rng, **restored)
        return state.replace(**restored)

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
