"""The train/eval steps — single jitted XLA programs, optionally SPMD.

Replaces the reference's per-batch ``sess.run(feed_dict=...)`` (SURVEY.md
§3.1, the host->device bottleneck) with donated HBM-resident batches and a
fully fused fwd+bwd+update graph. With a mesh, the step runs under
``jax.shard_map``: batch sharded on the ``data`` axis, params replicated,
gradients/batch-stats ``lax.pmean``-allreduced over ICI, confusion-matrix
counts ``lax.psum``-reduced — the TPU-native equivalent of the multi-GPU
allreduce the reference never had (BASELINE.json config 5).

Batch contract (all leaves leading dim = global batch):
  image: [N, H, W, 3] float32, already normalized (or uint8 + augment_fn)
  label: [N, H, W] int32 class ids
  valid: [N, H, W] bool/int — optional; padded pixels masked from loss+metrics
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from semanticsegmentation_tensorflow_tpu.parallel.mesh import (
    DATA_AXIS, SPATIAL_AXIS, batch_spec,
)
from semanticsegmentation_tensorflow_tpu.train.loss import (
    focal_loss_sum,
    softmax_cross_entropy_sum,
    softmax_cross_entropy_sum_binary,
    softmax_cross_entropy_sum_cmajor,
)
from semanticsegmentation_tensorflow_tpu.train.metrics import confusion_matrix
from semanticsegmentation_tensorflow_tpu.train.state import TrainState

AugmentFn = Callable[[jax.Array, dict], dict]  # (rng, batch) -> batch


def _loss_impl() -> str:
    """Layout strategy for the logits-consumer chain (CE + argmax):

    * 'nhwc'   — the classic one-hot form (C-minor T(2,128)/T(4,128)
      tilings at tiny C: 2/128 lane use; ~13 ms/step in the round-5
      SegNet b8 profile).
    * 'cmajor' — class-major [N, C, H, W] relayout. REJECTED on-chip
      (round 5: -2.6..-7% everywhere — the transpose costs more than
      the lane-starved chain it replaces); kept as an A/B leg.
    * 'binary' — C==2 logit-difference PLANE form (loss.py
      softmax_cross_entropy_sum_binary + l1>l0 argmax): no transpose,
      no one-hot; silently falls back to nhwc when C != 2 or the loss
      is not plain CE.

    Read at trace time (the SEG_CM_IMPL pattern); default pending the
    on-chip A/B."""
    import os

    v = os.environ.get("SEG_LOSS_IMPL", "nhwc")
    if v not in ("nhwc", "cmajor", "binary"):
        raise ValueError(
            f"SEG_LOSS_IMPL={v!r}: want 'nhwc', 'cmajor' or 'binary'")
    return v


def _argmax_classes(logits: jax.Array) -> jax.Array:
    impl = _loss_impl()
    if impl == "cmajor":
        return jnp.argmax(jnp.moveaxis(logits, -1, 1), axis=1)
    if impl == "binary" and logits.shape[-1] == 2:
        # bit-exact with argmax for C==2: argmax breaks ties toward the
        # lower index, and l1 > l0 is False on ties. Comparing the raw
        # slices (not sign(l1 - l0)) avoids subtraction rounding.
        return (logits[..., 1] > logits[..., 0]).astype(jnp.int32)
    return jnp.argmax(logits, axis=-1)


def _forward_loss(state: TrainState, params, batch: dict, num_classes: int,
                  train: bool, dropout_rng: jax.Array | None = None,
                  remat: bool = False, class_weights=None,
                  loss_sum_fn=softmax_cross_entropy_sum):
    has_bn = bool(jax.tree.leaves(state.batch_stats))
    variables = {"params": params}
    if has_bn:
        variables["batch_stats"] = state.batch_stats
    rngs = ({"dropout": dropout_rng}
            if (train and dropout_rng is not None) else None)
    def fwd(variables, image, rngs):
        if train and has_bn:
            return state.apply_fn(variables, image, train=True,
                                  mutable=["batch_stats"], rngs=rngs)
        return state.apply_fn(variables, image, train=train, rngs=rngs), None

    if remat and train:
        # rematerialize the forward in the backward pass: ~35% slower on
        # v5e for FCN-8s (measured — the model is compute-bound) but cuts
        # residual memory ~3x, enabling much larger batches/resolutions
        fwd = jax.checkpoint(
            fwd, policy=jax.checkpoint_policies.nothing_saveable)

    logits, mutated = fwd(variables, batch["image"], rngs)
    new_stats = (mutated["batch_stats"] if (train and has_bn)
                 else state.batch_stats)
    # Return the UN-normalized CE sum + valid count; the caller divides by
    # the (psum'd, when sharded) global valid count so mesh and no-mesh
    # training are numerically identical even with uneven masks.
    impl = _loss_impl()
    if (loss_sum_fn is softmax_cross_entropy_sum and impl == "binary"
            and num_classes == 2):
        ce_sum, valid_sum = softmax_cross_entropy_sum_binary(
            logits, batch["label"], batch.get("valid"), class_weights)
    elif loss_sum_fn is softmax_cross_entropy_sum and impl == "cmajor":
        ce_sum, valid_sum = softmax_cross_entropy_sum_cmajor(
            logits, batch["label"], num_classes, batch.get("valid"),
            class_weights)
    else:
        onehot = jax.nn.one_hot(batch["label"], num_classes,
                                dtype=logits.dtype)
        ce_sum, valid_sum = loss_sum_fn(
            logits, onehot, batch.get("valid"), class_weights)
    return ce_sum, (valid_sum, logits, new_stats)


def _accum_grads(state: TrainState, batch: dict, *, num_classes: int,
                 grad_accum: int, step_rng: jax.Array, remat: bool,
                 with_metrics: bool, class_weights,
                 augment_fn: AugmentFn | None,
                 loss_sum_fn=softmax_cross_entropy_sum):
    """Microbatched fwd+bwd: split the per-device batch into ``grad_accum``
    sequential microbatches via ``lax.scan``, summing the UN-normalized CE,
    valid count, gradients, and confusion matrix.

    Because the loss is kept in sum form until the single final divide, the
    accumulated result equals the full-batch computation up to float
    summation order (same trick that makes mesh == single-device exact) —
    so effective batch is decoupled from live-activation memory: residuals
    exist for one microbatch at a time, grads for one full set. BN running
    stats thread through the scan carry (microbatch i+1 sees i's stats),
    i.e. exactly k sequential forward passes. Augmentation/dropout RNG is
    folded with the microbatch index so draws stay decorrelated.
    """
    k = grad_accum
    n = jax.tree.leaves(batch)[0].shape[0]
    if n % k != 0:
        raise ValueError(f"grad_accum={k} must divide the per-device "
                         f"batch {n}")
    micro = jax.tree.map(lambda x: x.reshape((k, n // k) + x.shape[1:]), batch)

    zero_grads = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32),
                              state.params)
    cm0 = (jnp.zeros((num_classes, num_classes), jnp.int32)
           if with_metrics else None)

    def body(carry, xs):
        i, mb = xs
        ce_a, vs_a, g_a, stats, cm_a = carry
        rng_i = jax.random.fold_in(step_rng, i)
        aug_rng, dropout_rng = jax.random.split(rng_i)
        if augment_fn is not None:
            mb = augment_fn(aug_rng, mb)
        carry_state = state.replace(batch_stats=stats)
        grad_fn = jax.value_and_grad(
            lambda p: _forward_loss(carry_state, p, mb, num_classes,
                                    train=True, dropout_rng=dropout_rng,
                                    remat=remat,
                                    class_weights=class_weights,
                                    loss_sum_fn=loss_sum_fn),
            has_aux=True)
        (ce, (vs, logits, new_stats)), g = grad_fn(state.params)
        if with_metrics:
            preds = _argmax_classes(logits)
            cm_a = cm_a + confusion_matrix(mb["label"], preds, num_classes,
                                           mb.get("valid"))
        g_a = jax.tree.map(lambda a, b: a + b.astype(jnp.float32), g_a, g)
        return (ce_a + ce.astype(jnp.float32),
                vs_a + vs.astype(jnp.float32), g_a, new_stats, cm_a), None

    (ce_sum, valid_sum, grads, new_stats, cm), _ = lax.scan(
        body,
        (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32), zero_grads,
         state.batch_stats, cm0),
        (jnp.arange(k), micro))
    return ce_sum, valid_sum, grads, new_stats, cm


def _zero1_leaf_sharded(x, n: int) -> bool:
    """Must mirror parallel/mesh.py:zero1_spec's rule exactly."""
    return x.ndim >= 1 and x.shape[-1] >= n and x.shape[-1] % n == 0


def _zero1_apply_gradients(state: TrainState, grads, axis: str, n: int,
                           **changes) -> TrainState:
    """ZeRO-1 optimizer step inside shard_map: each shard holds 1/n of the
    (last-axis-sliced) Adam moments, updates only its param slice, and
    all_gathers the fresh params — the moment memory and the update's HBM
    traffic both drop to 1/n, at the cost of one params-sized all_gather
    that rides the same ICI ring as the grad psum.

    Correctness relies on the optimizer being ELEMENTWISE per leaf
    (adam/adamw/sgd all are): updating a slice with the sliced grad equals
    slicing the full update. Leaves whose last axis doesn't divide n
    (adam's scalar count, num_classes-wide score layers) are updated
    replicated — bit-identical on every shard since grads are psum'd.
    """
    import optax

    idx = lax.axis_index(axis)

    def slc(x):
        if _zero1_leaf_sharded(x, n):
            k = x.shape[-1] // n
            return lax.dynamic_slice_in_dim(x, idx * k, k, x.ndim - 1)
        return x

    p_sl = jax.tree.map(slc, state.params)
    g_sl = jax.tree.map(slc, grads)
    updates, new_opt = state.tx.update(g_sl, state.opt_state, p_sl)
    new_p_sl = optax.apply_updates(p_sl, updates)

    def gather(full_old, new_s):
        if _zero1_leaf_sharded(full_old, n):
            return lax.all_gather(new_s, axis, axis=full_old.ndim - 1,
                                  tiled=True)
        return new_s

    new_params = jax.tree.map(gather, state.params, new_p_sl)
    if state.ema_decay and jax.tree.leaves(state.ema_params):
        d = state.ema_decay
        changes.setdefault("ema_params", jax.tree.map(
            lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
            state.ema_params, new_params))
    return state.replace(step=state.step + 1, params=new_params,
                         opt_state=new_opt, **changes)


def _train_step_body(state: TrainState, batch: dict, *, num_classes: int,
                     augment_fn: AugmentFn | None, axis: str | None,
                     remat: bool = False, with_metrics: bool = True,
                     class_weights=None, grad_accum: int = 1,
                     zero1_n: int | None = None,
                     loss_sum_fn=softmax_cross_entropy_sum):
    step_rng = jax.random.fold_in(state.rng, state.step)
    if axis is not None:
        # decorrelate augmentation/dropout across shards
        step_rng = jax.random.fold_in(step_rng, lax.axis_index(axis))

    if grad_accum > 1:
        ce_sum, valid_sum, grads, new_stats, cm = _accum_grads(
            state, batch, num_classes=num_classes, grad_accum=grad_accum,
            step_rng=step_rng, remat=remat, with_metrics=with_metrics,
            class_weights=class_weights, augment_fn=augment_fn,
            loss_sum_fn=loss_sum_fn)
        logits = None
    else:
        aug_rng, dropout_rng = jax.random.split(step_rng)
        if augment_fn is not None:
            batch = augment_fn(aug_rng, batch)

        grad_fn = jax.value_and_grad(
            lambda p: _forward_loss(state, p, batch, num_classes, train=True,
                                    loss_sum_fn=loss_sum_fn,
                                    dropout_rng=dropout_rng, remat=remat,
                                    class_weights=class_weights),
            has_aux=True)
        (ce_sum, (valid_sum, logits, new_stats)), grads = grad_fn(state.params)

    # Exact global masked mean: psum the CE sum, the grad of the CE sum, and
    # the valid-pixel count, then divide — identical to single-device math
    # regardless of how valid pixels distribute across shards.
    if axis is not None:
        ce_sum = lax.psum(ce_sum, axis)
        valid_sum = lax.psum(valid_sum, axis)
        grads = lax.psum(grads, axis)
        new_stats = jax.tree.map(lambda s: lax.pmean(s, axis), new_stats)
    denom = jnp.maximum(valid_sum, 1.0)
    loss = ce_sum / denom
    grads = jax.tree.map(lambda g: g / denom.astype(g.dtype), grads)

    if zero1_n is not None:
        new_state = _zero1_apply_gradients(state, grads, axis, zero1_n,
                                           batch_stats=new_stats)
    else:
        new_state = state.apply_gradients(grads, batch_stats=new_stats)

    out = {"loss": loss}
    if with_metrics:
        # train-time confusion matrix (mIoU/pixel-acc). Optional: the
        # reference's train loop prints loss only (SURVEY.md §3.1); the
        # full-res argmax + count costs ~2-3 ms/step at KITTI batch 16.
        if grad_accum <= 1:
            preds = _argmax_classes(logits)
            cm = confusion_matrix(batch["label"], preds, num_classes,
                                  batch.get("valid"))
        if axis is not None:
            cm = lax.psum(cm, axis)
        out["cm"] = cm
    return new_state, out


def make_train_step(num_classes: int, mesh: Mesh | None = None,
                    augment_fn: AugmentFn | None = None,
                    remat: bool = False, with_metrics: bool = True,
                    class_weights=None, grad_accum: int = 1,
                    shard_opt: bool = False,
                    state: TrainState | None = None,
                    loss: str = "ce",
                    focal_gamma: float = 2.0) -> Callable:
    """Build the jitted train step ``(state, batch) -> (state, metrics)``.

    * no mesh: plain single-device jit.
    * 1-D ``data`` mesh: explicit SPMD via jax.shard_map — per-shard grads
      ``pmean``-allreduced over ICI.
    * 2-D ``data`` x ``spatial`` mesh: compiler-partitioned (pjit-style) —
      batch sharded on N, image HEIGHT sharded across ``spatial``; XLA's
      SPMD partitioner inserts the conv halo exchanges and the grad/metric
      reductions. For activations too large for one chip's HBM.

    ``grad_accum=k``: split each (per-device) batch into k sequential
    microbatches and accumulate sum-form loss/grads before the single
    optimizer update — effective batch without the activation memory
    (composes with ``remat``, which shrinks the per-MICRObatch residuals
    further, and with both mesh modes: accumulation is per-shard, the
    psum/pmean reduction happens once on the accumulated sums).

    ``shard_opt=True`` (1-D mesh only): ZeRO-1 — optimizer moments live
    sharded over the data axis (place the state with
    ``parallel.shard_state_zero1``; pass that state here as ``state`` so
    the per-leaf in/out specs can be built), each shard updates its slice,
    params all_gather. 1/n moment memory and update traffic.

    ``state`` is donated in every case.
    """
    if shard_opt and (mesh is None or SPATIAL_AXIS in mesh.axis_names):
        raise ValueError("shard_opt=True (ZeRO-1) requires a 1-D data mesh")
    if loss == "ce":
        loss_sum_fn = softmax_cross_entropy_sum
    elif loss == "focal":
        loss_sum_fn = partial(focal_loss_sum, gamma=focal_gamma)
    else:
        raise ValueError(f"unknown loss {loss!r} (ce | focal)")
    if mesh is None:
        body = partial(_train_step_body, num_classes=num_classes,
                       augment_fn=augment_fn, axis=None, remat=remat,
                       with_metrics=with_metrics, class_weights=class_weights,
                       loss_sum_fn=loss_sum_fn, grad_accum=grad_accum)
        return jax.jit(body, donate_argnums=(0,))

    if SPATIAL_AXIS in mesh.axis_names:
        # compiler-partitioned path: the body is written as a global-batch
        # program (axis=None); shardings alone drive the parallelism.
        # (Random *crop* augmentation would force H gathers here — use
        # flip/normalize-only augment with spatial sharding.)
        body = partial(_train_step_body, num_classes=num_classes,
                       augment_fn=augment_fn, axis=None, remat=remat,
                       with_metrics=with_metrics, class_weights=class_weights,
                       loss_sum_fn=loss_sum_fn, grad_accum=grad_accum)
        bspec = NamedSharding(mesh, batch_spec(mesh))
        repl = NamedSharding(mesh, P())
        return jax.jit(
            body,
            in_shardings=(repl, bspec),   # pytree-prefix: all batch leaves
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )

    zero1_n = None
    state_spec = P()
    if shard_opt:
        if state is None:
            raise ValueError("shard_opt=True needs the (abstract or real) "
                             "state to build per-leaf specs — pass state=")
        from semanticsegmentation_tensorflow_tpu.parallel.mesh import (
            state_specs_zero1,
        )
        zero1_n = int(mesh.shape[DATA_AXIS])
        state_spec = state_specs_zero1(state, mesh)
    body = partial(_train_step_body, num_classes=num_classes,
                   augment_fn=augment_fn, axis=DATA_AXIS, remat=remat,
                   with_metrics=with_metrics, class_weights=class_weights,
                   loss_sum_fn=loss_sum_fn, grad_accum=grad_accum, zero1_n=zero1_n)
    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(state_spec, P(DATA_AXIS)),
        out_specs=(state_spec, P()),
        check_vma=False,
    )
    to_sharding = lambda spec_tree: jax.tree.map(  # noqa: E731
        lambda s: NamedSharding(mesh, s), spec_tree,
        is_leaf=lambda s: isinstance(s, P))
    return jax.jit(
        sharded,
        in_shardings=(to_sharding(state_spec),
                      NamedSharding(mesh, P(DATA_AXIS))),
        out_shardings=(to_sharding(state_spec), NamedSharding(mesh, P())),
        donate_argnums=(0,),
    )


def _eval_step_body(state: TrainState, batch: dict, *, num_classes: int,
                    axis: str | None, road_hist: bool = False):
    ce_sum, (valid_sum, logits, _) = _forward_loss(
        state, state.params, batch, num_classes, train=False)
    preds = _argmax_classes(logits)
    cm = confusion_matrix(batch["label"], preds, num_classes, batch.get("valid"))
    out = {}
    if road_hist:
        # confidence histogram for the KITTI road devkit threshold sweep
        # (class 1 = road by the data layer's palette convention)
        from semanticsegmentation_tensorflow_tpu.train.metrics import (
            binary_confidence_histogram,
        )
        if _loss_impl() == "binary":
            # softmax(l)[1] == sigmoid(l1 - l0) exactly; plane form keeps
            # the full-res elementwise out of C-minor T(2,128) layouts
            prob = jax.nn.sigmoid(
                logits[..., 1].astype(jnp.float32)
                - logits[..., 0].astype(jnp.float32))
        else:
            prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., 1]
        out["road_hist"] = binary_confidence_histogram(
            prob, batch["label"] == 1, batch.get("valid"))
    if axis is not None:
        cm = lax.psum(cm, axis)
        ce_sum = lax.psum(ce_sum, axis)
        valid_sum = lax.psum(valid_sum, axis)
        if road_hist:
            out["road_hist"] = lax.psum(out["road_hist"], axis)
    loss = ce_sum / jnp.maximum(valid_sum, 1.0)
    return {"loss": loss, "cm": cm, "pred": preds, **out}


def make_eval_step(num_classes: int, mesh: Mesh | None = None,
                   road_hist: bool = False) -> Callable:
    """``(state, batch) -> {loss, cm, pred[, road_hist]}``.

    ``road_hist=True`` (binary models) adds the [2, 256] road-confidence
    histogram that feeds :func:`train.metrics.kitti_road_metrics` — the
    official KITTI road devkit measures (MaxF / AP / PRE / REC / FPR /
    FNR). psum'd across the mesh like the confusion matrix.
    """
    if road_hist and num_classes != 2:
        raise ValueError("road_hist needs a binary (num_classes=2) model")
    if mesh is None:
        return jax.jit(partial(_eval_step_body, num_classes=num_classes,
                               axis=None, road_hist=road_hist))
    body = partial(_eval_step_body, num_classes=num_classes, axis=DATA_AXIS,
                   road_hist=road_hist)
    out_specs = {"loss": P(), "cm": P(), "pred": P(DATA_AXIS)}
    if road_hist:
        out_specs["road_hist"] = P()
    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(sharded)
