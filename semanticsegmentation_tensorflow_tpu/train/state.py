"""Train state: params + optimizer + RNG + (optional) batch stats.

The reference's analog is the ad-hoc (sess, train_op, saver) triple. Here the
whole mutable training world is one pytree so a step is a pure function
``(state, batch) -> (state, metrics)`` — shardable, checkpointable, donatable.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import optax


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    batch_stats: Any          # {} for BN-free models
    rng: jax.Array            # per-step dropout/augment key
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    # Exponential moving average of params for eval/serving (Polyak
    # averaging — smooths the last-step noise of constant-LR Adam runs).
    # {} when disabled so old checkpoints/templates keep their structure;
    # the decay is STATIC (baked into the step's XLA program).
    ema_params: Any = flax.struct.field(default_factory=dict)
    ema_decay: float = flax.struct.field(pytree_node=False, default=0.0)

    def apply_gradients(self, grads: Any, **changes: Any) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        if self.ema_decay and jax.tree.leaves(self.ema_params):
            d = self.ema_decay
            changes.setdefault("ema_params", jax.tree.map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                self.ema_params, new_params))
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state, **changes)

    def eval_params(self, use_ema: bool = True) -> Any:
        """The params to serve/eval with: EMA when tracked, else raw."""
        if use_ema and jax.tree.leaves(self.ema_params):
            return self.ema_params
        return self.params


def make_lr_schedule(learning_rate: float, schedule: str = "constant",
                     total_steps: int | None = None, warmup_steps: int = 0,
                     power: float = 0.9, end_factor: float = 0.0):
    """Learning-rate schedule factory: a float (constant, no warmup) or an
    optax schedule.

    The reference trains with constant-LR Adam (SURVEY.md §2 row 6), so
    ``constant`` is the default everywhere; ``poly`` (power 0.9 — the
    DeepLab-paper schedule for its ASPP config) and ``cosine`` are the
    standard segmentation decays, both with an optional linear warmup.
    ``total_steps`` counts OPTIMIZER steps and is required for the decaying
    schedules; decay runs over the post-warmup remainder down to
    ``learning_rate * end_factor``.
    """
    if schedule in (None, "constant"):
        if not warmup_steps:
            return learning_rate
        return optax.schedules.join_schedules(
            [optax.schedules.linear_schedule(0.0, learning_rate, warmup_steps),
             optax.schedules.constant_schedule(learning_rate)],
            [warmup_steps])
    if total_steps is None:
        raise ValueError(f"schedule={schedule!r} requires total_steps")
    decay_steps = max(total_steps - warmup_steps, 1)
    end = learning_rate * end_factor
    if schedule == "poly":
        # NOT optax.polynomial_schedule: under jit XLA lowers its
        # ``frac ** 0.9`` as exp(0.9*log(frac)), which is NaN at frac == 0 —
        # i.e. the LR (and then every parameter, via 0*inf in the update)
        # goes NaN exactly at count == transition_steps, the normal final
        # step of a poly-scheduled run. Eager evaluation returns 0, so the
        # bug only bites inside the compiled train step. Guard the power
        # with a select on the raw frac.
        def dec(count):
            frac = jnp.clip(1.0 - count / decay_steps, 0.0, 1.0)
            val = (learning_rate - end) * frac ** power + end
            return jnp.where(frac > 0, val, end)
    elif schedule == "cosine":
        dec = optax.schedules.cosine_decay_schedule(
            init_value=learning_rate, decay_steps=decay_steps,
            alpha=end_factor)
    else:
        raise ValueError(f"unknown lr schedule {schedule!r} "
                         "(constant | poly | cosine)")
    if not warmup_steps:
        return dec
    return optax.schedules.join_schedules(
        [optax.schedules.linear_schedule(0.0, learning_rate, warmup_steps),
         dec], [warmup_steps])


def make_optimizer(name: str, learning_rate: float,
                   weight_decay: float = 0.0,
                   mu_dtype: Any = None,
                   schedule: str = "constant",
                   total_steps: int | None = None,
                   warmup_steps: int = 0) -> optax.GradientTransformation:
    """``mu_dtype``: store Adam's FIRST moment in this dtype (e.g. bf16) —
    a perf knob for weight-heavy configs (fc4096's 411 MB kernel makes the
    Adam update ~5 full-param HBM passes; bf16 mu saves one of them). The
    second moment stays f32 (it needs the range). Off (f32) by default —
    a numerics change, never flipped without an accuracy A/B.

    ``schedule``/``total_steps``/``warmup_steps``: see
    :func:`make_lr_schedule`; the default matches the reference's constant
    LR exactly (a plain float, no schedule machinery in the jaxpr)."""
    lr = make_lr_schedule(learning_rate, schedule, total_steps, warmup_steps)
    if name == "adam":
        tx = optax.adam(lr, mu_dtype=mu_dtype)
    elif name == "adamw":
        tx = optax.adamw(lr, weight_decay=weight_decay,
                         mu_dtype=mu_dtype)
    elif name == "sgd":
        tx = optax.sgd(lr, momentum=0.9,
                       accumulator_dtype=mu_dtype)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    if weight_decay and name == "adam":
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


def create_train_state(
    model: nn.Module,
    rng: jax.Array,
    input_shape: tuple[int, int, int, int],
    tx: optax.GradientTransformation,
    rng_impl: str | None = "rbg",
    ema_decay: float = 0.0,
) -> TrainState:
    init_rng, state_rng = jax.random.split(rng)
    if rng_impl is not None:
        # The state's TRAINING rng (dropout masks, augmentation draws) uses
        # the hardware rng_bit_generator impl: threefry mask generation for
        # the 4096-wide fc6/fc7 dropout measured ~7 ms/step on v5e (masks
        # are generated in fwd AND rematerialized in bwd); rbg is ~free.
        # Splits/fold_ins on rbg keys still use threefry on the key data, so
        # determinism and shard decorrelation are unchanged; only the bit
        # stream differs (param init above is untouched).
        state_rng = jax.random.key(
            jax.random.bits(state_rng, (), jnp.uint32), impl=rng_impl)
    variables = model.init(init_rng, jnp.zeros(input_shape, jnp.float32), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=batch_stats,
        rng=state_rng,
        apply_fn=model.apply,
        tx=tx,
        ema_params=(jax.tree.map(jnp.copy, params) if ema_decay else {}),
        ema_decay=ema_decay,
    )


def create_abstract_state(
    model: nn.Module,
    input_shape: tuple[int, int, int, int],
    tx: optax.GradientTransformation,
    ema: bool = False,
) -> TrainState:
    """Shape-only TrainState (jax.eval_shape — no device compile, no init).

    Use as the restore template in inference/eval paths: building the real
    init costs a full model compile (~85 s for FCN-8s on a tunneled v5e)
    that is thrown away the moment the checkpoint overwrites it.
    ``ema=True`` when restoring a checkpoint trained with ``--ema-decay``
    (the template's tree structure must match the saved one).
    """
    def _init():
        return create_train_state(model, jax.random.key(0), input_shape, tx,
                                  ema_decay=0.999 if ema else 0.0)

    return jax.eval_shape(_init)
