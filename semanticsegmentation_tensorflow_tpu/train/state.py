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

    def apply_gradients(self, grads: Any, **changes: Any) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state, **changes)


def make_optimizer(name: str, learning_rate: float,
                   weight_decay: float = 0.0,
                   mu_dtype: Any = None) -> optax.GradientTransformation:
    """``mu_dtype``: store Adam's FIRST moment in this dtype (e.g. bf16) —
    a perf knob for weight-heavy configs (fc4096's 411 MB kernel makes the
    Adam update ~5 full-param HBM passes; bf16 mu saves one of them). The
    second moment stays f32 (it needs the range). Off (f32) by default —
    a numerics change, never flipped without an accuracy A/B."""
    if name == "adam":
        tx = optax.adam(learning_rate, mu_dtype=mu_dtype)
    elif name == "adamw":
        tx = optax.adamw(learning_rate, weight_decay=weight_decay,
                         mu_dtype=mu_dtype)
    elif name == "sgd":
        tx = optax.sgd(learning_rate, momentum=0.9,
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
    )


def create_abstract_state(
    model: nn.Module,
    input_shape: tuple[int, int, int, int],
    tx: optax.GradientTransformation,
) -> TrainState:
    """Shape-only TrainState (jax.eval_shape — no device compile, no init).

    Use as the restore template in inference/eval paths: building the real
    init costs a full model compile (~85 s for FCN-8s on a tunneled v5e)
    that is thrown away the moment the checkpoint overwrites it.
    """
    def _init():
        return create_train_state(model, jax.random.key(0), input_shape, tx)

    return jax.eval_shape(_init)
