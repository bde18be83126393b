"""ZeRO-1 optimizer-state sharding (parallel/mesh.py:shard_state_zero1 +
train/step.py:_zero1_apply_gradients): equality vs the replicated update,
actual moment-shard sizes, composition with grad_accum/EMA, and guards."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from semanticsegmentation_tensorflow_tpu.data import synthetic_batch
from semanticsegmentation_tensorflow_tpu.models import build_model
from semanticsegmentation_tensorflow_tpu.parallel import (
    make_mesh, make_mesh_2d, replicate, shard_batch, shard_state_zero1,
    zero1_spec,
)
from semanticsegmentation_tensorflow_tpu.train import (
    create_train_state, make_train_step,
)
from semanticsegmentation_tensorflow_tpu.train.state import make_optimizer


def _state(opt="adam", ema_decay=0.0, seed=0, n=8):
    model = build_model("unet", num_classes=2, base_features=8,
                        dtype=jnp.float32)
    return create_train_state(model, jax.random.key(seed), (n, 32, 32, 3),
                              make_optimizer(opt, 1e-3),
                              ema_decay=ema_decay)


def _batch(n=8, seed=0):
    return {k: jnp.asarray(v)
            for k, v in synthetic_batch(n, 32, 32, seed=seed).items()}


def test_zero1_matches_replicated_mesh_step():
    """Two adam steps: ZeRO-1 sharded update == replicated mesh update.
    Same psum'd grads feed an elementwise optimizer, so slicing commutes
    with the update — tolerances only absorb fusion-order noise."""
    mesh = make_mesh()
    batch = _batch()

    sa = _state()
    sa = replicate(sa, mesh)
    step_a = make_train_step(num_classes=2, mesh=mesh)

    sb = _state()
    sb = shard_state_zero1(sb, mesh)
    step_b = make_train_step(num_classes=2, mesh=mesh, shard_opt=True,
                             state=sb)

    for i in range(2):
        b = _batch(seed=i)
        sa, out_a = step_a(sa, b)
        sb, out_b = step_b(sb, b)
        np.testing.assert_allclose(float(out_a["loss"]),
                                   float(out_b["loss"]), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_a["cm"]),
                                  np.asarray(out_b["cm"]))
    for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    # the moments agree too (gather the sharded ones for comparison)
    for a, b in zip(jax.tree.leaves(sa.opt_state),
                    jax.tree.leaves(sb.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_zero1_moments_actually_sharded():
    mesh = make_mesh()
    s = shard_state_zero1(_state(), mesh)
    sharded = replicated = 0
    for leaf in jax.tree.leaves(s.opt_state):
        if leaf.ndim >= 1 and leaf.shape[-1] % mesh.size == 0 \
                and leaf.shape[-1] >= mesh.size:
            shard = leaf.addressable_shards[0].data
            assert shard.shape[-1] == leaf.shape[-1] // mesh.size, leaf.shape
            sharded += 1
        else:
            replicated += 1
    assert sharded > 0
    # the big moment leaves all shard; only scalars/tiny leaves replicate
    big = [l for l in jax.tree.leaves(s.opt_state) if l.size >= 64]
    assert all(l.addressable_shards[0].data.size < l.size for l in big)


def test_zero1_spec_rule():
    mesh = make_mesh()
    assert zero1_spec(jnp.zeros((3, 3, 8, 64)), mesh) == P(
        None, None, None, "data")
    assert zero1_spec(jnp.zeros((64,)), mesh) == P("data")
    assert zero1_spec(jnp.zeros(()), mesh) == P()        # adam count
    assert zero1_spec(jnp.zeros((1, 1, 64, 2)), mesh) == P()  # score conv


def test_zero1_with_grad_accum_and_ema():
    mesh = make_mesh()
    s = shard_state_zero1(_state(ema_decay=0.9, n=16), mesh)
    step = make_train_step(num_classes=2, mesh=mesh, shard_opt=True,
                           state=s, grad_accum=2)
    s, out = step(s, _batch(16))
    assert np.isfinite(float(out["loss"]))
    assert int(jax.device_get(s.step)) == 1
    # EMA moved off its init (== init params) toward the new params
    d = [float(jnp.abs(e - p).max()) for e, p in
         zip(jax.tree.leaves(s.ema_params), jax.tree.leaves(s.params))]
    assert max(d) > 0


def test_zero1_guards():
    with pytest.raises(ValueError, match="1-D data mesh"):
        make_train_step(num_classes=2, shard_opt=True)
    with pytest.raises(ValueError, match="1-D data mesh"):
        make_train_step(num_classes=2, mesh=make_mesh_2d(4, 2),
                        shard_opt=True)
    with pytest.raises(ValueError, match="pass state="):
        make_train_step(num_classes=2, mesh=make_mesh(), shard_opt=True)
