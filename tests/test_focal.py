"""Focal loss (train/loss.py:focal_loss_sum, train.py --loss focal)."""

import numpy as np

import jax
import jax.numpy as jnp

from semanticsegmentation_tensorflow_tpu.models import build_model
from semanticsegmentation_tensorflow_tpu.train.loss import (
    focal_loss_sum, softmax_cross_entropy_sum,
)
from semanticsegmentation_tensorflow_tpu.train.state import (
    create_train_state, make_optimizer,
)
from semanticsegmentation_tensorflow_tpu.train.step import make_train_step

jax.config.update("jax_platforms", "cpu")


def _inputs(seed=0, n=2, h=8, w=8, c=3):
    rng = np.random.default_rng(seed)
    logits = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    labels = rng.integers(0, c, (n, h, w))
    onehot = jax.nn.one_hot(jnp.asarray(labels), c)
    valid = jnp.asarray(rng.integers(0, 2, (n, h, w)).astype(bool))
    return logits, onehot, valid


def test_gamma_zero_is_cross_entropy():
    logits, onehot, valid = _inputs()
    w = jnp.asarray([0.5, 2.0, 1.0])
    for mask in (None, valid):
        for cw in (None, w):
            f, nf = focal_loss_sum(logits, onehot, mask, cw, gamma=0.0)
            c, nc = softmax_cross_entropy_sum(logits, onehot, mask, cw)
            np.testing.assert_allclose(float(f), float(c), rtol=1e-6)
            assert float(nf) == float(nc)


def test_manual_value():
    # one pixel, two classes: focal = -(1-p_t)^g * log(p_t)
    logits = jnp.asarray([[[[2.0, 0.0]]]])
    onehot = jax.nn.one_hot(jnp.asarray([[[0]]]), 2)
    p = float(jax.nn.softmax(logits, -1)[0, 0, 0, 0])
    for g in (0.5, 2.0):
        f, n = focal_loss_sum(logits, onehot, gamma=g)
        want = -((1 - p) ** g) * np.log(p)
        np.testing.assert_allclose(float(f), want, rtol=1e-6)
        assert float(n) == 1.0


def test_focal_downweights_easy_pixels():
    """The modulating factor must shrink confident-correct pixels' loss
    much more than hard pixels' — the point of the loss."""
    easy = jnp.asarray([[[[6.0, 0.0]]]])   # p_t ~ 0.998
    hard = jnp.asarray([[[[0.0, 1.0]]]])   # p_t ~ 0.27
    onehot = jax.nn.one_hot(jnp.asarray([[[0]]]), 2)
    ratio = lambda lg: (  # noqa: E731
        float(focal_loss_sum(lg, onehot, gamma=2.0)[0])
        / float(softmax_cross_entropy_sum(lg, onehot)[0]))
    assert ratio(easy) < 1e-4 and ratio(hard) > 0.3


def test_train_step_focal_converges_and_meshes():
    model = build_model("unet", num_classes=2, base_features=8)
    shape = (4, 32, 32, 3)
    rng = np.random.default_rng(3)
    img = rng.normal(size=shape).astype(np.float32)
    batch = {"image": img,
             "label": (img[..., 0] > 0).astype(np.int32),
             "valid": np.ones(shape[:3], bool)}
    state = create_train_state(model, jax.random.key(0), shape,
                               make_optimizer("adam", 3e-3))
    step = make_train_step(2, with_metrics=False, loss="focal",
                           focal_gamma=2.0)
    first = None
    for _ in range(40):
        state, out = step(state, batch)
        first = float(out["loss"]) if first is None else first
    assert float(out["loss"]) < first * 0.5  # trains

    # shard_map mesh: focal threads through the SPMD step too
    from jax.sharding import Mesh

    from semanticsegmentation_tensorflow_tpu.parallel import replicate
    from semanticsegmentation_tensorflow_tpu.parallel.mesh import DATA_AXIS

    mesh = Mesh(np.asarray(jax.devices()[:4]), (DATA_AXIS,))
    mstate = replicate(create_train_state(model, jax.random.key(0), shape,
                                          make_optimizer("adam", 3e-3)),
                       mesh)
    mstep = make_train_step(2, mesh=mesh, with_metrics=False, loss="focal")
    mstate, mout = mstep(mstate, batch)
    assert np.isfinite(float(mout["loss"]))
