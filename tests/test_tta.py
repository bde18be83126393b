"""Test-time augmentation (infer/tta.py): identity reduction, flip
equivariance, multi-scale shapes, eval-step parity, and mesh equality."""

import numpy as np

import jax
import jax.numpy as jnp

from semanticsegmentation_tensorflow_tpu.data import synthetic_batch
from semanticsegmentation_tensorflow_tpu.infer.tta import (
    make_tta_eval_step, make_tta_logits_fn,
)
from semanticsegmentation_tensorflow_tpu.models import build_model
from semanticsegmentation_tensorflow_tpu.parallel import (
    make_mesh, replicate, shard_batch,
)
from semanticsegmentation_tensorflow_tpu.train import (
    create_train_state, make_eval_step,
)
from semanticsegmentation_tensorflow_tpu.train.state import make_optimizer


def _setup(n=4, h=32, w=32, **kw):
    model = build_model("unet", num_classes=2,
                        **(kw or dict(base_features=8, dtype=jnp.float32)))
    state = create_train_state(model, jax.random.key(0), (n, h, w, 3),
                               make_optimizer("adam", 1e-3))
    b = synthetic_batch(n, h, w, seed=0)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    return model, state, batch


def test_identity_tta_matches_plain_eval():
    """scales=(1.0,), flip=False is EXACTLY the plain eval step's preds
    and confusion matrix (probabilities are a monotone map of logits)."""
    model, state, batch = _setup()
    plain = make_eval_step(num_classes=2)(state, batch)
    tta = make_tta_eval_step(model, num_classes=2, scales=(1.0,),
                             flip=False)(state, batch)
    np.testing.assert_array_equal(np.asarray(plain["pred"]),
                                  np.asarray(tta["pred"]))
    np.testing.assert_array_equal(np.asarray(plain["cm"]),
                                  np.asarray(tta["cm"]))
    np.testing.assert_allclose(float(plain["loss"]), float(tta["loss"]),
                               rtol=1e-4)


def test_flip_tta_is_flip_invariant():
    """Averaging {x, flip(x)} makes the output EXACTLY flip-equivariant:
    tta(flip(x)) == flip(tta(x)) by symmetry of the variant set."""
    model, state, batch = _setup()
    fn = jax.jit(make_tta_logits_fn(model, scales=(1.0,), flip=True))
    variables = {"params": state.params}
    p = fn(variables, batch["image"])
    p_flipped_in = fn(variables, batch["image"][:, :, ::-1, :])
    np.testing.assert_allclose(np.asarray(p[:, :, ::-1, :]),
                               np.asarray(p_flipped_in),
                               rtol=1e-5, atol=1e-6)


def test_multi_scale_shapes_and_normalization():
    model, state, batch = _setup()
    fn = jax.jit(make_tta_logits_fn(model, scales=(0.75, 1.0, 1.25),
                                    flip=True))
    p = np.asarray(fn({"params": state.params}, batch["image"]))
    assert p.shape == (4, 32, 32, 2)
    # averaged softmaxes still sum to 1
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-5)
    assert (p >= 0).all()


def test_tta_eval_step_mesh_matches_single_device():
    model, state, batch = _setup(n=8)
    step_a = make_tta_eval_step(model, num_classes=2,
                                scales=(0.75, 1.0), flip=True)
    out_a = step_a(state, batch)

    mesh = make_mesh()
    step_b = make_tta_eval_step(model, num_classes=2,
                                scales=(0.75, 1.0), flip=True, mesh=mesh)
    out_b = step_b(replicate(state, mesh), shard_batch(batch, mesh))
    np.testing.assert_array_equal(np.asarray(out_a["cm"]),
                                  np.asarray(out_b["cm"]))
    np.testing.assert_allclose(float(out_a["loss"]), float(out_b["loss"]),
                               rtol=1e-5)


def test_tta_on_padded_batch_masks_invalid():
    """TTA eval on a stride-padded batch (the BatchLoader shape): the cm
    counts only valid pixels, same as plain eval."""
    model, state, batch = _setup(h=32, w=32)
    # pad width to 48, mark the pad invalid
    pad = ((0, 0), (0, 0), (0, 16))
    batch2 = {
        "image": jnp.pad(batch["image"], pad + ((0, 0),)),
        "label": jnp.pad(batch["label"], pad),
        "valid": jnp.pad(batch["valid"], pad),
    }
    plain = make_eval_step(num_classes=2)(state, batch2)
    tta = make_tta_eval_step(model, num_classes=2, scales=(1.0,),
                             flip=False)(state, batch2)
    np.testing.assert_array_equal(np.asarray(plain["cm"]),
                                  np.asarray(tta["cm"]))
    assert int(np.asarray(tta["cm"]).sum()) == int(
        np.asarray(batch["valid"]).sum())
