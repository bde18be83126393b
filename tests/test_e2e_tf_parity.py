"""End-to-end label-map parity: our FCN-8s vs the same network built from
raw TF ops with identical weights.

This is the BASELINE.json "bit-comparable label maps" gate, run in the only
form possible offline (SURVEY.md §0: the reference mount is empty, no
pretrained weights are fetchable): the reference's *runtime* (TF CPU) executes
the reference's *architecture* (VGG16 encoder -> score convs ->
conv2d_transpose ups with add-skips, SURVEY.md §3.4) using weights exported
from our flax model via the documented TF<->flax kernel mappings; logits and
argmax label maps must agree.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import flax
import jax
import jax.numpy as jnp

from semanticsegmentation_tensorflow_tpu.models import FCN8s
from semanticsegmentation_tensorflow_tpu.models.vgg16 import VGG16_STAGES


def _tf_fcn8s_forward(x_np: np.ndarray, params, fc_features: int,
                      width_mult: float, num_classes: int) -> np.ndarray:
    p = flax.traverse_util.flatten_dict(jax.tree.map(np.asarray, params),
                                        sep="/")

    def conv(x, name, dilations=1, relu=True):
        y = tf.nn.conv2d(x, p[f"{name}/kernel"], strides=1, padding="SAME",
                         dilations=dilations)
        y = y + p[f"{name}/bias"]
        return tf.nn.relu(y) if relu else y

    def up(x, name, stride, cout):
        k = p[f"{name}/kernel"]                      # flax [kh,kw,in,out]
        k_tf = np.transpose(k[::-1, ::-1], (0, 1, 3, 2))  # -> TF flipped
        n, h, w, _ = x.shape
        y = tf.nn.conv2d_transpose(
            x, k_tf, output_shape=(n, h * stride, w * stride, cout),
            strides=stride, padding="SAME")
        return y + p[f"{name}/bias"]

    x = tf.constant(x_np)
    ends = {}
    for i, (n_convs, feats) in enumerate(VGG16_STAGES, start=1):
        for j in range(n_convs):
            x = conv(x, f"vgg16/stage{i}/conv{j}")
        x = tf.nn.max_pool2d(x, 2, 2, "SAME")
        ends[f"pool{i}"] = x
    x = conv(x, "vgg16/conv6")
    x = conv(x, "vgg16/conv7")

    s7 = conv(x, "score_conv7", relu=False)
    s4 = conv(ends["pool4"], "score_pool4", relu=False)
    s3 = conv(ends["pool3"], "score_pool3", relu=False)
    y = up(s7, "up2_conv7", 2, num_classes) + s4
    y = up(y, "up2_fuse4", 2, num_classes) + s3
    y = up(y, "up8_final", 8, num_classes)
    return y.numpy()


def test_fcn8s_label_maps_match_tf_reference_graph():
    model = FCN8s(num_classes=2, fc_features=32, width_mult=0.125,
                  dtype=jnp.float32)
    x = np.random.default_rng(0).normal(size=(1, 64, 96, 3)).astype(np.float32)
    vs = model.init(jax.random.key(0), jnp.asarray(x), train=False)

    ours = np.asarray(model.apply(vs, jnp.asarray(x), train=False))
    theirs = _tf_fcn8s_forward(x, vs["params"], fc_features=32,
                               width_mult=0.125, num_classes=2)

    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)
    labels_ours = ours.argmax(-1)
    labels_tf = theirs.argmax(-1)
    # bit-comparable label maps (float noise may flip exact-boundary pixels)
    mismatch = (labels_ours != labels_tf).mean()
    assert mismatch < 1e-3, f"label maps diverge: {mismatch:.4%}"
