import numpy as np

import flax
import jax
import jax.numpy as jnp

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.import_tf_vgg import convert
from semanticsegmentation_tensorflow_tpu.models.vgg16 import (
    VGG16, load_npz_weights,
)


def _fake_keras_vgg():
    """block-style VGG16 weights at full width."""
    rng = np.random.default_rng(0)
    src = {}
    layout = [(1, 2, 3, 64), (2, 2, 64, 128), (3, 3, 128, 256),
              (4, 3, 256, 512), (5, 3, 512, 512)]
    for stage, n, cin, cout in layout:
        c = cin
        for i in range(n):
            src[f"block{stage}_conv{i+1}/kernel"] = rng.normal(
                size=(3, 3, c, cout)).astype(np.float32)
            src[f"block{stage}_conv{i+1}/bias"] = rng.normal(
                size=(cout,)).astype(np.float32)
            c = cout
    src["fc6/weights"] = rng.normal(size=(7 * 7 * 512, 1024)).astype(np.float32)
    src["fc6/biases"] = rng.normal(size=(1024,)).astype(np.float32)
    src["fc7/weights"] = rng.normal(size=(1024, 1024)).astype(np.float32)
    src["fc7/biases"] = rng.normal(size=(1024,)).astype(np.float32)
    return src


def test_convert_and_load_into_model(tmp_path):
    src = _fake_keras_vgg()
    out = convert(src)
    assert "vgg16/stage1/conv0/kernel" in out
    assert out["vgg16/conv6/kernel"].shape == (7, 7, 512, 1024)
    assert out["vgg16/conv7/kernel"].shape == (1, 1, 1024, 1024)
    path = tmp_path / "vgg.npz"
    np.savez(path, **out)

    model = VGG16(fc_features=1024)
    vs = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)
    loaded = load_npz_weights(vs["params"], str(path))
    flat = flax.traverse_util.flatten_dict(loaded, sep="/")
    np.testing.assert_array_equal(
        np.asarray(flat["stage1/conv0/kernel"]),
        src["block1_conv1/kernel"])
    np.testing.assert_array_equal(
        np.asarray(flat["conv6/bias"]), src["fc6/biases"])
