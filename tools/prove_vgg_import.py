#!/usr/bin/env python
"""Offline proof of the pretrained-VGG16 import path (SURVEY.md §2 row 9).

No pretrained blob is fetchable in this environment, but TensorFlow is
installed — so this tool manufactures REAL TF-format artifacts at the
reference-exact VGG16 shapes (conv1_1..conv5_3 at 64..512 channels, the
classic 4096-wide fc6/fc7) and drives the whole row-9 chain through them:

  1. builds a TF-slim-named VGG16 graph (``vgg_16/conv1/conv1_1/weights``
     ...) with He-scaled random weights and saves a genuine
     ``tf.compat.v1.train.Saver`` V2 checkpoint — the format the
     reference's pretrained backbone ships in;
  2. writes the same weights as a Keras-style ``.h5`` (``block1_conv1/...
     kernel:0``, dense ``fc6 [25088, 4096]`` — exercising the
     fc-as-conv reshape);
  3. converts BOTH through ``tools/import_tf_vgg.py`` and asserts the two
     archives are tensor-identical;
  4. strict-imports the archive into this framework's ``VGG16``
     (``load_npz_weights(strict=True)`` — every backbone param matched);
  5. runs the TF graph forward and our forward on the same input and
     asserts endpoint parity (pool3 / pool4 / conv7) to float32 tolerance.

After this, the only unproven step of row 9 is the download itself: any
real TF VGG16 checkpoint or Keras h5 will flow through the identical code
path. Train from the archive with
``scripts/train.py --preset fcn8s_kitti_parity --vgg-weights <npz>
--strict-import``.

Usage:  python tools/prove_vgg_import.py [--workdir /tmp/vggproof]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# VGG16 conv layout: stage -> (n_convs, cin of first conv, cout)
_LAYOUT = [(1, 2, 3, 64), (2, 2, 64, 128), (3, 3, 128, 256),
           (4, 3, 256, 512), (5, 3, 512, 512)]
FC = 4096


def make_weights(seed: int = 0) -> dict[str, np.ndarray]:
    """He-scaled random weights keyed by TF-slim variable names.

    He scaling keeps activations O(1) through the 15-layer stack so the
    forward-parity check isn't comparing overflowed garbage.
    """
    rng = np.random.default_rng(seed)
    w: dict[str, np.ndarray] = {}

    def conv(name, kh, kw, cin, cout):
        fan = kh * kw * cin
        w[f"{name}/weights"] = (rng.normal(size=(kh, kw, cin, cout))
                                * np.sqrt(2.0 / fan)).astype(np.float32)
        w[f"{name}/biases"] = (rng.normal(size=(cout,)) * 0.01
                               ).astype(np.float32)

    for stage, n, cin, cout in _LAYOUT:
        c = cin
        for i in range(n):
            conv(f"vgg_16/conv{stage}/conv{stage}_{i + 1}", 3, 3, c, cout)
            c = cout
    conv("vgg_16/fc6", 7, 7, 512, FC)
    conv("vgg_16/fc7", 1, 1, FC, FC)
    return w


def save_tf_checkpoint(weights: dict[str, np.ndarray], prefix: str) -> str:
    """Genuine TF V2 checkpoint with slim names via compat.v1 Saver."""
    import tensorflow as tf

    tf.compat.v1.reset_default_graph()
    with tf.Graph().as_default():
        for name, val in weights.items():
            tf.compat.v1.get_variable(name, initializer=val)
        saver = tf.compat.v1.train.Saver()
        with tf.compat.v1.Session() as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            return saver.save(sess, prefix)


def save_keras_h5(weights: dict[str, np.ndarray], path: str) -> str:
    """Keras-applications-style .h5: block names, dense fc matrices."""
    import h5py

    with h5py.File(path, "w") as f:
        for stage, n, _, _ in _LAYOUT:
            for i in range(n):
                slim = f"vgg_16/conv{stage}/conv{stage}_{i + 1}"
                keras = f"block{stage}_conv{i + 1}"
                g = f.create_group(keras).create_group(keras)
                g["kernel:0"] = weights[f"{slim}/weights"]
                g["bias:0"] = weights[f"{slim}/biases"]
        for fc, k in (("fc6", "vgg_16/fc6"), ("fc7", "vgg_16/fc7")):
            g = f.create_group(fc).create_group(fc)
            kern = weights[f"{k}/weights"]
            g["kernel:0"] = kern.reshape(-1, kern.shape[-1])  # HWIO -> [in,out]
            g["bias:0"] = weights[f"{k}/biases"]
    return path


def tf_forward(weights: dict[str, np.ndarray], x: np.ndarray) -> dict:
    """The reference-style TF graph forward (SURVEY.md §3.4): conv/SAME +
    bias + relu stacks, 2x2/2 SAME max pools, fc6/fc7 as convs."""
    import tensorflow as tf

    tf.compat.v1.reset_default_graph()
    with tf.Graph().as_default():
        t = tf.constant(x)
        ends = {}
        for stage, n, _, _ in _LAYOUT:
            for i in range(n):
                name = f"vgg_16/conv{stage}/conv{stage}_{i + 1}"
                t = tf.nn.relu(tf.nn.bias_add(
                    tf.nn.conv2d(t, weights[f"{name}/weights"],
                                 strides=1, padding="SAME"),
                    weights[f"{name}/biases"]))
            t = tf.nn.max_pool2d(t, 2, 2, "SAME")
            ends[f"pool{stage}"] = t
        t = tf.nn.relu(tf.nn.bias_add(
            tf.nn.conv2d(t, weights["vgg_16/fc6/weights"], strides=1,
                         padding="SAME"), weights["vgg_16/fc6/biases"]))
        t = tf.nn.relu(tf.nn.bias_add(
            tf.nn.conv2d(t, weights["vgg_16/fc7/weights"], strides=1,
                         padding="SAME"), weights["vgg_16/fc7/biases"]))
        ends["conv7"] = t
        with tf.compat.v1.Session() as sess:
            return sess.run(ends)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default="/tmp/vggproof")
    p.add_argument("--hw", type=int, nargs=2, default=(64, 64),
                   help="input H W for the forward-parity check")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    os.makedirs(args.workdir, exist_ok=True)

    # keep this host-only: JAX must not grab the TPU tunnel for a CPU proof
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    from tools.import_tf_vgg import convert, main as import_main

    print("== 1. TF-slim V2 checkpoint at reference shapes")
    weights = make_weights(args.seed)
    n_params = sum(v.size for v in weights.values())
    print(f"   {len(weights)} tensors, {n_params / 1e6:.1f}M params")
    ckpt = save_tf_checkpoint(weights, os.path.join(args.workdir, "vgg_16"))
    print(f"   saved {ckpt}")

    print("== 2. Keras-style .h5 (dense fc6 [25088, 4096])")
    h5 = save_keras_h5(weights, os.path.join(args.workdir, "vgg16.h5"))
    print(f"   saved {h5}")

    print("== 3. import_tf_vgg on both; archives must be identical")
    out_ckpt = os.path.join(args.workdir, "from_ckpt.npz")
    out_h5 = os.path.join(args.workdir, "from_h5.npz")
    assert import_main(["--src", ckpt, "--out", out_ckpt]) == 0
    assert import_main(["--src", h5, "--out", out_h5]) == 0
    a, b = np.load(out_ckpt), np.load(out_h5)
    assert set(a.files) == set(b.files), (a.files, b.files)
    assert len(a.files) == 2 * (13 + 2), a.files
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    print(f"   ok: {len(a.files)} tensors bit-identical across formats")

    print("== 4. strict import into the framework VGG16 (fc4096, f32)")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")  # sitecustomize override
    jax.config.update("jax_default_matmul_precision", "highest")

    from semanticsegmentation_tensorflow_tpu.models.vgg16 import (
        VGG16, load_npz_weights,
    )

    h, w = args.hw
    model = VGG16(fc_features=FC, dtype=jnp.float32)
    vs = model.init(jax.random.key(0), jnp.zeros((1, h, w, 3), jnp.float32),
                    train=False)
    report: dict = {}
    params = load_npz_weights(vs["params"], out_ckpt, strict=True,
                              report=report)
    print(f"   ok: {len(report['matched'])} params matched, "
          f"{len(report['unmatched_params'])} unmatched, "
          f"{len(report['unused_archive'])} unused")

    print(f"== 5. forward parity vs the TF graph at {h}x{w}")
    rng = np.random.default_rng(args.seed + 1)
    x = rng.normal(size=(1, h, w, 3)).astype(np.float32)
    ours = model.apply({"params": params}, jnp.asarray(x), train=False)
    theirs = tf_forward(weights, x)
    worst = 0.0
    for name in ("pool3", "pool4", "conv7"):
        o = np.asarray(ours[name], np.float32)
        t = theirs[name]
        err = float(np.max(np.abs(o - t) / (np.abs(t) + 1e-3)))
        worst = max(worst, err)
        print(f"   {name}: shape {o.shape} max rel err {err:.2e}")
        np.testing.assert_allclose(o, t, rtol=5e-4, atol=5e-4,
                                   err_msg=name)
    print(f"PROOF OK: TF ckpt + h5 -> converter -> strict import -> "
          f"forward parity (worst rel err {worst:.2e})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
