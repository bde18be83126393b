#!/usr/bin/env python
"""Convert TF VGG16 weights to this framework's .npz import format.

The reference's FCN script loads a pretrained TF VGG16 (SURVEY.md §2 row 9;
BASELINE.json:7 "VGG16 backbone"). No weight blob is fetchable in this
offline environment, so this converter is the parity hook: given either
  * a TF checkpoint / SavedModel containing standard VGG16 variables
    (conv1_1/kernel ... conv5_3/kernel, fc6, fc7), or
  * a Keras-applications-style .h5/.npz with block1_conv1 ... block5_conv3,
it emits an .npz keyed by this framework's canonical names
(stage1/conv0/kernel, ..., conv6/kernel, conv7/kernel — HWIO layout), which
`models.vgg16.load_npz_weights` consumes.

    python tools/import_tf_vgg.py --src vgg16_weights.npz --out vgg16_tpu.npz
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

# canonical (stage, conv-in-stage) -> common upstream aliases
_ALIASES: dict[str, tuple[str, ...]] = {}
_VGG_LAYOUT = [(1, 2), (2, 2), (3, 3), (4, 3), (5, 3)]
for stage, n_convs in _VGG_LAYOUT:
    for i in range(n_convs):
        ours = f"stage{stage}/conv{i}"
        _ALIASES[ours] = (
            f"conv{stage}_{i + 1}",                       # TF-slim style
            f"block{stage}_conv{i + 1}",                  # Keras applications
            f"vgg_16/conv{stage}/conv{stage}_{i + 1}",    # slim full path
        )
_ALIASES["conv6"] = ("fc6", "vgg_16/fc6")
_ALIASES["conv7"] = ("fc7", "vgg_16/fc7")


def _load_source(path: str) -> dict[str, np.ndarray]:
    if path.endswith(".npz"):
        blob = np.load(path)
        return {k: blob[k] for k in blob.files}
    if path.endswith(".h5"):
        import h5py  # optional; present only if the env ships it

        out: dict[str, np.ndarray] = {}

        def visit(name, obj):
            if hasattr(obj, "shape"):
                out[name] = np.asarray(obj)

        with h5py.File(path, "r") as f:
            f.visititems(visit)
        return out
    # TF checkpoint directory / prefix
    import tensorflow as tf  # CPU TF is available in this image

    reader = tf.train.load_checkpoint(path)
    return {name: reader.get_tensor(name)
            for name in reader.get_variable_to_shape_map()}


def _find(src: dict[str, np.ndarray], aliases: tuple[str, ...],
          kind: str) -> np.ndarray | None:
    suffixes = {
        "kernel": ("/kernel", "/weights", "_W", "/W", "_w_0", "/kernel:0"),
        "bias": ("/bias", "/biases", "_b", "/b", "_b_0", "/bias:0"),
    }[kind]
    for alias in aliases:
        for key, val in src.items():
            if any(key == alias + s or key.endswith(alias + s)
                   for s in suffixes):
                return np.asarray(val)
    return None


def convert(src: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for ours, aliases in _ALIASES.items():
        for kind in ("kernel", "bias"):
            val = _find(src, aliases, kind)
            if val is None:
                continue
            if kind == "kernel" and val.ndim == 2:
                # fc-as-conv: fc6 [25088, 4096] -> [7, 7, 512, 4096]
                if ours == "conv6" and val.shape[0] == 7 * 7 * 512:
                    val = val.reshape(7, 7, 512, -1)
                elif ours == "conv7":
                    val = val.reshape(1, 1, val.shape[0], val.shape[1])
            out[f"vgg16/{ours}/{kind}"] = val.astype(np.float32)
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", required=True,
                   help=".npz / .h5 / TF checkpoint prefix")
    p.add_argument("--out", required=True, help="output .npz")
    args = p.parse_args(argv)
    src = _load_source(args.src)
    out = convert(src)
    if not out:
        print("error: no recognizable VGG16 variables found", file=sys.stderr)
        return 1
    np.savez(args.out, **out)
    print(f"wrote {args.out} with {len(out)} tensors:")
    for k, v in sorted(out.items()):
        print(f"  {k}: {v.shape}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
