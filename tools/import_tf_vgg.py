#!/usr/bin/env python
"""Convert pretrained VGG16 weights to this framework's .npz import format.

The reference's FCN script loads a pretrained TF VGG16 (SURVEY.md §2 row 9;
BASELINE.json:7 "VGG16 backbone"). No weight blob is fetchable in this
offline environment, so this converter is the parity hook: given either
  * a TF checkpoint / SavedModel containing standard VGG16 variables
    (conv1_1/kernel ... conv5_3/kernel, fc6, fc7), or
  * a Keras-applications-style .h5/.npz with block1_conv1 ... block5_conv3, or
  * a torchvision-style .pth/.pt state_dict (features.0.weight ...,
    classifier.0/3 — OIHW convs transposed to HWIO, the Linears reshaped
    to fc-as-conv kernels with torch's NCHW flatten order unwound),
it emits an .npz keyed by this framework's canonical names
(stage1/conv0/kernel, ..., conv6/kernel, conv7/kernel — HWIO layout), which
`models.vgg16.load_npz_weights` consumes.

Normalization note for torchvision weights: torchvision normalizes
x/255 with mean (.485,.456,.406) / std (.229,.224,.225); this framework
normalizes raw uint8 with mean (123.68,116.779,103.939) / std
(58.393,57.12,57.375) — the SAME transform (each is the other scaled by
255), so no input-scale fixup is needed.

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
    if path.endswith((".pth", ".pt")):
        import torch  # CPU torch is available in this image

        blob = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(blob, dict) and "state_dict" in blob:
            blob = blob["state_dict"]
        return {k: np.asarray(v.detach().cpu().numpy())
                for k, v in blob.items() if hasattr(v, "detach")}
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


# torchvision VGG16 (no-BN): nn.Sequential index -> canonical name
_TORCHVISION_FEATURES = {
    0: "stage1/conv0", 2: "stage1/conv1",
    5: "stage2/conv0", 7: "stage2/conv1",
    10: "stage3/conv0", 12: "stage3/conv1", 14: "stage3/conv2",
    17: "stage4/conv0", 19: "stage4/conv1", 21: "stage4/conv2",
    24: "stage5/conv0", 26: "stage5/conv1", 28: "stage5/conv2",
}


def _convert_torchvision(src: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """torchvision vgg16 state_dict -> canonical npz dict.

    Convs: OIHW -> HWIO. classifier.0 (fc6, [out, C*7*7] with torch's
    NCHW-flatten column order c*49+h*7+w) -> [7,7,C,out] so that a VALID
    7x7 conv on the 7x7 pool5 grid reproduces the Linear exactly
    (value-tested against torch in tests/test_tools.py). classifier.3
    (fc7) -> [1,1,in,out]. classifier.6 (the 1000-way ImageNet head) has
    no canonical target and is skipped.
    """
    out: dict[str, np.ndarray] = {}
    for idx, ours in _TORCHVISION_FEATURES.items():
        w = src.get(f"features.{idx}.weight")
        if w is None:
            continue
        out[f"vgg16/{ours}/kernel"] = np.transpose(
            np.asarray(w), (2, 3, 1, 0)).astype(np.float32)
        b = src.get(f"features.{idx}.bias")
        if b is not None:
            out[f"vgg16/{ours}/bias"] = np.asarray(b).astype(np.float32)
    w6 = src.get("classifier.0.weight")
    if w6 is not None:
        o, i = np.asarray(w6).shape
        c = i // 49
        if c * 49 != i:
            raise ValueError(f"classifier.0 in_features {i} is not C*7*7")
        out["vgg16/conv6/kernel"] = (np.asarray(w6).reshape(o, c, 7, 7)
                                     .transpose(2, 3, 1, 0)
                                     .astype(np.float32))
    w7 = src.get("classifier.3.weight")
    if w7 is not None:
        w7 = np.asarray(w7)
        out["vgg16/conv7/kernel"] = (w7.T.reshape(1, 1, *w7.T.shape)
                                     .astype(np.float32))
    for tidx, ours in ((0, "conv6"), (3, "conv7")):
        b = src.get(f"classifier.{tidx}.bias")
        if b is not None:
            out[f"vgg16/{ours}/bias"] = np.asarray(b).astype(np.float32)
    return out


def convert(src: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    if any(k.startswith("features.") and k.endswith(".weight") for k in src):
        tv = _convert_torchvision(src)
        if tv:
            return tv
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
