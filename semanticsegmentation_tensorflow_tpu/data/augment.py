"""Device-side fused augmentation: normalize + random flip + random crop.

The reference augments on host inside its python batch generator
(SURVEY.md §3.5). Here augmentation is a pure jnp function executed *inside*
the jitted train step on the uint8 batch already resident in HBM — XLA fuses
normalize/flip/crop into the first convolution's input pipeline, so
augmentation costs ~zero extra HBM round-trips and the host thread only ever
ships raw uint8 pixels.

Random crops use per-example `lax.dynamic_slice` (static output shape, traced
offsets) vmapped over the batch — jit-stable, no host RNG.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax


def normalize_images(images: jax.Array, mean: Sequence[float],
                     std: Sequence[float]) -> jax.Array:
    """uint8/float [..., 3] -> float32 per-channel normalized."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (images.astype(jnp.float32) - mean) / std


def sample_augment_params(rng: jax.Array, n: int, h: int, w: int,
                          crop_hw: tuple[int, int] | None):
    """Per-example (flip [N] bool, oy [N] i32, ox [N] i32).

    The single source of augmentation randomness — the jnp and Pallas
    preprocess paths both consume these, so they are bit-identical.
    """
    keys = jax.random.split(rng, n)
    ks = jax.vmap(lambda k: jax.random.split(k, 3))(keys)  # [n, 3]
    k_flip, k_y, k_x = ks[:, 0], ks[:, 1], ks[:, 2]
    flip = jax.vmap(jax.random.bernoulli)(k_flip)
    if crop_hw is None:
        zeros = jnp.zeros((n,), jnp.int32)
        return flip, zeros, zeros
    ch, cw = crop_hw
    oy = jax.vmap(lambda k: jax.random.randint(k, (), 0, h - ch + 1))(k_y)
    ox = jax.vmap(lambda k: jax.random.randint(k, (), 0, w - cw + 1))(k_x)
    return flip, oy, ox


def _color_jitter_one(rng: jax.Array, img: jax.Array,
                      bcs: tuple[float, float, float]) -> jax.Array:
    """Per-example photometric jitter on ONE [H, W, 3] image (uint8 or
    float, 0..255 domain): additive brightness in ±b*255, contrast about
    the image's gray mean by a factor in [1-c, 1+c], saturation toward
    per-pixel luma by a factor in [1-s, 1+s]. Pure elementwise f32 math —
    XLA fuses it into the normalize; labels untouched."""
    b, c, s = bcs
    kb, kc, ks = jax.random.split(rng, 3)
    x = img.astype(jnp.float32)
    luma_w = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)
    if s:
        luma = jnp.sum(x * luma_w, axis=-1, keepdims=True)
        fs = jax.random.uniform(ks, (), minval=1.0 - s, maxval=1.0 + s)
        x = luma + (x - luma) * fs
    if c:
        m = jnp.mean(jnp.sum(x * luma_w, axis=-1))
        fc = jax.random.uniform(kc, (), minval=1.0 - c, maxval=1.0 + c)
        x = m + (x - m) * fc
    if b:
        x = x + jax.random.uniform(kb, (), minval=-b, maxval=b) * 255.0
    x = jnp.clip(x, 0.0, 255.0)
    return (jnp.round(x).astype(img.dtype)
            if jnp.issubdtype(img.dtype, jnp.integer) else
            x.astype(img.dtype))


def _augment_one(rng: jax.Array, img: jax.Array, lbl: jax.Array,
                 val: jax.Array, *, crop_hw: tuple[int, int] | None,
                 random_flip: bool,
                 color_jitter: tuple[float, float, float] | None = None):
    if color_jitter is not None:
        # fold the extra key off the TOP so the flip/crop stream with
        # jitter OFF stays bit-identical to the pre-jitter code (the
        # Pallas preprocess parity tests pin that stream)
        rng, k_col = jax.random.split(rng)
        img = _color_jitter_one(k_col, img, color_jitter)
    k_flip, k_y, k_x = jax.random.split(rng, 3)
    if random_flip:
        do = jax.random.bernoulli(k_flip)
        img = jnp.where(do, img[:, ::-1, :], img)
        lbl = jnp.where(do, lbl[:, ::-1], lbl)
        val = jnp.where(do, val[:, ::-1], val)
    if crop_hw is not None:
        ch, cw = crop_hw
        h, w = lbl.shape
        oy = jax.random.randint(k_y, (), 0, h - ch + 1)
        ox = jax.random.randint(k_x, (), 0, w - cw + 1)
        img = lax.dynamic_slice(img, (oy, ox, 0), (ch, cw, img.shape[-1]))
        lbl = lax.dynamic_slice(lbl, (oy, ox), (ch, cw))
        val = lax.dynamic_slice(val, (oy, ox), (ch, cw))
    return img, lbl, val


def _scale_jitter_batch(rng: jax.Array, img: jax.Array, lbl: jax.Array,
                        val: jax.Array, scales: tuple[float, ...]):
    """Per-BATCH random scale jitter with fully static shapes.

    One scale index is drawn per step and dispatched through
    ``lax.switch`` — every branch is a statically-shaped resize back to
    the input (h, w): zoom-IN resizes up then takes a random (h, w) crop;
    zoom-OUT resizes down and places the small image at a random offset
    on a zero canvas whose outside is ``valid=0`` (masked from loss and
    metrics). Images resize bilinearly (in f32, rounded back to the input
    dtype), labels and validity nearest — the standard DeepLab-lineage
    scale augmentation, shaped for XLA: exactly ONE branch executes per
    step and no shape depends on the drawn scale.

    Per-batch (not per-example) keeps the cost of the untaken branches
    zero — a vmapped switch would compute every scale for every image.
    """
    n, h, w = lbl.shape
    k_s, k_y, k_x = jax.random.split(rng, 3)

    def branch(s: float):
        hs, ws = max(1, int(round(h * s))), max(1, int(round(w * s)))

        def f(img, lbl, val, k_y, k_x):
            if (hs, ws) == (h, w):
                return img, lbl, val
            im = jax.image.resize(img.astype(jnp.float32),
                                  (n, hs, ws, img.shape[-1]), "bilinear")
            im = (jnp.clip(jnp.round(im), 0, 255).astype(img.dtype)
                  if jnp.issubdtype(img.dtype, jnp.integer) else
                  im.astype(img.dtype))
            lb = jax.image.resize(lbl, (n, hs, ws), "nearest")
            va = jax.image.resize(val, (n, hs, ws), "nearest")
            if hs >= h and ws >= w:  # zoom in: random crop back
                oy = jax.random.randint(k_y, (), 0, hs - h + 1)
                ox = jax.random.randint(k_x, (), 0, ws - w + 1)
                im = lax.dynamic_slice(im, (0, oy, ox, 0),
                                       (n, h, w, im.shape[-1]))
                lb = lax.dynamic_slice(lb, (0, oy, ox), (n, h, w))
                va = lax.dynamic_slice(va, (0, oy, ox), (n, h, w))
                return im, lb, va
            # zoom out: place on a zero canvas, valid=0 outside
            oy = jax.random.randint(k_y, (), 0, h - hs + 1)
            ox = jax.random.randint(k_x, (), 0, w - ws + 1)
            im = lax.dynamic_update_slice(
                jnp.zeros((n, h, w, img.shape[-1]), im.dtype), im,
                (0, oy, ox, 0))
            lb = lax.dynamic_update_slice(
                jnp.zeros((n, h, w), lb.dtype), lb, (0, oy, ox))
            va = lax.dynamic_update_slice(
                jnp.zeros((n, h, w), va.dtype), va, (0, oy, ox))
            return im, lb, va

        return f

    idx = jax.random.randint(k_s, (), 0, len(scales))
    return lax.switch(idx, [branch(s) for s in scales],
                      img, lbl, val, k_y, k_x)


def make_augment_fn(mean: Sequence[float], std: Sequence[float],
                    crop_size: tuple[int, int] | None = None,
                    random_flip: bool = True,
                    scale_jitter: Sequence[float] | None = None,
                    color_jitter: Sequence[float] | None = None):
    """Returns ``augment(rng, batch) -> batch`` for use inside the train step.

    Input batch images may be uint8 (preferred: 4x less HBM/PCIe traffic) or
    float; output images are normalized float32 of shape [N, *crop_size, 3].
    """

    color = tuple(float(v) for v in color_jitter) if color_jitter else None
    if color is not None and (len(color) != 3 or any(v < 0 for v in color)):
        raise ValueError("color_jitter must be 3 non-negative magnitudes "
                         "(brightness, contrast, saturation)")
    aug_one = partial(_augment_one, crop_hw=crop_size,
                      random_flip=random_flip,
                      color_jitter=color if color and any(color) else None)
    scales = (tuple(float(s) for s in scale_jitter)
              if scale_jitter else None)

    def augment(rng: jax.Array, batch: dict) -> dict:
        n = batch["label"].shape[0]
        val = batch.get("valid")
        if val is None:
            val = jnp.ones(batch["label"].shape, jnp.bool_)
        img_j, lbl_j, val_j = batch["image"], batch["label"], val
        if scales:
            k_jit, rng = jax.random.split(rng)
            img_j, lbl_j, val_j = _scale_jitter_batch(
                k_jit, img_j, lbl_j, val_j, scales)
        keys = jax.random.split(rng, n)
        # Flip/crop in the UINT8 domain, normalize after: a spatial
        # permutation commutes exactly with the per-channel elementwise
        # normalize (bit-identical results, tested), and the flip's
        # rev+select chain then moves 4x fewer bytes than on the f32
        # image it used to run on.
        img, lbl, val = jax.vmap(aug_one)(keys, img_j, lbl_j, val_j)
        img = normalize_images(img, mean, std)
        return {"image": img, "label": lbl, "valid": val}

    return augment
