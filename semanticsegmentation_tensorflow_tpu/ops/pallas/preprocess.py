"""Pallas TPU kernel: fused uint8 -> normalized-f32 image preprocessing.

The reference's input path (host-side numpy decode/resize/normalize/flip/crop
per batch, SURVEY.md §3.5) becomes device-side preprocessing here; the north
star calls for "fused Pallas/XLA preprocessing kernels" (BASELINE.json:5).
Division of labor, chosen from measured Mosaic capabilities on v5e:

  * flip + random crop: XLA (`where` on reversed slices + per-example
    `dynamic_slice`) **on the uint8 batch** — pure byte movement, 3 B/px,
    which XLA already emits at bandwidth. (In-kernel alternatives were
    probed and rejected: Mosaic has no `rev`; dynamic lane/sublane slices
    crash the v5e compile helper; dynamic `pltpu.roll` miscompiles for
    lane widths > 512.)
  * uint8 -> f32 + per-channel normalize: ONE Pallas kernel in channel-plane
    layout. This is the bandwidth-amplifying step (3 B/px in, 12 B/px out);
    fusing the cast with the scale/shift means the f32 tensor is written
    exactly once, directly in its final layout.

Randomness (flip flags, crop offsets) comes from
``data.augment.sample_augment_params`` — shared with the pure-jnp path, so
both paths produce bit-identical batches under the same key (tested in
tests/test_pallas.py).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from semanticsegmentation_tensorflow_tpu.data.augment import (
    sample_augment_params,
)


def _normalize_kernel(img_ref, out_ref, *, mean: tuple, std: tuple):
    c = pl.program_id(1)
    plane = img_ref[0, 0].astype(jnp.float32)
    # per-channel constants selected by grid position (python floats — no
    # captured device arrays)
    mean_v = jnp.where(c == 0, mean[0], jnp.where(c == 1, mean[1], mean[2]))
    inv = (1.0 / std[0], 1.0 / std[1], 1.0 / std[2])
    inv_std = jnp.where(c == 0, inv[0], jnp.where(c == 1, inv[1], inv[2]))
    out_ref[0, 0] = (plane - mean_v) * inv_std


def pallas_normalize(images_u8: jax.Array, mean: Sequence[float],
                     std: Sequence[float],
                     interpret: bool = False) -> jax.Array:
    """[N,H,W,3] uint8 -> [N,H,W,3] per-channel-normalized float32."""
    n, h, w, _ = images_u8.shape
    it = jnp.transpose(images_u8.astype(jnp.int32), (0, 3, 1, 2))  # N,3,H,W
    kernel = partial(_normalize_kernel,
                     mean=tuple(float(m) for m in mean),
                     std=tuple(float(s) for s in std))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 3, h, w), jnp.float32),
        grid=(n, 3),
        in_specs=[pl.BlockSpec((1, 1, h, w), lambda i, c: (i, c, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, h, w), lambda i, c: (i, c, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(it)
    return jnp.transpose(out, (0, 2, 3, 1))


def make_pallas_augment_fn(mean: Sequence[float], std: Sequence[float],
                           crop_size: tuple[int, int] | None = None,
                           random_flip: bool = True,
                           interpret: bool = False):
    """Drop-in for data.augment.make_augment_fn: same RNG stream, bit-equal
    outputs, with the normalize leg as a Pallas kernel."""

    def augment(rng: jax.Array, batch: dict) -> dict:
        img = batch["image"]
        if img.dtype != jnp.uint8:
            raise TypeError(
                f"pallas augment path expects uint8 images, got {img.dtype}; "
                "use data.augment.make_augment_fn for float inputs")
        lbl = batch["label"]
        val = batch.get("valid")
        if val is None:
            val = jnp.ones(lbl.shape, jnp.bool_)
        n, h, w = lbl.shape
        flip, oy, ox = sample_augment_params(rng, n, h, w, crop_size)
        if random_flip:
            f = flip[:, None, None]
            img = jnp.where(f[..., None], img[:, :, ::-1, :], img)
            lbl = jnp.where(f, lbl[:, :, ::-1], lbl)
            val = jnp.where(f, val[:, :, ::-1], val)
        if crop_size is not None:
            ch, cw = crop_size

            def crop3d(t, o_y, o_x):
                return jax.lax.dynamic_slice(t, (o_y, o_x, 0),
                                             (ch, cw, t.shape[-1]))

            def crop2d(t, o_y, o_x):
                return jax.lax.dynamic_slice(t, (o_y, o_x), (ch, cw))

            img = jax.vmap(crop3d)(img, oy, ox)
            lbl = jax.vmap(crop2d)(lbl, oy, ox)
            val = jax.vmap(crop2d)(val, oy, ox)
        img = pallas_normalize(img, mean, std,
                               interpret=interpret)
        return {"image": img, "label": lbl, "valid": val}

    return augment
