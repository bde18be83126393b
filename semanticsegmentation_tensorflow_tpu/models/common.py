"""Shared building blocks + the dtype policy.

Policy: params and accumulations in float32, matmul/conv inputs in bfloat16.
Flax threads this via (dtype=bf16, param_dtype=f32); XLA then emits bf16 MXU
convolutions with f32 accumulation — the TPU sweet spot. Final logits are cast
to f32 before the loss/softmax for numerical safety.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# Compute dtype used by every model unless overridden (re-exported from the
# leaf dtypes module so ops/ can share it without an import cycle).
from semanticsegmentation_tensorflow_tpu.dtypes import DEFAULT_DTYPE  # noqa: E402,F401


def winograd_ok(x: jax.Array, kernel_shape, winograd: str | None,
                dilation: int = 1) -> bool:
    """Layer-level gate for the fused Winograd conv (ops/pallas/winograd):
    flag set, stride-1 undilated 3x3, spatial dims divisible by the output
    tile, both channel widths filling the 128 TPU lanes. Ineligible layers
    silently take the direct-conv path — the flag is a perf choice, never
    an architecture change."""
    if not winograd or dilation != 1:
        return False
    from semanticsegmentation_tensorflow_tpu.ops.pallas.winograd import (
        eligible,
    )
    return eligible(x.shape, kernel_shape, winograd)


def conv3x3_bias_relu(x: jax.Array, kernel: jax.Array, bias: jax.Array, *,
                      dtype, dilation: int = 1,
                      winograd: str | None = None) -> jax.Array:
    """relu(SAME-conv3x3(x, kernel) + bias) — the VGG workhorse layer —
    with the fused Winograd fast path when eligible. Consumes CANONICAL
    parameters either way (same param tree, checkpoints, imports)."""
    x = x.astype(dtype)
    if winograd_ok(x, kernel.shape, winograd, dilation):
        from semanticsegmentation_tensorflow_tpu.ops.pallas.winograd import (
            winograd_conv_bias_relu,
        )
        return winograd_conv_bias_relu(x, kernel, bias, winograd,
                                       jax.default_backend() != "tpu")
    d = dilation
    z = jax.lax.conv_general_dilated(
        x, kernel.astype(dtype), window_strides=(1, 1),
        padding=((d, d), (d, d)), rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return nn.relu(z + bias.astype(dtype))


class ConvBlock(nn.Module):
    """n x (3x3 conv -> [BN] -> ReLU). The VGG/U-Net/SegNet workhorse.

    ``winograd``: 'f2' / 'f4' route eligible layers through the fused
    Winograd kernels (ops/pallas/winograd.py) — fewer MXU multiplies, same
    canonical parameters. BN blocks keep the direct path (the fused
    epilogue is bias+relu)."""

    features: int
    n_convs: int = 2
    use_bn: bool = False
    dilation: int = 1
    winograd: str | None = None
    dtype: jnp.dtype = DEFAULT_DTYPE

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        for i in range(self.n_convs):
            if self.winograd and not self.use_bn:
                # same param paths/shapes/init as nn.Conv (flax derives the
                # init rng from the module path, so values are bit-identical
                # too — the packed-stem pattern, ops/packed_stem._ConvParams)
                from semanticsegmentation_tensorflow_tpu.ops.packed_stem import (
                    _ConvParams,
                )
                k, b = _ConvParams(x.shape[-1], self.features,
                                   name=f"conv{i}")()
                x = conv3x3_bias_relu(x, k, b, dtype=self.dtype,
                                      dilation=self.dilation,
                                      winograd=self.winograd)
                continue
            x = nn.Conv(
                self.features, (3, 3),
                kernel_dilation=(self.dilation, self.dilation),
                padding="SAME", dtype=self.dtype, name=f"conv{i}",
            )(x)
            if self.use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train, dtype=self.dtype,
                    name=f"bn{i}",
                )(x)
            x = nn.relu(x)
        return x


def upsample_bilinear(x: jax.Array, factor: int) -> jax.Array:
    """Static bilinear upsampling (DeepLab head). XLA lowers this to two
    small matmuls along H and W — MXU-friendly, no gather."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * factor, w * factor, c), method="bilinear")


def kaiming_conv(features: int, kernel: Sequence[int] = (3, 3), **kw) -> nn.Conv:
    return nn.Conv(features, tuple(kernel), padding="SAME",
                   kernel_init=nn.initializers.he_normal(), **kw)
