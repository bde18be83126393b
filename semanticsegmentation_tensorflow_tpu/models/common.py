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


def winograd_impl(x_shape, kernel_shape, winograd: str | None,
                  dilation: int = 1) -> str | None:
    """Per-layer Winograd routing: ``'pallas'`` (the fused VMEM kernel,
    ops/pallas/winograd.py), ``'xla'`` (ops/winograd.winograd_conv2d,
    materialized V/M + batched MXU dot_general — suffix the variant with
    ``x``, e.g. ``'f2x'``, to force it), or ``None`` (direct conv).

    MEASURED STATUS (tools/bench_winograd.py on v5e, batch-16 KITTI
    shapes, table in ARCHITECTURE.md): neither Winograd implementation
    beats XLA's direct conv on the 3x3 stacks today — conv4_2 fwd runs
    direct ~5.2 ms, fused-pallas f2 8.4 ms, materialized-XLA f2 20.0 ms
    (the a^2/m^2 V/M HBM round-trip, ~1 GB each way at stage-4 shapes,
    dwarfs the multiply saving; the fused kernel is choreography-bound —
    ablations put its dots AND transform arithmetic near-free). The fc6
    7x7 decomposition (ops/winograd.winograd_conv_large) was likewise
    measured slower — its transformed-kernel build dominates
    (ARCHITECTURE.md rejection 10 has the full table). The flag
    therefore stays a tuning/benchmark knob, default off. Ineligible
    layers silently fall back: the flag is a perf choice, never an
    architecture change."""
    if not winograd or dilation != 1:
        return None
    from semanticsegmentation_tensorflow_tpu.ops.pallas.winograd import (
        eligible,
    )
    from semanticsegmentation_tensorflow_tpu.ops.winograd import (
        VARIANTS, xla_eligible,
    )
    force_xla = winograd.endswith("x")
    base = winograd[:-1] if force_xla else winograd
    if base not in VARIANTS:
        raise ValueError(f"unknown winograd variant {winograd!r}")
    if force_xla:
        # the materialized-XLA path pads arbitrary H/W/C itself — gate on
        # ITS eligibility (kernel/width economics), not the Pallas kernel's
        # alignment rules, or 'f4x' silently no-ops on layers it supports
        return "xla" if xla_eligible(x_shape, kernel_shape, base) else None
    return "pallas" if eligible(x_shape, kernel_shape, base) else None


def winograd_ok(x: jax.Array, kernel_shape, winograd: str | None,
                dilation: int = 1) -> bool:
    """Back-compat boolean form of :func:`winograd_impl`."""
    return winograd_impl(x.shape, kernel_shape, winograd, dilation) is not None


def conv3x3_bias_relu(x: jax.Array, kernel: jax.Array, bias: jax.Array, *,
                      dtype, dilation: int = 1,
                      winograd: str | None = None) -> jax.Array:
    """relu(SAME-conv3x3(x, kernel) + bias) — the VGG workhorse layer —
    with the Winograd fast path when eligible. Consumes CANONICAL
    parameters either way (same param tree, checkpoints, imports)."""
    x = x.astype(dtype)
    impl = winograd_impl(x.shape, kernel.shape, winograd, dilation)
    if impl == "xla":
        from semanticsegmentation_tensorflow_tpu.ops.winograd import (
            winograd_conv2d,
        )
        return winograd_conv2d(x, kernel, bias, winograd.rstrip("x"), True)
    if impl == "pallas":
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
