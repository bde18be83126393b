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


class ConvBlock(nn.Module):
    """n x (3x3 conv -> [BN] -> ReLU). The VGG/U-Net/SegNet workhorse."""

    features: int
    n_convs: int = 2
    use_bn: bool = False
    dilation: int = 1
    dtype: jnp.dtype = DEFAULT_DTYPE

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        for i in range(self.n_convs):
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
