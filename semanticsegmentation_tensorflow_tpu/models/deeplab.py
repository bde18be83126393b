"""DeepLab-v3-style model: atrous VGG backbone + ASPP multi-scale head.

Matches the reference's "atrous/ASPP multi-scale head" config
(BASELINE.json config 5): encoder runs at output stride 8 (stride-2 pools of
stages 4-5 replaced by dilation), head is parallel atrous 3x3 convs at
multiple rates + a global-average-pool image feature, concatenated, 1x1
projected, bilinearly upsampled to full resolution.

TPU notes: atrous convs are `lax.conv_general_dilated` with rhs_dilation —
native MXU work, same cost as dense convs. The image-level feature is a mean
over (H, W) + 1x1 conv + broadcast, which XLA keeps entirely in registers/
VMEM. Bilinear 8x upsample of *num_classes* channels (not 256) keeps the
upsample byte traffic trivial.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from semanticsegmentation_tensorflow_tpu.models.common import (
    DEFAULT_DTYPE, upsample_bilinear,
)
from semanticsegmentation_tensorflow_tpu.models.vgg16 import VGG16


class ASPP(nn.Module):
    """Atrous Spatial Pyramid Pooling."""

    features: int = 256
    rates: Sequence[int] = (6, 12, 18)
    use_bn: bool = True
    dtype: jnp.dtype = DEFAULT_DTYPE

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        def bn_relu(t, name):
            if self.use_bn:
                t = nn.BatchNorm(use_running_average=not train,
                                 dtype=self.dtype, name=f"{name}_bn")(t)
            return nn.relu(t)

        branches = [bn_relu(nn.Conv(self.features, (1, 1), dtype=self.dtype,
                                    name="b0")(x), "b0")]
        for r in self.rates:
            t = nn.Conv(self.features, (3, 3), kernel_dilation=(r, r),
                        padding="SAME", dtype=self.dtype, name=f"b_rate{r}")(x)
            branches.append(bn_relu(t, f"b_rate{r}"))

        # image-level feature: global mean pooled, projected, broadcast back
        img = jnp.mean(x, axis=(1, 2), keepdims=True)
        img = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="b_image")(img)
        img = bn_relu(img, "b_image")
        branches.append(jnp.broadcast_to(img, branches[0].shape))

        x = jnp.concatenate(branches, axis=-1)
        x = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="project")(x)
        return bn_relu(x, "project")


class DeepLabASPP(nn.Module):
    num_classes: int = 2
    aspp_features: int = 256
    rates: Sequence[int] = (6, 12, 18)
    width_mult: float = 1.0
    # DeepLab-v3 uses BN; the reference's TF1 script does not (SURVEY.md §2
    # row 4 lists atrous_conv2d/ASPP/resize_bilinear only), so the parity
    # default is off — measured +25% train img/s (27.1 -> 33.9 at batch 4,
    # v5e, os8).
    use_bn: bool = False
    dropout_rate: float = 0.5
    # 'f2'/'f4': fused Winograd kernels for the UNDILATED full-lane 3x3
    # stages (2-3 at os8, 2-4 at os16); dilated stages keep the direct
    # atrous conv (ops/pallas/winograd.py eligibility). Perf flag only.
    winograd: str | None = None
    dtype: jnp.dtype = DEFAULT_DTYPE
    output_stride: int = 8

    @property
    def total_stride(self) -> int:
        return self.output_stride

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        if self.output_stride not in (8, 16):
            raise ValueError(
                f"output_stride must be 8 or 16, got {self.output_stride}")
        # os8: stages 4-5 dilated (classic DeepLab-LargeFOV, the reference's
        # configuration). os16: only stage 5 dilated — stage5/fc run on a
        # 4x smaller grid (a measured ~2x train step speedup) at a modest
        # localization cost the ASPP rates partly recover.
        ends = VGG16(width_mult=self.width_mult, use_bn=self.use_bn,
                     dilated_last_stages=True,
                     dilate_from={8: 4, 16: 5}[self.output_stride],
                     fc_features=512,
                     dropout_rate=self.dropout_rate,
                     winograd=self.winograd,
                     dtype=self.dtype, name="vgg16")(x, train=train)
        x = ASPP(features=self.aspp_features, rates=self.rates,
                 use_bn=self.use_bn, dtype=self.dtype, name="aspp")(
                     ends["conv7"], train=train)
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="head")(x)
        x = upsample_bilinear(x.astype(jnp.float32), self.output_stride)
        return x
