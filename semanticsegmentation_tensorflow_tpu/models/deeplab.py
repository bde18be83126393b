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
from jax import lax

from semanticsegmentation_tensorflow_tpu.models.common import (
    DEFAULT_DTYPE, upsample_bilinear,
)
from semanticsegmentation_tensorflow_tpu.models.vgg16 import VGG16


class _ASPPProject(nn.Module):
    """The ASPP 1x1 projection over the (conceptual) branch concat.

    Parameter-tree-identical to ``nn.Conv(features, (1,1), name="project")``
    applied to the concatenated branches (same path, shapes, dtype, and
    lecun_normal/zeros init stream), so checkpoints are interchangeable and
    ``split=False`` computes bit-exactly the round-3 concat + conv.

    ``split=True`` is the perf form: a 1x1 conv over a concat is the SUM of
    per-branch 1x1 convs with the kernel row-sliced, so the [N,H,W,5F]
    concat (153 MB bf16 at os8/b8, written + read + regenerated in bwd)
    never materializes; and the image-level branch — a broadcast input —
    commutes with its projection, so it is projected at 1x1 and
    broadcast-ADDED, deleting both the full-grid broadcast and that slice's
    HW-sized conv FLOPs. Same math, float-summation order differs.
    """

    features: int
    split: bool = False
    dtype: jnp.dtype = DEFAULT_DTYPE

    @nn.compact
    def __call__(self, branches: list, img: jax.Array) -> jax.Array:
        cin = sum(b.shape[-1] for b in branches) + img.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        k = kernel.astype(self.dtype)
        dn = ("NHWC", "HWIO", "NHWC")

        def conv1x1(t, ks):
            return lax.conv_general_dilated(
                t.astype(self.dtype), ks, (1, 1), "VALID",
                dimension_numbers=dn)

        if not self.split:
            x = jnp.concatenate(
                branches + [jnp.broadcast_to(img, branches[0].shape)],
                axis=-1)
            y = conv1x1(x, k)
        else:
            off = 0
            y = None
            for t in branches:
                c = t.shape[-1]
                p = conv1x1(t, k[:, :, off:off + c, :])
                y = p if y is None else y + p
                off += c
            y = y + conv1x1(img, k[:, :, off:, :])  # [N,1,1,F] broadcast-add
        return y + bias.astype(self.dtype)


class ASPP(nn.Module):
    """Atrous Spatial Pyramid Pooling."""

    features: int = 256
    rates: Sequence[int] = (6, 12, 18)
    use_bn: bool = True
    split_proj: bool = False
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

        # image-level feature: global mean pooled, projected, (BN+)relu'd
        # at 1x1 — broadcast to the grid only inside the projection (and
        # only on its non-split path)
        img = jnp.mean(x, axis=(1, 2), keepdims=True)
        img = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="b_image")(img)
        img = bn_relu(img, "b_image")

        x = _ASPPProject(self.features, split=self.split_proj,
                         dtype=self.dtype, name="project")(branches, img)
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
    # concat-free ASPP projection (see _ASPPProject): same params/
    # checkpoints, float-summation order differs. Perf A/B flag.
    aspp_split_proj: bool = False
    # bias+relu after the pool in the undilated stages (bit-exact,
    # ops/packed_stem.PooledConvBlock). False = plain nn.Conv blocks,
    # required by interceptor-based int8/QAT (registry.quant_safe_kwargs).
    deferred_pool_bias: bool = True
    # fused width-pair-packed stage1 (ops/packed_stem.PackedStage1 — the
    # same kernel FCN/SegNet default to; DeepLab's stage1 is identically
    # undilated at any output stride). The round-5 os8 profile shows the
    # unpacked stage1 cluster at ~19 ms of a 105.8 ms step; FCN's packed
    # pair costs 14.3 ms at DOUBLE the batch. Same params/checkpoints.
    packed_stage1: bool = True
    # Pallas pool inside the packed stage1 (None = auto on TPU).
    pallas_pool: bool | None = None
    # SPMD halo-array mode for the fused stage1 kernel (height-sharded
    # 2-D mesh; registry.spmd_safe_kwargs sets it).
    pallas_spmd: bool = False
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
                     deferred_pool_bias=self.deferred_pool_bias,
                     packed_stage1=self.packed_stage1,
                     pallas_pool=self.pallas_pool,
                     pallas_spmd=self.pallas_spmd,
                     dtype=self.dtype, name="vgg16")(x, train=train)
        x = ASPP(features=self.aspp_features, rates=self.rates,
                 use_bn=self.use_bn, split_proj=self.aspp_split_proj,
                 dtype=self.dtype, name="aspp")(
                     ends["conv7"], train=train)
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="head")(x)
        x = upsample_bilinear(x.astype(jnp.float32), self.output_stride)
        return x
