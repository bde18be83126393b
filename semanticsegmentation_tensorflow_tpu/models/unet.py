"""U-Net: symmetric encoder-decoder with channel-concat skips.

Matches the reference's "U-Net style encoder-decoder with concat skip
connections" (BASELINE.json config 3; SURVEY.md §2 row 2): 4 down stages
(conv-conv-pool), bottleneck, 4 up stages (transposed conv + concat + convs).

TPU notes: concat along C keeps the lane dimension contiguous; channel widths
are multiples of 64 so the post-concat convs tile the MXU cleanly. BatchNorm
optional (off by default to mirror the reference's plain convs).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from semanticsegmentation_tensorflow_tpu.models.common import DEFAULT_DTYPE, ConvBlock
from semanticsegmentation_tensorflow_tpu.ops.pool import max_pool


class UNet(nn.Module):
    num_classes: int = 2
    base_features: int = 64
    depth: int = 4
    use_bn: bool = False
    # 'f2'/'f4': fused Winograd kernels for eligible full-lane 3x3 convs
    # (ops/pallas/winograd.py); same canonical params. Perf flag only.
    winograd: str | None = None
    dtype: jnp.dtype = DEFAULT_DTYPE

    @property
    def total_stride(self) -> int:
        return 2 ** self.depth

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        skips: list[jax.Array] = []
        feats = self.base_features
        for i in range(self.depth):
            x = ConvBlock(feats, use_bn=self.use_bn, winograd=self.winograd,
                          dtype=self.dtype, name=f"down{i}")(x, train=train)
            skips.append(x)
            x = max_pool(x, 2)
            feats *= 2

        x = ConvBlock(feats, use_bn=self.use_bn, winograd=self.winograd,
                      dtype=self.dtype, name="bottleneck")(x, train=train)

        for i in reversed(range(self.depth)):
            feats //= 2
            x = nn.ConvTranspose(feats, (2, 2), strides=(2, 2), padding="SAME",
                                 dtype=self.dtype, name=f"up{i}")(x)
            x = jnp.concatenate([skips[i], x], axis=-1)
            x = ConvBlock(feats, use_bn=self.use_bn, winograd=self.winograd,
                          dtype=self.dtype, name=f"upconv{i}")(x, train=train)

        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="head")(x)
        return x.astype(jnp.float32)
