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
    # compute the full-resolution 64-channel stages width-pair-packed
    # (ops/packed_conv.py): down0's convs + pool, up0's transposed conv
    # (emitted packed directly — a 2x2/2 transpose conv's column pair IS
    # the pack dim), the skip concat, upconv0, and the 1x1 head all run
    # at full MXU lanes. Same params/checkpoints; values equal up to
    # float summation order. MEASURED (tools/bench_flags.py 3-way A/B,
    # v5e 2026-08-19, runbook item 3): preset workload (Cityscapes
    # 256x512 b8) True 153.8 / False 140.2 / "mixed" 135.3 img/s
    # (+9.7% — default stays on); non-preset KITTI 384x1248 b8 False
    # 46.1 / True 43.9 / "mixed" 44.0 (upconv0's first conv consumes an
    # already-full-lane concat and the extra full-res skip pass grows
    # with area — set False for very large inputs; benchmarks/all.py's
    # fullres row does).
    # "mixed" (round 4's hypothesis): packed down0 + packed up0
    # transpose-conv + packed concat, then UNPACK before upconv0 —
    # measured WORST at both shapes (the unpack relayout costs more than
    # the duplicated-FLOP convs it avoids); kept only as an A/B leg.
    packed_stage0: bool | str = True
    # compute the up1..up{d} 2x2/2 transposed convs as 1x1-conv +
    # depth-to-space (ops/fast_upsample.fast_conv_transpose_2x2) instead
    # of XLA's fractionally-strided conv. Same canonical params; bit-equal
    # values. MEASURED (v5e 2026-08-19, runbook item 4): LOSES at both
    # shapes — fullres 42.0 vs 46.3 img/s, preset 147.6 vs 151.8 (XLA's
    # native transposed-conv schedule beats the 1x1+depth-to-space
    # rewrite here; the depth-to-space relayout is the cost). Rejected
    # as a default; stays available as an A/B knob.
    fast_upconv: bool = False
    dtype: jnp.dtype = DEFAULT_DTYPE

    @property
    def total_stride(self) -> int:
        return 2 ** self.depth

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        from semanticsegmentation_tensorflow_tpu.ops.packed_conv import (
            PackedConvBlock, PackedUNetDown0, pack_pairs, packed_concat,
            packed_conv1x1, packed_conv_transpose_2x2,
        )
        from semanticsegmentation_tensorflow_tpu.ops.packed_stem import (
            _ConvParams, unpack_pairs,
        )

        packed0 = (self.packed_stage0 and not self.use_bn
                   and self.base_features == 64 and self.depth >= 1
                   and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
        skips: list[jax.Array] = []
        feats = self.base_features
        for i in range(self.depth):
            if i == 0 and packed0:
                skip, x = PackedUNetDown0(feats, dtype=self.dtype,
                                          name="down0")(x)
                skips.append(skip)
                feats *= 2
                continue
            x = ConvBlock(feats, use_bn=self.use_bn, winograd=self.winograd,
                          dtype=self.dtype, name=f"down{i}")(x, train=train)
            skips.append(x)
            x = max_pool(x, 2)
            feats *= 2

        x = ConvBlock(feats, use_bn=self.use_bn, winograd=self.winograd,
                      dtype=self.dtype, name="bottleneck")(x, train=train)

        for i in reversed(range(self.depth)):
            feats //= 2
            if i == 0 and packed0:
                # packed decoder stage0 + head (flag docstring above)
                ku, bu = _ConvParams(x.shape[-1], feats, kernel_size=2,
                                     name="up0")()
                xp = packed_conv_transpose_2x2(x, ku, bu, self.dtype)
                xp = packed_concat(pack_pairs(skips[0].astype(self.dtype)),
                                   xp)
                if self.packed_stage0 == "mixed":
                    # unpack after the concat (flag docstring above);
                    # upconv0/head run canonical — same param tree either
                    # way (_ConvParams mirrors nn.Conv paths/init)
                    x = unpack_pairs(xp)
                    x = ConvBlock(feats, use_bn=self.use_bn,
                                  winograd=self.winograd, dtype=self.dtype,
                                  name="upconv0")(x, train=train)
                    x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                                name="head")(x)
                    return x.astype(jnp.float32)
                xp = PackedConvBlock(feats, n_convs=2, dtype=self.dtype,
                                     name="upconv0")(xp)
                kh, bh = _ConvParams(feats, self.num_classes,
                                     kernel_size=1, name="head")()
                xp = packed_conv1x1(xp, kh, bh, self.dtype)
                return unpack_pairs(xp).astype(jnp.float32)
            if self.fast_upconv:
                from semanticsegmentation_tensorflow_tpu.ops.fast_upsample import (
                    fast_conv_transpose_2x2,
                )
                ku, bu = _ConvParams(x.shape[-1], feats, kernel_size=2,
                                     name=f"up{i}")()
                x = fast_conv_transpose_2x2(x, ku, bu, self.dtype)
            else:
                x = nn.ConvTranspose(feats, (2, 2), strides=(2, 2),
                                     padding="SAME", dtype=self.dtype,
                                     name=f"up{i}")(x)
            x = jnp.concatenate([skips[i], x], axis=-1)
            x = ConvBlock(feats, use_bn=self.use_bn, winograd=self.winograd,
                          dtype=self.dtype, name=f"upconv{i}")(x, train=train)

        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="head")(x)
        return x.astype(jnp.float32)
