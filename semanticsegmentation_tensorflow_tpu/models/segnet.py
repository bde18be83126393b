"""SegNet: VGG-style encoder + max-pool-index unpooling decoder.

Matches the reference's "SegNet variant with max-pool-index unpooling"
(BASELINE.json config 4; SegNet paper, PAPERS.md arxiv 1511.00561): the
encoder records the argmax position of every 2x2 max pool; the decoder
upsamples by placing each value back at its recorded position (zeros
elsewhere), then convolves. No learned upsampling.

TPU notes: TF's max_pool_with_argmax + scatter-based unpool would be a
disaster on TPU (global int64 indices + scatter). Instead the encoder carries
an int8 *within-window* index and the decoder unpools via a dense one-hot
multiply in window layout (ops/pool.py) — no gather/scatter, fully fused.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from semanticsegmentation_tensorflow_tpu.models.common import DEFAULT_DTYPE, ConvBlock
from semanticsegmentation_tensorflow_tpu.ops.pool import max_pool_with_argmax, max_unpool

# (n_convs, features) per SegNet/VGG16 encoder stage.
_STAGES: tuple[tuple[int, int], ...] = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))


class SegNet(nn.Module):
    num_classes: int = 2
    width_mult: float = 1.0
    # The SegNet paper uses BN throughout; the reference's TF1 script does
    # not (SURVEY.md §2 row 3 lists only max_pool_with_argmax + unpool among
    # its TF calls), so the parity default is off — measured +18% train
    # img/s (40.7 -> 48.0 at batch 8, v5e): train-mode BN adds two full-res
    # reduction passes per conv that XLA cannot fuse away.
    use_bn: bool = False
    # compute the encoder's 64-channel full-res stage width-pair-packed
    # (full MXU lanes; same params/indices — ops/packed_stem.py). A perf
    # flag, not an architecture change.
    packed_stage1: bool = True
    # Pallas fused stage1 tail (in-kernel argmax pool; None = auto on TPU).
    pallas_pool: bool | None = None
    # SPMD halo-array mode for the fused stage1 kernel — set True under a
    # height-sharded (2-D spatial) mesh (registry.spmd_safe_kwargs does).
    pallas_spmd: bool = False
    # 'f2'/'f4': fused Winograd kernels for eligible full-lane 3x3 convs
    # (encoder stages 2-5 + decoder stages 2-5; ops/pallas/winograd.py).
    # Same canonical params; set None under a compiler-partitioned mesh.
    winograd: str | None = None
    # compute decoder stage1 (unpool -> three full-res 64-ch convs -> 1x1
    # head) width-pair-packed: the unpool emits the packed layout directly
    # (the 2x2 window's column pair IS the pack dim — ops/packed_conv.py)
    # and the convs + head run at full MXU lanes. Same params/checkpoints;
    # values equal up to float summation order. A perf flag.
    packed_dec1: bool = True
    # same treatment for decoder stage2. MEASURED REJECTION on v5e
    # (2026-08-17 A/B, tools/bench_flags.py, batch-8 KITTI): dec1-only
    # 60.2 img/s, +dec2 57.5, dec2-only 54.6 vs unpacked 55.8 — dec2's
    # first conv consumes an already-full-lane 128-ch input, so packing
    # doubles its FLOPs with no lane win (the conv2_1 lesson,
    # models/vgg16.py packed_stage2_entry). Kept for narrow variants.
    packed_dec2: bool = False
    dtype: jnp.dtype = DEFAULT_DTYPE
    total_stride: int = 32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        from semanticsegmentation_tensorflow_tpu.ops.packed_conv import (
            PackedConvBlock, packed_conv1x1, packed_unpool,
        )
        from semanticsegmentation_tensorflow_tpu.ops.packed_stem import (
            PackedSegNetStage1, _ConvParams, unpack_pairs,
        )

        indices: list[jax.Array] = []
        for i, (n_convs, feats) in enumerate(_STAGES, start=1):
            feats = max(8, int(feats * self.width_mult))
            if (i == 1 and self.packed_stage1 and not self.use_bn
                    and feats == 64
                    and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
                # width-pair-packed stage1 (full MXU lanes at the 64-ch
                # full-res stage; same params/indices — ops/packed_stem.py)
                x, idx = PackedSegNetStage1(
                    feats, dtype=self.dtype, pallas_pool=self.pallas_pool,
                    pallas_spmd=self.pallas_spmd, name="enc1")(x)
                indices.append(idx)
                continue
            x = ConvBlock(feats, n_convs=n_convs, use_bn=self.use_bn,
                          winograd=self.winograd,
                          dtype=self.dtype, name=f"enc{i}")(x, train=train)
            x, idx = max_pool_with_argmax(x, 2)
            indices.append(idx)

        for i, (n_convs, feats) in reversed(list(enumerate(_STAGES, start=1))):
            # decoder stage i outputs the width of the *previous* encoder stage
            out_feats = _STAGES[i - 2][1] if i > 1 else _STAGES[0][1]
            out_feats = max(8, int(out_feats * self.width_mult))
            if (i == 2 and self.packed_dec2 and not self.use_bn
                    and out_feats == 64):
                # packed decoder stage2 (module docstring flag note)
                xp = packed_unpool(x.astype(self.dtype), indices[1])
                xp = PackedConvBlock(out_feats, n_convs=n_convs,
                                     dtype=self.dtype, name="dec2")(xp)
                x = unpack_pairs(xp)
                continue
            if (i == 1 and self.packed_dec1 and not self.use_bn
                    and out_feats == 64):
                # packed decoder stage1 + head (module docstring flag note)
                xp = packed_unpool(x.astype(self.dtype), indices[0])
                xp = PackedConvBlock(out_feats, n_convs=n_convs,
                                     dtype=self.dtype, name="dec1")(xp)
                kh, bh = _ConvParams(out_feats, self.num_classes,
                                     kernel_size=1, name="head")()
                xp = packed_conv1x1(xp, kh, bh, self.dtype)
                return unpack_pairs(xp).astype(jnp.float32)
            x = max_unpool(x, indices[i - 1], 2)
            x = ConvBlock(out_feats, n_convs=n_convs, use_bn=self.use_bn,
                          winograd=self.winograd,
                          dtype=self.dtype, name=f"dec{i}")(x, train=train)

        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="head")(x)
        return x.astype(jnp.float32)
