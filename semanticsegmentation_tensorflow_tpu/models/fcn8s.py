"""FCN-8s: VGG16 encoder + transposed-conv decoder with add-fused skips.

Semantics follow the FCN paper (PAPERS.md: arxiv 1411.4038) and the
reference's decoder shape (SURVEY.md §3.4): 1x1 score convs on pool3 / pool4 /
conv7, 2x -> +pool4, 2x -> +pool3, 8x -> full-res logits.

TPU notes: flax ConvTranspose lowers to `lax.conv_transpose`, which XLA
compiles as a fractionally-strided conv on the MXU — for even strides with
SAME padding this matches TF's conv2d_transpose output shapes exactly (golden
shape tests in tests/test_models.py). Skip fusion is an elementwise add, fused
by XLA into the preceding conv. Requires H, W % 32 == 0 (pad via
ops.shape.pad_to_multiple).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from semanticsegmentation_tensorflow_tpu.models.common import DEFAULT_DTYPE
from semanticsegmentation_tensorflow_tpu.models.vgg16 import VGG16
from semanticsegmentation_tensorflow_tpu.ops.fast_upsample import FastConvTranspose

_SCORE_INIT = nn.initializers.normal(stddev=0.01)


class FCN8s(nn.Module):
    """FCN, all three paper variants via ``variant``:
    32 = direct 32x upsample of conv7 scores; 16 = fuse pool4, 16x up;
    8 (default, the reference's) = fuse pool4 + pool3, 8x up."""

    num_classes: int = 2
    fc_features: int = 1024
    width_mult: float = 1.0
    use_bn: bool = False
    dropout_rate: float = 0.5   # the reference's KEEP_PROB on fc6/fc7
    variant: int = 8            # 8 | 16 | 32
    dtype: jnp.dtype = DEFAULT_DTYPE
    total_stride: int = 32
    # pixel-shuffle decomposition of the transposed convs (bit-identical
    # function + params, ~10x faster on TPU for 2-channel score maps; see
    # ops/fast_upsample.py). Checkpoints are interchangeable either way.
    fast_upsample: bool = True
    # width-pair-packed stage1 (ops/packed_stem.py): same params/checkpoints,
    # values equal up to float summation order, ~2x faster stage1 on TPU.
    packed_stage1: bool = True
    # Pallas pool inside the packed stage1 (None = auto on TPU).
    pallas_pool: bool | None = None
    # SPMD halo-array mode for the fused stage1 kernel — set True under a
    # height-sharded (2-D spatial) mesh (registry.spmd_safe_kwargs does).
    pallas_spmd: bool = False
    # 'f2'/'f4': fused Winograd kernels for the eligible stage2-5 convs
    # (models/vgg16.py docstring); same params/checkpoints, fewer MXU
    # multiplies. Set None under a compiler-partitioned (2-D spatial) mesh.
    winograd: str | None = None
    # decomposed-Winograd fc6 (models/vgg16.py docstring). Pure XLA ops —
    # SPMD-safe. Default off: measured slower than the direct conv
    # (ARCHITECTURE.md rejection 10).
    winograd_fc6: bool | None = None
    # width-pair-packed conv2_1 (models/vgg16.py docstring): full-lane
    # input gradient for stage2's first conv. Perf flag only.
    packed_stage2_entry: bool = False
    # run each pooled stage's last bias+relu AFTER the pool (bit-exact,
    # ops/packed_stem.PooledConvBlock). Set False to route the backbone
    # through plain nn.Conv blocks — required by interceptor-based paths
    # (int8 quantization / QAT, registry.quant_safe_kwargs).
    deferred_pool_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        ends = VGG16(fc_features=self.fc_features, width_mult=self.width_mult,
                     use_bn=self.use_bn, dropout_rate=self.dropout_rate,
                     packed_stage1=self.packed_stage1,
                     pallas_pool=self.pallas_pool,
                     pallas_spmd=self.pallas_spmd, winograd=self.winograd,
                     winograd_fc6=self.winograd_fc6,
                     packed_stage2_entry=self.packed_stage2_entry,
                     deferred_pool_bias=self.deferred_pool_bias,
                     dtype=self.dtype, name="vgg16")(x, train=train)

        def score(t, name):
            return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                           kernel_init=_SCORE_INIT, name=name)(t)

        def up(t, factor, name):
            if self.fast_upsample:
                return FastConvTranspose(
                    self.num_classes, factor, dtype=self.dtype,
                    kernel_init=_SCORE_INIT, name=name)(t)
            return nn.ConvTranspose(
                self.num_classes, (factor * 2, factor * 2),
                strides=(factor, factor), padding="SAME",
                dtype=self.dtype, kernel_init=_SCORE_INIT, name=name,
            )(t)

        if self.variant not in (8, 16, 32):
            raise ValueError(f"FCN variant must be 8/16/32, got {self.variant}")

        s7 = score(ends["conv7"], "score_conv7")          # /32
        if self.variant == 32:
            x = up(s7, 32, "up32_final")                  # /1
            return x.astype(jnp.float32)

        s4 = score(ends["pool4"], "score_pool4")          # /16
        x = up(s7, 2, "up2_conv7") + s4                   # /16
        if self.variant == 16:
            x = up(x, 16, "up16_final")                   # /1
            return x.astype(jnp.float32)

        s3 = score(ends["pool3"], "score_pool3")          # /8
        x = up(x, 2, "up2_fuse4") + s3                    # /8
        x = up(x, 8, "up8_final")                         # /1
        return x.astype(jnp.float32)
