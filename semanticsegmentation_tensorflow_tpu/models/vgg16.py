"""VGG16 feature extractor (FCN/SegNet/DeepLab backbone).

The reference's FCN script loads a pretrained TF VGG16 graph and taps pool3 /
pool4 / the fc-as-conv conv7 (SURVEY.md §3.4; BASELINE.json:7 "VGG16
backbone"). No pretrained weights are fetchable in this offline environment,
so the backbone trains from scratch (he-init) and exposes a weight-import hook
(`load_npz_weights`) keyed by canonical layer names for when a weight blob is
available.

TPU notes: fc6/fc7 follow FCN's "convolutionalized" form but with the channel
width configurable (the classic 4096 is 90% of FCN-8s FLOPs for ~0 mIoU on a
2-class road task; default 1024 keeps the MXU busy without wasting HBM).
"""

from __future__ import annotations



import flax.linen as nn
import jax
import jax.numpy as jnp

from semanticsegmentation_tensorflow_tpu.models.common import DEFAULT_DTYPE, ConvBlock
from semanticsegmentation_tensorflow_tpu.ops.packed_stem import (
    PackedStage1, PooledConvBlock, _ConvParams,
)
from semanticsegmentation_tensorflow_tpu.ops.pool import max_pool

# (n_convs, features) per VGG16 stage.
VGG16_STAGES: tuple[tuple[int, int], ...] = (
    (2, 64), (2, 128), (3, 256), (3, 512), (3, 512),
)


class VGG16(nn.Module):
    """Returns a dict of endpoints: pool1..pool5, conv7.

    ``dilated_last_stages`` switches stages 4-5 to stride-1 atrous convs
    (output stride 8 instead of 32) — the DeepLab trick.
    """

    fc_features: int = 1024
    width_mult: float = 1.0
    use_bn: bool = False
    dilated_last_stages: bool = False
    # first stage whose pool is dropped (stride folded into dilation of
    # everything after it). 4 -> output stride 8 (classic DeepLab-LargeFOV);
    # 5 -> output stride 16 (stage4 keeps its pool; ~4x cheaper stage5/fc).
    dilate_from: int = 4
    # compute stage1 with width-pairs packed into channels (full MXU lanes;
    # ops/packed_stem.py). Same params/checkpoints; values equal up to float
    # summation order, so it is a perf flag, not an architecture change.
    packed_stage1: bool = False
    # Pallas pool kernel inside the packed stage1 (None = auto on TPU).
    pallas_pool: bool | None = None
    # SPMD halo-array mode for the fused stage1 kernel — set True under a
    # height-sharded (2-D spatial) mesh (registry.spmd_safe_kwargs does).
    pallas_spmd: bool = False
    # run each pooled stage's last bias+relu AFTER the pool (bit-exact — see
    # ops/packed_stem.PooledConvBlock — but 1/4-resolution elementwise work)
    deferred_pool_bias: bool = True
    # compute stage2's first conv (conv2_1, consuming the 64-channel
    # pool1 output) width-pair-packed (ops/packed_stem.PooledConvBlock
    # ``packed_entry``). Same params/checkpoints. MEASURED REJECTION on
    # v5e (2026-08-17, bench.py A/B): 108.9 vs 121.9 img/s — conv2_1's
    # output side is already full-lane, so the packed form's 2x FLOPs +
    # the pack/unpack relayouts cost far more than the ~1.5 ms half-lane
    # input-gradient they remove. Kept for narrower-input variants.
    packed_stage2_entry: bool = False
    # 'f2' / 'f4': compute eligible 3x3 convs (stages 2-5 at full lanes,
    # undilated) with Winograd fast convolution — 2.25x / 4x fewer MXU
    # multiplies for the same canonical parameters (ops/winograd.py routes
    # each layer to the measured-fastest implementation). A perf flag, not
    # an architecture change; ineligible layers fall back to the direct
    # conv automatically.
    winograd: str | None = None
    # Decomposed Winograd for the convolutionalized fc6 (the profiled
    # step's single hottest op at fc_features=4096: ~24 ms at 86-94% MXU —
    # only a FLOP-reduction beats it). The 7x7 becomes ONE F(3,3)
    # transform + a 3x3 convolution over Winograd tile indices + one
    # untransform (~51% of the direct multiplies; derivation and the two
    # measured-rejected alternatives in ops/winograd.py). Same canonical
    # conv6 params/checkpoints either way.
    winograd_fc6: bool | None = None
    # dropout on fc6/fc7, the reference's KEEP_PROB (SURVEY.md §3.1 lists it
    # among the script constants; FCN lineage uses keep_prob=0.5). 0 disables.
    dropout_rate: float = 0.5
    dtype: jnp.dtype = DEFAULT_DTYPE

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> dict[str, jax.Array]:
        ends: dict[str, jax.Array] = {}
        dilation = 1
        for i, (n_convs, feats) in enumerate(VGG16_STAGES, start=1):
            feats = max(8, int(feats * self.width_mult))
            dilate_stage = self.dilated_last_stages and i >= self.dilate_from
            if (i == 1 and self.packed_stage1 and not self.use_bn
                    and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
                x = PackedStage1(feats, dtype=self.dtype,
                                 pallas_pool=self.pallas_pool,
                                 pallas_spmd=self.pallas_spmd,
                                 name="stage1")(x)
                ends["pool1"] = x
                continue
            if dilate_stage or self.use_bn or not self.deferred_pool_bias:
                x = ConvBlock(
                    feats, n_convs=n_convs, use_bn=self.use_bn,
                    dilation=dilation, winograd=self.winograd,
                    dtype=self.dtype, name=f"stage{i}",
                )(x, train=train)
                if dilate_stage:
                    dilation *= 2  # stride folded into dilation
                    ends[f"pool{i}"] = x
                else:
                    x = max_pool(x, 2)
                    ends[f"pool{i}"] = x
            else:
                x = PooledConvBlock(feats, n_convs=n_convs, dilation=dilation,
                                    winograd=self.winograd,
                                    packed_entry=(
                                        i == 2 and self.packed_stage2_entry),
                                    dtype=self.dtype, name=f"stage{i}")(x)
                ends[f"pool{i}"] = x

        # fc6/fc7 as convs (FCN "convolutionalization"). 7x7 at the classic
        # VGG receptive field; dilated variant widens it accordingly.
        wino_fc6 = bool(self.winograd_fc6)
        if wino_fc6 and dilation == 1:
            from semanticsegmentation_tensorflow_tpu.ops.winograd import (
                winograd_conv_large,
            )
            k6, b6 = _ConvParams(x.shape[-1], self.fc_features,
                                 kernel_size=7, name="conv6")()
            x = winograd_conv_large(x.astype(self.dtype), k6, b6, "f3", True)
        else:
            x = nn.Conv(self.fc_features, (7, 7), padding="SAME",
                        kernel_dilation=(dilation, dilation),
                        dtype=self.dtype, name="conv6")(x)
            x = nn.relu(x)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train,
                           name="drop6")(x)
        x = nn.Conv(self.fc_features, (1, 1), dtype=self.dtype, name="conv7")(x)
        x = nn.relu(x)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train,
                           name="drop7")(x)
        ends["conv7"] = x
        return ends


def load_npz_weights(params: dict, npz_path: str, *, strict: bool = False,
                     report: dict | None = None) -> dict:
    """Import hook: overwrite matching VGG16 kernels/biases from an .npz
    archive with keys like ``stage1/conv0/kernel`` (HWIO layout).

    Matching is by canonical name; a name match with a SHAPE mismatch (e.g.
    classic 4096-wide fc6 weights loaded into an ``fc_features=1024`` model)
    is an error in both modes — silently keeping random init there would
    report a "successful" import of a mostly-random model.

    * ``strict=False``: entries absent from the archive keep their init.
    * ``strict=True``: every *backbone* param (any path containing a
      ``stageN/`` or ``conv6``/``conv7`` segment) must be matched, and every
      archive entry must land somewhere; anything else raises ValueError.
      Use this for parity imports (SURVEY.md §2 row 9).

    ``report`` (optional dict) is filled with ``matched`` / ``unmatched_params``
    / ``unused_archive`` key lists. Returns new params.
    """
    import numpy as np
    import flax

    blob = np.load(npz_path)
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    loaded = dict(flat)
    matched: list[str] = []
    used: set[str] = set()
    for key, val in flat.items():
        # archives may be keyed relative to the parent model ("vgg16/...")
        # or to the backbone itself
        for candidate in (key, f"vgg16/{key}", key.removeprefix("vgg16/")):
            if candidate in blob.files:
                if blob[candidate].shape != tuple(val.shape):
                    raise ValueError(
                        f"shape mismatch importing {candidate!r}: archive "
                        f"{blob[candidate].shape} vs param {tuple(val.shape)}"
                        " — model width (e.g. fc_features) must match the "
                        "archive; see the fcn8s_kitti_parity preset")
                loaded[key] = jnp.asarray(blob[candidate], dtype=val.dtype)
                matched.append(key)
                used.add(candidate)
                break

    def _is_backbone(key: str) -> bool:
        parts = key.split("/")
        return any(p.startswith("stage") or p in ("conv6", "conv7")
                   for p in parts)

    unmatched = [k for k in flat if k not in set(matched) and _is_backbone(k)]
    unused = [f for f in blob.files if f not in used]
    if report is not None:
        report.update(matched=sorted(matched),
                      unmatched_params=sorted(unmatched),
                      unused_archive=sorted(unused))
    if strict and (unmatched or unused):
        raise ValueError(
            "strict VGG16 import failed: "
            f"unmatched backbone params {sorted(unmatched)}; "
            f"unused archive entries {sorted(unused)}")
    return flax.traverse_util.unflatten_dict(loaded, sep="/")
