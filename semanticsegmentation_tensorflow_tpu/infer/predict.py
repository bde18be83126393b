"""Prediction + overlay writing (the reference's test / inference-on-image
entry points, SURVEY.md §3.2-3.3).

The whole per-image pipeline — normalize, pad to stride alignment, forward,
crop logits, argmax, colormap, alpha blend — is ONE jitted device program;
only uint8 pixels cross the host boundary in either direction. Overlays are
written to ``runs/<timestamp>/`` like the reference.
"""

from __future__ import annotations

import os
import time
from typing import Iterable, Iterator, Sequence

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from semanticsegmentation_tensorflow_tpu.data.augment import normalize_images
from semanticsegmentation_tensorflow_tpu.data.kitti import load_image
from semanticsegmentation_tensorflow_tpu.data.palette import KITTI_OVERLAY_PALETTE
from semanticsegmentation_tensorflow_tpu.ops.overlay import argmax_colormap_overlay
from semanticsegmentation_tensorflow_tpu.ops.shape import pad_to_multiple, crop_to


class Predictor:
    """Jitted forward + overlay for a fixed image size.

    ``mesh``: optional 1-axis ``data`` mesh for MULTI-CHIP batch-parallel
    inference — params replicated, the batch sharded over ICI, outputs
    sharded the same way (the serving analog of the shard_map train step;
    the reference's inference is single-image CPU, SURVEY.md §3.2, so this
    is a capability extension, not parity). The caller's batch must be a
    multiple of the mesh size (``__call__`` pads a ragged batch itself).
    The Pallas overlay kernel has no partitioning rule, so mesh mode uses
    the XLA overlay (elementwise — partitions trivially, bit-equal)."""

    def __init__(self, model: nn.Module, variables: dict,
                 image_size: tuple[int, int],
                 mean: Sequence[float] = (123.68, 116.779, 103.939),
                 std: Sequence[float] = (58.393, 57.12, 57.375),
                 overlay_palette: np.ndarray = KITTI_OVERLAY_PALETTE,
                 alpha: float = 0.5,
                 use_pallas: bool | None = None,
                 mesh=None,
                 apply_fn=None):
        self.image_size = image_size
        # apply_fn: drop-in replacement for model.apply — e.g. the int8
        # interceptor apply from infer/quant.make_apply (pass its
        # quantized variables tree too)
        apply = apply_fn if apply_fn is not None else model.apply
        self._mesh = mesh
        stride = getattr(model, "total_stride", 32)
        palette = jnp.asarray(overlay_palette)
        mean = tuple(mean); std = tuple(std)
        if use_pallas is None:  # auto: the kernel targets TPU
            use_pallas = (jax.devices()[0].platform == "tpu"
                          and mesh is None)
        if use_pallas and mesh is not None:
            raise ValueError(
                "use_pallas=True is incompatible with mesh inference: the "
                "Pallas overlay kernel has no SPMD partitioning rule — "
                "leave use_pallas unset (the XLA overlay is bit-equal)")
        if use_pallas:
            from semanticsegmentation_tensorflow_tpu.ops.pallas.overlay import (
                argmax_colormap_overlay_pallas,
            )
            overlay_fn = argmax_colormap_overlay_pallas
        else:
            overlay_fn = argmax_colormap_overlay

        def logits_fn(variables, image_u8: jax.Array) -> jax.Array:
            x = normalize_images(image_u8, mean, std)
            x = pad_to_multiple(x, stride)
            logits = apply(variables, x, train=False)
            return crop_to(logits, *image_size)

        def fwd(variables, image_u8):
            return overlay_fn(image_u8, logits_fn(variables, image_u8),
                              palette, alpha)

        def fwd_labels(variables, image_u8: jax.Array) -> jax.Array:
            # minimal label map — 12x less device->host traffic than the
            # overlay; the sweep path rebuilds the overlay on host
            # (ops.overlay.host_overlay) from the image it already decoded.
            # u8 only while class ids fit (KITTI/Cityscapes); wider label
            # spaces widen the wire dtype instead of silently wrapping.
            logits = logits_fn(variables, image_u8)
            label_dt = jnp.uint8 if logits.shape[-1] <= 256 else jnp.int32
            if logits.shape[-1] == 2:
                # bit-exact with argmax (ties -> class 0) but plane-form:
                # no C-minor T(2,128) reduce at full resolution (the
                # SEG_LOSS_IMPL=binary trick, train/step.py)
                return (logits[..., 1] > logits[..., 0]).astype(label_dt)
            return jnp.argmax(logits, axis=-1).astype(label_dt)

        # wire format for the sweep's label fetch: tiny class spaces pack on
        # device (1 bit/px for binary road labels, a nibble for nc<=16) —
        # 8x/2x less device->host traffic on the e2e-dominant fetch leg
        # (ops/labelpack.py). nc comes from an abstract trace (free).
        from semanticsegmentation_tensorflow_tpu.ops import labelpack

        nc = jax.eval_shape(
            logits_fn, variables,
            jax.ShapeDtypeStruct((1, *image_size, 3), jnp.uint8)).shape[-1]
        self._pack_mode = labelpack.pack_mode(nc)  # "none" for nc > 16

        def fwd_labels_packed(variables, image_u8: jax.Array) -> jax.Array:
            return labelpack.pack_labels(fwd_labels(variables, image_u8),
                                         self._pack_mode)

        # variables are a jit ARGUMENT, not a closure capture: captured
        # arrays become HLO constants, which baked all 135M fc4096 params
        # into the executable (353MB serialized, minutes of extra XLA
        # constant-handling at compile — measured) and defeated the
        # persistent compile cache
        if mesh is None:
            self._variables = jax.device_put(variables)
            self._jfwd = jax.jit(fwd)
            self._jfwd_labels = jax.jit(fwd_labels)
            self._jfwd_labels_packed = jax.jit(fwd_labels_packed)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from semanticsegmentation_tensorflow_tpu.parallel.mesh import (
                DATA_AXIS,
            )
            repl = NamedSharding(mesh, P())
            bspec = NamedSharding(mesh, P(DATA_AXIS))
            self._variables = jax.device_put(variables, repl)
            self._jfwd = jax.jit(fwd, in_shardings=(repl, bspec),
                                 out_shardings=(bspec, bspec))
            self._jfwd_labels = jax.jit(fwd_labels,
                                        in_shardings=(repl, bspec),
                                        out_shardings=bspec)
            self._jfwd_labels_packed = jax.jit(fwd_labels_packed,
                                               in_shardings=(repl, bspec),
                                               out_shardings=bspec)
        self._palette = np.asarray(overlay_palette)
        self._alpha = alpha
        self._logits_fn = logits_fn
        self._jfwd_conf = None  # built lazily by confidence()

    def confidence(self, image_u8: np.ndarray) -> np.ndarray:
        """[N,H,W] (or [H,W]) uint8 road-confidence map: round(P(road)*255)
        — the KITTI road devkit's SUBMISSION format (its threshold sweep
        reads a uint8 prob map; see train/metrics.py:kitti_road_metrics,
        the in-repo evaluator of the same quantization). Binary models
        only; jitted lazily on first use (mesh-sharded like the label
        path)."""
        if self._jfwd_conf is None:
            logits_fn = self._logits_fn

            def fwd_conf(variables, image_u8):
                logits = logits_fn(variables, image_u8)
                if logits.shape[-1] != 2:
                    raise ValueError("confidence maps need a binary "
                                     "(num_classes=2) model")
                p = jax.nn.softmax(logits.astype(jnp.float32), -1)[..., 1]
                return jnp.round(p * 255.0).astype(jnp.uint8)

            if self._mesh is None:
                self._jfwd_conf = jax.jit(fwd_conf)
            else:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from semanticsegmentation_tensorflow_tpu.parallel.mesh import (
                    DATA_AXIS,
                )
                repl = NamedSharding(self._mesh, P())
                bspec = NamedSharding(self._mesh, P(DATA_AXIS))
                self._jfwd_conf = jax.jit(fwd_conf,
                                          in_shardings=(repl, bspec),
                                          out_shardings=bspec)
        squeeze = image_u8.ndim == 3
        x = np.asarray(image_u8)[None] if squeeze else np.asarray(image_u8)
        n_real = x.shape[0]
        if self._mesh is not None and x.shape[0] % self._mesh.size:
            pad = (-x.shape[0]) % self._mesh.size
            x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
        out = np.asarray(self._jfwd_conf(self._variables,
                                         jnp.asarray(x)))[:n_real]
        return out[0] if squeeze else out

    def _fwd(self, image_u8):
        return self._jfwd(self._variables, image_u8)

    def _fwd_labels(self, image_u8):
        return self._jfwd_labels(self._variables, image_u8)

    def _fetch_labels(self, image_u8) -> np.ndarray:
        """Device forward + packed label fetch + host unpack (the sweep's
        fetch leg: bit/nibble-packed wire format, ops/labelpack.py).
        Ragged batches pad to the mesh size like ``__call__`` (the server
        feeds single images; the sweep pre-pads)."""
        from semanticsegmentation_tensorflow_tpu.ops.labelpack import (
            unpack_labels)
        n_real = image_u8.shape[0]
        if self._mesh is not None and n_real % self._mesh.size:
            pad = (-n_real) % self._mesh.size
            arr = np.asarray(image_u8)
            image_u8 = np.concatenate(
                [arr, np.repeat(arr[-1:], pad, axis=0)])
        packed = np.asarray(self._jfwd_labels_packed(self._variables,
                                                     image_u8))
        return unpack_labels(packed, self.image_size[1],
                             self._pack_mode)[:n_real]

    def __call__(self, image_u8: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """[H,W,3] or [N,H,W,3] uint8 -> (overlay u8, labels i32), same rank."""
        squeeze = image_u8.ndim == 3
        if squeeze:
            image_u8 = image_u8[None]
        n_real = image_u8.shape[0]
        if self._mesh is not None:
            # pad a ragged batch to the mesh size (repetition — the pad
            # rows are discarded below; same trick as the sweep producer)
            m = self._mesh.size
            pad = (-n_real) % m
            if pad:
                image_u8 = np.concatenate(
                    [image_u8, np.repeat(image_u8[-1:], pad, axis=0)])
        overlay, labels = self._fwd(jnp.asarray(image_u8))
        overlay = np.asarray(overlay)[:n_real]
        labels = np.asarray(labels)[:n_real]
        return (overlay[0], labels[0]) if squeeze else (overlay, labels)

    def predict_file(self, path: str) -> tuple[np.ndarray, np.ndarray]:
        return self(load_image(path, self.image_size))


def save_inference_samples(predictor: Predictor, image_paths: Iterable[str],
                           runs_dir: str = "runs", prefetch: int = 2,
                           batch_size: int = 1, writers: int = 2,
                           ) -> Iterator[tuple[str, str]]:
    """Run the test sweep; writes overlay PNGs to runs/<timestamp>/.

    Yields (image_path, output_path) as each file lands (streaming, like the
    reference's generator, SURVEY.md §3.2), with the three pipeline legs
    overlapped:

      * host PNG decode + the host->device upload run in a prefetch thread
        ahead of the device (the producer batches and ``device_put``s, so
        the upload of batch n+1 overlaps the compute/fetch of batch n; a
        ragged final batch is padded by repetition so the compiled shape is
        stable);
      * the device forward is batched (``batch_size`` > 1; the reference
        runs 1 image at a time — batch 8 is ~2x device throughput,
        benchmarks/results.json) and returns only the LABEL MAP, packed
        on device to 1 bit/px for binary label spaces (nibbles for
        nc<=16, ops/labelpack.py) — 96x less device->host traffic than
        fetching rendered overlays, which matters on PCIe and dominates
        on this tunneled dev chip (measured ~11/17 MB/s up/down);
      * overlay compositing (ops.overlay.host_overlay, same blend math as
        the device op), PNG encode via the vectorized sub-filter encoder
        (utils/fastpng.py, ~7x PIL — encode was 97% of the round-1 sweep;
        round 4 adds the native fixed-Huffman encoder under it, another
        ~9x), and the file write all run on a small writer pool. Both
        zlib and the native ctypes call release the GIL, so writers
        overlap the device fetch.

    Results are yielded in input order once their file is on disk; writer
    errors surface on the yield of the failed file.
    """
    import queue
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from semanticsegmentation_tensorflow_tpu.ops.overlay import host_overlay
    from semanticsegmentation_tensorflow_tpu.utils.fastpng import write_png

    out_dir = os.path.join(runs_dir, time.strftime("%Y%m%d-%H%M%S"))
    os.makedirs(out_dir, exist_ok=True)

    q: queue.Queue = queue.Queue(maxsize=max(1, prefetch))

    def producer() -> None:
        try:
            batch: list[tuple[str, np.ndarray]] = []

            def ship() -> None:
                imgs = np.stack([im for _, im in batch])
                n_real = len(batch)
                if n_real < batch_size:  # pad ragged tail to compiled shape
                    imgs = np.concatenate(
                        [imgs,
                         np.repeat(imgs[-1:], batch_size - n_real, axis=0)])
                if predictor._mesh is not None:
                    # upload shards DIRECTLY to their devices; a plain
                    # device_put would land on device 0 and the sharded jit
                    # would redistribute every batch over ICI
                    from jax.sharding import NamedSharding, PartitionSpec

                    from semanticsegmentation_tensorflow_tpu.parallel.mesh import (
                        DATA_AXIS,
                    )
                    dev = jax.device_put(imgs, NamedSharding(
                        predictor._mesh, PartitionSpec(DATA_AXIS)))
                else:
                    dev = jax.device_put(imgs)
                q.put(([p for p, _ in batch], imgs, dev))
                batch.clear()

            for p in image_paths:
                batch.append((p, load_image(p, predictor.image_size)))
                if len(batch) == batch_size:
                    ship()
            if batch:
                ship()
            q.put(None)
        except BaseException as e:  # propagate decode errors to the consumer
            q.put(e)

    threading.Thread(target=producer, daemon=True).start()

    with ThreadPoolExecutor(max_workers=max(1, writers)) as pool:
        futures: list[tuple[str, str, object]] = []

        def render(img: np.ndarray, labels: np.ndarray, path: str) -> None:
            overlay = host_overlay(img, labels, predictor._palette,
                                   predictor._alpha)
            if path.lower().endswith(".png"):
                write_png(path, overlay)
            else:  # non-PNG sources keep their format (PIL, by extension)
                from PIL import Image
                Image.fromarray(overlay).save(path)

        def flush(all_of_them: bool) -> Iterator[tuple[str, str]]:
            # yield in submission order; keep at most one batch in flight
            keep = 0 if all_of_them else batch_size
            while len(futures) > keep:
                src, dst, fut = futures.pop(0)
                fut.result()
                yield src, dst

        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            names, imgs, dev = item
            labels = predictor._fetch_labels(dev)
            for i in range(len(names)):
                out_path = os.path.join(out_dir, os.path.basename(names[i]))
                futures.append(
                    (names[i], out_path,
                     pool.submit(render, imgs[i], labels[i], out_path)))
            yield from flush(all_of_them=False)
        yield from flush(all_of_them=True)
