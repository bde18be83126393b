"""Host batch loader with RAM cache and background prefetch.

Replaces the reference's synchronous per-batch decode generator (the host
bottleneck flagged in SURVEY.md §3.1). KITTI road is small (~300 images), so
decoded uint8 examples are cached in RAM after the first epoch; batches are
stacked uint8 (normalization happens on device, see augment.py) and staged to
device asynchronously one batch ahead of the training loop.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np

import jax

from semanticsegmentation_tensorflow_tpu.data.kitti import KittiRoadDataset
from semanticsegmentation_tensorflow_tpu.parallel.mesh import shard_batch


class BatchLoader:
    """Shuffled, padded, prefetched uint8 batches from a KITTI-style dataset.

    Spatial dims are edge-padded up to ``pad_multiple`` (stride alignment,
    ops/shape.py convention); padded pixels get valid=0 so they are invisible
    to loss and metrics.
    """

    # default RAM budget for the decoded-example cache. KITTI road fits in
    # ~0.7 GB; an unbounded cache over e.g. the Cityscapes train split
    # (2975 decoded 512x1024 examples ~= 8 GB) would exhaust the one-core
    # dev host, so eviction is LRU under this byte cap.
    DEFAULT_CACHE_BYTES = 2 << 30

    def __init__(self, dataset: KittiRoadDataset, batch_size: int,
                 pad_multiple: int = 32, seed: int = 0, mesh=None,
                 drop_remainder: bool = True, cache: bool = True,
                 cache_bytes: int | None = None,
                 process_index: int | None = None,
                 process_count: int | None = None,
                 workers: int = 0):
        """``batch_size`` is the GLOBAL batch. On a multi-host pod each host
        loads only its 1/process_count slice of every batch (same shuffled
        order everywhere — the seed is shared — so slices are disjoint and
        exhaustive); pass process_index/process_count explicitly in tests.

        ``cache_bytes`` caps the decoded-example RAM cache (LRU eviction);
        None = DEFAULT_CACHE_BYTES, ``cache=False`` disables caching.

        ``workers``: decode a batch's examples on a thread pool of this
        size (0 = inline, the single-core default). PNG decode releases
        the GIL in both the PIL and native-segio paths, so this scales the
        cold-epoch decode nearly linearly with cores on a real host —
        e.g. a 123 img/s FCN trainer needs ~1.5 cores of decode to stay
        device-bound. Batch contents are bit-identical to workers=0.
        """
        from collections import OrderedDict

        self.ds = dataset
        self.batch_size = batch_size
        self.pad_multiple = pad_multiple
        self.mesh = mesh
        self.drop_remainder = drop_remainder
        self._rng = np.random.default_rng(seed)
        self._cache: "OrderedDict[str, tuple] | None" = (
            OrderedDict() if cache else None)
        self._cache_bytes = (self.DEFAULT_CACHE_BYTES if cache_bytes is None
                             else int(cache_bytes))
        self._cache_used = 0
        self._cache_lock = threading.Lock()
        self.workers = int(workers)
        self._pool = None  # created lazily; daemon threads via Executor
        # process-sharding is tied to mesh use: a mesh-less consumer (e.g.
        # single-host eval) must see full global batches even inside a
        # multi-process program
        if process_index is None:
            process_index = jax.process_index() if mesh is not None else 0
        if process_count is None:
            process_count = jax.process_count() if mesh is not None else 1
        self.process_index = process_index
        self.process_count = process_count
        if batch_size % self.process_count:
            raise ValueError(
                f"global batch {batch_size} not divisible by "
                f"process_count {self.process_count}")

    # -- host-side example assembly -------------------------------------
    @staticmethod
    def _example_nbytes(ex: tuple) -> int:
        return sum(int(a.nbytes) for a in ex if hasattr(a, "nbytes"))

    def _get(self, path: str):
        # cache hits/inserts are lock-protected (the decode pool shares the
        # LRU); the decode itself runs outside the lock, so a rare race can
        # decode the same path twice — both results are identical and the
        # second insert just refreshes the entry
        if self._cache is not None:
            with self._cache_lock:
                if path in self._cache:
                    self._cache.move_to_end(path)  # LRU: recent at the end
                    return self._cache[path]
        ex = self.ds.load_example(path)
        if self._cache is not None:
            size = self._example_nbytes(ex)
            if size <= self._cache_bytes:  # never admit > the whole budget
                with self._cache_lock:
                    if path not in self._cache:
                        self._cache[path] = ex
                        self._cache_used += size
                    while self._cache_used > self._cache_bytes and self._cache:
                        _, old = self._cache.popitem(last=False)
                        self._cache_used -= self._example_nbytes(old)
        return ex

    def _pad(self, img, lbl, val):
        m = self.pad_multiple
        h, w = lbl.shape
        ph, pw = (-h) % m, (-w) % m
        if ph or pw:
            img = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge")
            lbl = np.pad(lbl, ((0, ph), (0, pw)))
            val = np.pad(val, ((0, ph), (0, pw)))  # padded -> invalid
        return img, lbl, val

    def _stack(self, paths: list[str]) -> dict[str, np.ndarray]:
        if self.workers > 0:
            if self._pool is None:
                from concurrent.futures import ThreadPoolExecutor
                self._pool = ThreadPoolExecutor(
                    max_workers=self.workers,
                    thread_name_prefix="seg-decode")
            examples = list(self._pool.map(self._get, paths))  # keeps order
        else:
            examples = [self._get(p) for p in paths]
        imgs, lbls, vals = [], [], []
        for ex in examples:
            i, l, v = self._pad(*ex)
            imgs.append(i); lbls.append(l); vals.append(v)
        return {"image": np.stack(imgs), "label": np.stack(lbls),
                "valid": np.stack(vals)}

    def _host_epoch(self) -> Iterator[dict[str, np.ndarray]]:
        paths = list(self.ds.train_images)
        self._rng.shuffle(paths)
        bs = self.batch_size
        local = bs // self.process_count
        lo = self.process_index * local
        for i in range(0, len(paths), bs):
            chunk = paths[i:i + bs]
            n_real = len(chunk)
            if n_real < bs:
                if self.drop_remainder:
                    break
                # wrap-pad to keep shapes static, but mark the duplicated
                # examples entirely invalid so loss/metrics never count them
                chunk = chunk + paths[: bs - n_real]
            batch = self._stack(chunk[lo:lo + local])
            if n_real < bs:
                pad_mask = np.arange(lo, lo + local) >= n_real
                batch["valid"] = batch["valid"] & ~pad_mask[:, None, None]
            yield batch  # this host's slice

    # -- device staging with one-batch-ahead prefetch --------------------
    def epoch(self) -> Iterator[dict]:
        """Yields device-resident batches (sharded over the mesh if given)."""
        q: queue.Queue = queue.Queue(maxsize=2)

        def put(batch):
            if self.mesh is not None:
                return shard_batch(batch, self.mesh)
            return jax.device_put(batch)

        def producer():
            # Propagate failures (corrupt PNG, missing GT, bad divisibility)
            # to the consumer instead of silently ending the epoch early —
            # a swallowed error here would train truncated epochs and still
            # checkpoint as if healthy.
            try:
                for b in self._host_epoch():
                    q.put(put(b))  # device_put is async; overlaps compute
            except BaseException as e:  # noqa: BLE001 — re-raised in consumer
                q.put(e)
            else:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            b = q.get()
            if b is None:
                return
            if isinstance(b, BaseException):
                raise b
            yield b

    def steps_per_epoch(self) -> int:
        n = len(self.ds.train_images)
        return n // self.batch_size if self.drop_remainder else -(-n // self.batch_size)


class _SubsetDataset:
    """View of a dataset restricted to an explicit train-image list —
    how ``scripts/train.py --val-frac`` carves a validation split out of
    datasets whose ``train_images`` is a glob-backed property (KITTI has
    no labeled public val split). Everything else delegates."""

    def __init__(self, ds, paths):
        self._ds = ds
        self._paths = list(paths)

    @property
    def train_images(self):
        return list(self._paths)

    def load_example(self, path):
        return self._ds.load_example(path)

    def __getattr__(self, name):
        return getattr(self._ds, name)


def subset_dataset(ds, paths) -> _SubsetDataset:
    return _SubsetDataset(ds, paths)


def class_pixel_counts(dataset, num_classes: int) -> np.ndarray:
    """[C] labeled-pixel counts over the train split (ignore pixels
    excluded) — the input to ``train.loss.median_frequency_weights``
    (SegNet-paper class balancing). One host pass over the ground-truth
    maps; at KITTI scale (~300 images) this is a few seconds, and the
    decoded examples land in the loader's RAM cache path anyway."""
    counts = np.zeros(num_classes, np.int64)
    for path in dataset.train_images:
        _, ids, valid = dataset.load_example(path)
        counts += np.bincount(ids[valid].ravel(),
                              minlength=num_classes)[:num_classes]
    return counts
