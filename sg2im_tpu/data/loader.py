"""Host-side batch loader: parallel sample decoding -> padded GraphBatches.

Replaces the reference's torch ``DataLoader(collate_fn=coco_collate_fn)``
(``scripts/train.py:288-306``; 4 worker processes): samples are decoded by a
thread pool (PIL/numpy release the GIL for the heavy parts) and collated
into **static-shape padded** batch dicts ready for the jitted train step,
with a bounded prefetch queue so the TPU never waits on the host.

The ragged collate + ``obj_to_img`` layout of the reference
(``sg2im/data/coco.py:376-419``) is replaced by per-image padding — the
XLA-idiomatic choice (SURVEY.md §2.4).
"""

from __future__ import annotations

import queue
import threading
import warnings
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np


_TRUNC_WARNED = False


def collate_padded(samples, O_max: int, T_max: int, drop_excess: bool = True):
    """Collate per-sample dicts into one padded batch dict.

    Graphs exceeding (O_max, T_max) are truncated (objects keep the
    ``__image__`` node last; triples referencing dropped objects vanish) —
    with reference-default caps (COCO <=9 objects, VG <=11) and sane pads
    this never triggers.
    """
    N = len(samples)
    H, W, _ = samples[0]["image"].shape
    has_masks = samples[0].get("masks") is not None
    M = samples[0]["masks"].shape[-1] if has_masks else 0

    out = {
        "imgs": np.zeros((N, H, W, 3), np.float32),
        "objs": np.zeros((N, O_max), np.int32),
        "boxes": np.zeros((N, O_max, 4), np.float32),
        "triples": np.zeros((N, T_max, 3), np.int32),
        "obj_mask": np.zeros((N, O_max), np.float32),
        "triple_mask": np.zeros((N, T_max), np.float32),
    }
    if has_masks:
        out["masks"] = np.zeros((N, O_max, M, M), np.float32)

    for n, s in enumerate(samples):
        objs = np.asarray(s["objs"])
        triples = np.asarray(s["triples"]).reshape(-1, 3)
        O = len(objs)
        if O > O_max:
            if not drop_excess:
                raise ValueError(f"graph with {O} objects > O_max={O_max}")
            global _TRUNC_WARNED
            if not _TRUNC_WARNED:
                _TRUNC_WARNED = True
                warnings.warn(
                    f"collate_padded: graph with {O} objects truncated to "
                    f"O_max={O_max} (their relationships drop too); raise "
                    f"pad_objects_to to keep all objects", stacklevel=2)
            # keep first O_max-1 + the __image__ node (last)
            keep = list(range(O_max - 1)) + [O - 1]
            remap = {k: i for i, k in enumerate(keep)}
            objs = objs[keep]
            triples = np.asarray(
                [[remap[s_], p, remap[o_]] for s_, p, o_ in triples
                 if s_ in remap and o_ in remap], np.int64).reshape(-1, 3)
            s = dict(s, boxes=np.asarray(s["boxes"])[keep],
                     masks=(np.asarray(s["masks"])[keep]
                            if has_masks else None))
            O = O_max
        if len(triples) > T_max:
            if not _TRUNC_WARNED:
                _TRUNC_WARNED = True
                warnings.warn(
                    f"collate_padded: graph with {len(triples)} triples "
                    f"truncated to T_max={T_max}; raise pad_triples_to to "
                    f"keep all relationships", stacklevel=2)
        T = min(len(triples), T_max)
        out["imgs"][n] = s["image"]
        out["objs"][n, :O] = objs
        out["obj_mask"][n, :O] = 1.0
        out["boxes"][n, :O] = np.asarray(s["boxes"])[:O]
        out["triples"][n, :T] = triples[:T]
        out["triple_mask"][n, :T] = 1.0
        if has_masks:
            out["masks"][n, :O] = np.asarray(s["masks"])[:O]
    return out


class PaddedLoader:
    """Iterable over padded batch dicts with threaded decode + prefetch."""

    def __init__(self, dataset, batch_size: int, O_max: int, T_max: int,
                 shuffle: bool = True, num_workers: int = 4,
                 prefetch: int = 4, seed: int = 0, drop_last: bool = True,
                 shard: tuple[int, int] | None = None,
                 batch_decode: bool = True):
        """``shard=(host_index, host_count)`` gives each host a disjoint
        1/host_count slice of every epoch's permutation — the multi-host
        data-parallel contract (all hosts share the shuffle seed).

        ``batch_decode``: when the dataset exposes ``decode_images_batch``
        (COCO/VG), decode each batch's images in ONE GIL-free C++
        thread-pool call (``native/imagedec.cpp``) instead of per-sample
        inside the Python worker threads — same bytes, less GIL traffic.
        Automatically inapplicable (and skipped) when a decoded-sample
        cache is active or the native decoder is unavailable."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.O_max = O_max
        self.T_max = T_max
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        # Queue(maxsize<=0) is UNBOUNDED per the stdlib contract — the
        # producer would decode the whole epoch ahead (gigabytes resident).
        self.prefetch = max(1, prefetch)
        self.seed = seed
        self.drop_last = drop_last
        self.shard = shard
        self.batch_decode = batch_decode
        self._epoch = 0

    def _shard_slice(self, idx):
        if self.shard is None:
            return idx
        k, count = self.shard
        per = len(idx) // count
        return idx[k * per:(k + 1) * per]

    def __len__(self):
        n = len(self.dataset)
        if self.shard is not None:
            n = n // self.shard[1]
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self, epoch: int):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            # The epoch is the caller's bound value, not self._epoch: the
            # producer thread runs this after __iter__ returns, by which
            # time another iterator may have bumped the shared counter.
            rng = np.random.RandomState(self.seed + epoch)
            rng.shuffle(idx)
        idx = self._shard_slice(idx)
        n = len(idx)
        end = (n - n % self.batch_size) if self.drop_last else n
        for i in range(0, end, self.batch_size):
            yield idx[i:i + self.batch_size]

    def __iter__(self) -> Iterator[dict]:
        self._epoch += 1
        epoch = self._epoch
        # Advance the dataset's order-independent RNG stream so seeded
        # sampling re-rolls per epoch yet stays reproducible for any
        # num_workers (sg2im_tpu.data.seeding).  The epoch is BOUND to
        # this iterator (getitem_at_epoch), never written into shared
        # dataset state: a mid-epoch eval sweep spawning a second iterator
        # must not perturb the live train iterator's in-flight samples.
        if hasattr(self.dataset, "getitem_at_epoch"):
            def fetch(i, _e=epoch, image=None):
                if image is not None:
                    return self.dataset.getitem_at_epoch(i, _e, image=image)
                return self.dataset.getitem_at_epoch(i, _e)
        else:
            set_epoch = getattr(self.dataset, "set_epoch", None)
            if set_epoch is not None:
                set_epoch(epoch)
            fetch = self.dataset.__getitem__
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            # Bounded put that aborts when the consumer abandoned iteration
            # (a plain q.put would block forever and leak the thread pool).
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        decode_batch = (getattr(self.dataset, "decode_images_batch", None)
                        if (self.batch_decode
                            and hasattr(self.dataset, "getitem_at_epoch"))
                        else None)

        def producer():
            nonlocal decode_batch
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for batch_idx in self._index_batches(epoch):
                        if stop.is_set():
                            return
                        images = None
                        if decode_batch is not None:
                            images = decode_batch(
                                batch_idx, n_threads=self.num_workers)
                            if images is None:  # inapplicable: stop asking
                                decode_batch = None
                        if images is None:
                            samples = list(pool.map(fetch, batch_idx))
                        else:
                            samples = list(pool.map(fetch, batch_idx,
                                                    [epoch] * len(batch_idx),
                                                    images))
                        if not put_or_stop(collate_padded(
                                samples, self.O_max, self.T_max)):
                            return
                put_or_stop(None)
            except BaseException as exc:  # surface in the consumer
                put_or_stop(exc)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


def prefetch_to_device(iterator, size: int = 2):
    """Wrap a batch iterator so host->device transfers overlap compute.

    jax dispatch is async: putting batch N+1 on device while step N runs
    hides the transfer latency (measured ~30 ms/step for COCO-64 batches
    through a tunneled TPU). Yields device-resident batch dicts.
    """
    import collections

    import jax

    queue = collections.deque()

    def put(b):
        return {k: (jax.device_put(v) if v is not None else None)
                for k, v in b.items()}

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
