"""Host input pipeline: sharded, shuffled, threaded, prefetching loader.

Replaces the reference's MindSpore GeneratorDataset + map + batch stack
(/root/reference/mindpose/data/data_factory.py:59-150) with a framework-owned
loader designed for TPU feeding:

- per-process sharding (``rank_id::device_num`` slicing, matching the
  reference's num_shards/shard_id semantics),
- epoch-seeded shuffling on train,
- a thread pool running cv2 decode + transforms (cv2 releases the GIL, so
  threads parallelize the warp/encode hot loop without pickling overhead),
- bounded-queue prefetch of assembled batches so the accelerator never waits
  on the host; device transfer overlaps via JAX async dispatch.
"""
import queue
import threading
from collections import OrderedDict
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, List, Optional, Sequence

import cv2
import numpy as np

__all__ = ["DataLoader", "DecodedFrameCache"]


def _put_until_stopped(q: "queue.Queue", stop: threading.Event, item) -> bool:
    """Queue put that gives up once ``stop`` is set.

    A consumer abandoning iteration mid-epoch (early break, exception) sets
    ``stop`` with the queue possibly full; a plain blocking put would strand
    the producer thread forever.
    """
    while not stop.is_set():
        try:
            q.put(item, timeout=0.1)
            return True
        except queue.Full:
            continue
    return False


class DecodedFrameCache:
    """Byte-budgeted LRU of decoded RGB frames, shared across loader threads.

    Top-down training decodes the SAME source frame once per person record
    (COCO averages ~2, crowded scenes 8+), and every epoch re-decodes the
    whole set. On TPU hosts where cores are scarce relative to chip appetite,
    JPEG decode dominates the host pipeline; caching decoded frames converts
    the steady-state decode cost to a memory lookup. Frames are stored
    read-only so a transform mutating its input in place fails loudly
    instead of corrupting other records sharing the frame.

    The reference has no analogue — it assumes a many-core host behind
    MindSpore's GeneratorDataset workers (ref data_factory.py:59-150).
    """

    def __init__(self, budget_mb: float) -> None:
        self._budget = int(budget_mb * 1024 * 1024)
        self._lock = threading.Lock()
        self._frames: "OrderedDict[str, np.ndarray]" = OrderedDict()
        self._inflight: Dict[str, threading.Event] = {}
        self._bytes = 0
        self.hits = 0
        self.misses = 0

    def get(self, path: str) -> Optional[np.ndarray]:
        with self._lock:
            arr = self._frames.get(path)
            if arr is None:
                self.misses += 1
            else:
                self._frames.move_to_end(path)
                self.hits += 1
            return arr

    def put(self, path: str, arr: np.ndarray) -> np.ndarray:
        arr.setflags(write=False)
        if arr.nbytes > self._budget:
            return arr
        with self._lock:
            if path not in self._frames:
                while self._bytes + arr.nbytes > self._budget and self._frames:
                    _, old = self._frames.popitem(last=False)
                    self._bytes -= old.nbytes
                self._frames[path] = arr
                self._bytes += arr.nbytes
        return arr

    def get_or_decode(self, path: str, decode_fn) -> np.ndarray:
        """Cache lookup with in-flight coalescing.

        When several loader threads touch the SAME frame concurrently (the
        common case under frame-grouped shuffling: a frame's records are
        adjacent, so workers race on first touch), only one thread decodes;
        the others wait on its event instead of re-decoding. If the decoder
        raises or the frame is too big to cache, waiters fall back to
        decoding themselves.
        """
        arr = self.get(path)
        if arr is not None:
            return arr
        with self._lock:
            arr = self._frames.get(path)
            if arr is not None:
                self.hits += 1
                return arr
            ev = self._inflight.get(path)
            owner = ev is None
            if owner:
                ev = threading.Event()
                self._inflight[path] = ev
        if owner:
            try:
                arr = decode_fn()
                arr = self.put(path, arr)
            finally:
                with self._lock:
                    self._inflight.pop(path, None)
                ev.set()
            return arr
        ev.wait()
        arr = self.get(path)
        return arr if arr is not None else decode_fn()

# --- process-worker machinery -----------------------------------------------
# Threads cap at ~250 samples/s on the full top-down transform stack (the
# numpy encode holds the GIL; only the cv2 calls release it). Process workers
# give true parallelism; the dataset/transform stack is shipped once per
# worker via the pool initializer.

_WORKER_STATE: Dict[str, Any] = {}


def _process_worker_init(dataset, transforms, normalize, mean, std, seed,
                         decode_cache_mb=0):
    import os

    _WORKER_STATE["dataset"] = dataset
    _WORKER_STATE["transforms"] = transforms
    _WORKER_STATE["normalize"] = normalize
    _WORKER_STATE["mean"] = mean
    _WORKER_STATE["std"] = std
    _WORKER_STATE["cache"] = (
        DecodedFrameCache(decode_cache_mb) if decode_cache_mb else None)
    np.random.seed((seed + os.getpid()) % (2**31))
    cv2.setNumThreads(1)


def _process_worker_run(idx: int) -> Dict[str, Any]:
    state = _WORKER_STATE["dataset"][int(idx)]
    state = _decode_image(state, _WORKER_STATE.get("cache"))
    for t in _WORKER_STATE["transforms"]:
        state = t(state)
    if _WORKER_STATE["normalize"]:
        state["image"] = (
            state["image"].astype(np.float32) - _WORKER_STATE["mean"]
        ) / _WORKER_STATE["std"]
    return state


def _decode_image(
    state: Dict[str, Any], cache: Optional[DecodedFrameCache] = None
) -> Dict[str, Any]:
    """Read + decode the record's image file into an RGB uint8 HWC array."""
    path = state["image_file"]

    def _read() -> np.ndarray:
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(f"cannot read image: {path}")
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    state["image"] = _read() if cache is None else cache.get_or_decode(
        path, _read)
    return state


class DataLoader:
    """Iterate batches of stacked numpy arrays over the sharded dataset."""

    def __init__(
        self,
        dataset: Any,
        transforms: Sequence[Callable[[Dict[str, Any]], Dict[str, Any]]],
        final_columns: Sequence[str],
        batch_size: int = 1,
        is_train: bool = True,
        normalize: bool = True,
        normalize_mean: Sequence[float] = (0.485, 0.456, 0.406),
        normalize_std: Sequence[float] = (0.229, 0.224, 0.225),
        num_workers: int = 4,
        device_num: Optional[int] = None,
        rank_id: Optional[int] = None,
        drop_remainder: Optional[bool] = None,
        seed: int = 0,
        prefetch_batches: int = 2,
        worker_mode: str = "thread",
        image_bucket: Optional[int] = None,
        decode_cache_mb: float = 0,
        frame_grouped_shuffle: bool = False,
        patch_grouped_batching: bool = False,
    ) -> None:
        self.dataset = dataset
        self.transforms = list(transforms)
        self.final_columns = list(final_columns)
        self.batch_size = batch_size
        self.is_train = is_train
        self.normalize = normalize
        self.mean = np.asarray(normalize_mean, dtype=np.float32) * 255.0
        self.std = np.asarray(normalize_std, dtype=np.float32) * 255.0
        self.num_workers = max(1, num_workers)
        self.device_num = device_num or 1
        self.rank_id = rank_id or 0
        self.drop_remainder = is_train if drop_remainder is None else drop_remainder
        self.seed = seed
        self.prefetch_batches = prefetch_batches
        self.worker_mode = worker_mode
        # full device pipeline: variable-size source frames are zero-padded
        # to the batch max rounded up to this multiple (bounds the number of
        # distinct compiled shapes; zero padding is warp-neutral since the
        # device warp zero-fills out-of-source samples anyway)
        self.image_bucket = image_bucket
        # patch-grouped batching (full device pipeline): batches are padded
        # to the batch MAX, so one near-frame-sized source patch makes every
        # record in the batch pay its footprint (measured 111 MB/batch where
        # the per-record mean is ~32). Opt-in: regroup processed records by
        # their image_bucket shape and emit same-bucket batches (seq-len
        # bucketing, the NLP trick, applied to warp source patches). Same
        # records per epoch; batch COMPOSITION becomes size-correlated, a
        # mild divergence from iid batching, and each distinct bucket shape
        # compiles the step once (amortized by the persistent XLA cache).
        self.patch_grouped_batching = patch_grouped_batching
        self.decode_cache_mb = decode_cache_mb
        self.decode_cache = (
            DecodedFrameCache(decode_cache_mb) if decode_cache_mb else None)
        self.epoch = 0

        self._indices = np.arange(len(dataset))[self.rank_id :: self.device_num]
        self._pool = None  # lazily created process pool (worker_mode="process")

        # frame-grouped shuffling: shuffle FRAMES, keep this frame's records
        # adjacent. With the decoded-frame cache this makes the decode hit
        # rate (records/frame - 1)/records/frame deterministically — on
        # datasets far larger than any cache budget (COCO train: ~2.5
        # top-down records/frame), record-level shuffling almost never
        # re-hits a frame before eviction. Opt-in: batches become
        # frame-correlated, a (mild) divergence from the reference's
        # record-level shuffle (ref data_factory.py:63-66).
        self.frame_grouped_shuffle = frame_grouped_shuffle
        self._frame_groups: Optional[List[np.ndarray]] = None
        if frame_grouped_shuffle:
            records = getattr(dataset, "_dataset", None)
            groups: Dict[Any, List[int]] = {}
            for i in self._indices:
                key = (records[int(i)].get("image_file", int(i))
                       if records is not None else int(i))
                groups.setdefault(key, []).append(int(i))
            self._frame_groups = [np.asarray(v) for v in groups.values()]

    def __len__(self) -> int:
        n = len(self._indices)
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    @property
    def num_samples(self) -> int:
        return len(self._indices)

    def _process_one(self, idx: int) -> Dict[str, Any]:
        state = self.dataset[int(idx)]
        state = _decode_image(state, self.decode_cache)
        for t in self.transforms:
            state = t(state)
        if self.normalize:
            state["image"] = (
                state["image"].astype(np.float32) - self.mean
            ) / self.std
        return state

    def _collate(self, states: List[Dict[str, Any]]) -> Dict[str, Any]:
        batch: Dict[str, Any] = {}
        for col in self.final_columns:
            vals = [s[col] for s in states]
            if isinstance(vals[0], str):
                batch[col] = np.array(vals, dtype=object)
            elif col == "image" and self.image_bucket:
                batch[col] = self._pad_to_bucket([np.asarray(v) for v in vals])
            else:
                batch[col] = np.stack([np.asarray(v) for v in vals])
        return batch

    def _pad_to_bucket(self, images: List[np.ndarray]) -> np.ndarray:
        b = self.image_bucket
        max_h = max(im.shape[0] for im in images)
        max_w = max(im.shape[1] for im in images)
        bh = ((max_h + b - 1) // b) * b
        bw = ((max_w + b - 1) // b) * b
        out = np.zeros((len(images), bh, bw) + images[0].shape[2:],
                       images[0].dtype)
        for i, im in enumerate(images):
            out[i, : im.shape[0], : im.shape[1]] = im
        return out

    def _get_process_pool(self):
        if self._pool is None:
            import multiprocessing as mp

            ctx = mp.get_context("fork")
            self._pool = ctx.Pool(
                processes=self.num_workers,
                initializer=_process_worker_init,
                initargs=(
                    self.dataset, self.transforms, self.normalize,
                    self.mean, self.std, self.seed, self.decode_cache_mb,
                ),
            )
        return self._pool

    def __del__(self):
        pool = getattr(self, "_pool", None)
        if pool is not None:
            pool.terminate()

    def _epoch_indices(self) -> np.ndarray:
        idx = self._indices
        if self.is_train:
            rng = np.random.RandomState(self.seed + self.epoch)
            if self._frame_groups is not None:
                parts = []
                for g in rng.permutation(len(self._frame_groups)):
                    grp = self._frame_groups[g].copy()
                    rng.shuffle(grp)
                    parts.append(grp)
                return np.concatenate(parts)
            idx = idx.copy()
            rng.shuffle(idx)
        return idx

    def __iter__(self):
        indices = self._epoch_indices()
        self.epoch += 1
        if self.patch_grouped_batching and self.image_bucket:
            yield from self._iter_patch_grouped(indices)
            return
        n_batches = len(self)
        batch_indices = [
            indices[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(n_batches)
        ]

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()
        process_map = (
            self._get_process_pool().map
            if self.worker_mode == "process" and self.num_workers > 1
            else None
        )

        def producer():
            try:
                if process_map is not None:
                    for bidx in batch_indices:
                        if stop.is_set():
                            return
                        states = process_map(
                            _process_worker_run, [int(i) for i in bidx]
                        )
                        if not _put_until_stopped(out_q, stop,
                                                  self._collate(states)):
                            return
                else:
                    with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
                        for bidx in batch_indices:
                            if stop.is_set():
                                return
                            states = list(ex.map(self._process_one, bidx))
                            if not _put_until_stopped(out_q, stop,
                                                      self._collate(states)):
                                return
                _put_until_stopped(out_q, stop, None)
            except BaseException as e:  # surface worker errors to the consumer
                _put_until_stopped(out_q, stop, e)

        t = threading.Thread(target=producer, daemon=True,
                             name="loader-prefetch")
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    def _iter_patch_grouped(self, indices: np.ndarray):
        """Emit same-bucket-shape batches of variable-size source patches.

        Records are processed in shuffled order and accumulated per
        image_bucket-rounded (H, W); a bucket emits as soon as it holds a
        full batch, so every batch pads to exactly its bucket instead of the
        epoch-wide max. Held leftovers are bounded: past 8x batch_size the
        holder flushes size-SORTED mixed batches (neighbors in sorted order
        pad nearly as tightly as same-bucket peers). Epoch end flushes the
        tail the same way; a final partial batch obeys drop_remainder.
        The grouping adds no nondeterminism of its own: given the records'
        processed sizes, batch assembly is a pure function of arrival order
        (sizes still vary with augmentation draws, which with >1 worker
        interleave the shared RNG stream — same as the plain path). Every
        record is emitted exactly once per epoch (multiset-tested,
        tests/data/test_patch_grouped_batching.py).
        """
        b = self.image_bucket
        bs = self.batch_size
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()
        process_map = (
            self._get_process_pool().map
            if self.worker_mode == "process" and self.num_workers > 1
            else None
        )

        def bucket_key(state) -> tuple:
            h, w = np.asarray(state["image"]).shape[:2]
            return (-(-h // b) * b, -(-w // b) * b)

        def producer():
            try:
                buckets: Dict[tuple, list] = {}

                def emit(states) -> bool:
                    return _put_until_stopped(out_q, stop,
                                              self._collate(states))

                def flush_sorted(final: bool):
                    """Drain the holder as size-sorted batches; re-file the
                    sub-batch remainder unless this is the epoch-end flush.
                    Returns False if the consumer stopped."""
                    rest = sorted(
                        (s for v in buckets.values() for s in v),
                        key=lambda s: (s["image"].shape[0],
                                       s["image"].shape[1]))
                    buckets.clear()
                    while len(rest) >= bs:
                        if not emit(rest[:bs]):
                            return False
                        rest = rest[bs:]
                    if final:
                        if rest and not self.drop_remainder:
                            return emit(rest)
                        return True
                    for s in rest:
                        buckets.setdefault(bucket_key(s), []).append(s)
                    return True

                window = bs * 4
                chunks = [indices[i: i + window]
                          for i in range(0, len(indices), window)]
                with ThreadPoolExecutor(
                        max_workers=self.num_workers) as ex:
                    for chunk in chunks:
                        if stop.is_set():
                            return
                        if process_map is not None:
                            states = process_map(
                                _process_worker_run,
                                [int(i) for i in chunk])
                        else:
                            states = list(ex.map(self._process_one, chunk))
                        for s in states:
                            buckets.setdefault(bucket_key(s), []).append(s)
                        for k in list(buckets):
                            while len(buckets[k]) >= bs:
                                batch_states = buckets[k][:bs]
                                del buckets[k][:bs]
                                if not emit(batch_states):
                                    return
                        if sum(len(v) for v in buckets.values()) > bs * 8:
                            if not flush_sorted(final=False):
                                return
                    if any(buckets.values()):
                        if not flush_sorted(final=True):
                            return
                _put_until_stopped(out_q, stop, None)
            except BaseException as e:  # surface worker errors
                _put_until_stopped(out_q, stop, e)

        t = threading.Thread(target=producer, daemon=True,
                             name="loader-patch-grouped")
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


class DevicePrefetcher:
    """Overlap host->device transfer with device compute.

    Wraps a host-batch iterable: a daemon thread stays ``depth`` batches
    ahead, issuing the (optionally mesh-sharded) device transfer for batches
    N+1..N+depth while the consumer's step runs on batch N, so transfer time
    hides behind compute instead of serializing with it. This is the
    host->device half of what the reference gets from MindSpore's
    ``dataset_sink_mode=True`` epoch pipelining
    (reference tools/train.py:233); the host half is DataLoader's own
    bounded-queue prefetch.

    Yields lists of device arrays in ``columns`` order. JAX dispatch is
    thread-safe; the only ordering requirement is that the consumer sees
    batches in loader order, which the FIFO queue preserves.
    """

    def __init__(self, loader, columns: Sequence[str], mesh=None,
                 depth: int = 2, spec=None):
        self.loader = loader
        self.columns = list(columns)
        self.mesh = mesh
        self.depth = depth
        self.spec = spec  # batch PartitionSpec override (FSDP: both axes)

    def __len__(self) -> int:
        return len(self.loader)

    def __iter__(self):
        from mindpose_tpu.parallel import shard_batch  # lazy: avoids cycle

        out_q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        stop = threading.Event()

        def producer():
            try:
                for batch in self.loader:
                    if stop.is_set():
                        return
                    arrays = shard_batch(
                        [np.ascontiguousarray(batch[c]) for c in self.columns],
                        self.mesh,
                        spec=self.spec,
                    )
                    if not _put_until_stopped(out_q, stop, arrays):
                        return
                _put_until_stopped(out_q, stop, None)
            except BaseException as e:  # surface transfer/loader errors
                _put_until_stopped(out_q, stop, e)

        t = threading.Thread(target=producer, daemon=True,
                             name="device-prefetch")
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
