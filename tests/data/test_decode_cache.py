"""Decoded-frame LRU cache: parity, eviction, and read-only safety."""
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from helpers import DATASET_SETTING, make_tiny_coco
from mindpose_tpu.data import create_dataset, create_pipeline
from mindpose_tpu.data.loader import DecodedFrameCache


# deterministic transforms: random augmentation draws from the process-global
# RNG stream, so two loaders in one process can't be draw-order paired
TRANSFORMS = [
    "topdown_box_to_center_scale",
    "topdown_affine",
    {"topdown_generate_target": {"sigma": 2.0}},
]


def _epoch_batches(loader):
    return [{k: np.asarray(v) for k, v in b.items() if k != "image_file"}
            for b in loader]


def _make_loader(img_root, ann, num_workers=2, **kwargs):
    ds = create_dataset(img_root, ann, dataset_format="coco_topdown",
                        is_train=True, config=DATASET_SETTING)
    return create_pipeline(ds, TRANSFORMS, method="topdown", batch_size=4,
                           is_train=True, config=DATASET_SETTING, seed=7,
                           num_workers=num_workers, **kwargs)


def test_cached_epochs_bit_match_uncached(tmp_path):
    img_root, ann = make_tiny_coco(str(tmp_path), num_images=4,
                                   people_per_img=3)
    plain = _make_loader(img_root, ann, num_workers=1)
    cached = _make_loader(img_root, ann, num_workers=1, decode_cache_mb=256)
    for epoch in range(2):  # epoch 2 is served from cache
        # transforms draw center/scale jitter from the global RNG stream;
        # pin it so both loaders see identical draws in identical order
        np.random.seed(123)
        a_batches = _epoch_batches(plain)
        np.random.seed(123)
        b_batches = _epoch_batches(cached)
        for a, b in zip(a_batches, b_batches):
            assert a.keys() == b.keys()
            for k in a:
                np.testing.assert_array_equal(a[k], b[k]), k
    cache = cached.decode_cache
    assert cache.hits > 0, "second epoch should hit the cache"


def test_cache_hit_rate_with_shared_frames(tmp_path):
    """N people on one frame -> first epoch already hits (N-1)/N."""
    img_root, ann = make_tiny_coco(str(tmp_path), num_images=2,
                                   people_per_img=4)
    loader = _make_loader(img_root, ann, num_workers=1, decode_cache_mb=256)
    _ = _epoch_batches(loader)
    cache = loader.decode_cache
    n_records = len(loader) * loader.batch_size
    assert cache.misses == 2  # one decode per unique frame
    assert cache.hits == n_records - 2  # every other record reuses a frame
    assert cache.hits > 0


def test_lru_eviction_respects_budget():
    cache = DecodedFrameCache(budget_mb=1)
    a = np.zeros((512, 512, 3), np.uint8)  # 0.75 MB
    b = np.zeros((400, 400, 3), np.uint8)  # 0.46 MB
    cache.put("a", a.copy())
    cache.put("b", b.copy())  # evicts a
    assert cache.get("a") is None
    assert cache.get("b") is not None
    # a frame larger than the whole budget is returned but never stored
    big = cache.put("big", np.zeros((1024, 1024, 3), np.uint8))
    assert cache.get("big") is None
    assert big.flags.writeable is False


def test_cached_frames_are_readonly(tmp_path):
    img_root, ann = make_tiny_coco(str(tmp_path), num_images=1,
                                   people_per_img=1)
    cache = DecodedFrameCache(budget_mb=64)
    from mindpose_tpu.data.loader import _decode_image

    state = _decode_image({"image_file": f"{img_root}/000000000001.jpg"},
                          cache)
    with pytest.raises(ValueError):
        state["image"][0, 0, 0] = 255


def test_get_or_decode_coalesces_concurrent_decodes():
    """N threads touching the same frame -> exactly one decode."""
    import threading
    import time

    from mindpose_tpu.data.loader import DecodedFrameCache

    cache = DecodedFrameCache(64)
    calls = []
    lock = threading.Lock()

    def slow_decode():
        with lock:
            calls.append(1)
        time.sleep(0.05)
        return np.zeros((8, 8, 3), np.uint8)

    results = [None] * 8

    def worker(i):
        results[i] = cache.get_or_decode("/img/frame.jpg", slow_decode)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(calls) == 1, f"expected 1 decode, got {len(calls)}"
    for r in results:
        assert r is not None and r.shape == (8, 8, 3)


def test_get_or_decode_waiters_survive_decoder_failure():
    import threading

    from mindpose_tpu.data.loader import DecodedFrameCache

    cache = DecodedFrameCache(64)
    attempts = []

    def decode():
        attempts.append(1)
        if len(attempts) == 1:
            raise OSError("truncated jpeg")
        return np.ones((4, 4, 3), np.uint8)

    import pytest

    with pytest.raises(OSError):
        cache.get_or_decode("/img/bad.jpg", decode)
    # the in-flight slot was cleaned up; a retry decodes fresh
    out = cache.get_or_decode("/img/bad.jpg", decode)
    assert out.shape == (4, 4, 3)
