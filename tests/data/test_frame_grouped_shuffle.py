"""Frame-grouped shuffling: same-frame records stay adjacent per epoch.

With the decoded-frame LRU this makes the decode hit rate
(records/frame - 1)/records/frame on datasets far larger than any cache
budget (measured in docs/performance.md). Semantics checked here: exact
coverage, within-epoch adjacency, epoch-to-epoch reordering, and rank
sharding compatibility.
"""
import numpy as np

from mindpose_tpu.data.loader import DataLoader


class _FakeDataset:
    """Minimal RecordDataset stand-in: 6 frames x 4 records."""

    def __init__(self, frames=6, per=4):
        self._dataset = [
            {"image_file": f"/img/{f:03d}.jpg", "rec": f * per + r}
            for f in range(frames)
            for r in range(per)
        ]

    def __len__(self):
        return len(self._dataset)

    def __getitem__(self, i):
        return dict(self._dataset[i])


def _loader(**kw):
    return DataLoader(
        dataset=_FakeDataset(),
        transforms=[],
        final_columns=["rec"],
        batch_size=4,
        is_train=True,
        normalize=False,
        frame_grouped_shuffle=True,
        **kw,
    )


def test_epoch_indices_cover_every_record_once():
    loader = _loader()
    idx = loader._epoch_indices()
    assert sorted(idx.tolist()) == list(range(24))


def test_same_frame_records_adjacent():
    loader = _loader()
    ds = loader.dataset
    for epoch in range(3):
        idx = loader._epoch_indices()
        loader.epoch += 1
        files = [ds._dataset[i]["image_file"] for i in idx]
        # each frame's 4 records must form one contiguous run
        runs = [f for j, f in enumerate(files) if j == 0 or f != files[j - 1]]
        assert len(runs) == 6, runs


def test_epochs_reorder():
    loader = _loader()
    a = loader._epoch_indices()
    loader.epoch += 1
    b = loader._epoch_indices()
    assert not np.array_equal(a, b)


def test_rank_sharding_composes():
    # each rank groups only its own slice; union over ranks covers the set
    seen = []
    for rank in range(2):
        loader = _loader(device_num=2, rank_id=rank)
        idx = loader._epoch_indices()
        assert sorted(idx.tolist()) == sorted(loader._indices.tolist())
        seen += idx.tolist()
    assert sorted(seen) == list(range(24))


def test_iteration_yields_batches(tmp_path):
    import cv2

    ds = _FakeDataset()
    for rec in ds._dataset:
        path = str(tmp_path / rec["image_file"].rsplit("/", 1)[1])
        if not (tmp_path / rec["image_file"].rsplit("/", 1)[1]).exists():
            cv2.imwrite(path, np.zeros((8, 8, 3), np.uint8))
        rec["image_file"] = path

    loader = DataLoader(
        dataset=ds, transforms=[], final_columns=["rec"], batch_size=4,
        is_train=True, normalize=False, frame_grouped_shuffle=True,
        decode_cache_mb=64, num_workers=1,  # sequential: exact hit counts
    )
    batches = list(loader)
    assert len(batches) == 6
    recs = np.concatenate([b["rec"] for b in batches])
    assert sorted(recs.tolist()) == list(range(24))
    # 6 frames decoded once each; the other 18 records hit the cache
    assert loader.decode_cache.misses == 6
    assert loader.decode_cache.hits == 18
