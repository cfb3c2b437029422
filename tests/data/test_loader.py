"""DataLoader tests: sharding, shuffling, batching, remainder handling."""
import numpy as np

from mindpose_tpu.data.loader import DataLoader


class _FakeDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"image_file": f"img_{i}", "idx": np.int32(i)}


def _loader(n=10, **kw):
    defaults = dict(
        transforms=[],
        final_columns=["idx"],
        batch_size=4,
        is_train=True,
        normalize=False,
        num_workers=2,
    )
    defaults.update(kw)
    return DataLoader(_FakeDataset(n), **defaults)


class _NoDecode(DataLoader):
    def _process_one(self, idx):
        state = self.dataset[int(idx)]
        for t in self.transforms:
            state = t(state)
        return state


def test_sharding_partitions_indices():
    seen = []
    for rank in range(4):
        l = _NoDecode(_FakeDataset(20), transforms=[], final_columns=["idx"],
                      batch_size=5, is_train=False, normalize=False,
                      device_num=4, rank_id=rank)
        assert l.num_samples == 5
        for b in l:
            seen.extend(b["idx"].tolist())
    assert sorted(seen) == list(range(20))


def test_drop_remainder_on_train():
    l = _NoDecode(_FakeDataset(10), transforms=[], final_columns=["idx"],
                  batch_size=4, is_train=True, normalize=False)
    assert len(l) == 2  # 10 // 4
    l2 = _NoDecode(_FakeDataset(10), transforms=[], final_columns=["idx"],
                   batch_size=4, is_train=False, normalize=False)
    assert len(l2) == 3  # ceil
    batches = list(l2)
    assert [len(b["idx"]) for b in batches] == [4, 4, 2]


def test_shuffle_differs_by_epoch_and_is_seeded():
    l = _NoDecode(_FakeDataset(32), transforms=[], final_columns=["idx"],
                  batch_size=32, is_train=True, normalize=False, seed=7)
    e1 = next(iter(l))["idx"].tolist()
    e2 = next(iter(l))["idx"].tolist()
    assert e1 != e2  # reshuffled per epoch
    l_again = _NoDecode(_FakeDataset(32), transforms=[], final_columns=["idx"],
                        batch_size=32, is_train=True, normalize=False, seed=7)
    assert next(iter(l_again))["idx"].tolist() == e1  # deterministic
    assert sorted(e1) == list(range(32))


def test_transform_errors_propagate():
    def boom(state):
        raise RuntimeError("bad transform")

    l = _NoDecode(_FakeDataset(4), transforms=[boom], final_columns=["idx"],
                  batch_size=2, is_train=False, normalize=False)
    import pytest

    with pytest.raises(RuntimeError, match="bad transform"):
        list(l)


def test_device_prefetcher_matches_direct_transfer():
    from mindpose_tpu.data.loader import DevicePrefetcher

    l = _NoDecode(_FakeDataset(12), transforms=[], final_columns=["idx"],
                  batch_size=4, is_train=False, normalize=False)
    direct = [np.asarray(b["idx"]) for b in l]
    fetched = [np.asarray(arrays[0])
               for arrays in DevicePrefetcher(l, ["idx"], mesh=None, depth=2)]
    assert len(fetched) == len(direct) == len(l)
    for a, b in zip(fetched, direct):
        np.testing.assert_array_equal(a, b)
    # re-iterable (one producer thread per epoch)
    again = [np.asarray(a[0])
             for a in DevicePrefetcher(l, ["idx"], mesh=None, depth=1)]
    assert [x.tolist() for x in again] == [x.tolist() for x in direct]


def test_device_prefetcher_mesh_sharded():
    """Prefetcher yields mesh-sharded arrays identical to direct shard_batch
    (8-device virtual CPU mesh from conftest)."""
    from mindpose_tpu.data.loader import DevicePrefetcher
    from mindpose_tpu.parallel import create_mesh, shard_batch

    mesh = create_mesh()
    l = _NoDecode(_FakeDataset(16), transforms=[], final_columns=["idx"],
                  batch_size=8, is_train=False, normalize=False)
    direct = [shard_batch([np.ascontiguousarray(b["idx"])], mesh)[0]
              for b in l]
    fetched = list(DevicePrefetcher(l, ["idx"], mesh=mesh, depth=2))
    assert len(fetched) == len(direct)
    for got, want in zip(fetched, direct):
        assert got[0].sharding.is_equivalent_to(want.sharding, want.ndim)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want))


def test_device_prefetcher_propagates_errors():
    from mindpose_tpu.data.loader import DevicePrefetcher

    def boom(state):
        raise RuntimeError("bad transform")

    l = _NoDecode(_FakeDataset(4), transforms=[boom], final_columns=["idx"],
                  batch_size=2, is_train=False, normalize=False)
    import pytest

    with pytest.raises(RuntimeError, match="bad transform"):
        list(DevicePrefetcher(l, ["idx"], mesh=None, depth=2))


def test_prefetch_producers_exit_on_early_abandon():
    """Breaking out of iteration mid-epoch must not strand producer threads
    blocked on a full queue (loader-prefetch and device-prefetch both)."""
    import threading
    import time

    from mindpose_tpu.data.loader import DevicePrefetcher

    def named_threads():
        return [t for t in threading.enumerate()
                if t.name in ("loader-prefetch", "device-prefetch")]

    l = _NoDecode(_FakeDataset(64), transforms=[], final_columns=["idx"],
                  batch_size=2, is_train=False, normalize=False)
    for it in (iter(l), iter(DevicePrefetcher(l, ["idx"], mesh=None,
                                              depth=1))):
        next(it)
        it.close()  # generator close -> finally -> stop.set()
        deadline = time.time() + 5.0
        while named_threads() and time.time() < deadline:
            time.sleep(0.05)
        assert not named_threads(), "producer thread stranded after abandon"
