"""Checkpoint utils: pretrained-backbone loading via path and file:// URL.

Covers the reference's URL-or-path pretrained flow
(models/backbones/utils.py:10-42) and the non-strict merge semantics
(shape-matched backbone tensors only, params + batch_stats).
"""
import numpy as np
import pytest

from mindpose_tpu.utils.checkpoint import (
    load_pretrained_backbone,
    save_checkpoint,
)


def _variables(fill: float):
    return {
        "params": {
            "backbone": {
                "conv": {"kernel": np.full((3, 3, 3, 8), fill, np.float32)},
                "bn": {"scale": np.full((8,), fill, np.float32)},
            },
            "head": {"final": {"kernel": np.full((1, 1, 8, 17), fill, np.float32)}},
        },
        "batch_stats": {
            "backbone": {"bn": {"mean": np.full((8,), fill, np.float32)}},
            "head": {},
        },
    }


@pytest.fixture
def ckpt_path(tmp_path):
    path = str(tmp_path / "pretrained.msgpack")
    save_checkpoint(path, _variables(7.0))
    return path


def _check_merged(out):
    # backbone params + stats come from the checkpoint ...
    assert (out["params"]["backbone"]["conv"]["kernel"] == 7.0).all()
    assert (out["params"]["backbone"]["bn"]["scale"] == 7.0).all()
    assert (out["batch_stats"]["backbone"]["bn"]["mean"] == 7.0).all()
    # ... while the head stays untouched
    assert (out["params"]["head"]["final"]["kernel"] == 0.0).all()


def test_load_pretrained_backbone_local_path(ckpt_path):
    out = load_pretrained_backbone(ckpt_path, _variables(0.0))
    _check_merged(out)


def test_load_pretrained_backbone_file_url(ckpt_path):
    out = load_pretrained_backbone("file://" + ckpt_path, _variables(0.0))
    _check_merged(out)


def test_load_pretrained_backbone_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_pretrained_backbone(str(tmp_path / "nope.msgpack"), _variables(0.0))


def test_load_pretrained_backbone_shape_mismatch_skipped(tmp_path, caplog):
    src = _variables(7.0)
    src["params"]["backbone"]["conv"]["kernel"] = np.full(
        (5, 5, 3, 8), 7.0, np.float32
    )  # wrong shape -> must be skipped
    path = str(tmp_path / "mismatch.msgpack")
    save_checkpoint(path, src)

    out = load_pretrained_backbone(path, _variables(0.0))
    assert (out["params"]["backbone"]["conv"]["kernel"] == 0.0).all()
    assert (out["params"]["backbone"]["bn"]["scale"] == 7.0).all()


def test_async_save_matches_sync(tmp_path):
    import numpy as np

    from mindpose_tpu.utils.checkpoint import (
        load_checkpoint,
        save_checkpoint,
        wait_pending_checkpoints,
    )

    state = {"params": {"w": np.arange(12.0).reshape(3, 4)},
             "step": np.int32(7)}
    sync_path = str(tmp_path / "sync.ckpt")
    async_path = str(tmp_path / "async.ckpt")
    save_checkpoint(sync_path, state)
    save_checkpoint(async_path, state, async_write=True)
    wait_pending_checkpoints()
    target = {"params": {"w": np.zeros((3, 4))}, "step": np.int32(0)}
    a = load_checkpoint(async_path, target)
    b = load_checkpoint(sync_path, target)
    np.testing.assert_array_equal(a["params"]["w"], b["params"]["w"])
    assert int(a["step"]) == 7


def test_async_saves_to_same_path_keep_order(tmp_path):
    import numpy as np

    from mindpose_tpu.utils.checkpoint import (
        load_checkpoint,
        save_checkpoint,
        wait_pending_checkpoints,
    )

    path = str(tmp_path / "seq.ckpt")
    for step in range(5):
        save_checkpoint(path, {"step": np.int32(step)}, async_write=True)
    wait_pending_checkpoints()
    out = load_checkpoint(path, {"step": np.int32(-1)})
    assert int(out["step"]) == 4
