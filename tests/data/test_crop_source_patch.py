"""crop_source_patch: ship only the warp's source AABB, not whole frames.

The full device pipeline's host->device payload was whole zero-padded
frames; TopDownAffineMatrix now crops each frame to the axis-aligned
preimage of the output rectangle (plus bilinear margin) and rebases the
matrix to patch coordinates. Equivalence requirement: the device warp of
(patch, rebased matrix) equals the warp of (frame, original matrix) —
rotation, flip, scale and out-of-frame boxes included — because every
source pixel the output samples lies inside the patch, and out-of-frame
stays zero in both. Exact in exact arithmetic; in float32 the rebased
translation changes summation order, jittering sample coordinates by
~1 ulp, which bilinear interpolation amplifies to <~0.01 on the 0-255
intensity scale (observed max 0.004).
"""
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "tests")

from helpers import make_tiny_coco
from mindpose_tpu.data import create_dataset, create_pipeline
from mindpose_tpu.data.device_pipeline import (
    DEVICE_FULL_FINAL_COLUMNS,
    to_matrix_transforms,
)
from mindpose_tpu.data.transform.topdown_transform import TopDownAffineMatrix
from mindpose_tpu.data.transform.utils import get_affine_transform
from mindpose_tpu.ops.image import affine_warp

from tests.engine.test_train_eval_e2e import TINY_SETTING  # noqa: F401

# JAX-compile-heavy: runs only in the full tier (pytest -m "" / no -m filter); the
# fast gate is `pytest -m "not slow"` — see README "Running the tests"
pytestmark = pytest.mark.slow



def _warp(image, mat, out_hw):
    return np.asarray(
        affine_warp(jnp.asarray(image[None]), jnp.asarray(mat[None],
                    jnp.float32), out_hw)
    )[0]


def test_patch_warp_equals_frame_warp_fuzz():
    """Random center/scale/rotation (incl. boxes hanging off the frame):
    warp(patch, rebased) == warp(frame, original) exactly."""
    rng = np.random.RandomState(7)
    ow, oh = 96, 128
    tf = TopDownAffineMatrix(
        is_train=False,
        config={**TINY_SETTING, "image_size": np.array([ow, oh])},
    )
    for case in range(40):
        h = int(rng.randint(100, 400))
        w = int(rng.randint(100, 400))
        frame = rng.randint(0, 255, size=(h, w, 3)).astype(np.uint8)
        center = np.array([rng.uniform(-20, w + 20),
                           rng.uniform(-20, h + 20)], np.float32)
        scale = np.array([rng.uniform(0.3, 2.0),
                          rng.uniform(0.4, 2.7)], np.float32)
        rot = float(rng.uniform(-60, 60)) if case % 2 else 0.0
        trans = get_affine_transform(center, scale, rot, np.array([ow, oh]),
                                     pixel_std=200.0)
        want = _warp(frame, np.asarray(trans, np.float32), (oh, ow))

        patch, trans2 = tf._crop_to_patch(frame, trans)
        got = _warp(patch, np.asarray(trans2, np.float32), (oh, ow))

        assert patch.shape[0] <= h and patch.shape[1] <= w
        # atol: f32 coordinate rounding from the rebased translation (see
        # module docstring), not a geometry error — keypoint/AP effect is nil
        np.testing.assert_allclose(got, want, atol=2e-2,
                                   err_msg=f"case {case} rot={rot:.1f}")


def test_crop_source_patch_reduces_loader_bytes():
    """Through the real loader: full-mode batches ship patches (bucketed),
    not frames, and parity of geometry metadata is preserved."""
    import tempfile

    root = tempfile.mkdtemp()
    # realistic-COCO geometry (boxes a small fraction of the frame): the
    # default tiny fixture's 100x180 boxes in 240x320 frames leave little to
    # crop, which is not what the feature targets
    img_root, ann = make_tiny_coco(root, num_images=4, people_per_img=2,
                                   frame_hw=(480, 640), box_wh=(120, 180))
    transforms = to_matrix_transforms(
        ["topdown_box_to_center_scale", "topdown_affine"])
    ds = create_dataset(img_root, ann, dataset_format="coco_topdown",
                        is_train=False, config=TINY_SETTING,
                        use_gt_bbox_for_val=True)

    def batch_bytes(crop):
        tfs = [
            {"topdown_affine_matrix": {"crop_source_patch": crop}}
            if (not isinstance(t, str) and "topdown_affine_matrix" in t)
            else t
            for t in transforms
        ]
        loader = create_pipeline(
            ds, tfs, method="topdown", batch_size=8, is_train=False,
            normalize=False, config=TINY_SETTING,
            final_columns=DEVICE_FULL_FINAL_COLUMNS, image_bucket=64,
        )
        batch = next(iter(loader))
        return batch, batch["image"].nbytes

    full_batch, full_bytes = batch_bytes(False)
    patch_batch, patch_bytes = batch_bytes(True)

    # fixture: 480x640 frames, 120x180 boxes -> source patches (box *
    # aspect-fix * 1.25 padding + margin, bucketed) are a small fraction
    # of the bucketed frames
    assert patch_bytes < 0.5 * full_bytes, (patch_bytes, full_bytes)
    assert patch_batch["image"].dtype == np.uint8
    np.testing.assert_allclose(patch_batch["keypoints"],
                               full_batch["keypoints"], atol=1e-4)

    # and the warped crops are identical between the two payloads
    oh, ow = (int(TINY_SETTING["image_size"][1]),
              int(TINY_SETTING["image_size"][0]))
    got = np.asarray(affine_warp(jnp.asarray(patch_batch["image"]),
                                 jnp.asarray(patch_batch["warp_mat"]),
                                 (oh, ow)))
    want = np.asarray(affine_warp(jnp.asarray(full_batch["image"]),
                                  jnp.asarray(full_batch["warp_mat"]),
                                  (oh, ow)))
    np.testing.assert_allclose(got, want, atol=2e-2)
