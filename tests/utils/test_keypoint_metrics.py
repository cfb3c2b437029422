"""Hand-computed goldens for the distance keypoint metrics (PCK/AUC/EPE/NME)."""
import numpy as np

from mindpose_tpu.utils.keypoint_metrics import (
    keypoint_auc,
    keypoint_epe,
    keypoint_nme,
    keypoint_pck_accuracy,
    normalized_distances,
)


def test_normalized_distances_masks_and_norm():
    preds = np.array([[[3.0, 4.0], [10.0, 0.0]]])  # (1, 2, 2)
    gts = np.zeros((1, 2, 2))
    mask = np.array([[True, False]])
    norm = np.array([[1.0, 1.0]])
    d = normalized_distances(preds, gts, mask, norm)
    assert d.shape == (1, 2)
    assert d[0, 0] == 5.0  # 3-4-5 triangle
    assert d[0, 1] == -1.0  # masked out

    # per-axis normalization: dx/2, dy/4
    norm = np.array([[2.0, 4.0]])
    d = normalized_distances(preds, gts, np.ones((1, 2), bool), norm)
    np.testing.assert_allclose(d[0], [np.hypot(1.5, 1.0), 5.0])

    # non-positive norm excludes the whole instance
    d = normalized_distances(preds, gts, np.ones((1, 2), bool),
                             np.array([[0.0, 4.0]]))
    assert (d == -1).all()


def test_pck_accuracy_golden():
    # two instances, 2 joints; bbox norm 10x10; thr 0.2 -> radius 2 px
    preds = np.array(
        [[[0.0, 0.0], [5.0, 5.0]],
         [[1.0, 1.0], [9.0, 5.0]]]
    )
    gts = np.array(
        [[[1.0, 0.0], [5.0, 5.0]],
         [[1.0, 1.0], [5.0, 5.0]]]
    )
    mask = np.ones((2, 2), bool)
    norm = np.full((2, 2), 10.0)
    per_joint, avg, count = keypoint_pck_accuracy(preds, gts, mask, 0.2, norm)
    # distances/10: [[0.1, 0.0], [0.0, 0.4]] -> hits: j0 2/2, j1 1/2
    np.testing.assert_allclose(per_joint, [1.0, 0.5])
    assert avg == 0.75 and count == 4

    # joint never labeled -> per-joint slot is -1, excluded from avg
    mask[:, 1] = False
    per_joint, avg, count = keypoint_pck_accuracy(preds, gts, mask, 0.2, norm)
    assert per_joint[1] == -1.0 and avg == 1.0 and count == 2


def test_epe_and_nme():
    preds = np.array([[[3.0, 4.0], [0.0, 0.0]]])
    gts = np.zeros((1, 2, 2))
    mask = np.ones((1, 2), bool)
    assert keypoint_epe(preds, gts, mask) == 2.5  # mean(5, 0)
    norm = np.full((1, 2), 10.0)
    assert keypoint_nme(preds, gts, mask, norm) == 0.25
    # empty mask -> 0.0, no NaN
    assert keypoint_epe(preds, gts, np.zeros((1, 2), bool)) == 0.0


def test_auc_golden():
    # single joint at normalized distance 0.25 of norm_factor 20 (5 px off)
    preds = np.array([[[5.0, 0.0]]])
    gts = np.zeros((1, 1, 2))
    mask = np.ones((1, 1), bool)
    # thresholds 0, .025, ..., .475: hits where thr > .25 -> 9/20
    assert keypoint_auc(preds, gts, mask, norm_factor=20.0) == 9 / 20
    # perfect prediction: every threshold except 0 hits (dist < thr strict)
    assert keypoint_auc(gts, gts, mask, norm_factor=20.0) == 19 / 20
