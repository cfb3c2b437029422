"""Decoder correctness tests: argmax recovery, subpixel shift direction,
coordinate transforms, bottom-up top-K + tag gather."""
import jax
import jax.numpy as jnp
import numpy as np

from mindpose_tpu.models.decoders import (
    BottomUpHeatMapAEDecoder,
    TopDownHeatMapDecoder,
)


def _peaked_heatmap(n, h, w, k, peaks):
    """Heatmap with gaussian peaks at given (x, y) per (n, k)."""
    hm = np.zeros((n, h, w, k), np.float32)
    ys, xs = np.mgrid[0:h, 0:w]
    for ni in range(n):
        for ki in range(k):
            px, py = peaks[ni][ki]
            hm[ni, :, :, ki] = np.exp(-((xs - px) ** 2 + (ys - py) ** 2) / 4.0)
    return hm


def test_topdown_decoder_argmax_identity():
    peaks = [[(10, 20), (30, 5)], [(0, 0), (47, 63)]]
    hm = _peaked_heatmap(2, 64, 48, 2, peaks)
    # to_original=False requires identity transform: set scale so that
    # scale*200 == heatmap size and center at the middle
    dec = TopDownHeatMapDecoder(to_original=False)
    preds, boxes = dec(
        jnp.asarray(hm), jnp.zeros((2, 2)), jnp.ones((2, 2)), jnp.ones(2)
    )
    got = np.asarray(preds)[..., :2]
    np.testing.assert_allclose(got, np.array(peaks, np.float32), atol=1e-5)
    np.testing.assert_allclose(np.asarray(preds)[..., 2], 1.0, atol=1e-5)
    assert boxes.shape == (2, 6)


def test_topdown_decoder_shift_direction():
    hm = np.zeros((1, 8, 8, 1), np.float32)
    hm[0, 4, 4, 0] = 1.0
    hm[0, 4, 5, 0] = 0.5  # gradient to the right
    hm[0, 3, 4, 0] = 0.2  # gradient upward (smaller y)
    dec = TopDownHeatMapDecoder(to_original=False, shift_coordinate=True)
    preds, _ = dec(jnp.asarray(hm), jnp.zeros((1, 2)), jnp.ones((1, 2)), jnp.ones(1))
    x, y = np.asarray(preds)[0, 0, :2]
    assert x == 4.25  # toward larger right neighbour
    assert y == 3.75  # toward larger upper neighbour


def test_topdown_decoder_transform_to_original():
    hm = np.zeros((1, 64, 48, 1), np.float32)
    hm[0, 32, 24, 0] = 1.0
    center = jnp.array([[100.0, 200.0]])
    scale = jnp.array([[1.0, 1.0]])  # box 200x200 px
    dec = TopDownHeatMapDecoder()
    preds, boxes = dec(jnp.asarray(hm), center, scale, jnp.ones(1))
    x, y = np.asarray(preds)[0, 0, :2]
    # x = 24 * (200/48) + 100 - 100 = 100; y = 32 * (200/64) + 200 - 100 = 200
    np.testing.assert_allclose([x, y], [100.0, 200.0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(boxes)[0, 4], 200.0 * 200.0, rtol=1e-6)


def test_topdown_decoder_udp_scaling():
    hm = np.zeros((1, 64, 48, 1), np.float32)
    hm[0, 63, 47, 0] = 1.0  # bottom-right corner
    center = jnp.array([[50.0, 50.0]])
    scale = jnp.array([[0.5, 0.5]])  # 100x100 box
    dec = TopDownHeatMapDecoder(use_udp=True)
    preds, _ = dec(jnp.asarray(hm), center, scale, jnp.ones(1))
    x, y = np.asarray(preds)[0, 0, :2]
    # UDP: corner maps exactly to box corner: 47*(100/47)+50-50 = 100
    np.testing.assert_allclose([x, y], [100.0, 100.0], atol=1e-4)


def test_bottomup_decoder_topk_and_tags():
    h = w = 16
    k = 2
    hm = np.random.rand(1, h, w, 2 * k).astype(np.float32) * 0.1
    # strongest peak for joint 0 at (3, 7) with tag 2.5
    hm[0, 7, 3, 0] = 1.0
    hm[0, 7, 3, k + 0] = 2.5
    dec = BottomUpHeatMapAEDecoder(
        num_joints=k, num_stages=1, with_ae_loss=(True,), max_num=5
    )
    mask = jnp.ones((1, h, w))
    val_k, tag_k, ind_k, hm_raw, thm = dec([jnp.asarray(hm)], mask)
    assert val_k.shape == (1, k, 5)
    assert tag_k.shape == (1, k, 5, 1)
    assert ind_k.shape == (1, k, 5, 2)
    np.testing.assert_allclose(np.asarray(val_k)[0, 0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ind_k)[0, 0, 0], [3.0, 7.0])
    np.testing.assert_allclose(np.asarray(tag_k)[0, 0, 0, 0], 2.5, atol=1e-6)


def test_bottomup_decoder_mask_and_nms():
    h = w = 16
    hm = np.zeros((1, h, w, 2), np.float32)
    hm[0, 5, 5, 0] = 1.0
    hm[0, 5, 6, 0] = 0.9  # suppressed by 3x3 NMS
    hm[0, 12, 12, 0] = 0.8
    mask = np.ones((1, h, w), np.float32)
    mask[0, 12, 12] = 0  # masked out
    dec = BottomUpHeatMapAEDecoder(
        num_joints=1, num_stages=1, with_ae_loss=(True,), use_nms=True,
        nms_kernel=3, max_num=3,
    )
    val_k, tag_k, ind_k, *_ = dec([jnp.asarray(hm)], jnp.asarray(mask))
    vals = np.asarray(val_k)[0, 0]
    assert vals[0] == 1.0
    # second candidate: 0.9 at (6,5) is NMS-suppressed; (12,12) is masked
    assert vals[1] == 0.0
