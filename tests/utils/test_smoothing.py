"""One-Euro filter: jitter suppression, lag bound, reset semantics."""
import numpy as np

from mindpose_tpu.utils.smoothing import OneEuroFilter


def test_jitter_reduction_on_static_pose():
    """Still person + sensor noise: output variance must drop hard."""
    rng = np.random.RandomState(0)
    truth = np.array([[100.0, 50.0], [40.0, 80.0]])  # 2 joints
    f = OneEuroFilter(freq=30.0, min_cutoff=1.0, beta=0.007)
    raw, smooth = [], []
    for _ in range(300):
        x = truth + rng.randn(2, 2) * 3.0
        raw.append(x)
        smooth.append(f(x))
    raw = np.stack(raw)[50:]
    smooth = np.stack(smooth)[50:]
    assert smooth.var(axis=0).mean() < 0.25 * raw.var(axis=0).mean()
    # and it stays centered on the truth
    np.testing.assert_allclose(smooth.mean(axis=0), truth, atol=1.0)


def test_low_lag_on_fast_motion():
    """Fast linear motion: adaptive cutoff keeps lag small."""
    f = OneEuroFilter(freq=30.0, min_cutoff=1.0, beta=0.05)
    out = x = None
    for t in range(120):
        x = np.array([[10.0 * t, 0.0]])  # 300 px/s
        out = f(x)
    lag = abs(out[0, 0] - x[0, 0])
    assert lag < 25.0, lag  # < 2.5 frames of motion


def test_first_frame_passthrough_and_reset():
    f = OneEuroFilter(freq=30.0)
    x0 = np.array([[1.0, 2.0]])
    np.testing.assert_array_equal(f(x0), x0)
    f(np.array([[100.0, 200.0]]))  # state now moving
    f.reset()
    x1 = np.array([[5.0, 6.0]])
    np.testing.assert_array_equal(f(x1), x1)  # passthrough again


def test_shape_change_resets():
    """Instance count change (new/lost person) restarts the filter."""
    f = OneEuroFilter(freq=30.0)
    f(np.zeros((2, 17, 2)))
    x = np.ones((3, 17, 2)) * 7.0
    np.testing.assert_array_equal(f(x), x)  # passthrough, no crash


def test_dt_override():
    f = OneEuroFilter(freq=30.0, min_cutoff=1.0, beta=0.0)
    f(np.array([0.0]))
    # with beta=0 the cutoff is fixed: larger dt -> larger alpha -> closer
    # to the new sample
    a = f(np.array([10.0]), dt=1.0 / 30.0)
    f2 = OneEuroFilter(freq=30.0, min_cutoff=1.0, beta=0.0)
    f2(np.array([0.0]))
    b = f2(np.array([10.0]), dt=1.0)
    assert b[0] > a[0]
