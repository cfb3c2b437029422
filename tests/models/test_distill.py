"""Knowledge distillation: loss semantics + teacher-in-the-step training."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "tests")

import mindpose_tpu as mp
from mindpose_tpu.models.distill import build_teacher_preprocess
from mindpose_tpu.models.loss.distill import JointsMSEDistillLoss
from mindpose_tpu.optim import create_optimizer
from mindpose_tpu.parallel import build_train_step, create_train_state

# registers tiny_test_backbone
from tests.engine.test_train_eval_e2e import TINY_SETTING  # noqa: F401


def test_loss_components_and_alpha():
    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.rand(2, 8, 8, 3))
    target = jnp.asarray(rng.rand(2, 8, 8, 3))
    teacher = jnp.asarray(rng.rand(2, 8, 8, 3))
    weight = jnp.ones((2, 3))

    loss = JointsMSEDistillLoss(use_target_weight=True, alpha=0.5)
    out = loss(pred, target, weight, teacher)
    assert out.shape == (2,)
    np.testing.assert_allclose(
        out[0], jnp.mean(jnp.square(pred - target)), rtol=1e-6)
    np.testing.assert_allclose(
        out[1], 0.5 * jnp.mean(jnp.square(pred - teacher)), rtol=1e-6)

    # alpha scales only the distill term
    out2 = JointsMSEDistillLoss(alpha=1.0)(pred, target, weight, teacher)
    np.testing.assert_allclose(out2[0], out[0], rtol=1e-6)
    np.testing.assert_allclose(out2[1], 2.0 * out[1], rtol=1e-6)

    # masked joints contribute to neither term
    w0 = weight.at[:, 0].set(0.0)
    masked = JointsMSEDistillLoss(alpha=0.5)(pred, target, w0, teacher)
    assert masked[0] < out[0] and masked[1] < out[1]


def test_no_gradient_through_teacher():
    """d(loss)/d(teacher_pred) must be exactly zero (stop_gradient)."""
    pred = jnp.ones((1, 4, 4, 2)) * 0.3
    target = jnp.zeros((1, 4, 4, 2))
    weight = jnp.ones((1, 2))
    loss = JointsMSEDistillLoss(alpha=1.0)

    g = jax.grad(
        lambda t: jnp.sum(loss(pred, target, weight, t))
    )(jnp.ones((1, 4, 4, 2)))
    assert float(jnp.abs(g).max()) == 0.0


def test_distillation_pulls_student_toward_teacher():
    """Training with a frozen teacher drives both loss components down and
    the student's output toward the teacher's."""
    teacher_net = mp.create_network("tiny_test_backbone", "hrnet_head")
    t_vars = teacher_net.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)), train=False)
    # give the teacher a macroscopically distinct output (fresh nets both
    # emit ~0 from the small final-conv init); params only — batch_stats
    # variance must stay positive
    t_vars = dict(t_vars)
    t_vars["params"] = jax.tree.map(
        lambda x: x + 0.05 * jax.random.normal(
            jax.random.PRNGKey(7), x.shape, x.dtype),
        t_vars["params"])

    student = mp.create_network("tiny_test_backbone", "hrnet_head")
    s_vars = student.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 3)), train=False)

    loss = mp.create_loss("joint_mse_distill", use_target_weight=True,
                          alpha=1.0)
    nwl = mp.create_network_with_loss(student, loss, has_extra_inputs=True)
    tx = create_optimizer(s_vars["params"], "adam", learning_rate=3e-3)
    state = create_train_state(s_vars, tx)

    preprocess = build_teacher_preprocess(teacher_net, t_vars)
    step_fn = build_train_step(nwl, tx, mesh=None, donate=False,
                               preprocess=preprocess)

    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(4, 64, 64, 3), jnp.float32)
    # consistent objectives: the Gaussian targets agree with the teacher
    # (as they do when the teacher is accurate), so both terms must fall
    target = teacher_net.apply(t_vars, image, train=False)
    weight = jnp.ones((4, 17), jnp.float32)

    gap0 = float(jnp.mean(jnp.square(
        student.apply(s_vars, image, train=False)
        - teacher_net.apply(t_vars, image, train=False))))

    first = last = None
    for i in range(60):
        state, loss_vec = step_fn(state, image, target, weight)
        if i == 0:
            first = np.asarray(loss_vec)
        last = np.asarray(loss_vec)
    assert last.shape == (2,)
    assert last.sum() < first.sum(), (first, last)  # objective decreases

    # the student's raw output moved toward the (frozen) teacher's
    s_out = student.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        image, train=False)
    t_out = teacher_net.apply(t_vars, image, train=False)
    gap = float(jnp.mean(jnp.square(s_out - t_out)))
    assert gap < gap0 * 0.5, (gap0, gap)
