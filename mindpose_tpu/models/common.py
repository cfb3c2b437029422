"""Shared building blocks for model definitions.

All models are NHWC (TPU-native conv layout) with a configurable compute
``dtype`` (bf16 by default under AMP) and float32 parameters. BatchNorm
statistics are always accumulated in float32 (flax upcasts internally).
"""
from functools import partial
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

Dtype = Any

# He-normal is the conventional init for conv+relu stacks.
conv_kernel_init = nn.initializers.he_normal()

# Final heatmap-regression convs start near zero so initial predictions sit
# at the heatmap background (MindSpore's Conv2d default is a small truncated
# normal; large inits waste early training undoing noise).
final_kernel_init = nn.initializers.truncated_normal(stddev=0.001)


def conv3x3(
    features: int, stride: int = 1, dtype: Dtype = jnp.float32, name: Optional[str] = None
) -> nn.Conv:
    return nn.Conv(
        features,
        (3, 3),
        strides=(stride, stride),
        padding=((1, 1), (1, 1)),
        use_bias=False,
        dtype=dtype,
        kernel_init=conv_kernel_init,
        name=name,
    )


def conv1x1(
    features: int, stride: int = 1, dtype: Dtype = jnp.float32, name: Optional[str] = None
) -> nn.Conv:
    return nn.Conv(
        features,
        (1, 1),
        strides=(stride, stride),
        use_bias=False,
        dtype=dtype,
        kernel_init=conv_kernel_init,
        name=name,
    )


def batch_norm(
    train: bool,
    dtype: Dtype = jnp.float32,
    name: Optional[str] = None,
    stats_frac: float = 1.0,
    grad_stats: str = "exact",
):
    if grad_stats not in ("exact", "fused", "frozen", "frozen_var"):
        raise ValueError(
            "grad_stats must be 'exact', 'fused', 'frozen_var' or 'frozen', "
            f"got {grad_stats!r}"
        )
    if grad_stats == "fused":
        return FusedBatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=dtype,
            name=name,
        )
    # momentum 0.9 mirrors the reference's BatchNorm2d default
    # (running = 0.9 * running + 0.1 * batch).
    if stats_frac >= 1.0 and grad_stats == "exact":
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=dtype,
            name=name,
        )
    return SubsampledBatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        stats_frac=stats_frac,
        grad_stats=grad_stats,
        name=name,
    )


def _bn_variables(module: nn.Module, c: int):
    """Create the nn.BatchNorm-compatible param/stat variables."""
    scale = module.param("scale", nn.initializers.ones, (c,), jnp.float32)
    bias = module.param("bias", nn.initializers.zeros, (c,), jnp.float32)
    ra_mean = module.variable(
        "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
    )
    ra_var = module.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
    return scale, bias, ra_mean, ra_var


def _bn_train_stats(module: nn.Module, xs: jnp.ndarray, ra_mean, ra_var):
    """Train-mode batch moments over ``xs`` [N, c] (f32), with the running-
    stat EMA update and the module's ``grad_stats`` freezing policy applied.
    Shared by SubsampledBatchNorm and the s2d stem's ParityGroupBatchNorm."""

    mean = jnp.mean(xs, axis=0)
    var = jnp.mean(jnp.square(xs), axis=0) - jnp.square(mean)
    if not module.is_initializing():
        m = module.momentum
        ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
        ra_var.value = m * ra_var.value + (1.0 - m) * var
    if module.grad_stats in ("frozen", "frozen_var"):
        var = lax.stop_gradient(var)
    if module.grad_stats == "frozen":
        mean = lax.stop_gradient(mean)
    return mean, var


class SubsampledBatchNorm(nn.Module):
    """BatchNorm with TPU throughput knobs: subsampled stats, frozen-grad stats.

    Two documented TPU-first deviations (docs/divergences.md), both
    checkpoint-compatible with nn.BatchNorm (params: scale/bias,
    batch_stats: mean/var; auto-name "BatchNorm_i"):

    - ``stats_frac < 1``: train-mode mean/var from a leading batch slice —
      cuts one of BN's three HBM passes to a fraction while remaining an
      unbiased estimator (at batch 128 x 64x48 spatial, a 1/4 slice is still
      ~98K samples per channel). Measured slower in-context on TPU (breaks
      XLA's conv-epilogue fusion) — off by default.
    - ``grad_stats``: ``stop_gradient`` on the batch statistics. The forward
      matches exact BN up to float reassociation (different reduction/affine
      ordering than flax's nn.BatchNorm; parity asserted at 2e-5 in
      tests/models/test_frozen_bn.py) — only the backward changes
      semantically. ``"frozen_var"`` drops the dvar correction (one fewer
      full-tensor reduction per BN layer, keeps the stabilizing
      mean-centering term); ``"frozen"`` drops both dmean and dvar (fastest,
      measured -10.6 ms on the HRNet-W32 batch-128 train step). **Both
      measured to slowly diverge on the synthetic benchmark** (with or
      without the optimizer-side radial projection), so neither is safe as
      a default; they remain as measured experiment knobs. See
      docs/performance.md for the full stability record.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    stats_frac: float = 0.25
    # "exact" | "frozen_var" (stop-grad var only) | "frozen" (stop-grad both)
    grad_stats: str = "exact"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale, bias, ra_mean, ra_var = _bn_variables(self, c)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            n = max(1, int(round(x.shape[0] * self.stats_frac)))
            xs = x[:n].astype(jnp.float32).reshape(-1, c)
            mean, var = _bn_train_stats(self, xs, ra_mean, ra_var)
        inv = lax.rsqrt(var + self.epsilon) * scale
        mul = inv.astype(self.dtype)
        add = (bias - mean * inv).astype(self.dtype)
        return x * mul + add


# flax auto-names unnamed submodules "<cls.__name__>_<i>"; adopting
# nn.BatchNorm's name keeps param/stat paths (BatchNorm_i) identical, so
# checkpoints interchange between exact-BN and subsampled-BN models.
SubsampledBatchNorm.__name__ = "BatchNorm"
SubsampledBatchNorm.__qualname__ = "BatchNorm"


def _bn_train_apply(x, scale, bias, eps):
    """Exact train-mode BN forward; returns y and the backward residuals.

    Stats in f32 (E[x^2]-E[x]^2, matching flax's _compute_stats), normalize
    as a single fused multiply-add in the compute dtype.
    """
    c = x.shape[-1]
    xf = x.astype(jnp.float32).reshape(-1, c)
    mean = jnp.mean(xf, axis=0)
    var = jnp.mean(jnp.square(xf), axis=0) - jnp.square(mean)
    inv = lax.rsqrt(var + eps)
    mul = (inv * scale).astype(x.dtype)
    add = (bias - mean * inv * scale).astype(x.dtype)
    return x * mul + add, mean, var, inv


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_train_fused(x, scale, bias, eps):
    """Train-mode BN with a hand-written minimal backward.

    Primal outputs (y, mean, var): mean/var feed the running-stat EMA (a
    side-effect path, so their cotangents are symbolic zeros in training;
    the bwd rule still handles them exactly for generality).

    The backward emits exactly two per-channel reductions over one fused
    pass of (dy, x) — sum(dy) and sum(dy*xhat) — then one elementwise pass:

        dx = scale*inv * (dy - sum(dy)/n - xhat * sum(dy*xhat)/n)

    versus autodiff's separate dmean/dvar reduction chains. Numerics are
    exact BN (same formula autodiff differentiates), validated against
    jax.grad of the identical forward in tests/models/test_fused_bn.py.
    """
    y, mean, var, _ = _bn_train_apply(x, scale, bias, eps)
    return y, mean, var


def _bn_fused_fwd(x, scale, bias, eps):
    y, mean, var, inv = _bn_train_apply(x, scale, bias, eps)
    return (y, mean, var), (x, scale, mean, inv)


def _bn_fused_bwd(eps, res, cts):
    dy, dmean_ct, dvar_ct = cts
    x, scale, mean, inv = res
    c = x.shape[-1]
    n = x.size // c
    dyf = dy.astype(jnp.float32).reshape(-1, c)
    xhat = (x.astype(jnp.float32).reshape(-1, c) - mean) * inv
    sum_dy = jnp.sum(dyf, axis=0)
    sum_dy_xhat = jnp.sum(dyf * xhat, axis=0)
    dscale = sum_dy_xhat
    dbias = sum_dy
    dx = (scale * inv) * (dyf - sum_dy / n - xhat * (sum_dy_xhat / n))
    # cotangents flowing back through the (mean, var) primal outputs (zero in
    # the training step — the EMA update is a non-differentiated side effect)
    dx = dx + dmean_ct / n + dvar_ct * (2.0 / n) * (xhat / inv)
    return dx.reshape(x.shape).astype(x.dtype), dscale, dbias


bn_train_fused.defvjp(_bn_fused_fwd, _bn_fused_bwd)


class FusedBatchNorm(nn.Module):
    """Exact BatchNorm with a custom-vjp fused backward (grad_stats="fused").

    Forward semantics and running-stat updates match nn.BatchNorm (stats in
    f32, momentum EMA); only the backward *implementation* differs — the
    hand-written rule in bn_train_fused replaces autodiff's dmean/dvar
    reduction chains with two reductions in one pass. Checkpoint-compatible
    with nn.BatchNorm (params scale/bias, batch_stats mean/var, auto-name
    "BatchNorm_i").
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale, bias, ra_mean, ra_var = _bn_variables(self, c)
        if self.use_running_average:
            inv = lax.rsqrt(ra_var.value + self.epsilon) * scale
            mul = inv.astype(self.dtype)
            add = (bias - ra_mean.value * inv).astype(self.dtype)
            return x * mul + add
        y, mean, var = bn_train_fused(x, scale, bias, self.epsilon)
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
            ra_var.value = m * ra_var.value + (1.0 - m) * var
        return y


FusedBatchNorm.__name__ = "BatchNorm"
FusedBatchNorm.__qualname__ = "BatchNorm"


def resize_nearest(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Nearest-neighbour resize of an NHWC tensor (integer upscale fast-path).

    HRNet fusion only ever upsamples by powers of two; for that case a
    reshape-broadcast is cheaper for XLA than a general gather resize.
    """
    n, h, w, c = x.shape
    if height % h == 0 and width % w == 0:
        fh, fw = height // h, width // w
        if fh == 1 and fw == 1:
            return x
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, fh, w, fw, c))
        return x.reshape(n, height, width, c)
    import jax

    return jax.image.resize(x, (n, height, width, c), method="nearest")


def resize_bilinear(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Bilinear (align_corners=False, half_pixel) resize of an NHWC tensor."""
    import jax

    n, _, _, c = x.shape
    return jax.image.resize(x, (n, height, width, c), method="bilinear")
