"""Negative log-likelihood loss for direct coordinate regression.

Beyond the reference: pairs with heads/rle_head.py (arXiv:2107.11291).
The head predicts per-keypoint ``(mu, sigma)``; the loss is the NLL of the
ground-truth coordinate under a density centered at ``mu`` with scale
``sigma``:

- ``q_distribution="laplace"`` (default):
  ``log(2 sigma) + |gt - mu| / sigma`` per axis — the paper's Q = Laplace
  baseline (its Table 1 "direct regression + Laplace").
- ``q_distribution="gaussian"``:
  ``log(sigma sqrt(2 pi)) + (gt - mu)^2 / (2 sigma^2)``.

Documented divergence from the full RLE method: the paper refines Q with a
realNVP flow whose parameters train jointly with the network. Losses in
this framework are stateless pure functions (models/loss/loss.py), so the
flow is omitted; what ships is the paper's distribution-baseline ablation,
which already learns per-joint anisotropic uncertainty. The flow's params
are discarded at inference in the original too, so serving parity is
unaffected.
"""
import dataclasses
import math
from typing import Optional, Tuple

import jax.numpy as jnp

from ...register import register
from .loss import Loss


@register("loss", extra_name="rle")
@dataclasses.dataclass(frozen=True)
class RLELoss(Loss):
    """Inputs: pred ``(mu [N, K, 2], sigma [N, K, 2])``;
    target ``[N, K, 2]`` normalized coordinates (same convention as the
    head); target_weight ``[N, K]``.
    """

    use_target_weight: bool = True
    q_distribution: str = "laplace"
    eps: float = 1e-9

    def __call__(
        self,
        pred: Tuple[jnp.ndarray, jnp.ndarray],
        target: jnp.ndarray,
        target_weight: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        mu, sigma = pred
        mu = mu.astype(jnp.float32)
        sigma = sigma.astype(jnp.float32) + self.eps
        err = (target.astype(jnp.float32) - mu) / sigma
        if self.q_distribution == "gaussian":
            nll = jnp.log(sigma * math.sqrt(2.0 * math.pi)) + 0.5 * err**2
        elif self.q_distribution == "laplace":
            nll = jnp.log(2.0 * sigma) + jnp.abs(err)
        else:
            raise ValueError(
                f"unknown q_distribution: {self.q_distribution!r}"
            )
        loss = jnp.sum(nll, axis=-1)  # [N, K]
        if self.use_target_weight and target_weight is not None:
            loss = loss * target_weight.astype(jnp.float32)
        return self.get_loss(loss)
