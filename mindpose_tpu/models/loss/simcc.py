"""KL-divergence loss over SimCC bin distributions.

Beyond the reference: pairs with heads/simcc_head.py (arXiv:2107.03332
§3.2). Targets are per-joint discrete Gaussian label distributions over the
x and y bin axes (data/transform TopDownGenerateSimCCTarget, normalized to
sum 1), so KL(target || softmax(logits)) reduces to cross-entropy up to a
constant; invisible joints are masked by target_weight.
"""
import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...register import register
from .loss import Loss


@register("loss", extra_name="kl_discret")
@dataclasses.dataclass(frozen=True)
class KLDiscretLoss(Loss):
    """Inputs: pred ``(x_logits [N,K,Bx], y_logits [N,K,By])``;
    target ``[N, K, Bx+By]`` (x labels then y labels, each summing to 1);
    target_weight ``[N, K]``.
    """

    use_target_weight: bool = True

    def __call__(
        self,
        pred: Tuple[jnp.ndarray, jnp.ndarray],
        target: jnp.ndarray,
        target_weight: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        x_logits, y_logits = pred
        bx = x_logits.shape[-1]
        tx = target[..., :bx].astype(jnp.float32)
        ty = target[..., bx:].astype(jnp.float32)

        def ce(logits, labels):  # [N, K]
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            return -jnp.sum(labels * logp, axis=-1)

        loss = ce(x_logits, tx) + ce(y_logits, ty)  # [N, K]
        if self.use_target_weight and target_weight is not None:
            loss = loss * target_weight.astype(jnp.float32)
        return self.get_loss(loss)
