"""DifferentiableOP: learnable hard channel gates with straight-through grads.

Semantics match the reference exactly (models/DifferentiableOp.py:22-59):

  forward:  mask = (sign(alpha - threshold) + 1) / 2        in {0, 1/2?, 1}
  backward: d(mask)/d(alpha) = identity (gradient passes through unchanged)

(sign(0) = 0 gives mask 1/2 exactly at alpha == threshold, as in torch.)

The gate multiplies an NHWC activation along C. Under XLA the multiply fuses
into the neighboring conv; at export time `gcc_tpu.compress` folds zero
channels away entirely, so the "pruned" discriminator is dense compute with
masked channels during search and physically sliced afterwards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


@jax.custom_vjp
def mask_from_alpha(alpha: jax.Array, threshold: jax.Array) -> jax.Array:
    return (jnp.sign(alpha - threshold) + 1.0) / 2.0


def _mask_fwd(alpha, threshold):
    return mask_from_alpha(alpha, threshold), None


def _mask_bwd(_, g):
    # straight-through: grad w.r.t. alpha is g unchanged; none for threshold
    # (models/DifferentiableOp.py:29-32)
    return g, None


mask_from_alpha.defvjp(_mask_fwd, _mask_bwd)


class MaskGate(nn.Module):
    """Per-channel gate over the trailing (feature) axis of an NHWC tensor.

    ``alpha`` lives in the ``arch`` variable collection so the engines can
    partition D-weight vs. D-arch optimization without pytree surgery
    (reference mutates requires_grad instead, models/Pix2Pix.py:624-634).
    Alphas init to 1.0 and are clipped to [0,1] by the arch step
    (DifferentiableOp.py:39,51-53).
    """

    features: int
    threshold: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.variable(
            "arch", "alpha", lambda: jnp.ones((self.features,), jnp.float32))
        mask = mask_from_alpha(alpha.value, jnp.float32(self.threshold))
        return x * mask.astype(x.dtype)


def clip_alphas(arch_tree):
    """clip_alpha(): project alphas back to [0,1] (DifferentiableOp.py:51-53)."""
    return jax.tree_util.tree_map(lambda a: jnp.clip(a, 0.0, 1.0), arch_tree)


def current_masks(arch_tree, threshold: float = 0.5):
    """get_current_mask() per gate, for sparsity reporting (l.58-59).
    `threshold` must match the gates' --threshold for an accurate report."""
    return jax.tree_util.tree_map(
        lambda a: (jnp.sign(a - threshold) + 1.0) / 2.0, arch_tree)


def sparsity_report(arch_tree, threshold: float = 0.5) -> dict:
    """name -> fraction of masked-off channels (models/Pix2Pix.py:595-600)."""
    flat = jax.tree_util.tree_flatten_with_path(arch_tree)[0]
    out = {}
    for path, alpha in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        mask = (jnp.sign(alpha - threshold) + 1.0) / 2.0
        out[name] = float(jnp.mean(mask == 0.0))
    return out
