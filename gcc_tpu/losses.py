"""Loss functions: GAN objectives, distillation (content/gram), TV.

GAN modes replicate models/GANLoss.py:38-59 exactly:
  lsgan   : MSE vs target label
  vanilla : BCE-with-logits vs target label
  hinge   : D: -E[min(+-pred - 1, 0)]; G: -E[pred] (target must be real)
  wgangp  : -+E[pred]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

GAN_MODES = ("lsgan", "vanilla", "hinge", "wgangp")


def gan_loss(pred: jax.Array, target_is_real: bool, gan_mode: str,
             for_discriminator: bool = True) -> jax.Array:
    pred = pred.astype(jnp.float32)
    if gan_mode == "lsgan":
        target = 1.0 if target_is_real else 0.0
        return jnp.mean(jnp.square(pred - target))
    if gan_mode == "vanilla":
        target = 1.0 if target_is_real else 0.0
        # BCEWithLogits: softplus(-x) for target 1, softplus(x) for target 0
        z = pred if target_is_real else -pred
        return jnp.mean(jax.nn.softplus(-z))
    if gan_mode == "hinge":
        if for_discriminator:
            signed = pred - 1.0 if target_is_real else -pred - 1.0
            return -jnp.mean(jnp.minimum(signed, 0.0))
        assert target_is_real
        return -jnp.mean(pred)
    if gan_mode == "wgangp":
        return -jnp.mean(pred) if target_is_real else jnp.mean(pred)
    raise NotImplementedError(f"gan mode {gan_mode} not implemented")


def l1(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def mse(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))


def gram(x: jax.Array) -> jax.Array:
    """Gram matrix G = f f^T / (c*h*w), f = (B, C, H*W) (Pix2Pix.py:733-740).

    Input is NHWC; output (B, C, C). One batched MXU matmul.
    """
    b, h, w, c = x.shape
    f = x.reshape(b, h * w, c).astype(jnp.float32)
    g = jnp.einsum("bnc,bnd->bcd", f, f, preferred_element_type=jnp.float32)
    return g / (c * h * w)


def sqrt_mse(a: jax.Array, b: jax.Array) -> jax.Array:
    """sqrt(MSE(a, b)) used by pix2pix/sagan/srgan distillation
    (Pix2Pix.py:542-543). A tiny floor keeps the gradient finite at 0."""
    return jnp.sqrt(jnp.maximum(mse(a, b), 1e-12))


def distillation_loss(student_feats, teacher_feats, use_sqrt: bool = True):
    """Content + gram feature-matching losses over paired feature lists.

    pix2pix/sagan/srgan use sqrt(MSE(.)); cyclegan uses plain MSE
    (CycleGAN.py:513-514). Teacher features are stop-gradiented (the
    reference compares against ``target_feature.detach()``).
    """
    err = sqrt_mse if use_sqrt else mse
    content = 0.0
    gram_l = 0.0
    for s, t in zip(student_feats, teacher_feats):
        t = jax.lax.stop_gradient(t)
        content = content + err(s, t)
        gram_l = gram_l + err(gram(s), gram(t))
    return content, gram_l


def tv_loss(x: jax.Array, weight: float = 1.0) -> jax.Array:
    """Total-variation loss (models/GANLoss.py:76-93), NHWC input."""
    b, h, w, c = x.shape
    count_h = (h - 1) * w * c
    count_w = h * (w - 1) * c
    h_tv = jnp.sum(jnp.square(x[:, 1:, :, :] - x[:, :-1, :, :]))
    w_tv = jnp.sum(jnp.square(x[:, :, 1:, :] - x[:, :, :-1, :]))
    return weight * 2.0 * (h_tv / count_h + w_tv / count_w) / b
