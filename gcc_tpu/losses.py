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

    Input is NHWC; output (B, C, C) in float32. One batched MXU matmul.

    The einsum contracts the NATIVE-dtype operand with f32 accumulation
    (preferred_element_type) instead of upcasting the feature tensor first:
    a convert feeding a matmul cannot fuse into it, so an explicit
    .astype(f32) materializes a 2x-size HBM copy of every (large) feature
    map and forces the multi-pass f32 MXU algorithm. For bf16-valued
    inputs the single-pass product is exact in f32, so accumulate-in-f32
    is numerically equivalent and strictly cheaper (measured: the pix2pix
    distillation block's HBM bytes drop ~3x; benchmarks/kernel_evidence.py).
    """
    b, h, w, c = x.shape
    f = x.reshape(b, h * w, c)
    g = jnp.einsum("bnc,bnd->bcd", f, f, preferred_element_type=jnp.float32)
    return g / (c * h * w)


def sqrt_mse(a: jax.Array, b: jax.Array) -> jax.Array:
    """sqrt(MSE(a, b)) used by pix2pix/sagan/srgan distillation
    (Pix2Pix.py:542-543). A tiny floor keeps the gradient finite at 0."""
    return jnp.sqrt(jnp.maximum(mse(a, b), 1e-12))


def gram_pair_err(f: jax.Array, t: jax.Array,
                  use_sqrt: bool = True) -> jax.Array:
    """err(gram(f), gram(t)) — the per-pair gram distillation term
    (Pix2Pix.py:541-543), with a TPU fast path for rank-deficient grams.

    When hw < c the (c, c) gram has rank hw and is LARGER than the feature
    itself (the GCC teacher D's 1024-channel taps at 16x16: a 537 MB f32
    gram per batch-128 tensor, materialized four times across fwd+bwd).
    The Frobenius identity

        ||Gf - Gt||_F^2 = ||Kff||^2 - 2 ||Kft||^2 + ||Ktt||^2,
        Kxy = x y^T in (hw, hw),  tr(x^Tx y^Ty) = ||y x^T||_F^2

    computes the SAME loss from (hw, hw) kernel matrices, cutting both
    FLOPs and materialized bytes by hw/c (measured on the pix2pix
    distillation block: benchmarks/kernel_evidence.py). The identity
    needs THREE kernel matmuls (plus their grads) where the direct form
    needs two grams, so it only pays off when hw <= c/2 (6*hw^2*c vs
    4*hw*c^2 total dot FLOPs) — measured: gating at hw < c regressed by
    pulling in the teacher D's 31x31x1024 tap. The three-term form
    cancels catastrophically only when Gf ~= Gt to ~1e-5 relative —
    never the case for a pruned student vs its full teacher — and is
    floored at 0. It is gated to bf16 inputs so the f32 path (CPU parity
    suites, the torch-oracle comparisons) computes grams exactly as the
    reference does.
    """
    b, h, w, c = f.shape
    n = h * w
    if f.dtype == jnp.bfloat16 and t.dtype == jnp.bfloat16 and 2 * n <= c:
        fr = f.reshape(b, n, c)
        tr = t.reshape(b, n, c)

        def k(x, y):
            return jnp.einsum("bnc,bmc->bnm", x, y,
                              preferred_element_type=jnp.float32)

        def sq(m):
            return jnp.sum(jnp.square(m), axis=(1, 2))

        per = sq(k(fr, fr)) - 2.0 * sq(k(fr, tr)) + sq(k(tr, tr))
        m = (jnp.mean(jnp.maximum(per, 0.0))
             / (float(c) * n) ** 2 / (c * c))
        return jnp.sqrt(jnp.maximum(m, 1e-12)) if use_sqrt else m
    return (sqrt_mse if use_sqrt else mse)(gram(f), gram(t))


def tv_loss(x: jax.Array, weight: float = 1.0) -> jax.Array:
    """Total-variation loss (models/GANLoss.py:76-93), NHWC input."""
    b, h, w, c = x.shape
    count_h = (h - 1) * w * c
    count_w = h * (w - 1) * c
    h_tv = jnp.sum(jnp.square(x[:, 1:, :, :] - x[:, :-1, :, :]))
    w_tv = jnp.sum(jnp.square(x[:, :, 1:, :] - x[:, :, :-1, :]))
    return weight * 2.0 * (h_tv / count_h + w_tv / count_w) / b
