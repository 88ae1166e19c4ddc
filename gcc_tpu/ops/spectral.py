"""Spectral normalization with power-iteration state (models/SAGAN.py:17-71).

The reference keeps u/v vectors as non-trainable Parameters updated in-place
before every forward; here they are a ``spectral`` variable collection
updated functionally when the module is called mutable (training), and read
as-is in eval. Gradients flow through W in sigma = u^T W v with u, v treated
as constants — exactly the reference's no-grad power-iteration update
followed by a differentiable sigma (SAGAN.py:33-38).

torch weight layout for the sigma computation is w.view(height, -1) with
height = out_channels. Our kernels are HWIO, so the matricization is
(out, in*kh*kw) obtained by transposing O to the front.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from gcc_tpu.ops.layers import conv_init


def _l2normalize(v, eps=1e-12):
    return v / (jnp.linalg.norm(v) + eps)


class _SpectralWeight(nn.Module):
    """Shared u/v power-iteration logic; subclasses provide the conv.

    power_iterations is declared as the LAST dataclass field on each
    subclass (not here) so subclass positional args bind features first.
    """

    power_iterations = 1  # fallback; shadowed by subclass fields

    def _normalize(self, w_bar: jax.Array, out_axis: int) -> jax.Array:
        w = jnp.moveaxis(w_bar, out_axis, 0)
        height = w.shape[0]
        wm = w.reshape(height, -1).astype(jnp.float32)
        width = wm.shape[1]

        u_var = self.variable(
            "spectral", "u",
            lambda: _l2normalize(jax.random.normal(
                self.make_rng("params") if self.has_rng("params") else jax.random.PRNGKey(0),
                (height,), jnp.float32)))
        v_var = self.variable(
            "spectral", "v",
            lambda: _l2normalize(jax.random.normal(
                self.make_rng("params") if self.has_rng("params") else jax.random.PRNGKey(1),
                (width,), jnp.float32)))

        u, v = u_var.value, v_var.value
        wm_ng = jax.lax.stop_gradient(wm)
        for _ in range(self.power_iterations):
            v = _l2normalize(wm_ng.T @ u)
            u = _l2normalize(wm_ng @ v)
        # torch updates u/v in-place on every forward (train and eval); we
        # persist them whenever the collection is mutable and always use the
        # freshly-iterated vectors for sigma.
        if self.is_mutable_collection("spectral") and not self.is_initializing():
            u_var.value, v_var.value = u, v
        sigma = u @ (wm @ v)  # grads flow through wm only
        return w_bar / sigma.astype(w_bar.dtype)


class SpectralConv(_SpectralWeight):
    """Conv2d wrapped in spectral norm (SAGAN D layers)."""

    features: int = 0
    kernel_size: Tuple[int, int] = (4, 4)
    strides: Tuple[int, int] = (2, 2)
    padding: int = 1
    use_bias: bool = True
    kernel_init: Callable = conv_init()
    power_iterations: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        w_bar = self.param("kernel", self.kernel_init,
                           (kh, kw, x.shape[-1], self.features))
        w = self._normalize(w_bar, out_axis=3)
        pad = ((self.padding, self.padding),) * 2
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), self.strides, pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


class SpectralConvTranspose(_SpectralWeight):
    """ConvTranspose2d wrapped in spectral norm (SAGAN G layers).

    torch's height for the power iteration is weight.shape[0] = in_channels
    for ConvTranspose2d (SAGAN.py:31), so out_axis here is the I axis (2).
    """

    features: int = 0
    kernel_size: Tuple[int, int] = (4, 4)
    strides: Tuple[int, int] = (2, 2)
    padding: int = 1
    use_bias: bool = True
    kernel_init: Callable = conv_init()
    power_iterations: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        w_bar = self.param("kernel", self.kernel_init,
                           (kh, kw, x.shape[-1], self.features))
        w = self._normalize(w_bar, out_axis=2)
        lo = kh - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x, jnp.flip(w, axis=(0, 1)).astype(x.dtype), (1, 1),
            ((lo, lo), (lo, lo)), lhs_dilation=self.strides,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y
