"""SAGAN self-attention over H*W positions (models/SAGAN.py:73-107).

out = gamma * (V @ softmax(Q^T K)^T) + x, with Q,K projecting to C/8.

The default path is einsum — XLA fuses it onto the MXU and, at the
reference's sizes (N = H*W <= 4096), materializing the N x N attention is
VMEM-friendly. A fused Pallas flash-attention path
(gcc_tpu.ops.pallas.attention) kicks in for larger maps where the N x N
matrix would blow HBM traffic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from gcc_tpu.ops.layers import Conv


class SelfAttention(nn.Module):
    """NHWC self-attention block with learnable residual gate gamma."""

    use_pallas_threshold: int = 8192  # switch to fused kernel when N exceeds

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        cq = max(c // 8, 1)
        q = Conv(cq, (1, 1), (1, 1), 0, name="query_conv")(x)
        k = Conv(cq, (1, 1), (1, 1), 0, name="key_conv")(x)
        v = Conv(c, (1, 1), (1, 1), 0, name="value_conv")(x)
        gamma = self.param("gamma", nn.initializers.zeros, ())

        qf = q.reshape(n, h * w, cq)
        kf = k.reshape(n, h * w, cq)
        vf = v.reshape(n, h * w, c)

        if h * w > self.use_pallas_threshold:
            from gcc_tpu.ops.pallas.attention import flash_attention
            out = flash_attention(qf, kf, vf)
        else:
            energy = jnp.einsum("bic,bjc->bij", qf, kf,
                                preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(energy, axis=-1).astype(x.dtype)
            # reference: out = V @ attn^T, i.e. out_i = sum_j attn[i,j] v_j
            out = jnp.einsum("bij,bjc->bic", attn, vf,
                             preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(n, h, w, c)
        return gamma.astype(x.dtype) * out + x
