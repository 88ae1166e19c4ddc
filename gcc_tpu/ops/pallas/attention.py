"""Flash-style fused self-attention Pallas kernel for SAGAN's Self_Attn.

The reference materializes the full N x N attention matrix with two bmm's
(models/SAGAN.py:97-103). For the reference's sizes (N <= 4096) the einsum
path in gcc_tpu.ops.attention is already MXU-bound; this kernel exists so
larger feature maps (bigger image sizes than the reference's 64^2) stay
VMEM-resident with online softmax instead of an O(N^2) HBM intermediate.

Matches the reference math exactly: *unscaled* logits (no 1/sqrt(d)),
softmax over keys, out_i = sum_j softmax(q_i . k_j) v_j.

Falls back to interpret mode automatically off-TPU so tests run on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int):
    # blocks carry a leading singleton batch dim:
    # q_ref: (1, bq, dq), k_ref: (1, N, dq), v_ref: (1, N, dv)
    q = q_ref[0].astype(jnp.float32)
    n = k_ref.shape[1]
    bq = q.shape[0]
    dv = v_ref.shape[2]
    num_kb = n // block_k

    def body(kb, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (bq, bk)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, dv), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _reference_attention(q, k, v):
    """Unscaled-logit attention in f32 (the reference math, SAGAN.py:97-103).
    Used for the backward pass: recompute-based VJP trades the O(N^2) memory
    spike for a simple exact gradient (the fused forward stays Pallas)."""
    s = jnp.einsum("bic,bjc->bij", q.astype(jnp.float32),
                   k.astype(jnp.float32))
    a = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bij,bjc->bic", a, v.astype(jnp.float32)).astype(q.dtype)


@jax.custom_vjp
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Differentiable fused attention: Pallas forward (online softmax, no
    O(N^2) HBM intermediate), recompute-einsum backward."""
    return _flash_attention_fwd_only(q, k, v)


def _fa_fwd(q, k, v):
    return _flash_attention_fwd_only(q, k, v), (q, k, v)


def _fa_bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(_reference_attention, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fa_fwd, _fa_bwd)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def _flash_attention_fwd_only(q: jax.Array, k: jax.Array, v: jax.Array,
                              block_q: int = 256, block_k: int = 512,
                              interpret: bool | None = None) -> jax.Array:
    """q, k: (B, N, dq); v: (B, N, dv) -> (B, N, dv). N multiple of block_q
    is padded internally; key padding is masked via -inf logits."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, dq = q.shape
    dv = v.shape[-1]

    def round_up(x, m):
        return (x + m - 1) // m * m

    n_pad = round_up(n, max(block_q, block_k))
    dq_pad = round_up(dq, 128)
    dv_pad = round_up(dv, 128)
    qp = _pad_to(_pad_to(q, n_pad, 1), dq_pad, 2)
    kp = _pad_to(_pad_to(k, n_pad, 1), dq_pad, 2)
    vp = _pad_to(_pad_to(v, n_pad, 1), dv_pad, 2)
    if n_pad != n:
        # mask padded keys: give them strongly negative logits by adding a
        # sentinel feature dimension (q gets +1 there, padded keys -inf)
        flag_q = jnp.ones((b, n_pad, 1), qp.dtype)
        flag_k = jnp.concatenate(
            [jnp.zeros((b, n, 1), kp.dtype),
             jnp.full((b, n_pad - n, 1), _NEG_INF / 2, kp.dtype)], axis=1)
        qp = jnp.concatenate([qp, flag_q], axis=-1)
        kp = jnp.concatenate([kp, flag_k], axis=-1)
        dq_pad += 1

    grid = (b, n_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dq_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n_pad, dq_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n_pad, dv_pad), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dv_pad), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, dv_pad), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :n, :dv]
