"""Flash-style fused self-attention Pallas kernels for SAGAN's Self_Attn.

The reference materializes the full N x N attention matrix with two bmm's
(models/SAGAN.py:97-103). Here both the FORWARD (online softmax) and the
BACKWARD (blockwise dq / dk+dv with recomputed probabilities from saved
row log-sum-exps) run without any O(N^2) HBM intermediate, so feature maps
far larger than the reference's 64^2 stay VMEM-resident.

Matches the reference math exactly: *unscaled* logits (no 1/sqrt(d)),
softmax over keys, out_i = sum_j softmax(q_i . k_j) v_j.

Backward math (FlashAttention-style, unscaled):
  delta_i = dO_i . O_i
  dv_j = sum_i p_ij dO_i
  dq_i = sum_j p_ij (dO_i . v_j - delta_i) k_j
  dk_j = sum_i p_ij (dO_i . v_j - delta_i) q_i
with p_ij = exp(q_i . k_j - lse_i) recomputed per block.

Falls back to interpret mode automatically off-TPU so tests run on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_INF = -1e30


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _attn_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k: int):
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
    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = (m + jnp.log(l))[:, 0]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _attn_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                        dq_ref, *, block_k: int):
    q = q_ref[0].astype(jnp.float32)           # (bq, dq)
    do = do_ref[0].astype(jnp.float32)         # (bq, dv)
    lse = lse_ref[0].astype(jnp.float32)[:, None]    # (bq, 1)
    delta = delta_ref[0].astype(jnp.float32)[:, None]  # (bq, 1)
    n = k_ref.shape[1]
    num_kb = n // block_k

    def body(kb, dq):
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        p = jnp.exp(s - lse)                    # (bq, bk)
        t = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        return dq + jnp.dot(p * (t - delta), k,
                            preferred_element_type=jnp.float32)

    dq0 = jnp.zeros_like(q)
    dq = jax.lax.fori_loop(0, num_kb, body, dq0)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _attn_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dk_ref, dv_ref, *, block_q: int):
    k = k_ref[0].astype(jnp.float32)            # (bk, dq)
    v = v_ref[0].astype(jnp.float32)            # (bk, dv)
    n = q_ref.shape[1]
    num_qb = n // block_q

    def body(qb, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(qb * block_q, block_q)].astype(
            jnp.float32)[:, None]
        delta = delta_ref[0, pl.ds(qb * block_q, block_q)].astype(
            jnp.float32)[:, None]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (bq, bk)
        p = jnp.exp(s - lse)
        dv = dv + jnp.dot(p.T, do, preferred_element_type=jnp.float32)
        t = jnp.dot(do, v.T, preferred_element_type=jnp.float32)  # (bq, bk)
        dk = dk + jnp.dot((p * (t - delta)).T, q,
                          preferred_element_type=jnp.float32)
        return dk, dv

    dk0 = jnp.zeros_like(k)
    dv0 = jnp.zeros_like(v)
    dk, dv = jax.lax.fori_loop(0, num_qb, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# padding + dispatch
# ---------------------------------------------------------------------------

def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _pad_qkv(q, k, v, block_q, block_k):
    """Pad N to the block grid and feature dims to lanes; padded KEYS get a
    sentinel feature column that drives their logits to -inf."""
    b, n, dq = q.shape
    dv = v.shape[-1]
    n_pad = _round_up(n, max(block_q, block_k))
    dq_pad = _round_up(dq, 128)
    dv_pad = _round_up(dv, 128)
    qp = _pad_to(_pad_to(q, n_pad, 1), dq_pad, 2)
    kp = _pad_to(_pad_to(k, n_pad, 1), dq_pad, 2)
    vp = _pad_to(_pad_to(v, n_pad, 1), dv_pad, 2)
    if n_pad != n:
        flag_q = jnp.ones((b, n_pad, 1), qp.dtype)
        flag_k = jnp.concatenate(
            [jnp.zeros((b, n, 1), kp.dtype),
             jnp.full((b, n_pad - n, 1), _NEG_INF / 2, kp.dtype)], axis=1)
        qp = jnp.concatenate([qp, flag_q], axis=-1)
        kp = jnp.concatenate([kp, flag_k], axis=-1)
        dq_pad += 1
    return qp, kp, vp, n_pad, dq_pad, dv_pad


DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 512


def _reference_attention(q, k, v):
    """Unscaled-logit attention in f32 (the reference math, SAGAN.py:97-103).
    Parity oracle for tests; materializes the full N x N matrix."""
    s = jnp.einsum("bic,bjc->bij", q.astype(jnp.float32),
                   k.astype(jnp.float32))
    a = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bij,bjc->bic", a,
                      v.astype(jnp.float32)).astype(q.dtype)


def _flash_attention_fwd_only(q, k, v, block_q: int = DEFAULT_BLOCK_Q,
                              block_k: int = DEFAULT_BLOCK_K,
                              interpret: bool | None = None):
    """Forward pass only (no residuals); kept for tests/benchmarks."""
    out, _ = _fwd_impl(q, k, v, block_q, block_k, interpret)
    return out


def _fwd_impl(q, k, v, block_q, block_k, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, dq = q.shape
    dv = v.shape[-1]
    qp, kp, vp, n_pad, dq_pad, dv_pad = _pad_qkv(q, k, v, block_q, block_k)
    grid = (b, n_pad // block_q)
    out, lse = pl.pallas_call(
        functools.partial(_attn_fwd_kernel, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dq_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n_pad, dq_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n_pad, dv_pad), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dv_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_q), lambda i, j: (i, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, dv_pad), q.dtype),
            jax.ShapeDtypeStruct((b, n_pad), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :n, :dv], lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K,
                    interpret: bool | None = None) -> jax.Array:
    """Differentiable fused attention: Pallas forward AND backward, both
    blockwise with no O(N^2) HBM intermediate.

    q, k: (B, N, dq); v: (B, N, dv) -> (B, N, dv). Any N (padded internally,
    padded keys masked via sentinel -inf logits)."""
    out, _ = _fwd_impl(q, k, v, block_q, block_k, interpret)
    return out


def _fa_fwd(q, k, v, block_q, block_k, interpret):
    out, lse = _fwd_impl(q, k, v, block_q, block_k, interpret)
    return out, (q, k, v, out, lse)


def _fa_bwd(block_q, block_k, interpret, res, g):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    q, k, v, out, lse = res
    b, n, dq = q.shape
    dv = v.shape[-1]

    # delta_i = dO_i . O_i  (O(N dv), fine outside the kernel)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), -1)

    qp, kp, vp, n_pad, dq_pad, dv_pad = _pad_qkv(q, k, v, block_q, block_k)
    gp = _pad_to(_pad_to(g, n_pad, 1), dv_pad, 2)
    # padded query rows must not contribute to dk/dv: p = exp(s - lse) == 0
    # when their lse is huge; their delta is zeroed too
    lse_p = _pad_to(lse, n_pad, 1)
    if n_pad != n:
        pad_rows = jnp.arange(n_pad) >= n
        lse_p = jnp.where(pad_rows[None, :], -_NEG_INF, lse_p)
    delta_p = _pad_to(delta, n_pad, 1)

    dq = pl.pallas_call(
        functools.partial(_attn_bwd_dq_kernel, block_k=block_k),
        grid=(b, n_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dq_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n_pad, dq_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n_pad, dv_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_q, dv_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_q), lambda i, j: (i, j)),
            pl.BlockSpec((1, block_q), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dq_pad), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, dq_pad), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, gp, lse_p, delta_p)

    dk, dvv = pl.pallas_call(
        functools.partial(_attn_bwd_dkv_kernel, block_q=block_q),
        grid=(b, n_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, n_pad, dq_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_k, dq_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_k, dv_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n_pad, dv_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n_pad), lambda i, j: (i, 0)),
            pl.BlockSpec((1, n_pad), lambda i, j: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, dq_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_k, dv_pad), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, dq_pad), k.dtype),
            jax.ShapeDtypeStruct((b, n_pad, dv_pad), v.dtype),
        ],
        interpret=interpret,
    )(qp, kp, vp, gp, lse_p, delta_p)

    # slice off padding and the sentinel feature column
    return dq[:, :n, :q.shape[-1]], dk[:, :n, :q.shape[-1]], \
        dvv[:, :n, :dv]


flash_attention.defvjp(_fa_fwd, _fa_bwd)
