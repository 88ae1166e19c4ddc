"""Flash-style fused self-attention Pallas kernels for SAGAN's Self_Attn.

The reference materializes the full N x N attention matrix with two bmm's
(models/SAGAN.py:97-103). Here the FORWARD (online softmax) and the
BACKWARD (blockwise dq / dk+dv with probabilities recomputed from saved row
log-sum-exps) are grid-reduction Pallas kernels: the grid's innermost
dimension walks the reduced (key or query) blocks while VMEM scratch
accumulates, so VMEM holds only O(block^2) tiles — no O(N^2) intermediate
anywhere, and no full-K/V VMEM residency either (that is what makes N in
the tens of thousands compile on a 16 MB-VMEM part).

Matches the reference math exactly: *unscaled* logits (no 1/sqrt(d)),
softmax over keys, out_i = sum_j softmax(q_i . k_j) v_j.

Backward math (FlashAttention-style, unscaled):
  delta_i = dO_i . O_i
  dv_j = sum_i p_ij dO_i
  dq_i = sum_j p_ij (dO_i . v_j - delta_i) k_j
  dk_j = sum_i p_ij (dO_i . v_j - delta_i) q_i
with p_ij = exp(q_i . k_j - lse_i) recomputed per block pair.

Falls back to interpret mode automatically off-TPU so tests run on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 512


# ---------------------------------------------------------------------------
# forward: grid (b, n_q_blocks, n_k_blocks), k innermost (reduction)
# ---------------------------------------------------------------------------

def _attn_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                     m_scr, l_scr, acc_scr, *, num_kb: int):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (bq, bk)
    m_prev, l_prev, acc = m_scr[...], l_scr[...], acc_scr[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    m_scr[...] = m_new
    l_scr[...] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[...] = acc * alpha + jnp.dot(p, v,
                                         preferred_element_type=jnp.float32)

    @pl.when(kb == num_kb - 1)
    def _finish():
        l = l_scr[...]
        o_ref[0] = (acc_scr[...] / l).astype(o_ref.dtype)
        # Mosaic wants (8,128)-aligned block tails: lse as a lane-replicated
        # (bq, 128) tile
        lse_ref[0] = jnp.broadcast_to(m_scr[...] + jnp.log(l),
                                      lse_ref.shape[1:])


# ---------------------------------------------------------------------------
# backward dq: grid (b, n_q_blocks, n_k_blocks), k innermost
# ---------------------------------------------------------------------------

def _attn_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                        dq_ref, dq_scr, *, num_kb: int):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, :, :1].astype(jnp.float32)
    delta = delta_ref[0, :, :1].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    p = jnp.exp(s - lse)
    t = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    dq_scr[...] += jnp.dot(p * (t - delta), k,
                           preferred_element_type=jnp.float32)

    @pl.when(kb == num_kb - 1)
    def _finish():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# backward dk/dv: grid (b, n_k_blocks, n_q_blocks), q innermost
# ---------------------------------------------------------------------------

def _attn_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dk_ref, dv_ref, dk_scr, dv_scr, *, num_qb: int):
    qb = pl.program_id(2)

    @pl.when(qb == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, :, :1].astype(jnp.float32)
    delta = delta_ref[0, :, :1].astype(jnp.float32)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (bq, bk)
    p = jnp.exp(s - lse)
    dv_scr[...] += jnp.dot(p.T, do, preferred_element_type=jnp.float32)
    t = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    dk_scr[...] += jnp.dot((p * (t - delta)).T, q,
                           preferred_element_type=jnp.float32)

    @pl.when(qb == num_qb - 1)
    def _finish():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


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
        dq_pad = _round_up(dq_pad + 1, 128)
        qp = _pad_to(qp, dq_pad, 2)
        kp = _pad_to(kp, dq_pad, 2)
    return qp, kp, vp, n_pad, dq_pad, dv_pad


def _reference_attention(q, k, v):
    """Unscaled-logit attention in f32 (the reference math, SAGAN.py:97-103).
    Parity oracle for tests; materializes the full N x N matrix."""
    s = jnp.einsum("bic,bjc->bij", q.astype(jnp.float32),
                   k.astype(jnp.float32))
    a = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bij,bjc->bic", a,
                      v.astype(jnp.float32)).astype(q.dtype)


def _fwd_impl(q, k, v, block_q, block_k, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, dq = q.shape
    dv = v.shape[-1]
    qp, kp, vp, n_pad, dq_pad, dv_pad = _pad_qkv(q, k, v, block_q, block_k)
    num_kb = n_pad // block_k
    grid = (b, n_pad // block_q, num_kb)
    out, lse = pl.pallas_call(
        functools.partial(_attn_fwd_kernel, num_kb=num_kb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dq_pad), lambda i, j, kk: (i, j, 0)),
            pl.BlockSpec((1, block_k, dq_pad), lambda i, j, kk: (i, kk, 0)),
            pl.BlockSpec((1, block_k, dv_pad), lambda i, j, kk: (i, kk, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dv_pad), lambda i, j, kk: (i, j, 0)),
            pl.BlockSpec((1, block_q, 128), lambda i, j, kk: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, dv_pad), q.dtype),
            jax.ShapeDtypeStruct((b, n_pad, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, dv_pad), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :n, :dv], lse[:, :, 0]


def _flash_attention_fwd_only(q, k, v, block_q: int = DEFAULT_BLOCK_Q,
                              block_k: int = DEFAULT_BLOCK_K,
                              interpret: bool | None = None):
    """Forward pass only (no residuals); kept for tests/benchmarks."""
    out, _ = _fwd_impl(q, k, v, block_q, block_k, interpret)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K,
                    interpret: bool | None = None) -> jax.Array:
    """Differentiable fused attention: Pallas forward AND backward, both
    grid-reduction kernels with O(block^2) VMEM and no O(N^2) HBM
    intermediate.

    q, k: (B, N, dq); v: (B, N, dv) -> (B, N, dv). Any N (padded internally,
    padded keys/queries masked)."""
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
    # lane-replicated (b, n_pad, 128) tiles for Mosaic block alignment
    lse_t = jnp.broadcast_to(lse_p[..., None], (b, n_pad, 128))
    delta_t = jnp.broadcast_to(delta_p[..., None], (b, n_pad, 128))

    num_kb = n_pad // block_k
    num_qb = n_pad // block_q

    dq_out = pl.pallas_call(
        functools.partial(_attn_bwd_dq_kernel, num_kb=num_kb),
        grid=(b, num_qb, num_kb),
        in_specs=[
            pl.BlockSpec((1, block_q, dq_pad), lambda i, j, kk: (i, j, 0)),
            pl.BlockSpec((1, block_k, dq_pad), lambda i, j, kk: (i, kk, 0)),
            pl.BlockSpec((1, block_k, dv_pad), lambda i, j, kk: (i, kk, 0)),
            pl.BlockSpec((1, block_q, dv_pad), lambda i, j, kk: (i, j, 0)),
            pl.BlockSpec((1, block_q, 128), lambda i, j, kk: (i, j, 0)),
            pl.BlockSpec((1, block_q, 128), lambda i, j, kk: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dq_pad),
                               lambda i, j, kk: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, dq_pad), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, dq_pad), jnp.float32)],
        interpret=interpret,
    )(qp, kp, vp, gp, lse_t, delta_t)

    dk, dvv = pl.pallas_call(
        functools.partial(_attn_bwd_dkv_kernel, num_qb=num_qb),
        grid=(b, num_kb, num_qb),
        in_specs=[
            pl.BlockSpec((1, block_q, dq_pad), lambda i, j, qq: (i, qq, 0)),
            pl.BlockSpec((1, block_k, dq_pad), lambda i, j, qq: (i, j, 0)),
            pl.BlockSpec((1, block_k, dv_pad), lambda i, j, qq: (i, j, 0)),
            pl.BlockSpec((1, block_q, dv_pad), lambda i, j, qq: (i, qq, 0)),
            pl.BlockSpec((1, block_q, 128), lambda i, j, qq: (i, qq, 0)),
            pl.BlockSpec((1, block_q, 128), lambda i, j, qq: (i, qq, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, dq_pad), lambda i, j, qq: (i, j, 0)),
            pl.BlockSpec((1, block_k, dv_pad), lambda i, j, qq: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, dq_pad), k.dtype),
            jax.ShapeDtypeStruct((b, n_pad, dv_pad), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, dq_pad), jnp.float32),
            pltpu.VMEM((block_k, dv_pad), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, gp, lse_t, delta_t)

    # slice off padding and the sentinel feature column
    return dq_out[:, :n, :dq], dk[:, :n, :dq], dvv[:, :n, :dv]


flash_attention.defvjp(_fa_fwd, _fa_bwd)
