"""Fused MobileResnet residual-block Pallas kernels (SURVEY §2.1 target (a)).

The cyclegan/pix2pix-resnet residual block (models/CycleGAN.py:15-28,
112-120) is a chain of bandwidth-bound ops at 64x64 resolution:

  reflect-pad -> depthwise 3x3 -> InstanceNorm -> pointwise 1x1
  -> InstanceNorm -> ReLU -> reflect-pad -> depthwise -> InstanceNorm
  -> pointwise -> InstanceNorm -> residual add

XLA materializes an HBM round-trip at every conv boundary and two more for
each InstanceNorm's reduction+normalize, ~12 round trips of the full
activation per block. Here ONE Pallas program per (sample, stage) holds the
activation in VMEM end-to-end: reflect pad via concats, the depthwise conv
as 9 shifted VPU FMAs, the pointwise as an MXU matmul over (H*W, C), and
both InstanceNorms as in-VMEM reductions — 1 read + 1 write of the
activation per stage (plus weights), i.e. 2 round trips per stage instead
of ~6.

A "stage" is one separable conv + its two InstanceNorms (+ optional ReLU /
residual add): y = IN(pw(IN(dw(pad(x))))) [relu] [+ res]. A block is two
stages. The backward is two Pallas kernels per stage (flash-style: nothing
saved but the inputs; intermediates recomputed in VMEM):
  bwd_pw: recompute a-hat/b-hat, backprop through relu + IN2 + pointwise
          -> d(a-hat) to HBM, accumulate dW over the batch grid
  bwd_dw: recompute a-hat, backprop through IN1 + depthwise + pad adjoint
          -> dx, accumulate d(dw kernel) over the batch grid

Bias parameters are mathematically INERT in this architecture: every conv
is immediately followed by an affine-free InstanceNorm, which subtracts the
per-channel mean — the reference's biases (Conv2d default) are dead weights
there too. The fused path therefore neither reads them nor produces
gradients for them (the XLA path's bias grads are reduction noise ~1e-8).

Stats are computed in f32 regardless of storage dtype; matmuls run in the
activation dtype with f32 accumulation (matching the XLA path's bf16 convs
on TPU). Falls back to interpret mode off-TPU so CPU tests run.

MEASURED OUTCOME (v5e, bf16, teacher shapes — benchmarks/
fused_block_result.json): 0.89x XLA forward, 0.74x fwd+bwd. XLA's conv
pipeline already runs within ~1.35x of its own traffic bound on this
block, so the ~3x per-stage HBM-traffic saving does not pay for the
Mosaic per-pass VPU overhead — the kernel ships OFF by default
(--fused_resblock on re-enables; parity is pinned by
tests/test_mobile_block.py either way). Contrast flash attention
(ops/pallas/attention.py), where the O(N^2)->O(block^2) memory change
moves the roofline itself and wins 2.4x.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5  # torch InstanceNorm2d default (ops/layers.py InstanceNorm)

# Mosaic's default scoped-VMEM cap is 16 MB; v5e has headroom above that.
# The C=M=256 teacher stage measures ~17 MB of scoped VMEM — raise the cap
# rather than splitting the stage (an extra HBM round trip per stage).
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _rpad1(x):
    """Reflect-pad 1 px on H and W of (H, W, C): rows first, then cols —
    the adjoint below folds in the reverse order."""
    h, w = x.shape[0], x.shape[1]
    xr = jnp.concatenate([x[1:2], x, x[h - 2:h - 1]], axis=0)
    return jnp.concatenate([xr[:, 1:2], xr, xr[:, w - 2:w - 1]], axis=1)


def _rpad1_adjoint(gxp):
    """Adjoint of _rpad1: (H+2, W+2, C) -> (H, W, C)."""
    h, w = gxp.shape[0] - 2, gxp.shape[1] - 2
    c = gxp.shape[2]
    g1 = gxp[:, 1:w + 1, :]
    g1 = g1 + jnp.concatenate(
        [jnp.zeros((h + 2, 1, c), g1.dtype), gxp[:, 0:1, :],
         jnp.zeros((h + 2, w - 4, c), g1.dtype), gxp[:, w + 1:w + 2, :],
         jnp.zeros((h + 2, 1, c), g1.dtype)], axis=1)
    gx = g1[1:h + 1]
    return gx + jnp.concatenate(
        [jnp.zeros((1, w, c), gx.dtype), g1[0:1],
         jnp.zeros((h - 4, w, c), gx.dtype), g1[h + 1:h + 2],
         jnp.zeros((1, w, c), gx.dtype)], axis=0)


def _dw_accum_cols(cols, dwk_ref, h, out_dt):
    """Depthwise 3x3 from three sublane-aligned column-shifted buffers
    (scratch refs of shape (H+2, W, C)): 9 FMAs over leading-dim slices."""
    acc = None
    for i in range(3):
        for j in range(3):
            term = cols[j][i:i + h].astype(jnp.float32) \
                * dwk_ref[3 * i + j].astype(jnp.float32)
            acc = term if acc is None else acc + term
    return acc.astype(out_dt)


def _dw_accum(xp, dwk_ref, h, w, out_dt):
    """Depthwise 3x3 on the padded (H+2, W+2, C) tile: 9 shifted VPU FMAs,
    f32 accumulation, stored in out_dt. dwk_ref is (9, C)."""
    acc = None
    for idx in range(9):
        i, j = divmod(idx, 3)
        term = xp[i:i + h, j:j + w, :].astype(jnp.float32) \
            * dwk_ref[idx].astype(jnp.float32)
        acc = term if acc is None else acc + term
    return acc.astype(out_dt)


def _inorm(t, axes):
    """Affine-free InstanceNorm over `axes`: out in t.dtype, stats in f32.

    E[x^2]-E[x]^2 form (one data pass; ops/layers.InstanceNorm uses the
    two-pass form — equivalent to fp accuracy at these activation scales);
    f32 accumulation via the reduction dtype so no full-size f32 temporary
    outlives the expression (VMEM is the scarce resource here)."""
    n = 1.0
    for ax in axes:
        n *= t.shape[ax]
    s1 = jnp.sum(t, axis=axes, keepdims=True, dtype=jnp.float32)
    s2 = jnp.sum(jnp.square(t.astype(jnp.float32)), axis=axes,
                 keepdims=True, dtype=jnp.float32)
    mean = s1 / n
    var = s2 / n - jnp.square(mean)
    r = jax.lax.rsqrt(var + _EPS)
    out = ((t.astype(jnp.float32) - mean) * r).astype(t.dtype)
    return out, r


def _inorm_bwd(g, that, r, axes, out_dt):
    """d/dt of IN given upstream g, normalized output that, and r."""
    n = 1.0
    for ax in axes:
        n *= that.shape[ax]
    gm = jnp.sum(g, axis=axes, keepdims=True, dtype=jnp.float32) / n
    gym = jnp.sum(g.astype(jnp.float32) * that.astype(jnp.float32),
                  axis=axes, keepdims=True, dtype=jnp.float32) / n
    out = r * (g.astype(jnp.float32) - gm
               - that.astype(jnp.float32) * gym)
    return out.astype(out_dt)


# ---------------------------------------------------------------------------
# forward: grid (B,), whole stage per sample in VMEM
# ---------------------------------------------------------------------------

def _stage_fwd_kernel(x_ref, dwk_ref, pwk_ref, *rest, relu, has_res):
    if has_res:
        res_ref, y_ref, c0, c1, c2 = rest
    else:
        y_ref, c0, c1, c2 = rest
    h, w = x_ref.shape[1], x_ref.shape[2]
    x = x_ref[0]
    cdt = x.dtype
    xp = _rpad1(x)
    # materialize the three column-shifted views once (sublane-aligned
    # scratch): the 9 taps then read free leading-dim slices instead of
    # paying a sublane relayout per window
    c0[...] = xp[:, 0:w, :]
    c1[...] = xp[:, 1:w + 1, :]
    c2[...] = xp[:, 2:w + 2, :]
    a = _dw_accum_cols((c0, c1, c2), dwk_ref, h, cdt)
    ah, _ = _inorm(a, (0, 1))
    b = jnp.dot(ah.reshape(h * w, ah.shape[-1]),
                pwk_ref[...].astype(cdt),
                preferred_element_type=jnp.float32).astype(cdt)
    bh, _ = _inorm(b, (0,))
    y = jnp.maximum(bh, 0) if relu else bh
    y = y.reshape(h, w, y.shape[-1])
    if has_res:
        y = y + res_ref[0]
    y_ref[0] = y.astype(y_ref.dtype)


# ---------------------------------------------------------------------------
# backward part 1 (pointwise side): d(a-hat) + dW
# ---------------------------------------------------------------------------

def _stage_bwd_pw_kernel(x_ref, dwk_ref, pwk_ref, g_ref, gah_ref, gpw_ref,
                         *, relu):
    h, w = x_ref.shape[1], x_ref.shape[2]
    x = x_ref[0]
    cdt = x.dtype
    xp = _rpad1(x)
    a = _dw_accum(xp, dwk_ref, h, w, cdt)
    ah, _ = _inorm(a, (0, 1))
    ahc = ah.reshape(h * w, ah.shape[-1])
    b = jnp.dot(ahc, pwk_ref[...].astype(cdt),
                preferred_element_type=jnp.float32).astype(cdt)
    bh, rb = _inorm(b, (0,))

    g = g_ref[0].reshape(h * w, g_ref.shape[-1])
    if relu:
        # compare in f32: Mosaic has no bf16 vector cmpf on this target
        g = jnp.where(bh.astype(jnp.float32) > 0, g, 0).astype(cdt)
    gb = _inorm_bwd(g, bh, rb, (0,), cdt)
    gah = jnp.dot(gb, pwk_ref[...].astype(cdt).T,
                  preferred_element_type=jnp.float32)
    gah_ref[0] = gah.reshape(h, w, gah.shape[-1]).astype(gah_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gpw_ref[...] = jnp.zeros_like(gpw_ref)

    gpw_ref[...] += jnp.dot(ahc.T, gb, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# backward part 2 (depthwise side): dx + d(dw kernel)
# ---------------------------------------------------------------------------

def _stage_bwd_dw_kernel(x_ref, dwk_ref, gah_ref, gx_ref, gdw_ref):
    h, w = x_ref.shape[1], x_ref.shape[2]
    x = x_ref[0]
    cdt = x.dtype
    xp = _rpad1(x)
    a = _dw_accum(xp, dwk_ref, h, w, cdt)
    ah, ra = _inorm(a, (0, 1))
    ga = _inorm_bwd(gah_ref[0], ah, ra, (0, 1), cdt)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gdw_ref[...] = jnp.zeros_like(gdw_ref)

    gxp = None
    for idx in range(9):
        i, j = divmod(idx, 3)
        win = xp[i:i + h, j:j + w, :]
        gdw_ref[idx, :] += jnp.sum(
            ga.astype(jnp.float32) * win.astype(jnp.float32), axis=(0, 1),
            dtype=jnp.float32)
        term = jnp.pad(ga * dwk_ref[idx].astype(cdt),
                       ((i, 2 - i), (j, 2 - j), (0, 0)))
        gxp = term if gxp is None else gxp + term
    gx_ref[0] = _rpad1_adjoint(gxp).astype(gx_ref.dtype)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def _pad_ch(t, target, axis=-1):
    pad = target - t.shape[axis]
    if pad <= 0:
        return t
    widths = [(0, 0)] * t.ndim
    widths[axis] = (0, pad)
    return jnp.pad(t, widths)


def _prep(x, dwk, pwk, residual):
    """Channel-pad everything to 128 lanes; flatten kernels to 2D."""
    b, h, w, c = x.shape
    m = pwk.shape[-1]
    cp, mp = _round_up(c, 128), _round_up(m, 128)
    xp = _pad_ch(x, cp)
    dwk2 = _pad_ch(dwk.reshape(9, c), cp)
    pwk2 = _pad_ch(_pad_ch(pwk.reshape(c, m), cp, 0), mp, 1)
    resp = _pad_ch(residual, mp) if residual is not None else None
    return xp, dwk2, pwk2, resp, (b, h, w, c, m, cp, mp)


def _fwd_impl(x, dwk, pwk, residual, relu, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xp, dwk2, pwk2, resp, (b, h, w, c, m, cp, mp) = _prep(
        x, dwk, pwk, residual)
    has_res = resp is not None
    in_specs = [
        pl.BlockSpec((1, h, w, cp), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((9, cp), lambda i: (0, 0)),
        pl.BlockSpec((cp, mp), lambda i: (0, 0)),
    ]
    args = [xp, dwk2, pwk2]
    if has_res:
        in_specs.append(pl.BlockSpec((1, h, w, mp), lambda i: (i, 0, 0, 0)))
        args.append(resp)
    y = pl.pallas_call(
        functools.partial(_stage_fwd_kernel, relu=relu, has_res=has_res),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, w, mp), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, mp), x.dtype),
        scratch_shapes=[pltpu.VMEM((h + 2, w, cp), x.dtype)
                        for _ in range(3)],
        compiler_params=None if interpret else _COMPILER_PARAMS,
        interpret=interpret,
    )(*args)
    return y[..., :m]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_sep_stage(x, dwk, pwk, residual=None, relu=False,
                    interpret=None):
    """One fused separable-conv stage: IN(pw(IN(dw(rpad(x))))) [relu] [+res].

    x: (B, H, W, C) NHWC (H, W >= 5); dwk: (3, 3, 1, C) flax depthwise
    kernel; pwk: (1, 1, C, M); residual: optional (B, H, W, M).
    Differentiable (Pallas forward AND backward, recompute-based).
    """
    return _fwd_impl(x, dwk, pwk, residual, relu, interpret)


def _fss_fwd(x, dwk, pwk, residual, relu, interpret):
    y = _fwd_impl(x, dwk, pwk, residual, relu, interpret)
    return y, (x, dwk, pwk, residual is not None)


def _fss_bwd(relu, interpret, res, g):
    x, dwk, pwk, had_res = res
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xp, dwk2, pwk2, _, (b, h, w, c, m, cp, mp) = _prep(x, dwk, pwk, None)
    gp = _pad_ch(g, mp)

    gah, gpw = pl.pallas_call(
        functools.partial(_stage_bwd_pw_kernel, relu=relu),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, cp), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9, cp), lambda i: (0, 0)),
            pl.BlockSpec((cp, mp), lambda i: (0, 0)),
            pl.BlockSpec((1, h, w, mp), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, h, w, cp), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((cp, mp), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, cp), x.dtype),
            jax.ShapeDtypeStruct((cp, mp), jnp.float32),
        ],
        compiler_params=None if interpret else _COMPILER_PARAMS,
        interpret=interpret,
    )(xp, dwk2, pwk2, gp)

    gx, gdw = pl.pallas_call(
        _stage_bwd_dw_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, cp), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9, cp), lambda i: (0, 0)),
            pl.BlockSpec((1, h, w, cp), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, h, w, cp), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9, cp), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, cp), x.dtype),
            jax.ShapeDtypeStruct((9, cp), jnp.float32),
        ],
        compiler_params=None if interpret else _COMPILER_PARAMS,
        interpret=interpret,
    )(xp, dwk2, gah)

    gx = gx[..., :c]
    gdw_out = gdw[:, :c].reshape(3, 3, 1, c).astype(dwk.dtype)
    gpw_out = gpw[:c, :m].reshape(1, 1, c, m).astype(pwk.dtype)
    gres = g if had_res else None
    return gx, gdw_out, gpw_out, gres


fused_sep_stage.defvjp(_fss_fwd, _fss_bwd)


def fused_mobile_block(x, dwk1, pwk1, dwk2, pwk2, interpret=None):
    """One full MobileResnet residual block (CycleGAN.py:112-120):
    x + IN(pw2(IN(dw2(rpad(relu(IN(pw1(IN(dw1(rpad(x)))))))))))."""
    r = fused_sep_stage(x, dwk1, pwk1, None, True, interpret)
    return fused_sep_stage(r, dwk2, pwk2, x, False, interpret)
