"""Serving export: pruned generators as portable StableHLO artifacts.

The reference's only deployment story is "load the .pth in torch and call
netG" (reference test.py:131-163). TPU-natively we can do better:
`jax.export` serializes the *compiled function itself* — weights baked in as
constants — into a single StableHLO artifact that any JAX process (or an XLA
runtime via PJRT) can deserialize and call **without gcc_tpu, flax, or the
checkpoint**. One artifact serves every batch size: the batch dimension is
exported symbolically.

Portability rules applied to the exported module:
- Pallas kernels are excluded (flash attention -> einsum path, fused mobile
  blocks -> XLA path): the artifact must lower for every requested platform,
  and at serving batch sizes the XLA paths are within noise of the fused
  ones (benchmarks/serving_latency.py).
- Multi-platform lowering defaults to ("cpu", "tpu") so the same file runs
  on a dev box and a serving chip.

Artifact container: the raw `Exported.serialize()` bytes, written verbatim.
Load with `jax.export.deserialize(bytearray(open(p,'rb').read())).call(x)`.
"""

from __future__ import annotations

import warnings
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport


def _portable(mod):
    """Clone a generator module with every Pallas path forced off, so the
    exported StableHLO lowers on any platform (see module docstring)."""
    overrides = {}
    if getattr(mod, "use_fused_blocks", None) is not False and \
            hasattr(mod, "use_fused_blocks"):
        overrides["use_fused_blocks"] = False
    if hasattr(mod, "pallas_attn_threshold"):
        overrides["pallas_attn_threshold"] = 2 ** 31
    return mod.clone(**overrides) if overrides else mod


def _pick_generator(engine, direction: str, teacher: bool):
    """(module, net-key) of the requested generator, mirroring the engines'
    own generate() dispatch (engines/*.py)."""
    # Capability dispatch (not class-name string matching): any engine with
    # per-direction generators is treated as cyclegan-shaped, so subclasses
    # and renames keep working (ADVICE r3).
    if hasattr(engine, "G_A") and hasattr(engine, "G_B"):
        if direction not in ("AtoB", "BtoA"):
            raise ValueError(f"cyclegan export needs direction AtoB|BtoA, "
                             f"got {direction!r}")
        if direction == "AtoB":
            return (engine.TG_A, "tg_a") if teacher else (engine.G_A, "g_a")
        return (engine.TG_B, "tg_b") if teacher else (engine.G_B, "g_b")
    return (engine.TG, "tg") if teacher else (engine.G, "g")


def example_input_shape(cfg) -> Tuple[int, ...]:
    """Per-family serving input shape at the configured sizes (batch 1)."""
    if cfg.model == "sagan":
        return (1, cfg.z_dim)
    if cfg.model == "srgan":
        s = cfg.image_size // cfg.upscale_factor
        return (1, s, s, 3)
    # pix2pix/cyclegan generators consume cfg.input_nc channels (ADVICE r3:
    # a checkpoint trained with --input_nc != 3 must trace with that width;
    # engines/pix2pix.py inits G with cfg.input_nc).
    return (1, cfg.crop_size, cfg.crop_size, getattr(cfg, "input_nc", 3))


def quantize_int8(params):
    """Per-output-channel symmetric int8 weight-only quantization.

    Every floating leaf with ndim >= 2 (conv HWIO kernels, transpose-conv
    forward kernels, dense kernels) is quantized along its last axis — the
    output-channel axis in this repo's HWIO/[in,out] conventions — with a
    symmetric scale max|w|/127 per channel. Caveat: transpose-conv kernels
    are stored as the HWIO of the FORWARD conv (repo convention, CLAUDE.md),
    so for those leaves the last axis is the deconv's *input* channel; the
    grouping is per-forward-output-channel, which is numerically valid but
    a different channel grouping than for ordinary convs. 1-D leaves (norm
    scales/biases, spectral u/v vectors) stay full precision: they are a
    rounding-error fraction of the bytes and quantizing norm affine params
    is what actually hurts quality. Returns (flat_leaves, treedef, qinfo)
    where qinfo[i] is None for passthrough leaves or (int8 q, f32 scale)
    for quantized ones.

    Beyond the reference (no quantized deployment path exists there; its
    serving story is torch-loading the f32 .pth, reference test.py:131-163).
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    qinfo = []
    for w in leaves:
        w = np.asarray(w)
        # jnp.issubdtype, not np.issubdtype: ml_dtypes.bfloat16 (a bf16-typed
        # params tree) is floating under jax's lattice but NOT under numpy's
        # — the np check would silently pass every bf16 kernel through
        # unquantized (ADVICE r4).
        if w.ndim >= 2 and jnp.issubdtype(w.dtype, jnp.floating):
            axes = tuple(range(w.ndim - 1))
            w32 = w.astype(np.float32)
            s = np.max(np.abs(w32), axis=axes, keepdims=True) / 127.0
            s = np.where(s == 0, 1.0, s).astype(np.float32)
            q = np.clip(np.round(w32 / s), -127, 127).astype(np.int8)
            qinfo.append((q, s))
        else:
            qinfo.append(None)
    if leaves and not any(i is not None for i in qinfo):
        warnings.warn(
            "quantize_int8: no leaf was quantized (no floating leaf with "
            "ndim >= 2 found) — the exported artifact will not shrink",
            stacklevel=2)
    return leaves, treedef, qinfo


def export_generator(engine, state, example_shape: Sequence[int],
                     *, direction: str = "AtoB", teacher: bool = False,
                     platforms: Sequence[str] = ("cpu", "tpu"),
                     poly_batch: bool = True,
                     dtype=jnp.float32,
                     weight_quant: Optional[str] = None) -> jexport.Exported:
    """Export one generator as a self-contained serving function.

    example_shape includes the batch dim; with poly_batch the batch becomes
    the symbolic dimension "b" so one artifact serves any batch size.
    dtype sets both the input spec and the baked-in weights (bf16 halves the
    artifact and is the measured serving dtype on v5e).
    weight_quant="int8" stores conv/dense kernels as int8 constants with
    per-output-channel scales and dequantizes (q * s -> dtype) INSIDE the
    exported function, so the on-disk artifact carries int8 weights (~4x
    smaller than f32) while compute stays in dtype. Measured ~64 dB PSNR vs
    the f32 generator (tests/test_hlo_export.py pins the quality gate).
    """
    from gcc_tpu.engines.common import apply_net

    mod, key = _pick_generator(engine, direction, teacher)
    mod = _portable(mod)
    net = jax.device_get(state.nets[key])
    net = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if jnp.issubdtype(
            jnp.asarray(a).dtype, jnp.floating) else a, net)

    if weight_quant not in (None, "none", "int8"):
        raise ValueError(f"unsupported weight_quant {weight_quant!r} "
                         "(expected 'int8')")
    if weight_quant == "int8":
        # Quantize from the ORIGINAL (pre-dtype-cast) weights for scale
        # precision; the dequant ops below are traced into the artifact so
        # serialization keeps the int8 constants (the exported StableHLO is
        # unoptimized — constant folding happens at consumer compile time).
        raw = jax.device_get(state.nets[key]).get("params", {})
        _, treedef, qinfo = quantize_int8(raw)
        fp_leaves = jax.tree_util.tree_flatten(net.get("params", {}))[0]

        def _params():
            deq = [fp if info is None else
                   (jnp.asarray(info[0]).astype(jnp.float32)
                    * jnp.asarray(info[1])).astype(dtype)
                   for fp, info in zip(fp_leaves, qinfo)]
            return jax.tree_util.tree_unflatten(treedef, deq)

        def serve(x):
            net_q = dict(net)
            net_q["params"] = _params()
            out, _, _ = apply_net(mod, net_q, x, train=False,
                                  update_stats=False)
            return out
    else:
        def serve(x):
            out, _, _ = apply_net(mod, net, x, train=False,
                                  update_stats=False)
            return out

    shape = tuple(example_shape)
    if poly_batch:
        (b,) = jexport.symbolic_shape("b")
        shape = (b,) + shape[1:]
    spec = jax.ShapeDtypeStruct(shape, dtype)
    return jexport.export(jax.jit(serve), platforms=list(platforms))(spec)


def save_exported(exported: jexport.Exported, path: str) -> int:
    """Write the serialized artifact; returns its size in bytes."""
    data = bytes(exported.serialize())
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def load_exported(path: str) -> jexport.Exported:
    with open(path, "rb") as f:
        return jexport.deserialize(bytearray(f.read()))
