"""Startup HBM guardrail for cli.train (VERDICT r3 #8).

Before the first training step executes, AOT-lower the exact jitted step
at the run's shapes with ABSTRACT arguments (jax.ShapeDtypeStruct — the
compile touches no device memory) and read XLA's own buffer-assignment
peak via ``compiled.memory_analysis()``. If the projected per-device peak
exceeds the device's HBM, fit the two-point bytes-per-image model from
benchmarks/memory_budget.py (one extra compile at half batch) and suggest
the largest batch that fits.

The reference has no equivalent: its failure mode is a raw CUDA OOM in
the middle of the first iteration (torch.cuda.max_memory_allocated is
never called anywhere in /root/reference). Here the user gets the
projection — and with ``--memory_guard strict`` a clean abort — before
any step runs.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

V5E_HBM_BYTES = 16 * 1024 ** 3  # per-chip fallback when the backend
# doesn't report a limit (v5e sticker)

_GIB = 1024 ** 3


class MemoryGuardError(RuntimeError):
    """Projected HBM peak exceeds the device limit (strict mode)."""


def _abstract(tree):
    import jax

    def leaf(a):
        # keep mesh shardings on arrays (the projection must see the SPMD
        # program) but not on scalars: a committed single-device scalar
        # (e.g. jnp.float32(lr)) would conflict with mesh-placed state
        shd = getattr(a, "sharding", None) if getattr(a, "ndim", 0) else None
        try:
            return jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=shd)
        except (TypeError, ValueError):
            return jax.ShapeDtypeStruct(a.shape, a.dtype)

    return jax.tree_util.tree_map(leaf, tree)


def _scale_batch(tree, new_batch: int):
    """Abstract copy of a batched pytree with the leading dim replaced.

    Shardings are dropped: at a different batch size the original
    NamedSharding may not divide the new dim, and the projection only
    needs the slope, which an unsharded (single-device) compile gives."""
    import jax

    def leaf(a):
        shape = (new_batch,) + tuple(a.shape[1:])
        return jax.ShapeDtypeStruct(shape, a.dtype)

    return jax.tree_util.tree_map(leaf, tree)


def device_hbm_bytes(default: int = V5E_HBM_BYTES) -> Tuple[int, str]:
    """Per-device memory limit: (bytes, provenance)."""
    import jax

    dev = jax.local_devices()[0]
    try:
        stats = dev.memory_stats() or {}
        limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        if limit:
            return int(limit), f"{dev.device_kind} memory_stats"
    except Exception:
        pass
    return default, "assumed v5e 16 GiB (backend reports no limit)"


def _peak(jitted, args) -> Optional[int]:
    compiled = jitted.lower(*args).compile()
    ma = compiled.memory_analysis()
    if ma is None:
        return None
    return int(ma.peak_memory_in_bytes)


def check_step(jitted, args: Sequence, batch_argnums: Sequence[int],
               batch_size: int, hbm_bytes: Optional[int] = None,
               logger=None, strict: bool = False) -> Optional[dict]:
    """Project the jitted step's per-device HBM peak at these arg shapes.

    args may be concrete arrays or pytrees thereof; they are abstracted
    before lowering, so no device memory is allocated. batch_argnums
    names the positions whose leaves carry the batch as dim 0 (used for
    the half-batch slope fit when over budget). Returns the projection
    dict, or None when the backend exposes no memory analysis. Best
    effort: any failure is logged and swallowed unless strict."""
    info = logger.info if logger else (lambda *_: None)
    warn = logger.warning if logger else (lambda *_: None)
    try:
        aargs = [_abstract(a) for a in args]
        peak = _peak(jitted, aargs)
        if peak is None:
            info("memory guard: backend exposes no memory_analysis; skipped")
            return None
        if hbm_bytes is None:
            hbm_bytes, src = device_hbm_bytes()
        else:
            src = "caller-supplied"
        out = {"peak_bytes": peak, "hbm_bytes": hbm_bytes,
               "pct_of_hbm": round(100.0 * peak / hbm_bytes, 1)}
        if peak <= hbm_bytes:
            info(f"memory guard: projected step peak "
                 f"{peak / _GIB:.2f} / {hbm_bytes / _GIB:.2f} GiB "
                 f"({out['pct_of_hbm']}% of HBM, {src})")
            return out
        # over budget: fit bytes/image from a half-batch compile and
        # suggest the largest batch that fits (memory_budget.py's model,
        # incl. its ADVICE-r3 reliability gate)
        suggestion = ""
        if batch_size >= 2:
            half = batch_size // 2
            hargs = [(_scale_batch(a, half) if i in set(batch_argnums)
                      else a) for i, a in enumerate(aargs)]
            p_half = _peak(jitted, hargs)
            if p_half is not None:
                slope = (peak - p_half) / (batch_size - half)
                fixed = peak - slope * batch_size
                share = slope * batch_size / peak if peak else 0.0
                out.update(bytes_per_image=int(slope),
                           fixed_bytes=int(fixed),
                           batch_dependent_share=round(share, 4))
                max_batch = (int((hbm_bytes - fixed) / slope)
                             if slope > 0 and fixed < hbm_bytes else 0)
                if slope > 0 and share >= 0.05 and max_batch >= 1:
                    out["suggested_max_batch"] = max_batch
                    suggestion = (f"; largest projected-to-fit batch "
                                  f"~{max_batch} (fit: {int(slope)} B/image "
                                  f"+ {fixed / _GIB:.2f} GiB fixed)")
                else:
                    suggestion = ("; peak is dominated by batch-independent "
                                  "temps — reducing batch will not fit this "
                                  "model (try a smaller model/crop or more "
                                  "devices)")
        msg = (f"memory guard: projected step peak {peak / _GIB:.2f} GiB "
               f"EXCEEDS device HBM {hbm_bytes / _GIB:.2f} GiB ({src})"
               f"{suggestion}")
        if strict:
            raise MemoryGuardError(msg)
        warn(msg)
        return out
    except MemoryGuardError:
        raise
    except Exception as e:  # pragma: no cover - backend-specific failures
        info(f"memory guard unavailable: {e}")
        return None
