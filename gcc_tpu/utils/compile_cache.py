"""Persistent XLA compilation cache for the CLI entry points.

The cooperative train steps are large programs: first compile is 20-60 s
on a TPU and minutes on CPU. JAX's persistent compilation cache
serializes the compiled executable keyed by (program, backend, flags), so
every later run of the same config — resumes (`--continue_train`),
preemption restarts, eval re-runs, epoch sweeps — skips straight past
compilation. The reference has no equivalent (torch eager recompiles
nothing, but also fuses nothing).

Best-effort by design: an experimental backend (e.g. the sandbox's
tunnel plugin) may not support executable serialization; failures to
enable or to write are logged and ignored, never fatal.
"""

from __future__ import annotations

import os


def enable(cfg, logger=None) -> str | None:
    """Point JAX's persistent compilation cache at cfg.compile_cache.

    Returns the cache dir when enabled, else None. "auto" resolves to
    <checkpoints_dir>/jax_compile_cache so all runs under one experiments
    root share compiled executables; "" (or None) disables.
    """
    path = getattr(cfg, "compile_cache", "") or ""
    if not path:
        return None
    if path == "auto":
        path = os.path.join(cfg.checkpoints_dir, "jax_compile_cache")
    log = logger.info if logger else (lambda *_: None)
    try:
        import jax
        os.makedirs(path, exist_ok=True)
        if jax.config.jax_compilation_cache_dir not in (None, path):
            # JAX's cache object is a lazily-initialized singleton: once a
            # different dir has been used (e.g. a prior enable in the same
            # process), updating the config alone is ignored — reset so the
            # new dir actually takes effect.
            try:
                from jax._src import compilation_cache
                compilation_cache.reset_cache()
            except Exception:
                pass
        jax.config.update("jax_compilation_cache_dir", path)
        # cache even fast compiles: the win here is the many-minute
        # cooperative steps, but tests verify via small programs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        log(f"persistent compilation cache: {path}")
        return path
    except Exception as e:  # noqa: BLE001 — never let caching kill a run
        log(f"compilation cache unavailable ({e}); continuing without")
        return None
