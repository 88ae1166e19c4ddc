"""Post-step numerics check (--check_numerics).

SURVEY.md §5 sanitizers row. The reference has no NaN story at all; jax's
own --debug_nans re-executes every primitive un-jitted once a NaN appears,
which is exact but orders of magnitude slower. This mode instead checks the
named-loss dict the jitted step already returns: one small host sync per
iteration, abort with the offending loss NAMES so the user knows which term
(G gan loss, distill, D real/fake, arch...) diverged and at which iteration.
"""

from __future__ import annotations

import numpy as np


def assert_finite_losses(losses, *, epoch=None, iters=None):
    """Raise FloatingPointError naming every non-finite loss in the dict.

    `losses` is the named-loss dict returned by an engine's train/arch step
    (scalars or small arrays; device or host). Returns the dict unchanged
    when everything is finite so call sites can chain it.
    """
    bad = {}
    for name, v in losses.items():
        a = np.asarray(v)
        if not np.all(np.isfinite(a)):
            flat = a.ravel()
            bad[name] = float(flat[0]) if flat.size == 1 else \
                f"{int(np.sum(~np.isfinite(a)))}/{a.size} non-finite"
    if bad:
        where = ""
        if epoch is not None:
            where = f" at epoch {epoch}" + (
                f", iters {iters}" if iters is not None else "")
        names = ", ".join(f"{k}={v}" for k, v in sorted(bad.items()))
        raise FloatingPointError(
            f"--check_numerics: non-finite loss{where}: {names}. The train "
            f"state after this step is poisoned; restart from the last "
            f"checkpoint with a lower --lr / different --gan_mode, or rerun "
            f"with --debug_nans to localize the primitive that produced it.")
    return losses
