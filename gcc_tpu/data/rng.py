"""Thread-safe RandomState for datasets under the per-item Loader pool.

Loader submits one decode task per image (loader.py), so a dataset's
`self.rng` is hit from num_threads workers concurrently. Mersenne-twister
state updates are not atomic — unlocked concurrent draws can return
duplicate values or garble the state. This wrapper serializes just the
draw (nanoseconds) while the heavy decode work stays parallel.

Draw ORDER across threads is scheduling-dependent either way (true of the
previous per-batch pool too); what this guarantees is state integrity and
distinct draws. Tests needing exact reproducibility use num_threads=1.
"""

from __future__ import annotations

import threading

import numpy as np


class LockedRandomState(np.random.RandomState):
    def __init__(self, seed=None):
        super().__init__(seed)
        self._lock = threading.Lock()

    def rand(self, *args):
        with self._lock:
            return super().rand(*args)

    def randn(self, *args):
        with self._lock:
            return super().randn(*args)

    def randint(self, *args, **kw):
        with self._lock:
            return super().randint(*args, **kw)

    def uniform(self, *args, **kw):
        with self._lock:
            return super().uniform(*args, **kw)

    def shuffle(self, *args, **kw):
        with self._lock:
            return super().shuffle(*args, **kw)

    def permutation(self, *args, **kw):
        with self._lock:
            return super().permutation(*args, **kw)
