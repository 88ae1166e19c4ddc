"""Replay buffer of generated images for D updates (utils/image_pool.py:5-54).

Host-side state (numpy) with an explicit seeded RNG — it sits outside the
jitted step by design: the pool mutates across iterations and its 50% swap
branches are data-dependent, so it stays on host and only its output batch
is fed to the device step.
"""

from __future__ import annotations

import numpy as np


class ImagePool:
    def __init__(self, pool_size: int, seed: int = 0):
        self.pool_size = pool_size
        self.rng = np.random.RandomState(seed)
        if pool_size > 0:
            self.num_imgs = 0
            self.images = []

    def query(self, images: np.ndarray) -> np.ndarray:
        """images: (B, H, W, C) host array; returns same shape."""
        if self.pool_size == 0:
            return images
        out = []
        for image in np.asarray(images):
            image = image[None]
            if self.num_imgs < self.pool_size:
                self.num_imgs += 1
                self.images.append(image)
                out.append(image)
            else:
                if self.rng.uniform(0, 1) > 0.5:
                    idx = self.rng.randint(0, self.pool_size)
                    tmp = self.images[idx].copy()
                    self.images[idx] = image
                    out.append(tmp)
                else:
                    out.append(image)
        return np.concatenate(out, 0)
