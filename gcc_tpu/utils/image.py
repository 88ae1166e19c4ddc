"""Image conversion and saving (utils/util.py:45-95, 208-235).

tensor2im: [-1,1] float NHWC -> uint8 HWC; save_images writes
<name>_<label>.png per visual, as the reference's test loops do.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def tensor2im(arr, imtype=np.uint8) -> np.ndarray:
    """First image of an NHWC batch in [-1,1] -> HWC uint8."""
    arr = np.asarray(arr)
    if arr.ndim == 4:
        arr = arr[0]
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    img = (arr + 1.0) / 2.0 * 255.0
    return np.clip(img, 0, 255).astype(imtype)


def save_image(image_numpy: np.ndarray, image_path: str,
               aspect_ratio: float = 1.0) -> None:
    from PIL import Image
    os.makedirs(os.path.dirname(image_path) or ".", exist_ok=True)
    pil = Image.fromarray(image_numpy)
    h, w = image_numpy.shape[:2]
    if aspect_ratio > 1.0:
        pil = pil.resize((w, int(h * aspect_ratio)), Image.BICUBIC)
    elif aspect_ratio < 1.0:
        pil = pil.resize((int(w / aspect_ratio), h), Image.BICUBIC)
    pil.save(image_path)


def save_images(save_dir: str, visuals: Dict[str, np.ndarray],
                image_name: str, aspect_ratio: float = 1.0) -> None:
    base = os.path.splitext(os.path.basename(image_name))[0]
    for label, im_data in visuals.items():
        save_image(tensor2im(im_data),
                   os.path.join(save_dir, f"{base}_{label}.png"),
                   aspect_ratio=aspect_ratio)
