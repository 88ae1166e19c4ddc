"""Bit-matched image preprocessing (data/base_dataset.py:63-147).

PIL does the resampling (same BICUBIC kernels as torchvision's PIL backend),
so pixel values match the reference exactly; outputs are float32 NHW C in
[-1, 1] (ToTensor + Normalize(0.5,0.5,0.5)).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
from PIL import Image


def get_params(cfg, size: Tuple[int, int],
               rng: np.random.RandomState) -> Dict:
    """Shared random crop/flip parameters (base_dataset.py:63-78)."""
    w, h = size
    new_w, new_h = w, h
    if cfg.preprocess == "resize_and_crop":
        new_w = new_h = cfg.load_size
    elif cfg.preprocess == "scale_width_and_crop":
        new_w = cfg.load_size
        new_h = cfg.load_size * h // w
    x = rng.randint(0, max(0, new_w - cfg.crop_size) + 1)
    y = rng.randint(0, max(0, new_h - cfg.crop_size) + 1)
    flip = rng.rand() > 0.5
    return {"crop_pos": (x, y), "flip": flip}


def scale_width(img: Image.Image, target_size: int, crop_size: int,
                method=Image.BICUBIC) -> Image.Image:
    ow, oh = img.size
    if ow == target_size and oh >= crop_size:
        return img
    w = target_size
    h = int(max(target_size * oh / ow, crop_size))
    return img.resize((w, h), method)


def make_power_2(img: Image.Image, base: int = 4,
                 method=Image.BICUBIC) -> Image.Image:
    ow, oh = img.size
    w, h = int(round(ow / base) * base), int(round(oh / base) * base)
    if (w, h) == (ow, oh):
        return img
    return img.resize((w, h), method)


def apply_transform(cfg, img: Image.Image, params: Optional[Dict] = None,
                    rng: Optional[np.random.RandomState] = None,
                    grayscale: bool = False,
                    method=Image.BICUBIC, convert: bool = True):
    """get_transform(opt, params) applied to one image
    (base_dataset.py:81-112). params=None draws crop/flip from rng (the
    reference's RandomCrop / RandomHorizontalFlip path).

    With cfg.native_loader the resize->crop->flip->normalize chain runs in
    the C++ engine (gcc_tpu.native; PIL-parity within 1/255)."""
    if (getattr(cfg, "native_loader", False) and not grayscale and convert
            and cfg.preprocess == "resize_and_crop"):
        from gcc_tpu import native
        if native.available():
            if params is None:
                x = rng.randint(0, max(0, cfg.load_size - cfg.crop_size) + 1)
                y = rng.randint(0, max(0, cfg.load_size - cfg.crop_size) + 1)
                flip = (not cfg.no_flip) and rng.rand() > 0.5
            else:
                x, y = params["crop_pos"]
                flip = (not cfg.no_flip) and params["flip"]
            arr = np.asarray(img.convert("RGB"), np.uint8)
            return native.transform_batch(
                [arr], cfg.load_size, cfg.crop_size, [(x, y)], [flip],
                num_threads=1)[0]
    if grayscale:
        img = img.convert("L")
    if "resize" in cfg.preprocess:
        img = img.resize((cfg.load_size, cfg.load_size), method)
    elif "scale_width" in cfg.preprocess:
        img = scale_width(img, cfg.load_size, cfg.crop_size, method)

    if "crop" in cfg.preprocess:
        ow, oh = img.size
        if params is None:
            x = rng.randint(0, max(0, ow - cfg.crop_size) + 1)
            y = rng.randint(0, max(0, oh - cfg.crop_size) + 1)
        else:
            x, y = params["crop_pos"]
        if ow > cfg.crop_size or oh > cfg.crop_size:
            img = img.crop((x, y, x + cfg.crop_size, y + cfg.crop_size))

    if cfg.preprocess == "none":
        img = make_power_2(img, 4, method)

    if not cfg.no_flip:
        flip = (rng.rand() > 0.5) if params is None else params["flip"]
        if flip:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)

    if not convert:
        return img
    return to_tensor_norm(img)


def to_tensor_norm(img: Image.Image) -> np.ndarray:
    """ToTensor + Normalize(0.5): HWC float32 in [-1, 1]."""
    arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr * 2.0 - 1.0


def center_crop(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    left = int(round((w - size) / 2.0))
    top = int(round((h - size) / 2.0))
    return img.crop((left, top, left + size, top + size))
