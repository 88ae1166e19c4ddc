"""Dataset classes: aligned / unaligned / sa / sr / synthetic.

Host-side python objects returning numpy dicts (NHWC float32); batching,
shuffling and device transfer live in gcc_tpu.data.loader. Behavior mirrors
the reference datasets with bit-matched preprocessing:

  * AlignedDataset    — data/aligned_dataset.py:7-60 (side-by-side AB pairs,
    identical transform params on both halves)
  * UnalignedDataset  — data/unaligned_dataset.py:8-79 (random B index unless
    serial_batches; independent transforms per side; optional half split)
  * SADataset         — data/sa_dataset.py:9-50 (flat dir, optional
    center-crop 160, per-item z ~ N(0,1))
  * SRDataset         — data/sr_dataset.py:122-183 (train: random HR crop ->
    bicubic /scale LR; test: largest scale-divisible center crop; LR
    imagenet-norm, HR [-1,1])
  * SyntheticDataset  — no reference equivalent: procedurally generated
    paired images so tests/benchmarks need no downloads.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
from PIL import Image

from gcc_tpu.data.rng import LockedRandomState
from gcc_tpu.data.image_folder import make_dataset, make_split_dataset
from gcc_tpu.data.transforms import (
    apply_transform, center_crop, get_params, to_tensor_norm,
)
from gcc_tpu.metrics.vgg import IMAGENET_MEAN, IMAGENET_STD


class AlignedDataset:
    def __init__(self, cfg, seed: int = 0):
        self.cfg = cfg
        self.dir_AB = os.path.join(cfg.dataroot, cfg.phase)
        self.AB_paths = sorted(make_dataset(self.dir_AB, cfg.max_dataset_size))
        assert cfg.load_size >= cfg.crop_size
        self.rng = LockedRandomState(seed)

    def __len__(self):
        return len(self.AB_paths)

    def __getitem__(self, index) -> Dict:
        path = self.AB_paths[index]
        AB = Image.open(path).convert("RGB")
        w, h = AB.size
        w2 = w // 2
        A = AB.crop((0, 0, w2, h))
        B = AB.crop((w2, 0, w, h))
        params = get_params(self.cfg, A.size, self.rng)
        A = apply_transform(self.cfg, A, params)
        B = apply_transform(self.cfg, B, params)
        return {"A": A, "B": B, "A_paths": path, "B_paths": path}


class UnalignedDataset:
    def __init__(self, cfg, seed: int = 0, first_part: bool = True):
        self.cfg = cfg
        self.dir_A = os.path.join(cfg.dataroot, cfg.phase + "A")
        self.dir_B = os.path.join(cfg.dataroot, cfg.phase + "B")
        if cfg.split_dataset:
            self.A_paths = sorted(make_split_dataset(
                self.dir_A, cfg.max_dataset_size, first_part))
            self.B_paths = sorted(make_split_dataset(
                self.dir_B, cfg.max_dataset_size, first_part))
        else:
            self.A_paths = sorted(make_dataset(self.dir_A,
                                               cfg.max_dataset_size))
            self.B_paths = sorted(make_dataset(self.dir_B,
                                               cfg.max_dataset_size))
        self.rng = LockedRandomState(seed)

    def __len__(self):
        return max(len(self.A_paths), len(self.B_paths))

    def __getitem__(self, index) -> Dict:
        A_path = self.A_paths[index % len(self.A_paths)]
        if self.cfg.serial_batches:
            B_path = self.B_paths[index % len(self.B_paths)]
        else:
            B_path = self.B_paths[self.rng.randint(0, len(self.B_paths))]
        A = Image.open(A_path).convert("RGB")
        B = Image.open(B_path).convert("RGB")
        A = apply_transform(self.cfg, A, params=None, rng=self.rng)
        B = apply_transform(self.cfg, B, params=None, rng=self.rng)
        return {"A": A, "B": B, "A_paths": A_path, "B_paths": B_path}


class SADataset:
    def __init__(self, cfg, seed: int = 0):
        self.cfg = cfg
        self.data_folder = os.path.join(cfg.dataroot, cfg.phase)
        self.image_file_names = sorted(os.listdir(self.data_folder))
        self.rng = LockedRandomState(seed)

    def __len__(self):
        return len(self.image_file_names)

    def __getitem__(self, index) -> Dict:
        name = self.image_file_names[index]
        img = Image.open(os.path.join(self.data_folder, name)).convert("RGB")
        if self.cfg.center_crop:
            img = center_crop(img, 160)
        img = img.resize((self.cfg.crop_size, self.cfg.crop_size),
                         Image.BILINEAR)  # torchvision Resize default
        real = to_tensor_norm(img)
        z = self.rng.randn(self.cfg.z_dim).astype(np.float32)
        return {"z": z, "real_img": real, "img_path": name}


class SRDataset:
    def __init__(self, cfg, seed: int = 0, test_data_name: Optional[str] = None):
        self.cfg = cfg
        folder = test_data_name if test_data_name else cfg.phase
        self.data_folder = os.path.join(cfg.dataroot, folder)
        self.split = ("train" if cfg.phase.lower() == "train"
                      and test_data_name is None else "test")
        self.crop_size = int(cfg.image_size)
        self.scale = int(cfg.upscale_factor)
        self.image_file_names = sorted(os.listdir(self.data_folder))
        self.rng = LockedRandomState(seed)

    def __len__(self):
        return len(self.image_file_names)

    def __getitem__(self, index) -> Dict:
        name = self.image_file_names[index]
        img = Image.open(os.path.join(self.data_folder, name)).convert("RGB")
        if self.split == "train":
            # random crop, low bound 1 as the reference (sr_dataset.py:94-95)
            left = self.rng.randint(1, img.width - self.crop_size + 1)
            top = self.rng.randint(1, img.height - self.crop_size + 1)
            hr = img.crop((left, top, left + self.crop_size,
                           top + self.crop_size))
        else:
            xr, yr = img.width % self.scale, img.height % self.scale
            hr = img.crop((xr // 2, yr // 2, xr // 2 + img.width - xr,
                           yr // 2 + img.height - yr))
        lr = hr.resize((hr.width // self.scale, hr.height // self.scale),
                       Image.BICUBIC)
        lr01 = np.asarray(lr, np.float32) / 255.0
        lr_in = (lr01 - IMAGENET_MEAN) / IMAGENET_STD  # lr_img_type default
        hr_m11 = to_tensor_norm(hr)                    # hr_img_type default
        return {"lr": lr_in.astype(np.float32), "hr": hr_m11,
                "lr_names": name, "hr_names": name}


class SyntheticDataset:
    """Procedural paired/unpaired data for tests and benchmarks: smooth
    random fields for B and an edge-map-like rendition for A."""

    def __init__(self, cfg, seed: int = 0, length: Optional[int] = None):
        self.cfg = cfg
        if length is None:
            # a finite --max_dataset_size sets the epoch size directly
            # (soaks/benches need real epochs); unbounded keeps the small
            # test default
            length = (int(cfg.max_dataset_size)
                      if np.isfinite(cfg.max_dataset_size) else 64)
        self.length = int(min(length, cfg.max_dataset_size))
        self.seed = seed
        self.mode = cfg.dataset_mode if cfg.dataset_mode != "synthetic" else {
            "pix2pix": "aligned", "cyclegan": "unaligned",
            "sagan": "sa", "srgan": "sr"}.get(cfg.model, "aligned")
        self.rng = LockedRandomState(seed)

    def __len__(self):
        return self.length

    def _image(self, index: int, size: int, salt: int = 0) -> np.ndarray:
        rng = np.random.RandomState(self.seed * 100003 + index * 31 + salt)
        low = rng.rand(8, 8, 3).astype(np.float32)
        img = np.asarray(Image.fromarray(
            (low * 255).astype(np.uint8)).resize((size, size), Image.BICUBIC),
            np.float32) / 255.0
        return img * 2.0 - 1.0

    def __getitem__(self, index) -> Dict:
        cfg = self.cfg
        if self.mode in ("aligned", "unaligned"):
            size = cfg.crop_size
            B = self._image(index, size, 0)
            A = np.sign(B) * np.abs(B) ** 0.5 if self.mode == "aligned" \
                else self._image(index, size, 1)
            return {"A": A.astype(np.float32), "B": B.astype(np.float32),
                    "A_paths": f"synthetic_{index}.png",
                    "B_paths": f"synthetic_{index}.png"}
        if self.mode == "sa":
            return {"z": self.rng.randn(cfg.z_dim).astype(np.float32),
                    "real_img": self._image(index, cfg.crop_size),
                    "img_path": f"synthetic_{index}.png"}
        if self.mode == "sr":
            hr = self._image(index, cfg.image_size)
            pil = Image.fromarray(
                ((hr + 1) / 2 * 255).astype(np.uint8))
            lr = pil.resize((cfg.image_size // cfg.upscale_factor,) * 2,
                            Image.BICUBIC)
            lr01 = np.asarray(lr, np.float32) / 255.0
            lr_in = (lr01 - IMAGENET_MEAN) / IMAGENET_STD
            return {"lr": lr_in.astype(np.float32),
                    "hr": hr.astype(np.float32),
                    "lr_names": f"synthetic_{index}.png",
                    "hr_names": f"synthetic_{index}.png"}
        raise NotImplementedError(self.mode)
