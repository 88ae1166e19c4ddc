"""Re-align a pix2pix-style dataset folder (reference:
datasets/make_dataset_aligned.py): finds <root>/<phase>A and <phase>B image
pairs and writes side-by-side AB images into <root>/<phase>.

Usage: python make_dataset_aligned.py --dataset-path .../mydataset
"""

import argparse
import os

import numpy as np
from PIL import Image


def align(root: str) -> None:
    for phase in ("train", "val", "test"):
        da, db = os.path.join(root, phase + "A"), os.path.join(root, phase + "B")
        if not (os.path.isdir(da) and os.path.isdir(db)):
            continue
        out = os.path.join(root, phase)
        os.makedirs(out, exist_ok=True)
        for fname in sorted(os.listdir(da)):
            pa = os.path.join(da, fname)
            pb = os.path.join(db, fname.replace("_A", "_B"))
            if not os.path.exists(pb):
                continue
            a = Image.open(pa).convert("RGB")
            b = Image.open(pb).convert("RGB").resize(a.size)
            Image.fromarray(np.concatenate(
                [np.asarray(a), np.asarray(b)], axis=1)).save(
                os.path.join(out, fname.replace("_A", "")))
        print(f"aligned {phase}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dataset-path", required=True)
    align(p.parse_args().dataset_path)
