"""Combine paired A/ and B/ folders into side-by-side AB images for the
aligned dataset (reference: datasets/combine_A_and_B.py).

Usage: python combine_A_and_B.py --fold_A .../A --fold_B .../B --fold_AB .../AB
"""

import argparse
import os

import numpy as np
from PIL import Image

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--fold_A", required=True)
    p.add_argument("--fold_B", required=True)
    p.add_argument("--fold_AB", required=True)
    a = p.parse_args()
    for phase in sorted(os.listdir(a.fold_A)):
        dir_A = os.path.join(a.fold_A, phase)
        dir_B = os.path.join(a.fold_B, phase)
        if not os.path.isdir(dir_A):
            continue
        dir_AB = os.path.join(a.fold_AB, phase)
        os.makedirs(dir_AB, exist_ok=True)
        for fname in sorted(os.listdir(dir_A)):
            pa = os.path.join(dir_A, fname)
            pb = os.path.join(dir_B, fname.replace("_A", "_B"))
            if not os.path.exists(pb):
                continue
            im_A = np.asarray(Image.open(pa).convert("RGB"))
            im_B = np.asarray(Image.open(pb).convert("RGB"))
            Image.fromarray(np.concatenate([im_A, im_B], axis=1)).save(
                os.path.join(dir_AB, fname.replace("_A", "")))
        print(f"combined {phase}")
