"""Convert cityscapes gtFine labelIds maps to 19-class trainIds maps
(reference: datasets/get_trainIds.py:87-136), as consumed by the mIoU
evaluator. Unlabeled/ignored classes map to 255.

Usage: python get_trainIds.py --gtFine_dir .../gtFine
"""

import argparse
import glob
import os

import numpy as np
from PIL import Image

# official cityscapes labelId -> trainId mapping (19 evaluation classes)
ID_TO_TRAINID = {7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7,
                 21: 8, 22: 9, 23: 10, 24: 11, 25: 12, 26: 13, 27: 14,
                 28: 15, 31: 16, 32: 17, 33: 18}


def convert(label_path: str) -> None:
    arr = np.asarray(Image.open(label_path), np.uint8)
    out = np.full_like(arr, 255)
    for lid, tid in ID_TO_TRAINID.items():
        out[arr == lid] = tid
    Image.fromarray(out).save(label_path.replace("_labelIds", "_trainIds"))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--gtFine_dir", required=True)
    a = p.parse_args()
    paths = sorted(glob.glob(os.path.join(
        a.gtFine_dir, "*", "*", "*_labelIds.png")))
    for i, path in enumerate(paths):
        convert(path)
        if i % 200 == 0:
            print(f"{i}/{len(paths)}")
