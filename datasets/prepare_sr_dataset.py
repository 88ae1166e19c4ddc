"""Prepare the SRGAN data layout (reference: datasets/prepare_sr_dataset.py:
37-114): copy COCO train2014+val2014 images with min dimension > min_size
into <out>/train, and lay out Set5/Set14/B100/Urban100 test sets.

Usage:
  python prepare_sr_dataset.py --coco_dirs .../train2014 .../val2014 \
      --test_dirs .../Set5 .../Set14 .../B100 .../Urban100 --output_dir .../sr
"""

import argparse
import os
import shutil

from PIL import Image


def filter_copy(src_dirs, out_dir, min_size=96):
    os.makedirs(out_dir, exist_ok=True)
    kept = skipped = 0
    for d in src_dirs:
        for fname in sorted(os.listdir(d)):
            path = os.path.join(d, fname)
            try:
                with Image.open(path) as im:
                    w, h = im.size
            except OSError:
                skipped += 1
                continue
            if min(w, h) > min_size:
                shutil.copy(path, os.path.join(out_dir, fname))
                kept += 1
            else:
                skipped += 1
    print(f"{out_dir}: kept {kept}, skipped {skipped}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--coco_dirs", nargs="+", required=True)
    p.add_argument("--test_dirs", nargs="*", default=[])
    p.add_argument("--output_dir", required=True)
    p.add_argument("--min_size", type=int, default=96)
    a = p.parse_args()
    filter_copy(a.coco_dirs, os.path.join(a.output_dir, "train"), a.min_size)
    for d in a.test_dirs:
        name = os.path.basename(d.rstrip("/"))
        dst = os.path.join(a.output_dir, name)
        os.makedirs(dst, exist_ok=True)
        for fname in sorted(os.listdir(d)):
            shutil.copy(os.path.join(d, fname), os.path.join(dst, fname))
        print(f"copied test set {name}")
