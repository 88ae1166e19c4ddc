"""Build the pix2pix/cyclegan cityscapes layout from the official zips
(reference: datasets/prepare_cityscapes_dataset.py:31-77).

Outputs per phase: <out>/<phase>/<i>.jpg (512x256 side-by-side, photo left /
label right), <out>/<phase>A/<i>_A.jpg photos, <out>/<phase>B/<i>_B.jpg
labels, plus table.txt rows "<i> <trainIds label relpath> <photo relpath>"
consumed by the mIoU evaluator (gcc_tpu/metrics/miou.py).

Usage:
  python prepare_cityscapes_dataset.py --gtFine_dir .../gtFine \
      --leftImg8bit_dir .../leftImg8bit --output_dir .../cityscapes \
      --table_path .../cityscapes/table.txt
"""

import argparse
import glob
import os

from PIL import Image


def load_resized(path):
    return Image.open(path).convert("RGB").resize((256, 256))


def process(gtFine_dir, leftImg8bit_dir, output_dir, phase, table_path=None):
    savedir = os.path.join(output_dir, phase)
    os.makedirs(savedir, exist_ok=True)
    os.makedirs(savedir + "A", exist_ok=True)
    os.makedirs(savedir + "B", exist_ok=True)

    segmaps = sorted(glob.glob(
        os.path.join(gtFine_dir, phase, "*", "*_color.png")))
    photos = sorted(glob.glob(
        os.path.join(leftImg8bit_dir, phase, "*", "*_leftImg8bit.png")))
    assert len(segmaps) == len(photos), \
        f"{len(segmaps)} segmaps vs {len(photos)} photos"

    table = open(table_path, "w") if table_path else None
    for i, (seg_path, photo_path) in enumerate(zip(segmaps, photos)):
        seg_id = os.path.basename(seg_path).replace("_gtFine_color", "")
        photo_id = os.path.basename(photo_path).replace("_leftImg8bit", "")
        assert seg_id == photo_id, f"mismatch: {seg_path} vs {photo_path}"
        seg, photo = load_resized(seg_path), load_resized(photo_path)
        pair = Image.new("RGB", (512, 256))
        pair.paste(photo, (0, 0))
        pair.paste(seg, (256, 0))
        pair.save(os.path.join(savedir, f"{i}.jpg"), format="JPEG",
                  subsampling=0, quality=100)
        photo.save(os.path.join(savedir + "A", f"{i}_A.jpg"), format="JPEG",
                   subsampling=0, quality=100)
        seg.save(os.path.join(savedir + "B", f"{i}_B.jpg"), format="JPEG",
                 subsampling=0, quality=100)
        if table:
            rel_seg = os.path.relpath(
                seg_path, os.path.dirname(os.path.abspath(gtFine_dir)))
            rel_photo = os.path.relpath(
                photo_path, os.path.dirname(os.path.abspath(leftImg8bit_dir)))
            table.write(f"{i} {rel_seg.replace('_color', '_trainIds')} "
                        f"{rel_photo}\n")
        if i % 100 == 0:
            print(f"{phase}: {i}/{len(segmaps)}")
    if table:
        table.close()


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--gtFine_dir", required=True)
    p.add_argument("--leftImg8bit_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--table_path", default=None)
    a = p.parse_args()
    process(a.gtFine_dir, a.leftImg8bit_dir, a.output_dir, "val",
            a.table_path)
    process(a.gtFine_dir, a.leftImg8bit_dir, a.output_dir, "train")
