#!/usr/bin/env bash
# SR dataset fetch + layout (reference datasets/download_esrgan_dataset.sh:
# Flickr2K only, DIV2K commented out). This wrapper also pulls COCO and the
# Set5/Set14/B100/Urban100 evaluation archive, then builds the layout the
# SRDataset expects via prepare_sr_dataset.py.
#
# Usage: bash datasets/download_sr_dataset.sh [DATABASE_DIR]
set -e
DB="${1:-./database}"

python3 - "$DB" <<'EOF'
import sys
from gcc_tpu.utils.get_data import GetData
gd = GetData(technique="sr", save_path=sys.argv[1])
for name in gd.available():
    try:
        print(gd.get(name))
    except RuntimeError as e:
        print(f"SKIP {name}: {e}")
EOF

python3 datasets/prepare_sr_dataset.py \
    --coco_dirs "$DB/coco_train2014" "$DB/coco_val2014" \
    --test_dirs "$DB/sr_testsets" \
    --output_dir "$DB/sr" || true
