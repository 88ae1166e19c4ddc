#!/usr/bin/env bash
# usage: bash download_pix2pix_dataset.sh cityscapes
python -c "from gcc_tpu.utils.get_data import GetData; GetData('pix2pix', './database').get('$1')"
