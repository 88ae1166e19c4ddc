#!/usr/bin/env bash
# usage: bash download_cyclegan_dataset.sh horse2zebra
python -c "from gcc_tpu.utils.get_data import GetData; GetData('cyclegan', './database').get('$1')"
