#!/usr/bin/env bash
python -m gcc_tpu.cli.train \
  --dataroot ./database/horse2zebra/ \
  --model cyclegan \
  --lambda_weight 1e-3 \
  --ndf 64 \
  --ngf 48 \
  --name horse2zebra_ngf24_ndf64_norm1e-3
