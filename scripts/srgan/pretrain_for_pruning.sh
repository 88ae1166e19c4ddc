#!/usr/bin/env bash
python -m gcc_tpu.cli.train \
  --dataroot ./database/sr/ \
  --model srgan \
  --initial_path ./experiments/sr_ngf24/checkpoints/model_130.ckpt \
  --ngf 24 \
  --ndf 64 \
  --lambda_scale 1e-2 \
  --name sr_ngf24_scale1e-2
