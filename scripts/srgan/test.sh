#!/usr/bin/env bash
python -m gcc_tpu.cli.test \
  --dataroot ./database/sr \
  --model srgan \
  --ngf 24 \
  --pretrain_path ./experiments/sr_ngf24scale0.2_darts_l1c0.1g0.1/checkpoints/model_best_Set5_psnr.ckpt \
  --name srgan_test
