#!/usr/bin/env bash
python -m gcc_tpu.cli.test \
  --dataroot ./database/horse2zebra/ \
  --model cyclegan \
  --ngf 24 \
  --pretrain_path ./experiments/cyclegan_ngf24norm2.4_ndf32_c0.01g1000/checkpoints/model_best_AtoB.ckpt \
  --name cyclegan_test
