#!/usr/bin/env bash
# stage 1: sparsity pretraining (reference scripts/pix2pix/pretrain_for_pruning.sh)
python -m gcc_tpu.cli.train \
  --dataroot ./database/cityscapes/ \
  --model pix2pix \
  --lambda_scale 1e-2 \
  --ngf 32 \
  --ndf 128 \
  --name cityscapes_ngf32_ndf128_scale1e-2
