#!/usr/bin/env bash
python -m gcc_tpu.cli.test \
  --dataroot ./database/cityscapes/ \
  --model pix2pix \
  --ngf 32 \
  --pretrain_path ./experiments/cityscapes_ngf32scale3.0_darts_c50g1e4/checkpoints/model_best_BtoA.ckpt \
  --name cityscapes_test
