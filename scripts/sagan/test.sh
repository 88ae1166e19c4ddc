#!/usr/bin/env bash
python -m gcc_tpu.cli.test \
  --dataroot ./database/celeb/ \
  --model sagan \
  --ngf 48 \
  --pretrain_path ./experiments/celeb_ngf48scale16.0_dartsT0.1_l0c1g1/checkpoints/model_best_AtoB.ckpt \
  --name sagan_test
