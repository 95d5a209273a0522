#!/bin/bash
# Parity: /root/reference/train_monocap.sh (4 sequences, 2,000 iterations)
set -e
for seq in lan_images620_1300 marc_images35000_36200 olek_images0812 vlad_images1011; do
  python -m mygauhuman_tpu.cli.train \
    -s "data/monocap/${seq}" \
    --exp_name "monocap/${seq}" \
    --iterations 2000 --test_iterations 2000 --save_iterations 2000 \
    --motion_offset_flag --smpl_type smpl --white_background
done
