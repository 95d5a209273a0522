#!/bin/bash
# Experiment config parity: /root/reference/train_zju_mocap_refine.sh
# (6 ZJU-MoCap-refine subjects, 1,200 iterations each)
set -e
for subject in my_377 my_386 my_387 my_392 my_393 my_394; do
  python -m mygauhuman_tpu.cli.train \
    -s "data/zju_mocap_refine/${subject}" \
    --exp_name "zju_mocap_refine/${subject}" \
    --iterations 1200 --test_iterations 1200 --save_iterations 1200 \
    --motion_offset_flag --smpl_type smpl --white_background
done
