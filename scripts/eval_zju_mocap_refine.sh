#!/bin/bash
# Parity: /root/reference/eval_zju_mocap_refine.sh
set -e
for subject in my_377 my_386 my_387 my_392 my_393 my_394; do
  python -m mygauhuman_tpu.cli.render \
    -m "output/zju_mocap_refine/${subject}" \
    -s "data/zju_mocap_refine/${subject}" --iteration 1200 \
    --use_replay_cache --white_background
done
