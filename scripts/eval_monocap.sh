#!/bin/bash
# Parity: /root/reference/eval_monocap.sh
set -e
for seq in lan_images620_1300 marc_images35000_36200 olek_images0812 vlad_images1011; do
  python -m mygauhuman_tpu.cli.render \
    -m "output/monocap/${seq}" -s "data/monocap/${seq}" --iteration 2000 \
    --use_replay_cache --white_background
done
