#!/usr/bin/env bash
# Directory-inference smoke runs (mirror of /root/reference/infer_dir.sh):
# audio mode, mel mode, and streaming chunked mode on the bundled fixtures.
set -euo pipefail

ckpt_arg=()
if [ "${1:-}" != "" ]; then ckpt_arg=(--checkpoint "$1"); fi

python -m flow2gan_tpu.bin.infer_dir "${ckpt_arg[@]}" \
  --input-dir /root/reference/test_data/wav --output-dir out_wav \
  --n-timesteps 4

python -m flow2gan_tpu.bin.infer_dir "${ckpt_arg[@]}" \
  --input-dir /root/reference/test_data/mel --output-dir out_mel \
  --mel true --n-timesteps 4

python -m flow2gan_tpu.bin.infer_dir "${ckpt_arg[@]}" \
  --input-dir /root/reference/test_data/wav --output-dir out_stream \
  --n-timesteps 4 --chunk-size 100
