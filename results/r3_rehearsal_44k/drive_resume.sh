#!/usr/bin/env bash
set -uo pipefail
cd /root/repo
R=/tmp/r3_44k
./run_libritts.sh --stage 4 --stop-stage 4 \
  --corpus-dir $R/LibriTTS --data-dir $R/manifests --exp-dir $R/exp \
  --model-name mel_44k_128band_512x_base --train-splits train_clean_100 \
  --fm-epochs 8 --fm-avg 3 \
  --n-timesteps-list "2 4" \
  --gan-epochs 4 --gan-batch 16 --gan-avg 2 \
  --gan-extra-args "--gen-start-batch-idx 100 --valid-interval 400 --save-every-n 1000000 --log-interval 50" \
  2>&1 | tee -a $R/drive.log
echo "RESUME_24_DONE rc=$?"
