#!/usr/bin/env bash
# Round-3 24k quality rehearsal: FM ~3060 steps, then EQUAL GAN budgets per
# step count (~1020 steps each: 100 D-warmup + 460 D/G pairs), then infer +
# metrics for fm_only and gan_{1,2,4}step. VERDICT r2 "Next round #1".
set -euo pipefail
cd /root/repo

R3=/tmp/r3
LOG=$R3/drive.log
mkdir -p $R3

stage=${1:-2}
stop=${2:-6}

if [ "$stage" -le 2 ] && [ "$stop" -ge 2 ]; then
  ./run_libritts.sh --stage 2 --stop-stage 3 \
    --corpus-dir $R3/LibriTTS --data-dir $R3/manifests --exp-dir $R3/exp \
    --train-splits train_clean_100 \
    --fm-epochs 15 --fm-batch 16 --fm-avg 5 \
    --fm-extra-args "--valid-interval 400 --save-every-n 1000000 --log-interval 50" \
    2>&1 | tee -a $LOG
fi

if [ "$stage" -le 4 ] && [ "$stop" -ge 4 ]; then
  ./run_libritts.sh --stage 4 --stop-stage 4 \
    --corpus-dir $R3/LibriTTS --data-dir $R3/manifests --exp-dir $R3/exp \
    --train-splits train_clean_100 \
    --fm-epochs 15 --fm-avg 5 \
    --gan-epochs 5 --gan-batch 16 --gan-avg 2 \
    --gan-extra-args "--gen-start-batch-idx 100 --valid-interval 400 --save-every-n 1000000 --log-interval 50" \
    2>&1 | tee -a $LOG
fi

if [ "$stage" -le 5 ] && [ "$stop" -ge 5 ]; then
  ./run_libritts.sh --stage 5 --stop-stage 6 \
    --corpus-dir $R3/LibriTTS --data-dir $R3/manifests --exp-dir $R3/exp \
    --train-splits train_clean_100 --gan-epochs 5 \
    2>&1 | tee -a $LOG

  # fm_only baseline: infer with the averaged FM model at 1 step
  python -m flow2gan_tpu.bin.infer \
    --model-name mel_24k_base \
    --checkpoint $R3/exp/fm/averaged.ckpt \
    --recordings $R3/manifests/libritts_recordings_test_clean.jsonl.gz \
    --root-path $R3/LibriTTS \
    --output-dir $R3/exp/fm/test_clean_wavs \
    --n-timesteps 1 2>&1 | tee -a $LOG
  python scripts/compute_pesq_visqol.py \
    --ref-dir $R3/LibriTTS/test-clean --gen-dir $R3/exp/fm/test_clean_wavs/test-clean \
    --output $R3/exp/fm/metrics_pesq.json || true
  python scripts/compute_pitch_periodicity.py \
    --ref-dir $R3/LibriTTS/test-clean --gen-dir $R3/exp/fm/test_clean_wavs/test-clean \
    --output $R3/exp/fm/metrics_pitch.json || true
fi
echo "DRIVE_24K_DONE rc=0"
