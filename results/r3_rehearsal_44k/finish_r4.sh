#!/usr/bin/env bash
# Round-4 finish of the 44.1 kHz rehearsal (VERDICT r3 "Next round #2"):
# today's fresh drive_44k.sh rerun completed FM(8 epochs) + 1-step + 2-step
# GAN stages all-on-chip, then the 4-step G-step OOM'd HBM (16.13 GB needed
# vs 15.75 — the unremattered scanned rollout stores 4 steps of residuals).
# This script reruns the 4-step stage with --remat-rollout true (scan-body
# remat, residuals ~1 step) and then stages 5-6 for all rows + the FM row.
set -uo pipefail
cd /root/repo

R=/tmp/r3_44k
LOG=$R/finish_r4.log
M=mel_44k_128band_512x_base

echo "=== finish_r4 start $(date -u) ===" | tee -a $LOG

# fresh 4-step exp dir (the OOM'd attempt only left log/tensorboard)
rm -rf $R/exp/gan_4step

./run_libritts.sh --stage 4 --stop-stage 4 \
  --corpus-dir $R/LibriTTS --data-dir $R/manifests --exp-dir $R/exp \
  --model-name $M --train-splits train_clean_100 \
  --n-timesteps-list "4" \
  --fm-epochs 8 --fm-avg 3 \
  --gan-epochs 4 --gan-batch 16 --gan-avg 2 \
  --gan-extra-args "--gen-start-batch-idx 100 --valid-interval 400 --save-every-n 1000000 --log-interval 50 --remat-rollout true" \
  2>&1 | tee -a $LOG
echo "4STEP_STAGE rc=$?" | tee -a $LOG

# stages 5-6 for all three GAN rows (1/2-step generators were exported today)
./run_libritts.sh --stage 5 --stop-stage 6 \
  --corpus-dir $R/LibriTTS --data-dir $R/manifests --exp-dir $R/exp \
  --model-name $M --train-splits train_clean_100 \
  --n-timesteps-list "1 2 4" --gan-epochs 4 \
  2>&1 | tee -a $LOG
echo "STAGES56 rc=$?" | tee -a $LOG

# FM-only row
python -m flow2gan_tpu.bin.infer \
  --model-name $M \
  --checkpoint $R/exp/fm/averaged.ckpt \
  --recordings $R/manifests/libritts_recordings_test_clean.jsonl.gz \
  --root-path $R/LibriTTS \
  --output-dir $R/exp/fm/test_clean_wavs \
  --n-timesteps 1 2>&1 | tee -a $LOG
python scripts/compute_pesq_visqol.py \
  --ref-dir $R/LibriTTS/test-clean --gen-dir $R/exp/fm/test_clean_wavs/test-clean \
  --output $R/exp/fm/metrics_pesq.json 2>&1 | tee -a $LOG || true
python scripts/compute_pitch_periodicity.py \
  --ref-dir $R/LibriTTS/test-clean --gen-dir $R/exp/fm/test_clean_wavs/test-clean \
  --output $R/exp/fm/metrics_pitch.json 2>&1 | tee -a $LOG || true
echo "FM_ROW rc=$?" | tee -a $LOG

python scripts/collect_minipipe_results.py \
  --exp-dir $R/exp --output-dir results/r3_rehearsal_44k \
  --steps 1 2 4 --extra fm:$R/exp/fm 2>&1 | tee -a $LOG
echo "FINISH_R4_DONE $(date -u)" | tee -a $LOG
