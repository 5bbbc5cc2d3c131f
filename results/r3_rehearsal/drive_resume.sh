#!/usr/bin/env bash
# Resume the round-3 24k rehearsal after the scan-rollout fix:
# stage 4 for n=2,4 (1-step already done), then stages 5-6 for all + fm baseline.
set -uo pipefail
cd /root/repo
R3=/tmp/r3
LOG=$R3/drive.log

./run_libritts.sh --stage 4 --stop-stage 4 \
  --corpus-dir $R3/LibriTTS --data-dir $R3/manifests --exp-dir $R3/exp \
  --train-splits train_clean_100 --n-timesteps-list "2 4" \
  --fm-epochs 15 --fm-avg 5 \
  --gan-epochs 5 --gan-batch 16 --gan-avg 2 \
  --gan-extra-args "--gen-start-batch-idx 100 --valid-interval 400 --save-every-n 1000000 --log-interval 50" \
  2>&1 | tee -a $LOG
echo "STAGE4_RC=$?" | tee -a $LOG

./run_libritts.sh --stage 5 --stop-stage 6 \
  --corpus-dir $R3/LibriTTS --data-dir $R3/manifests --exp-dir $R3/exp \
  --train-splits train_clean_100 --gan-epochs 5 \
  2>&1 | tee -a $LOG
echo "STAGE56_RC=$?" | tee -a $LOG

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
  --output $R3/exp/fm/metrics_pesq.json 2>&1 | tee -a $LOG || true
python scripts/compute_pitch_periodicity.py \
  --ref-dir $R3/LibriTTS/test-clean --gen-dir $R3/exp/fm/test_clean_wavs/test-clean \
  --output $R3/exp/fm/metrics_pitch.json 2>&1 | tee -a $LOG || true
python scripts/compute_fsd.py \
  --ref-dir $R3/LibriTTS/test-clean --gen-dir $R3/exp/fm/test_clean_wavs/test-clean \
  --output $R3/exp/fm/metrics_fsd.json 2>&1 | tee -a $LOG || true
echo "DRIVE_RESUME_DONE" | tee -a $LOG
