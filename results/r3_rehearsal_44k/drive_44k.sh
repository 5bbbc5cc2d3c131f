#!/usr/bin/env bash
# Round-3 44.1 kHz GAN-stage rehearsal (VERDICT r2 "Next round #6"):
# stages 2-6 for mel_44k_128band_512x_base at rehearsal scale on the chip.
set -euo pipefail
cd /root/repo

R=/tmp/r3_44k
LOG=$R/drive.log

stage=${1:-1}
stop=${2:-6}
mkdir -p $R

if [ "$stage" -le 1 ] && [ "$stop" -ge 1 ]; then
  # 44.1 kHz rehearsal corpus: the bundled 24 kHz reference test audio
  # resampled to 44.1 kHz, same crop/repeat recipe as results/r3_rehearsal
  # (109 dense 2 s train crops x30 repeats = 3270, 7-file test split).
  python scripts/make_rehearsal_corpus.py \
    --corpus-dir $R/LibriTTS --data-dir $R/manifests \
    --resample-to 44100 --train-repeat 30 \
    2>&1 | tee -a $LOG
fi

if [ "$stage" -le 2 ] && [ "$stop" -ge 2 ]; then
  ./run_libritts.sh --stage 2 --stop-stage 3 \
    --corpus-dir $R/LibriTTS --data-dir $R/manifests --exp-dir $R/exp \
    --model-name mel_44k_128band_512x_base --train-splits train_clean_100 \
    --fm-epochs 8 --fm-batch 16 --fm-avg 3 \
    --fm-extra-args "--valid-interval 400 --save-every-n 1000000 --log-interval 50" \
    2>&1 | tee -a $LOG
fi

if [ "$stage" -le 4 ] && [ "$stop" -ge 4 ]; then
  ./run_libritts.sh --stage 4 --stop-stage 4 \
    --corpus-dir $R/LibriTTS --data-dir $R/manifests --exp-dir $R/exp \
    --model-name mel_44k_128band_512x_base --train-splits train_clean_100 \
    --fm-epochs 8 --fm-avg 3 \
    --gan-epochs 4 --gan-batch 16 --gan-avg 2 \
    --gan-extra-args "--gen-start-batch-idx 100 --valid-interval 400 --save-every-n 1000000 --log-interval 50" \
    2>&1 | tee -a $LOG
fi

if [ "$stage" -le 5 ] && [ "$stop" -ge 5 ]; then
  ./run_libritts.sh --stage 5 --stop-stage 6 \
    --corpus-dir $R/LibriTTS --data-dir $R/manifests --exp-dir $R/exp \
    --model-name mel_44k_128band_512x_base --train-splits train_clean_100 \
    --gan-epochs 4 \
    2>&1 | tee -a $LOG

  python -m flow2gan_tpu.bin.infer \
    --model-name mel_44k_128band_512x_base \
    --checkpoint $R/exp/fm/averaged.ckpt \
    --recordings $R/manifests/libritts_recordings_test_clean.jsonl.gz \
    --root-path $R/LibriTTS \
    --output-dir $R/exp/fm/test_clean_wavs \
    --n-timesteps 1 2>&1 | tee -a $LOG
  python scripts/compute_pesq_visqol.py \
    --ref-dir $R/LibriTTS/test-clean --gen-dir $R/exp/fm/test_clean_wavs/test-clean \
    --output $R/exp/fm/metrics_pesq.json || true
  python scripts/compute_pitch_periodicity.py \
    --ref-dir $R/LibriTTS/test-clean --gen-dir $R/exp/fm/test_clean_wavs/test-clean \
    --output $R/exp/fm/metrics_pitch.json || true
fi
echo "DRIVE_44K_DONE rc=0"
