#!/usr/bin/env bash
# Round-4 budget notch (VERDICT r3 "Next round #8"): the exact r3_rehearsal
# 24 kHz recipe with the FM budget pushed 3,060 -> ~10k steps, same GAN
# budget per step count (gen-start 100 -> 460 G updates), so
# results/r3_rehearsal's rows become the low-budget points of a
# budget-vs-metric trend.
#
# Structured as FEW LONG epochs (train-repeat 150 -> 1,020 batches/epoch x
# 10 epochs) rather than 49 short ones: epoch-end processing (1.6 GB
# checkpoint fetch over the tunnel + f64 averaging) costs ~2-3 min each, so
# short epochs would spend more wall time on bookkeeping than on steps. The
# LR schedule depends only on the global batch count, so the trajectory is
# epoch-granularity-independent.
set -uo pipefail
cd /root/repo

R=/tmp/r4_budget
LOG=$R/drive.log
mkdir -p $R

stage=${1:-0}
stop=${2:-9}

if [ "$stage" -le 0 ] && [ "$stop" -ge 0 ]; then
  python scripts/make_rehearsal_corpus.py \
    --corpus-dir $R/LibriTTS --data-dir $R/manifests --train-repeat 150 \
    2>&1 | tee -a $LOG
fi

if [ "$stage" -le 2 ] && [ "$stop" -ge 2 ]; then
  ./run_libritts.sh --stage 2 --stop-stage 3 \
    --corpus-dir $R/LibriTTS --data-dir $R/manifests --exp-dir $R/exp \
    --model-name mel_24k_base --train-splits train_clean_100 \
    --fm-epochs 10 --fm-batch 16 --fm-avg 3 \
    --fm-extra-args "--valid-interval 2000 --save-every-n 1000000 --log-interval 200 --keep-last-k 4" \
    2>&1 | tee -a $LOG
  echo "FM rc=$?" | tee -a $LOG
fi

if [ "$stage" -le 4 ] && [ "$stop" -ge 4 ]; then
  ./run_libritts.sh --stage 4 --stop-stage 4 \
    --corpus-dir $R/LibriTTS --data-dir $R/manifests --exp-dir $R/exp \
    --model-name mel_24k_base --train-splits train_clean_100 \
    --fm-epochs 10 --fm-avg 3 \
    --gan-epochs 1 --gan-batch 16 --gan-avg 1 \
    --gan-extra-args "--gen-start-batch-idx 100 --valid-interval 800 --save-every-n 1000000 --log-interval 100 --remat-rollout true" \
    2>&1 | tee -a $LOG
  echo "GAN rc=$?" | tee -a $LOG
fi

if [ "$stage" -le 5 ] && [ "$stop" -ge 5 ]; then
  ./run_libritts.sh --stage 5 --stop-stage 6 \
    --corpus-dir $R/LibriTTS --data-dir $R/manifests --exp-dir $R/exp \
    --model-name mel_24k_base --train-splits train_clean_100 \
    --gan-epochs 1 \
    2>&1 | tee -a $LOG

  python -m flow2gan_tpu.bin.infer \
    --model-name mel_24k_base \
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

  python scripts/collect_minipipe_results.py \
    --exp-dir $R/exp --output-dir results/r4_budget \
    --steps 1 2 4 --extra fm:$R/exp/fm 2>&1 | tee -a $LOG
fi
echo "DRIVE_BUDGET_DONE $(date -u)" | tee -a $LOG
