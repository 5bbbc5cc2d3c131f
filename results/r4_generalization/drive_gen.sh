#!/usr/bin/env bash
# Round-4 GENERALIZATION rehearsal (VERDICT r3 "Next round #3"): train on a
# procedural speech-like corpus and score on held-out utterances whose
# parameter draws the model has NEVER seen (scripts/make_synthetic_corpus.py,
# disjoint seed ranges) — the first non-overfit quality evidence; matches the
# reference's held-out evaluation protocol (README.md:19, run_libritts.sh
# stage 5). Runs stages 1-6 on the real chip at r3_rehearsal-like scale.
set -uo pipefail
cd /root/repo

R=/tmp/r4_gen
LOG=$R/drive.log
mkdir -p $R

stage=${1:-0}
stop=${2:-9}

if [ "$stage" -le 0 ] && [ "$stop" -ge 0 ]; then
  python scripts/make_synthetic_corpus.py \
    --corpus-dir $R/LibriTTS --data-dir $R/manifests \
    --n-train 300 --n-test 20 --n-dev 4 --duration 3.0 --train-repeat 10 \
    2>&1 | tee -a $LOG
fi

if [ "$stage" -le 2 ] && [ "$stop" -ge 2 ]; then
  ./run_libritts.sh --stage 2 --stop-stage 3 \
    --corpus-dir $R/LibriTTS --data-dir $R/manifests --exp-dir $R/exp \
    --model-name mel_24k_base --train-splits train_clean_100 \
    --fm-epochs 16 --fm-batch 16 --fm-avg 3 \
    --fm-extra-args "--valid-interval 800 --save-every-n 1000000 --log-interval 100" \
    2>&1 | tee -a $LOG
  echo "FM rc=$?" | tee -a $LOG
fi

if [ "$stage" -le 4 ] && [ "$stop" -ge 4 ]; then
  ./run_libritts.sh --stage 4 --stop-stage 4 \
    --corpus-dir $R/LibriTTS --data-dir $R/manifests --exp-dir $R/exp \
    --model-name mel_24k_base --train-splits train_clean_100 \
    --fm-epochs 16 --fm-avg 3 \
    --gan-epochs 4 --gan-batch 16 --gan-avg 2 \
    --gan-extra-args "--gen-start-batch-idx 100 --valid-interval 800 --save-every-n 1000000 --log-interval 100 --remat-rollout true" \
    2>&1 | tee -a $LOG
  echo "GAN rc=$?" | tee -a $LOG
fi

if [ "$stage" -le 5 ] && [ "$stop" -ge 5 ]; then
  ./run_libritts.sh --stage 5 --stop-stage 6 \
    --corpus-dir $R/LibriTTS --data-dir $R/manifests --exp-dir $R/exp \
    --model-name mel_24k_base --train-splits train_clean_100 \
    --gan-epochs 4 \
    2>&1 | tee -a $LOG
  echo "STAGES56 rc=$?" | tee -a $LOG

  # FM-only row on the held-out split
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
    --exp-dir $R/exp --output-dir results/r4_generalization \
    --steps 1 2 4 --extra fm:$R/exp/fm 2>&1 | tee -a $LOG
fi
echo "DRIVE_GEN_DONE $(date -u)" | tee -a $LOG
