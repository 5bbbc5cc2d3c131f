#!/usr/bin/env bash
# Round-4 budget notch (VERDICT r3 "Next round #8"): the r3_rehearsal 24 kHz
# recipe with the FM budget pushed 3,060 -> ~6-10k steps, so
# results/r3_rehearsal's rows become the low-budget points of a
# budget-vs-metric trend. The corpus generator is deterministic, so the test
# split is IDENTICAL to r3_rehearsal's 7 files and rows are comparable.
#
# Structured for incremental value under a bounded chip window:
#   stage 0  corpus (CPU)
#   stage 2  FM pretrain ($FM_EPOCHS x 1,020 batches; train-repeat 150
#            amortizes the ~2-3 min epoch-end checkpoint cost that made
#            49 short epochs uneconomical — the LR schedule depends only on
#            the global batch count, so the trajectory is
#            epoch-granularity-independent) + averaged export
#   stage 3  FM-only inference + metrics + collect   <- first publishable row
#   stage 4  GAN 1-step at the r3 budget (gen-start 100 -> 460 G updates;
#            1-step is where r3 saw the pitch-RMSE inversion vs FM-only)
#   stage 5  GAN 1-step inference + metrics + collect
# Usage: drive_budget.sh [start_stage] [stop_stage] [fm_epochs]
set -uo pipefail
cd /root/repo

R=/tmp/r4_budget
LOG=$R/drive.log
mkdir -p $R

stage=${1:-0}
stop=${2:-9}
FM_EPOCHS=${3:-6}

commit_results() {
  git add results/r4_budget && git commit -q -m "$1

No-Verification-Needed: results-only evidence artifact, no runtime code" \
    && echo "COMMITTED: $1" | tee -a $LOG
}

if [ "$stage" -le 0 ] && [ "$stop" -ge 0 ]; then
  python scripts/make_rehearsal_corpus.py \
    --corpus-dir $R/LibriTTS --data-dir $R/manifests --train-repeat 150 \
    2>&1 | tee -a $LOG
fi

if [ "$stage" -le 2 ] && [ "$stop" -ge 2 ]; then
  ./run_libritts.sh --stage 2 --stop-stage 3 \
    --corpus-dir $R/LibriTTS --data-dir $R/manifests --exp-dir $R/exp \
    --model-name mel_24k_base --train-splits train_clean_100 \
    --fm-epochs $FM_EPOCHS --fm-batch 16 --fm-avg 2 \
    --fm-extra-args "--valid-interval 2000 --save-every-n 1000000 --log-interval 200 --keep-last-k 3" \
    2>&1 | tee -a $LOG
  echo "FM rc=$?" | tee -a $LOG
fi

if [ "$stage" -le 3 ] && [ "$stop" -ge 3 ]; then
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
    --steps 1 --extra fm:$R/exp/fm 2>&1 | tee -a $LOG
  commit_results "r4_budget: 6k-step FM row (budget trend vs r3_rehearsal's 3,060 steps)"
  echo "FM_METRICS_DONE" | tee -a $LOG
fi

if [ "$stage" -le 4 ] && [ "$stop" -ge 4 ]; then
  ./run_libritts.sh --stage 4 --stop-stage 4 \
    --corpus-dir $R/LibriTTS --data-dir $R/manifests --exp-dir $R/exp \
    --model-name mel_24k_base --train-splits train_clean_100 \
    --fm-epochs $FM_EPOCHS --fm-avg 2 \
    --n-timesteps-list "1" \
    --gan-epochs 1 --gan-batch 16 --gan-avg 1 \
    --gan-extra-args "--gen-start-batch-idx 100 --valid-interval 800 --save-every-n 1000000 --log-interval 100 --remat-rollout true" \
    2>&1 | tee -a $LOG
  echo "GAN rc=$?" | tee -a $LOG
fi

if [ "$stage" -le 5 ] && [ "$stop" -ge 5 ]; then
  ./run_libritts.sh --stage 5 --stop-stage 6 \
    --corpus-dir $R/LibriTTS --data-dir $R/manifests --exp-dir $R/exp \
    --model-name mel_24k_base --train-splits train_clean_100 \
    --n-timesteps-list "1" \
    --gan-epochs 1 \
    2>&1 | tee -a $LOG
  python scripts/collect_minipipe_results.py \
    --exp-dir $R/exp --output-dir results/r4_budget \
    --steps 1 --extra fm:$R/exp/fm 2>&1 | tee -a $LOG
  commit_results "r4_budget: GAN 1-step row at the r3 G budget on the 6k-step FM init"
fi
echo "DRIVE_BUDGET_DONE $(date -u)" | tee -a $LOG
