#!/usr/bin/env bash
# Token family on the HELD-OUT protocol + GAN stage (VERDICT r4 #7):
# retrain token_24k_base on the synthetic generalization corpus (disjoint
# seed ranges, scripts/make_synthetic_corpus.py — the same corpus as
# ../r4_generalization) instead of the overfit rehearsal corpus, then run
# ONE GAN step-count on top of the token FM checkpoint to show stage 2
# composes with token conditioning. Matches the reference CondEncoder
# "codec embeddings" intent (modules.py:499) + gan.py:30-166.
#
# FAIL-CLOSED: set -e; metric scripts/collector exit nonzero on empty
# results; pathspec-scoped commits after the collector.
#
# Stages: 1 preflight+sweep | 2 tokenizer+FM train | 3 FM tokens-only rows
#         + commit | 4 GAN 1-step on tokens + commit
# Usage: drive_token_gen.sh [start_stage] [stop_stage]
set -euo pipefail
cd /root/repo

R=/tmp/r5_token_gen
G=/tmp/r4_gen            # shared synthetic corpus + manifests
LOG=$R/drive.log
OUT=results/r5_token_gen
M=token_24k_base
mkdir -p $R

stage=${1:-1}
stop=${2:-9}

has_rows() {  # has_rows FILE -> success when FILE exists with n_files > 0
  python -c "
import json, sys, os
p = sys.argv[1]
ok = os.path.exists(p) and json.load(open(p)).get('summary', {}).get('n_files', 0) > 0
sys.exit(0 if ok else 1)
" "$1"
}

commit_results() {
  git add "$OUT"
  # Idempotent on re-runs: a regenerated row that is bit-identical to the
  # committed one stages nothing — skip loudly instead of dying on the empty
  # commit. The fail-closed guarantee lives in the collector (exits nonzero
  # on empty metrics), not here.
  if git diff --cached --quiet -- "$OUT"; then
    echo "SKIP COMMIT (no changes vs HEAD): $1" | tee -a $LOG
    return 0
  fi
  git commit -q -m "$1

No-Verification-Needed: results-only evidence artifact, no runtime code" \
    -- "$OUT"
  echo "COMMITTED: $1" | tee -a $LOG
}

if [ "$stage" -le 1 ] && [ "$stop" -ge 1 ]; then
  scripts/preflight_pipeline.sh /tmp/preflight_token 2>&1 | tail -2 | tee -a $LOG
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/compile_sweep.py \
    --models token_24k_base --batches 1 8 16 --durations 1.0 3.0 \
    --n-timesteps 1 2>&1 | tee -a $LOG
fi

if [ "$stage" -le 2 ] && [ "$stop" -ge 2 ]; then
  if [ ! -f $G/manifests_fm/libritts_recordings_test_clean.jsonl.gz ]; then
    python scripts/make_synthetic_corpus.py \
      --corpus-dir $G/LibriTTS --data-dir $G/manifests_fm \
      --n-train 300 --n-test 20 --n-dev 4 --duration 3.0 --train-repeat 80 \
      2>&1 | tee -a $LOG
    python scripts/make_synthetic_corpus.py \
      --corpus-dir $G/LibriTTS --data-dir $G/manifests_gan \
      --n-train 300 --n-test 20 --n-dev 4 --duration 3.0 --train-repeat 40 \
      2>&1 | tee -a $LOG
  fi
  if [ ! -f $R/tokenizer_1024.npz ]; then
    python scripts/train_tokenizer.py \
      --model-name $M \
      --recordings $G/manifests_gan/libritts_recordings_train_clean_100.jsonl.gz \
      --output $R/tokenizer_1024.npz 2>&1 | tee -a $LOG
  fi
  if [ ! -f $R/exp/fm/averaged.ckpt ]; then
    python -m flow2gan_tpu.bin.pretrain \
      --exp-dir $R/exp/fm --model-name $M \
      --tokenizer $R/tokenizer_1024.npz \
      --train-recordings $G/manifests_fm/libritts_recordings_train_clean_100.jsonl.gz \
      --valid-recordings $G/manifests_fm/libritts_recordings_dev_clean.jsonl.gz \
      --num-epochs 4 --batch-size 16 --base-lr 0.035 --lr-batches 7500 \
      --duration 1.5 \
      --valid-interval 100000 --save-every-n 1000000 --log-interval 200 \
      --keep-last-k 3 2>&1 | tee -a $LOG
    python -m flow2gan_tpu.bin.save_averaged_model \
      --exp-dir $R/exp/fm --epoch 4 --avg 2 \
      --output $R/exp/fm/averaged.ckpt 2>&1 | tee -a $LOG
  fi
fi

if [ "$stage" -le 3 ] && [ "$stop" -ge 3 ]; then
  # tokens-only reconstruction of utterances the model has NEVER seen
  for n in 1 2 4; do
    if ! has_rows $R/exp/fm_${n}step/metrics_pitch.json; then
      python -m flow2gan_tpu.bin.infer \
        --model-name $M --tokenizer $R/tokenizer_1024.npz \
        --checkpoint $R/exp/fm/averaged.ckpt \
        --recordings $G/manifests_fm/libritts_recordings_test_clean.jsonl.gz \
        --root-path $G/LibriTTS \
        --output-dir $R/exp/fm_${n}step/test_clean_wavs \
        --n-timesteps $n 2>&1 | tee -a $LOG
      python scripts/compute_pesq_visqol.py \
        --ref-dir $G/LibriTTS/test-clean \
        --gen-dir $R/exp/fm_${n}step/test_clean_wavs/test-clean \
        --output $R/exp/fm_${n}step/metrics_pesq.json 2>&1 | tee -a $LOG
      python scripts/compute_pitch_periodicity.py \
        --ref-dir $G/LibriTTS/test-clean \
        --gen-dir $R/exp/fm_${n}step/test_clean_wavs/test-clean \
        --output $R/exp/fm_${n}step/metrics_pitch.json 2>&1 | tee -a $LOG
    fi
  done
  python scripts/collect_minipipe_results.py \
    --exp-dir $R/exp --output-dir $OUT --steps 1 2 4 \
    --extra fm_1step:$R/exp/fm_1step fm_2step:$R/exp/fm_2step \
            fm_4step:$R/exp/fm_4step 2>&1 | tee -a $LOG
  commit_results "r5_token_gen: held-out tokens-only FM rows (n=1/2/4)"
fi

if [ "$stage" -le 4 ] && [ "$stop" -ge 4 ]; then
  n=1
  if [ ! -f $R/exp/gan_${n}step/epoch-1.ckpt ]; then
    python -m flow2gan_tpu.bin.finetune \
      --exp-dir $R/exp/gan_${n}step --model-name $M \
      --tokenizer $R/tokenizer_1024.npz \
      --generator-model-path $R/exp/fm/averaged.ckpt \
      --n-timesteps $n --num-epochs 1 --batch-size 16 \
      --train-recordings $G/manifests_gan/libritts_recordings_train_clean_100.jsonl.gz \
      --valid-recordings $G/manifests_gan/libritts_recordings_dev_clean.jsonl.gz \
      --gen-start-batch-idx 100 --valid-interval 100000 \
      --save-every-n 1000000 --log-interval 100 --remat-rollout true \
      2>&1 | tee -a $LOG
  fi
  if [ ! -f $R/exp/gan_${n}step/generator.ckpt ]; then
    python -m flow2gan_tpu.bin.save_averaged_model \
      --exp-dir $R/exp/gan_${n}step --epoch 1 --avg 1 \
      --load-gan true \
      --output $R/exp/gan_${n}step/generator.ckpt 2>&1 | tee -a $LOG
  fi
  if ! has_rows $R/exp/gan_${n}step/metrics_pitch.json; then
    python -m flow2gan_tpu.bin.infer \
      --model-name $M --tokenizer $R/tokenizer_1024.npz \
      --checkpoint $R/exp/gan_${n}step/generator.ckpt \
      --recordings $G/manifests_fm/libritts_recordings_test_clean.jsonl.gz \
      --root-path $G/LibriTTS \
      --output-dir $R/exp/gan_${n}step/test_clean_wavs \
      --n-timesteps $n 2>&1 | tee -a $LOG
    python scripts/compute_pesq_visqol.py \
      --ref-dir $G/LibriTTS/test-clean \
      --gen-dir $R/exp/gan_${n}step/test_clean_wavs/test-clean \
      --output $R/exp/gan_${n}step/metrics_pesq.json 2>&1 | tee -a $LOG
    python scripts/compute_pitch_periodicity.py \
      --ref-dir $G/LibriTTS/test-clean \
      --gen-dir $R/exp/gan_${n}step/test_clean_wavs/test-clean \
      --output $R/exp/gan_${n}step/metrics_pitch.json 2>&1 | tee -a $LOG
  fi
  python scripts/collect_minipipe_results.py \
    --exp-dir $R/exp --output-dir $OUT --steps 1 \
    --extra fm_1step:$R/exp/fm_1step fm_2step:$R/exp/fm_2step \
            fm_4step:$R/exp/fm_4step gan_1step:$R/exp/gan_${n}step \
    2>&1 | tee -a $LOG
  commit_results "r5_token_gen: GAN 1-step row on held-out tokens-only synthesis"
fi
echo "DRIVE_TOKEN_GEN_DONE $(date -u)" | tee -a $LOG
