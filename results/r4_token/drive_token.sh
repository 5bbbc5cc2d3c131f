#!/usr/bin/env bash
# Round-4 token-conditioned FM rehearsal on the real chip (VERDICT r3 "Next
# round #1", done-criterion part 3): fit the k-means pseudo-codec, pretrain
# token_24k_base from the CLI, synthesize the test split from TOKENS ONLY,
# and score reconstruction. Same rehearsal corpus recipe as results/r3_rehearsal
# (dense crops of the bundled reference test audio, 7-file held-out-crop test
# split).
set -uo pipefail
cd /root/repo

R=/tmp/r4_token
LOG=$R/drive.log
M=token_24k_base
mkdir -p $R

stage=${1:-0}
stop=${2:-9}

if [ "$stage" -le 0 ] && [ "$stop" -ge 0 ]; then
  python scripts/make_rehearsal_corpus.py \
    --corpus-dir $R/LibriTTS --data-dir $R/manifests --train-repeat 30 \
    2>&1 | tee -a $LOG
  python scripts/train_tokenizer.py \
    --model-name $M \
    --recordings $R/manifests/libritts_recordings_train_clean_100.jsonl.gz \
    --output $R/tokenizer_1024.npz 2>&1 | tee -a $LOG
  echo "TOKENIZER rc=$?" | tee -a $LOG
fi

if [ "$stage" -le 2 ] && [ "$stop" -ge 2 ]; then
  python -m flow2gan_tpu.bin.pretrain \
    --exp-dir $R/exp/fm --model-name $M \
    --tokenizer $R/tokenizer_1024.npz \
    --train-recordings $R/manifests/libritts_recordings_train_clean_100.jsonl.gz \
    --valid-recordings $R/manifests/libritts_recordings_dev_clean.jsonl.gz \
    --num-epochs 8 --batch-size 16 --base-lr 0.035 --lr-batches 7500 \
    --duration 1.5 \
    --valid-interval 400 --save-every-n 1000000 --log-interval 50 \
    2>&1 | tee -a $LOG
  echo "FM rc=$?" | tee -a $LOG
  python -m flow2gan_tpu.bin.save_averaged_model \
    --exp-dir $R/exp/fm --epoch 8 --avg 3 \
    --output $R/exp/fm/averaged.ckpt 2>&1 | tee -a $LOG
fi

if [ "$stage" -le 5 ] && [ "$stop" -ge 5 ]; then
  # tokens-only reconstruction of the held-out crops (audio -> tokens ->
  # audio inside bin/infer)
  for n in 1 2; do
    python -m flow2gan_tpu.bin.infer \
      --model-name $M --tokenizer $R/tokenizer_1024.npz \
      --checkpoint $R/exp/fm/averaged.ckpt \
      --recordings $R/manifests/libritts_recordings_test_clean.jsonl.gz \
      --root-path $R/LibriTTS \
      --output-dir $R/exp/fm/test_wavs_${n}step \
      --n-timesteps $n 2>&1 | tee -a $LOG
    python scripts/compute_pesq_visqol.py \
      --ref-dir $R/LibriTTS/test-clean \
      --gen-dir $R/exp/fm/test_wavs_${n}step/test-clean \
      --output $R/exp/fm/metrics_pesq_${n}step.json 2>&1 | tee -a $LOG || true
    python scripts/compute_pitch_periodicity.py \
      --ref-dir $R/LibriTTS/test-clean \
      --gen-dir $R/exp/fm/test_wavs_${n}step/test-clean \
      --output $R/exp/fm/metrics_pitch_${n}step.json 2>&1 | tee -a $LOG || true
  done
fi
echo "DRIVE_TOKEN_DONE $(date -u)" | tee -a $LOG
