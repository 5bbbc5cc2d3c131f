#!/usr/bin/env bash
# LibriTTS pipeline: data prep -> FM pretrain -> average -> GAN finetune ->
# inference -> metrics -> export. TPU-native equivalent of the reference
# /root/reference/run_libritts.sh (stages -1..6); one JAX process drives all
# local TPU devices, so the world-size/GPU-count plumbing disappears.
#
# Usage: ./run_libritts.sh --stage 1 --stop-stage 6 [--corpus-dir ...]

set -euo pipefail

stage=1
stop_stage=6
corpus_dir=data/LibriTTS
data_dir=data/manifests
exp_dir=exp
model_name=mel_24k_base
n_timesteps_list="1 2 4"

while [[ $# -gt 0 ]]; do
  case "$1" in
    --stage) stage="$2"; shift 2;;
    --stop-stage) stop_stage="$2"; shift 2;;
    --corpus-dir) corpus_dir="$2"; shift 2;;
    --data-dir) data_dir="$2"; shift 2;;
    --exp-dir) exp_dir="$2"; shift 2;;
    --model-name) model_name="$2"; shift 2;;
    *) echo "unknown option $1"; exit 1;;
  esac
done

log() { echo "$(date '+%Y-%m-%d %H:%M:%S') $*"; }

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  log "Stage 1: prepare manifests"
  python scripts/prepare_recordings_libritts.py \
    --corpus-dir "$corpus_dir" --output-dir "$data_dir"
  python scripts/prepare_test_list_libritts.py \
    --corpus-dir "$corpus_dir" --split test-clean \
    --output "$data_dir/test_clean_files.txt"
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  log "Stage 2: Flow-Matching pretraining (200 epochs, global batch 512)"
  # reference: 200 epochs, batch 256 x 2 GPUs (run_libritts.sh:57-61)
  python -m flow2gan_tpu.bin.pretrain \
    --exp-dir "$exp_dir/fm" --model-name "$model_name" \
    --train-recordings "$data_dir/libritts_recordings_train_clean_100.jsonl.gz,$data_dir/libritts_recordings_train_clean_360.jsonl.gz" \
    --valid-recordings "$data_dir/libritts_recordings_dev_clean.jsonl.gz" \
    --num-epochs 200 --batch-size 512 --base-lr 0.035 --lr-batches 7500 \
    --duration 1.5
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  log "Stage 3: average FM checkpoints (avg-40 of 200)"
  python -m flow2gan_tpu.bin.save_averaged_model \
    --exp-dir "$exp_dir/fm" --epoch 200 --avg 40 \
    --output "$exp_dir/fm/averaged.ckpt"
fi

if [ $stage -le 4 ] && [ $stop_stage -ge 4 ]; then
  for n in $n_timesteps_list; do
    log "Stage 4: GAN finetune, n_timesteps=$n (20 epochs, batch 64)"
    python -m flow2gan_tpu.bin.finetune \
      --exp-dir "$exp_dir/gan_${n}step" --model-name "$model_name" \
      --generator-model-path "$exp_dir/fm/averaged.ckpt" \
      --n-timesteps "$n" --num-epochs 20 --batch-size 64 \
      --train-recordings "$data_dir/libritts_recordings_train_clean_100.jsonl.gz,$data_dir/libritts_recordings_train_clean_360.jsonl.gz" \
      --valid-recordings "$data_dir/libritts_recordings_dev_clean.jsonl.gz"
    log "Stage 4b: export averaged GAN generator (avg-4 of 20)"
    python -m flow2gan_tpu.bin.save_averaged_model \
      --exp-dir "$exp_dir/gan_${n}step" --epoch 20 --avg 4 --load-gan true \
      --output "$exp_dir/gan_${n}step/generator.ckpt"
  done
fi

if [ $stage -le 5 ] && [ $stop_stage -ge 5 ]; then
  for n in $n_timesteps_list; do
    log "Stage 5: inference on test-clean, n_timesteps=$n"
    python -m flow2gan_tpu.bin.infer \
      --model-name "$model_name" \
      --checkpoint "$exp_dir/gan_${n}step/generator.ckpt" \
      --recordings "$data_dir/libritts_recordings_test_clean.jsonl.gz" \
      --root-path "$corpus_dir" \
      --output-dir "$exp_dir/gan_${n}step/test_clean_wavs" \
      --n-timesteps "$n"
  done
fi

if [ $stage -le 6 ] && [ $stop_stage -ge 6 ]; then
  for n in $n_timesteps_list; do
    log "Stage 6: metrics, n_timesteps=$n"
    out="$exp_dir/gan_${n}step"
    python scripts/compute_pesq_visqol.py \
      --ref-dir "$corpus_dir/test-clean" --gen-dir "$out/test_clean_wavs/test-clean" \
      --output "$out/metrics_pesq.json" || true
    python scripts/compute_pitch_periodicity.py \
      --ref-dir "$corpus_dir/test-clean" --gen-dir "$out/test_clean_wavs/test-clean" \
      --output "$out/metrics_pitch.json" || true
    python scripts/compute_fsd.py \
      --ref-dir "$corpus_dir/test-clean" --gen-dir "$out/test_clean_wavs/test-clean" \
      --output "$out/metrics_fsd.json" || true
  done
fi

log "Pipeline done."
