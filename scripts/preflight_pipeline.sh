#!/usr/bin/env bash
# Preflight: tiny-config train -> export -> infer -> score, CPU-only, ~4 min.
#
# Run this at the top of EVERY evidence drive (VERDICT r4 next-round #3):
# round 4 burned three hours of chip time on a GAN export edge a 2-minute
# preflight would have caught. Exercises the exact CLI surfaces and flag
# combinations the drives use — including the avg==epochs export window —
# and ends by requiring a scored metrics file with n_files > 0.
#
# CPU-only on purpose: PYTHONPATH deliberately excludes /root/.axon_site so
# the axon TPU plugin never initializes (immune to tunnel state; see
# .claude/skills/verify/SKILL.md round-3 learnings).
#
# Usage: scripts/preflight_pipeline.sh [workdir]   (default /tmp/preflight)
set -euo pipefail
cd "$(dirname "$0")/.."
R=${1:-/tmp/preflight}
rm -rf "$R" && mkdir -p "$R"
export PYTHONPATH=/root/repo
export JAX_PLATFORMS=cpu

python scripts/make_synthetic_corpus.py \
  --corpus-dir "$R/LibriTTS" --data-dir "$R/manifests" \
  --n-train 6 --n-test 2 --n-dev 2 --duration 1.0 --train-repeat 2

python -m flow2gan_tpu.bin.pretrain \
  --model-name mel_24k_tiny --exp-dir "$R/exp/fm" \
  --train-recordings "$R/manifests/libritts_recordings_train_clean_100.jsonl.gz" \
  --valid-recordings "$R/manifests/libritts_recordings_dev_clean.jsonl.gz" \
  --num-epochs 1 --batch-size 2 --duration 1.0 \
  --valid-interval 100000 --log-interval 5

# the round-4 killer: avg == epochs (must use the epoch-0 snapshot window)
python -m flow2gan_tpu.bin.save_averaged_model \
  --exp-dir "$R/exp/fm" --epoch 1 --avg 1

python -m flow2gan_tpu.bin.finetune \
  --model-name mel_24k_tiny --exp-dir "$R/exp/gan_1step" \
  --generator-model-path "$R/exp/fm/averaged.ckpt" \
  --train-recordings "$R/manifests/libritts_recordings_train_clean_100.jsonl.gz" \
  --valid-recordings "$R/manifests/libritts_recordings_dev_clean.jsonl.gz" \
  --n-timesteps 1 --num-epochs 1 --batch-size 2 --duration 1.0 \
  --gen-start-batch-idx 2 --valid-interval 100000 --log-interval 5

python -m flow2gan_tpu.bin.save_averaged_model \
  --exp-dir "$R/exp/gan_1step" --epoch 1 --avg 1 \
  --load-gan true --output "$R/exp/gan_1step/generator.ckpt"

python -m flow2gan_tpu.bin.infer \
  --model-name mel_24k_tiny \
  --checkpoint "$R/exp/gan_1step/generator.ckpt" \
  --recordings "$R/manifests/libritts_recordings_test_clean.jsonl.gz" \
  --root-path "$R/LibriTTS" \
  --output-dir "$R/exp/gan_1step/test_clean_wavs" \
  --n-timesteps 1

python scripts/compute_pesq_visqol.py \
  --ref-dir "$R/LibriTTS/test-clean" \
  --gen-dir "$R/exp/gan_1step/test_clean_wavs/test-clean" \
  --output "$R/exp/gan_1step/metrics_pesq.json"
python scripts/compute_pitch_periodicity.py \
  --ref-dir "$R/LibriTTS/test-clean" \
  --gen-dir "$R/exp/gan_1step/test_clean_wavs/test-clean" \
  --output "$R/exp/gan_1step/metrics_pitch.json"

python - "$R/exp/gan_1step/metrics_pesq.json" <<'EOF'
import json, sys
s = json.load(open(sys.argv[1]))["summary"]
assert s["n_files"] > 0 and s["mrstft"] is not None, s
print(f"preflight metrics: n_files={s['n_files']} mrstft={s['mrstft']:.3f}")
EOF
echo "PREFLIGHT_OK"
