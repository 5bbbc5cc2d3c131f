#!/usr/bin/env bash
# Finish the 44k rehearsal after the tunnel wedge killed the 2-step run
# mid-save of epoch-4: resume 2-step epoch 4 from epoch-3.ckpt, export the
# averaged generator, run the full 4-step finetune, then stages 5-6
# (inference + metrics) for both.
set -uo pipefail
cd /root/repo
R=/tmp/r3_44k
LOG=$R/drive.log
M=mel_44k_128band_512x_base
TRAIN=$R/manifests/libritts_recordings_train_clean_100.jsonl.gz
VALID=$R/manifests/libritts_recordings_dev_clean.jsonl.gz

echo "=== drive_finish start $(date -u) ===" | tee -a $LOG

# 1. 2-step: resume epoch 4 only
python -m flow2gan_tpu.bin.finetune \
  --exp-dir $R/exp/gan_2step --model-name $M \
  --generator-model-path $R/exp/fm/averaged.ckpt \
  --n-timesteps 2 --num-epochs 4 --start-epoch 4 --batch-size 16 \
  --train-recordings $TRAIN --valid-recordings $VALID \
  --gen-start-batch-idx 100 --valid-interval 400 \
  --save-every-n 1000000 --log-interval 50 2>&1 | tee -a $LOG
echo "2STEP_RESUME rc=$?" | tee -a $LOG

python -m flow2gan_tpu.bin.save_averaged_model \
  --exp-dir $R/exp/gan_2step --epoch 4 --avg 2 --load-gan true \
  --output $R/exp/gan_2step/generator.ckpt 2>&1 | tee -a $LOG
echo "2STEP_AVG rc=$?" | tee -a $LOG

# 2. 4-step: full finetune
python -m flow2gan_tpu.bin.finetune \
  --exp-dir $R/exp/gan_4step --model-name $M \
  --generator-model-path $R/exp/fm/averaged.ckpt \
  --n-timesteps 4 --num-epochs 4 --batch-size 16 \
  --train-recordings $TRAIN --valid-recordings $VALID \
  --gen-start-batch-idx 100 --valid-interval 400 \
  --save-every-n 1000000 --log-interval 50 2>&1 | tee -a $LOG
echo "4STEP_TRAIN rc=$?" | tee -a $LOG

python -m flow2gan_tpu.bin.save_averaged_model \
  --exp-dir $R/exp/gan_4step --epoch 4 --avg 2 --load-gan true \
  --output $R/exp/gan_4step/generator.ckpt 2>&1 | tee -a $LOG
echo "4STEP_AVG rc=$?" | tee -a $LOG

# 3. stages 5-6 for both step counts
for n in 2 4; do
  python -m flow2gan_tpu.bin.infer \
    --model-name $M \
    --checkpoint $R/exp/gan_${n}step/generator.ckpt \
    --recordings $R/manifests/libritts_recordings_test_clean.jsonl.gz \
    --root-path $R/LibriTTS \
    --output-dir $R/exp/gan_${n}step/test_clean_wavs \
    --n-timesteps $n 2>&1 | tee -a $LOG
  echo "${n}STEP_INFER rc=$?" | tee -a $LOG
  python scripts/compute_pesq_visqol.py \
    --ref-dir $R/LibriTTS/test-clean \
    --gen-dir $R/exp/gan_${n}step/test_clean_wavs/test-clean \
    --output $R/exp/gan_${n}step/metrics_pesq.json 2>&1 | tee -a $LOG
  python scripts/compute_pitch_periodicity.py \
    --ref-dir $R/LibriTTS/test-clean \
    --gen-dir $R/exp/gan_${n}step/test_clean_wavs/test-clean \
    --output $R/exp/gan_${n}step/metrics_pitch.json 2>&1 | tee -a $LOG
  echo "${n}STEP_METRICS rc=$?" | tee -a $LOG
done

echo "DRIVE_FINISH_DONE $(date -u)" | tee -a $LOG
