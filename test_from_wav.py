#!/usr/bin/env python3
"""Smoke script: wav -> mel -> wav reconstruction.

Mirror of /root/reference/test_from_wav.py (the reference's user-facing
recipe: LogMelSpectrogram frontend + model.infer).
"""

import argparse
from pathlib import Path

import numpy as np

from flow2gan_tpu import get_model
from flow2gan_tpu.data.audio_io import read_wav, resample, write_wav


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wav-file", type=Path,
                   default=Path("/root/reference/test_data/wav/1089_134686_000002_000000.wav"))
    p.add_argument("--model-name", type=str, default="mel_24k_base")
    p.add_argument("--hf-model-name", type=str, default=None)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--n-timesteps", type=int, default=4)
    p.add_argument("--output", type=Path, default=Path("output.wav"))
    args = p.parse_args()

    model = get_model(
        model_name=args.model_name,
        hf_model_name=args.hf_model_name,
        checkpoint=args.checkpoint,
    )
    sr = model.config.sampling_rate

    audio, in_sr = read_wav(args.wav_file)
    audio = audio.mean(axis=0, keepdims=True)
    if in_sr != sr:
        audio = resample(audio, in_sr, sr)

    wav = np.asarray(model.reconstruct(audio, n_timesteps=args.n_timesteps))
    write_wav(args.output, wav[0], sr)
    print(f"Wrote {args.output} ({wav.shape[1] / sr:.2f}s)")


if __name__ == "__main__":
    main()
