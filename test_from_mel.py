#!/usr/bin/env python3
"""Smoke script: mel fixture -> waveform with a released (or local) checkpoint.

Mirror of /root/reference/test_from_mel.py. With no checkpoint available
(zero-egress environments) it runs with random weights just to exercise the
full path; pass --checkpoint for real synthesis.
"""

import argparse
from pathlib import Path

import numpy as np

from flow2gan_tpu import get_model
from flow2gan_tpu.data.audio_io import write_wav


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mel-file", type=Path,
                   default=Path("/root/reference/test_data/mel/1089_134686_000002_000000.pt"))
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

    if str(args.mel_file).endswith(".pt"):
        import torch

        mel = torch.load(args.mel_file, map_location="cpu").numpy()
    else:
        mel = np.load(args.mel_file)
    if mel.ndim == 2:
        mel = mel[None]

    wav = np.asarray(model.infer(mel, n_timesteps=args.n_timesteps))
    write_wav(args.output, wav[0], model.config.sampling_rate)
    print(f"Wrote {args.output} ({wav.shape[1] / model.config.sampling_rate:.2f}s)")


if __name__ == "__main__":
    main()
