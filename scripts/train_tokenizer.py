#!/usr/bin/env python3
"""Fit the k-means pseudo-codec codebook for token-conditioned training.

Reads a recordings manifest, computes log-mel frames with the named model
config's frontend, Lloyd-fits `vocab_size` centroids, and writes a
self-describing `.npz` codebook that `bin/pretrain --tokenizer`,
`bin/finetune --tokenizer` and `bin/infer --tokenizer` load
(`ops/tokenizer.py`). This is the offline "train the codec" step of the
token-conditioned capability (the reference CondEncoder's "codec embeddings"
conditioning, reference models/modules.py:499; the reference itself ships no
codec).

Example:
  python scripts/train_tokenizer.py \
      --model-name token_24k_base \
      --recordings data/libritts_recordings_train_clean_100.jsonl.gz \
      --output exp/tokenizer_1024.npz
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

from flow2gan_tpu.data.audio_io import read_wav, resample  # noqa: E402
from flow2gan_tpu.data.dataset import read_recording_manifest  # noqa: E402
from flow2gan_tpu.models import get_generator_config  # noqa: E402
from flow2gan_tpu.ops.mel import LogMelSpectrogram  # noqa: E402
from flow2gan_tpu.ops.tokenizer import MelKMeansTokenizer, kmeans_fit  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--model-name", default="token_24k_base",
                   help="Generator config whose mel frontend + vocab_size "
                   "the codebook is fit for")
    p.add_argument("--recordings", required=True,
                   help="recordings.jsonl[.gz] manifest to fit on")
    p.add_argument("--root-path", default=None,
                   help="If manifest paths are relative, resolve under this")
    p.add_argument("--output", required=True, help="Output .npz codebook path")
    p.add_argument("--vocab-size", type=int, default=None,
                   help="Codebook size (default: the config's vocab_size)")
    p.add_argument("--max-recordings", type=int, default=2000,
                   help="Cap on recordings read (uniformly strided)")
    p.add_argument("--max-frames", type=int, default=2_000_000,
                   help="Cap on mel frames fed to k-means (random subsample)")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    cfg = get_generator_config(args.model_name)
    k = args.vocab_size or int(cfg.get("vocab_size", 1024))
    mel_fn = LogMelSpectrogram(
        sampling_rate=cfg.sampling_rate,
        n_fft=cfg.mel_n_fft,
        hop_length=cfg.mel_hop_length,
        n_mels=cfg.n_mels,
    )
    mel_jit = jax.jit(mel_fn)

    recs = read_recording_manifest(args.recordings)
    if len(recs) > args.max_recordings:
        stride = len(recs) / args.max_recordings
        recs = [recs[int(i * stride)] for i in range(args.max_recordings)]
    logging.info(f"fitting k={k} on {len(recs)} recordings")

    frames = []
    n_frames = 0
    for rec in recs:
        path = rec.path
        if args.root_path and not Path(path).exists():
            path = str(Path(args.root_path) / path)
        audio, sr = read_wav(path)
        audio = np.atleast_2d(np.asarray(audio, np.float32))[:1]
        if sr != cfg.sampling_rate:
            audio = np.atleast_2d(
                np.asarray(resample(audio[0], sr, cfg.sampling_rate))
            )
        # bucket-pad to whole seconds so mel_jit compiles once per bucket,
        # not once per distinct recording length (real corpora have nearly
        # all-unique lengths -> thousands of ~1 s XLA compiles otherwise);
        # trim the frames the zero-pad could touch
        n_samp = audio.shape[-1]
        bucket = cfg.sampling_rate
        pad = -(-n_samp // bucket) * bucket - n_samp
        if pad:
            audio = np.pad(audio, ((0, 0), (0, pad)))
        t_keep = max(
            1,
            n_samp // cfg.mel_hop_length
            + 1
            - cfg.mel_n_fft // cfg.mel_hop_length,
        )
        mel = np.asarray(mel_jit(audio))[0][:, :t_keep]  # (n_mels, T)
        frames.append(mel.T.astype(np.float32))
        n_frames += frames[-1].shape[0]
        if n_frames >= args.max_frames * 2:
            break
    X = np.concatenate(frames, axis=0)
    if X.shape[0] > args.max_frames:
        keep = np.random.RandomState(args.seed).choice(
            X.shape[0], args.max_frames, replace=False
        )
        X = X[keep]
    logging.info(f"k-means on {X.shape[0]} frames x {X.shape[1]} mels")

    C = kmeans_fit(X, k, iters=args.iters, seed=args.seed)
    tok = MelKMeansTokenizer(
        C, cfg.sampling_rate, cfg.mel_n_fft, cfg.mel_hop_length, cfg.n_mels
    )
    Path(args.output).parent.mkdir(parents=True, exist_ok=True)
    tok.save(args.output)
    # report codebook usage on the fit data as a sanity signal
    used = len(np.unique(np.argmin(
        -2.0 * X[:100000] @ C.T + np.sum(C * C, axis=1), axis=1)))
    logging.info(f"saved {args.output}: K={k}, {used}/{k} centroids used on fit sample")


if __name__ == "__main__":
    main()
