#!/usr/bin/env python3
"""Procedural speech-like corpus with DISJOINT train/test parameter draws —
the generalization rehearsal data source (VERDICT r3 "Next round #3").

Every prior quality artifact trains on dense crops of the same audio it is
scored on (see make_rehearsal_corpus.py); real LibriTTS is egress-blocked.
This generator builds unlimited novel audio offline so held-out evaluation is
possible: each utterance is synthesized from an independent random draw of

  - an f0 contour (random-walk pitch 90-350 Hz, per-speaker base),
  - a harmonic stack with amplitudes shaped by 3 formant-ish resonances
    (random centers/bandwidths, speech-band),
  - voiced/unvoiced segmentation (smooth gates) with formant-shaped noise
    in unvoiced spans + breath noise in voiced ones,
  - a syllabic (3-7 Hz) amplitude envelope,

so MR-STFT / pitch RMSE / periodicity / V-UV metrics all have real structure
to measure. Train and test draw from DISJOINT seed ranges (train: seed+i,
test: seed+100000+i) — a model can only score well on test by generalizing.

Layout + manifests match run_libritts.sh (same as make_rehearsal_corpus.py):
  <corpus-dir>/{train-clean-100,dev-clean,test-clean}/<spk>/<chap>/*.wav
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flow2gan_tpu.data.audio_io import write_wav  # noqa: E402
from flow2gan_tpu.data.dataset import (  # noqa: E402
    Recording,
    write_recording_manifest,
)


def synth_utterance(seed: int, sr: int, duration: float) -> np.ndarray:
    """One speech-like utterance, fully determined by `seed`."""
    rng = np.random.RandomState(seed)
    n = int(duration * sr)
    hop = 256
    n_frames = n // hop + 2
    t_frames = np.arange(n_frames) * hop / sr

    # --- f0 contour: per-utterance base + slow random walk + vibrato-ish LFO
    f0_base = rng.uniform(90.0, 350.0)
    walk = np.cumsum(rng.randn(n_frames)) * rng.uniform(0.2, 0.8)
    walk = walk - np.linspace(walk[0], walk[-1], n_frames)  # detrend
    lfo = rng.uniform(1.0, 4.0) * np.sin(
        2 * np.pi * rng.uniform(4.0, 7.0) * t_frames + rng.uniform(0, 2 * np.pi)
    )
    f0_frames = np.clip(f0_base * (1.0 + 0.01 * walk) + lfo, 60.0, 420.0)

    # --- voiced/unvoiced gating: 2-5 voiced spans with smooth edges
    gate = np.zeros(n_frames)
    n_spans = rng.randint(2, 6)
    edges = np.sort(rng.uniform(0.05, 0.95, 2 * n_spans)) * n_frames
    for a, b in edges.reshape(-1, 2):
        gate[int(a) : int(b)] = 1.0
    # smooth the gate (~30 ms ramps)
    k = max(3, int(0.03 * sr / hop) | 1)
    gate = np.convolve(gate, np.hanning(k) / np.hanning(k).sum(), mode="same")

    # --- formant envelope: 3 resonances over frequency
    centers = np.sort(rng.uniform(250.0, 3500.0, 3))
    bws = rng.uniform(80.0, 400.0, 3)
    gains = rng.uniform(0.5, 1.0, 3)

    def formant_amp(freqs):
        a = np.zeros_like(freqs)
        for c, b, g in zip(centers, bws, gains):
            a = a + g / (1.0 + ((freqs - c) / b) ** 2)
        # gentle spectral tilt
        return a * (1.0 + freqs / 500.0) ** -0.5

    # --- upsample frame tracks to samples
    t_samp = np.arange(n) / sr
    f0 = np.interp(t_samp, t_frames, f0_frames)
    v = np.interp(t_samp, t_frames, gate)

    # --- harmonic stack (vectorized over harmonics)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    max_h = int(np.floor((sr / 2 - 200.0) / f0_frames.max()))
    max_h = min(max_h, 40)  # cap for cost; >40th harmonic is inaudible here
    ks = np.arange(1, max_h + 1)
    harm_f = ks[:, None] * f0[None, :]  # (K, n)
    amps = formant_amp(harm_f)
    amps[harm_f > sr / 2 - 100.0] = 0.0
    voiced = (amps * np.sin(ks[:, None] * phase[None, :])).sum(axis=0)
    voiced /= max_h**0.5

    # --- noise: formant-shaped broadband (unvoiced) + breath (voiced)
    white = rng.randn(n).astype(np.float64)
    spec = np.fft.rfft(white)
    freqs = np.fft.rfftfreq(n, 1.0 / sr)
    shaped = np.fft.irfft(spec * formant_amp(freqs), n)
    shaped /= np.abs(shaped).max() + 1e-9

    # --- syllabic amplitude envelope
    syl = 0.55 + 0.45 * np.sin(
        2 * np.pi * rng.uniform(3.0, 7.0) * t_samp + rng.uniform(0, 2 * np.pi)
    )

    audio = syl * (v * (voiced + 0.05 * shaped) + (1.0 - v) * 0.35 * shaped)
    audio = audio / (np.abs(audio).max() + 1e-9) * rng.uniform(0.5, 0.89)
    return audio.astype(np.float32)


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--corpus-dir", type=Path, required=True)
    p.add_argument("--data-dir", type=Path, required=True,
                   help="Manifest output dir")
    p.add_argument("--sampling-rate", type=int, default=24000)
    p.add_argument("--n-train", type=int, default=300)
    p.add_argument("--n-test", type=int, default=20)
    p.add_argument("--n-dev", type=int, default=4)
    p.add_argument("--duration", type=float, default=3.0)
    p.add_argument("--train-repeat", type=int, default=1,
                   help="Write each train utterance N times into the train "
                   "manifest (longer epochs; independent crops per epoch)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    sr = args.sampling_rate
    splits = {
        # DISJOINT seed ranges: test/dev utterances share no parameter draw
        # with anything trained on
        "train-clean-100": (args.seed, args.n_train, "syn"),
        "test-clean": (args.seed + 100_000, args.n_test, "test"),
        "dev-clean": (args.seed + 200_000, args.n_dev, "dev"),
    }
    manifests = {}
    for split, (base_seed, count, prefix) in splits.items():
        recs = []
        d = args.corpus_dir / split / "9999" / "000000"
        d.mkdir(parents=True, exist_ok=True)
        for i in range(count):
            audio = synth_utterance(base_seed + i, sr, args.duration)
            path = d / f"{prefix}_{i:04d}.wav"
            write_wav(path, audio, sr)
            rid = f"{prefix}_{i:04d}"
            rec = Recording(
                id=rid, path=str(path), sampling_rate=sr,
                num_samples=len(audio),
            )
            repeats = args.train_repeat if split == "train-clean-100" else 1
            for r in range(repeats):
                recs.append(
                    rec if r == 0 else Recording(
                        id=f"{rid}_rep{r}", path=str(path),
                        sampling_rate=sr, num_samples=len(audio),
                    )
                )
        manifests[split] = recs

    args.data_dir.mkdir(parents=True, exist_ok=True)
    name_map = {
        "train-clean-100": "train_clean_100",
        "test-clean": "test_clean",
        "dev-clean": "dev_clean",
    }
    for split, recs in manifests.items():
        out = args.data_dir / f"libritts_recordings_{name_map[split]}.jsonl.gz"
        write_recording_manifest(recs, str(out))
    print(
        f"synthetic corpus: {args.n_train} train (x{args.train_repeat} in "
        f"manifest), {args.n_test} test, {args.n_dev} dev @ {sr} Hz "
        f"-> {args.corpus_dir} (disjoint seed ranges)"
    )


if __name__ == "__main__":
    main()
