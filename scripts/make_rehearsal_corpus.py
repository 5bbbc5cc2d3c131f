#!/usr/bin/env python3
"""Build a LibriTTS-shaped rehearsal corpus from a handful of wav files.

The on-chip pipeline rehearsals (results/minipipe*, QUALITY.md) train on the
reference's bundled test audio (/root/reference/test_data/wav — ~15 s at
24 kHz; wav_44k/mixture.wav — 5 s stereo at 44.1 kHz). This script cuts that
audio into the corpus layout `run_libritts.sh` expects:

  <corpus-dir>/train-clean-100/<spk>/<chap>/seg_%04d.wav   dense 2 s crops
  <corpus-dir>/test-clean/<spk>/<chap>/test_%04d.wav       contiguous held-out*
  <corpus-dir>/dev-clean/<spk>/<chap>/dev_0000.wav

and writes lhotse-style manifests. *"held-out" within the overfit rehearsal:
the test crops are non-overlapping partitions of the same source audio the
train crops densely cover — this measures reconstruction quality of a model
trained on (nearly) this audio, NOT generalization (see QUALITY.md).

--train-repeat N writes each train crop N times into the train manifest
(distinct ids, same file): epochs become N× longer so rehearsal-scale step
budgets (thousands of steps) don't drown in per-epoch checkpoint/IO
overhead. Each repeated entry draws an independent random crop offset per
epoch (dataset.py seeds the crop rng by manifest index).

Round-2 corpus reproduction: defaults (stride 0.1, crop 2.0, repeat 1) on
/root/reference/test_data/wav give the exact 109-seg / 7-test / 1-dev layout
committed in results/minipipe/.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flow2gan_tpu.data.audio_io import read_wav, resample, write_wav  # noqa: E402
from flow2gan_tpu.data.dataset import (  # noqa: E402
    Recording,
    write_recording_manifest,
)


def get_parser():
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    p.add_argument("--source-dir", type=Path,
                   default=Path("/root/reference/test_data/wav"))
    p.add_argument("--corpus-dir", type=Path, required=True)
    p.add_argument("--data-dir", type=Path, required=True,
                   help="manifest output dir")
    p.add_argument("--spk", type=str, default="1089")
    p.add_argument("--chap", type=str, default="134686")
    p.add_argument("--crop-sec", type=float, default=2.0)
    p.add_argument("--stride-sec", type=float, default=0.1)
    p.add_argument("--train-repeat", type=int, default=1)
    p.add_argument("--n-test", type=int, default=6,
                   help="contiguous test crops cut from the longest source")
    p.add_argument("--resample-to", type=int, default=None,
                   help="resample all source audio to this rate before "
                        "cropping (e.g. 44100 for the 44k rehearsal corpus)")
    return p


def main():
    args = get_parser().parse_args()
    wavs = sorted(args.source_dir.glob("*.wav"))
    if not wavs:
        raise SystemExit(f"no wavs under {args.source_dir}")
    loaded = []
    for w in wavs:
        audio, sr = read_wav(w)  # (C, T)
        mono = audio.mean(axis=0) if audio.ndim == 2 else audio
        if args.resample_to is not None and sr != args.resample_to:
            mono = resample(mono, sr, args.resample_to)
            sr = args.resample_to
        loaded.append((w, mono.astype(np.float32), sr))
    loaded.sort(key=lambda t: -t[1].shape[-1])
    (long_path, long_audio, sr) = loaded[0]
    assert all(s == sr for _, _, s in loaded), "mixed sample rates"

    crop = int(args.crop_sec * sr)
    stride = int(args.stride_sec * sr)
    sub = Path(args.spk) / args.chap

    def put(split, name, audio):
        out = args.corpus_dir / split / sub / f"{name}.wav"
        out.parent.mkdir(parents=True, exist_ok=True)
        write_wav(out, audio, sr)
        return Recording(
            id=name, path=str(out), sampling_rate=sr, num_samples=audio.shape[-1]
        )

    # train: dense overlapping crops of the longest source
    train = []
    for i, start in enumerate(range(0, long_audio.shape[-1] - crop + 1, stride)):
        train.append(put("train-clean-100", f"seg_{i:04d}",
                         long_audio[start : start + crop]))

    # test: non-overlapping partition of the longest source + the remaining
    # sources whole; dev: the shortest source (round-2 minipipe layout)
    test = []
    for i in range(args.n_test):
        seg = long_audio[i * crop : (i + 1) * crop]
        if seg.shape[-1] < crop // 2:
            break
        test.append(put("test-clean", f"test_{i:04d}", seg))
    for j, (_, audio, _) in enumerate(loaded[1:]):
        test.append(put("test-clean", f"test_{len(test):04d}", audio))
    dev_audio = loaded[-1][1] if len(loaded) > 1 else long_audio[:crop]
    dev = [put("dev-clean", "dev_0000", dev_audio)]

    args.data_dir.mkdir(parents=True, exist_ok=True)
    train_m = []
    for r in range(args.train_repeat):
        for rec in train:
            train_m.append(
                rec if r == 0 else Recording(
                    id=f"{rec.id}#r{r}", path=rec.path,
                    sampling_rate=rec.sampling_rate, num_samples=rec.num_samples,
                )
            )
    write_recording_manifest(
        train_m, args.data_dir / "libritts_recordings_train_clean_100.jsonl.gz"
    )
    write_recording_manifest(
        test, args.data_dir / "libritts_recordings_test_clean.jsonl.gz"
    )
    write_recording_manifest(
        dev, args.data_dir / "libritts_recordings_dev_clean.jsonl.gz"
    )
    (args.data_dir / "test_clean_files.txt").write_text(
        "\n".join(str(Path(r.path).relative_to(args.corpus_dir / "test-clean"))
                  for r in test) + "\n"
    )
    print(
        f"corpus: {len(train)} train crops (x{args.train_repeat} in manifest), "
        f"{len(test)} test, {len(dev)} dev @ {sr} Hz -> {args.corpus_dir}"
    )


if __name__ == "__main__":
    main()
